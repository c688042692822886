#!/bin/bash
# Run a python script on the TPU with claim-retry.
#
# The axon tunnel admits one process at a time and a claim can hang
# indefinitely on a stale grant (even after clean exits).  The payload
# script MUST print a line containing "claim" right after its first tiny
# device op; if that line doesn't appear within CLAIM_WAIT seconds the
# payload is killed and relaunched.
#
# usage: tpu_run.sh <script.py> <output-file> [timeout-seconds] [attempts]
set -u
SCRIPT="$1"; OUT="$2"; TMO="${3:-540}"; ATTEMPTS="${4:-10}"
CLAIM_WAIT=${CLAIM_WAIT:-100}
: > "$OUT"
for i in $(seq 1 "$ATTEMPTS"); do
  TRY=$(mktemp)
  echo "[tpu_run] attempt $i $(date +%T)" >> "$OUT"
  timeout "$TMO" python -u "$SCRIPT" > "$TRY" 2>&1 &
  PID=$!
  CLAIMED=0
  for _ in $(seq 1 "$CLAIM_WAIT"); do
    if ! kill -0 "$PID" 2>/dev/null; then break; fi
    if grep -q "claim" "$TRY" 2>/dev/null; then CLAIMED=1; break; fi
    sleep 1
  done
  if [ "$CLAIMED" = 1 ] || ! kill -0 "$PID" 2>/dev/null; then
    wait "$PID"; RC=$?
    cat "$TRY" >> "$OUT"; rm -f "$TRY"
    echo "[tpu_run] payload exited $RC $(date +%T)" >> "$OUT"
    exit "$RC"
  fi
  kill "$PID" 2>/dev/null
  wait "$PID" 2>/dev/null
  cat "$TRY" >> "$OUT"; rm -f "$TRY"
  echo "[tpu_run] claim timed out, retrying $(date +%T)" >> "$OUT"
  sleep 30
done
echo "[tpu_run] giving up after $ATTEMPTS attempts" >> "$OUT"
exit 1
