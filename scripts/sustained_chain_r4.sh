#!/bin/bash
# Run the three sustained_r4 phases in order on the TPU (VERDICT r3 #3).
# Each phase goes through tpu_run.sh's claim-retry.  The kill phase is
# EXPECTED to exit nonzero (it os._exit(1)s mid-stream by design).
set -u
DIR="${1:-/tmp/sustained_r4_run}"
OUT="${2:-/tmp/sustained_r4.out}"
rm -rf "$DIR"; mkdir -p "$DIR"
: > "$OUT"

# tpu_run.sh takes a bare script path; wrap each phase in a tiny
# launcher that injects the argv
for spec in "straight:" "kill:" "resume:"; do
  phase="${spec%%:*}"
  L=$(mktemp --suffix=.py)
  cat > "$L" <<PYEOF
import runpy, sys
sys.argv = ["sustained_r4.py", "--phase", "$phase", "--dir", "$DIR"]
runpy.run_path("scripts/sustained_r4.py", run_name="__main__")
PYEOF
  echo "=== phase $phase $(date +%T) ===" >> "$OUT"
  bash scripts/tpu_run.sh "$L" "$OUT.$phase" 2400 10
  rc=$?
  cat "$OUT.$phase" >> "$OUT"
  rm -f "$L"
  if [ "$phase" = "kill" ]; then
    echo "kill phase rc=$rc (nonzero expected)" >> "$OUT"
  elif [ "$rc" != 0 ]; then
    echo "phase $phase FAILED rc=$rc — aborting chain" >> "$OUT"
    exit "$rc"
  fi
done
echo "chain done $(date +%T)" >> "$OUT"
