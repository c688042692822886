"""Round-5 probe A: decompose the out-of-core wall (VERDICT r4 item #2).

INGEST_r04 measured the 313 MB FASTQ count at 89.27s (~1.5M k-mers/s)
while the engine's sustained rate is 168.8M/s — and nobody decomposed
where the ~60x goes.  This probe times every phase of the shipped
`count_read_stream` path on the real chip, plus the candidate fast
composition (packed wire + fold_windows_into_wide), so the r5 rebuild
is aimed, not guessed.

Phases (each isolated, blocking where needed for honest attribution):
  feed      : _reads_file_batches alone (parse + bucket + assemble)
  pack      : pack2bit_rows over the assembled batches
  upload    : device_put of packed words, block_until_ready
  count     : per-batch count_kmers step (the shipped jit), blocked
  merge     : WideAccumulator.add fold (shipped _merge_into_wide_jit),
              including its growth syncs/recompiles, blocked
  shipped_e2e : the real count_read_stream wall (un-instrumented)
  fast_e2e  : prototype loop — producer feed + packed upload +
              fold_windows_into_wide step, pipelined

Usage: tpu_run.sh scripts/probe_r5a.py /tmp/probe_r5a.out
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PATH = "/tmp/ingest_rss/small.fastq"
K = 21
BATCH = 262144
CHUNK = 64 << 20
SLOTS = 1 << 22  # distinct keys here ~5.0M -> grows to 8M on this data


def main():
    import jax
    import jax.numpy as jnp

    from kmer_tpu.cli import _reads_file_batches
    from kmer_tpu.native import pack2bit_rows

    print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)
    out = {}
    fsize = os.path.getsize(PATH)
    out["file_gb"] = round(fsize / 1e9, 3)

    # --- phase: feed (host only) --------------------------------------
    t0 = time.perf_counter()
    batches = []
    n_windows = 0
    for codes, lens in _reads_file_batches(PATH, "fastq", K, batch=BATCH,
                                           chunk_bytes=CHUNK):
        batches.append((codes, lens))
        n_windows += int(np.maximum(np.asarray(lens, np.int64) - (K - 1), 0).sum())
    t_feed = time.perf_counter() - t0
    out["feed_s"] = round(t_feed, 2)
    out["n_batches"] = len(batches)
    out["n_windows"] = n_windows
    out["batch_shapes"] = sorted({tuple(c.shape) for c, _ in batches})
    print(json.dumps({k: out[k] for k in out}), flush=True)

    # --- phase: pack (host only) --------------------------------------
    t0 = time.perf_counter()
    packed = [(pack2bit_rows(c), l) for c, l in batches]
    t_pack = time.perf_counter() - t0
    out["pack_s"] = round(t_pack, 2)
    out["packed_mb"] = round(sum(p.nbytes for p, _ in packed) / 1e6, 1)

    # --- phase: upload (packed wire, blocked) -------------------------
    t0 = time.perf_counter()
    dev = []
    for p, l in packed:
        dp = jax.device_put(p)
        dl = jax.device_put(np.asarray(l, np.int32))
        dev.append((dp, dl))
    for dp, dl in dev:
        dp.block_until_ready()
    t_up = time.perf_counter() - t0
    out["upload_s"] = round(t_up, 2)
    out["upload_mb_s"] = round(out["packed_mb"] / t_up, 1)
    print(json.dumps({"pack_s": out["pack_s"], "upload_s": out["upload_s"],
                      "upload_mb_s": out["upload_mb_s"]}), flush=True)

    # --- phase: count step (shipped jit), per batch shape -------------
    from kmer_tpu.native import device_unpack_rows
    from kmer_tpu.ops.count import count_kmers

    step = jax.jit(
        lambda w, l, width: count_kmers(
            device_unpack_rows(w, width), l, K, True
        ),
        static_argnames=("width",),
    )
    shapes = {(c.shape, c.shape[1]) for c, _ in batches}
    # warm every (batch, width) shape — the tail batch's smaller B is a
    # separate jit entry, and an in-loop compile would pollute the timing
    for (dp, dl), (c, _) in zip(dev, batches):
        key = (c.shape, c.shape[1])
        if key in shapes:
            step(dp, dl, c.shape[1]).counts.block_until_ready()
            shapes.discard(key)
    t0 = time.perf_counter()
    tables = []
    for (dp, dl), (c, _) in zip(dev, batches):
        tables.append(step(dp, dl, c.shape[1]))
    for t in tables:
        t.counts.block_until_ready()
    t_count = time.perf_counter() - t0
    out["count_s"] = round(t_count, 2)
    print(json.dumps({"count_s": out["count_s"]}), flush=True)

    # --- phase: shipped merge (WideAccumulator.add), incl. growth -----
    from kmer_tpu.ops.wide import WideAccumulator

    acc = WideAccumulator(SLOTS)
    t0 = time.perf_counter()
    for t in tables:
        acc.add(t)
    r = acc.result()
    jax.block_until_ready(r.counts_lo)
    t_merge = time.perf_counter() - t0
    out["merge_s"] = round(t_merge, 2)
    out["distinct"] = int(r.n_unique)
    del tables, acc, r
    print(json.dumps({"merge_s": out["merge_s"],
                      "distinct": out["distinct"]}), flush=True)

    # --- shipped end-to-end (un-instrumented), warm jits --------------
    from kmer_tpu.streaming import count_read_stream

    t0 = time.perf_counter()
    table = count_read_stream(
        _reads_file_batches(PATH, "fastq", K, batch=BATCH,
                            chunk_bytes=CHUNK),
        K, canonical=True, capacity=SLOTS,
    )
    jax.block_until_ready(table.counts_lo)
    t_ship = time.perf_counter() - t0
    out["shipped_e2e_s"] = round(t_ship, 2)
    out["shipped_kmers_s"] = round(n_windows / t_ship / 1e6, 2)
    ship_trim = table.trim()
    del table
    print(json.dumps({"shipped_e2e_s": out["shipped_e2e_s"],
                      "shipped_Mkmers_s": out["shipped_kmers_s"]}), flush=True)

    # --- fast prototype: producer thread + packed wire + fold ---------
    import queue
    import threading

    from kmer_tpu.ops.extract import canonicalize, extract_windows_batch
    from kmer_tpu.ops.wide import WideCounts, fold_windows_into_wide

    CAP = 1 << 23  # 8M slots (5.0M distinct here)

    def fold_step(acc, words, lengths, width):
        codes = device_unpack_rows(words, width)
        wins, valid = extract_windows_batch(codes, lengths, K)
        hi, lo = canonicalize(wins.hi, wins.lo, K)
        return fold_windows_into_wide(acc, hi, lo, valid, K)

    fold_j = jax.jit(fold_step, static_argnames=("width",))

    def producer(q):
        for codes, lens in _reads_file_batches(PATH, "fastq", K, batch=BATCH,
                                               chunk_bytes=CHUNK):
            if codes.shape[0] < BATCH:  # pad tail: ONE compiled shape
                pad = BATCH - codes.shape[0]
                codes = np.concatenate(
                    [codes, np.zeros((pad, codes.shape[1]), np.uint8)])
                lens = np.concatenate([lens, np.zeros(pad, lens.dtype)])
            q.put((pack2bit_rows(codes), np.asarray(lens, np.int32),
                   codes.shape[1]))
        q.put(None)

    # warm: one batch through both jit variants (fresh + committed acc)
    acc0 = WideCounts.empty(CAP)
    wb, wl, ww = packed[0][0], np.asarray(packed[0][1], np.int32), batches[0][0].shape[1]
    acc0 = fold_j(acc0, wb, wl, ww)
    acc0 = fold_j(acc0, wb, wl, ww)
    jax.block_until_ready(acc0.counts_lo)
    del acc0, packed, dev, batches

    q: "queue.Queue" = queue.Queue(maxsize=4)
    th = threading.Thread(target=producer, args=(q,), daemon=True)
    acc = WideCounts.empty(CAP)
    from collections import deque
    inflight: deque = deque()
    t0 = time.perf_counter()
    th.start()
    nb = 0
    while True:
        item = q.get()
        if item is None:
            break
        w, l, width = item
        acc = fold_j(acc, jax.device_put(w), jax.device_put(l), width)
        nb += 1
        inflight.append(acc.n_unique)
        while len(inflight) > 4:
            if inflight[0].is_ready():
                inflight.popleft()
            else:
                time.sleep(0.01)
    jax.block_until_ready(acc.counts_lo)
    t_fast = time.perf_counter() - t0
    out["fast_e2e_s"] = round(t_fast, 2)
    out["fast_kmers_s"] = round(n_windows / t_fast / 1e6, 2)
    out["fast_distinct"] = int(acc.n_unique)

    # exactness: fast == shipped
    ft = acc.trim()
    ok = (np.array_equal(np.asarray(ship_trim.hi), np.asarray(ft.hi))
          and np.array_equal(np.asarray(ship_trim.lo), np.asarray(ft.lo))
          and np.array_equal(ship_trim.counts64(), ft.counts64()))
    out["fast_exact_vs_shipped"] = bool(ok)

    print(json.dumps(out), flush=True)
    with open("/tmp/probe_r5a.json", "w") as f:
        json.dump(out, f, indent=1)
    print("probe_r5a OK", flush=True)


if __name__ == "__main__":
    main()
