"""Round-5 probe B: the rebuilt count_file on hardware (313 MB FASTQ).

Measures:
  1. upload characteristics: per-size device_put rates, and whether an
     upload overlaps a running step (decides super-batching)
  2. count_file end-to-end: cold (incl. compile) and warm walls with
     the shipped auto defaults
  3. exactness: distinct/total vs the r4-verified values

Usage: tpu_run.sh scripts/probe_r5b.py /tmp/probe_r5b.out 1200
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PATH = "/tmp/ingest_rss/small.fastq"
K = 21
EXPECT_DISTINCT = 4999967
EXPECT_TOTAL = 130000000


def main():
    import jax
    import jax.numpy as jnp

    print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)
    out = {}

    # --- 1. upload rates by transfer size -----------------------------
    rng = np.random.default_rng(0)
    for mb in (4, 12, 40):
        arr = rng.integers(0, 2**32, (mb << 20) // 4, dtype=np.uint32)
        d = jax.device_put(arr)  # warm the path
        d.block_until_ready()
        t0 = time.perf_counter()
        d = jax.device_put(arr)
        d.block_until_ready()
        dt = time.perf_counter() - t0
        out[f"upload_{mb}mb_mb_s"] = round(mb / dt, 1)
    print(json.dumps(out), flush=True)

    # --- 1b. does an upload overlap a running step? -------------------
    # one ~0.5s compute kernel; upload 12 MB while it runs
    x = jax.device_put(rng.integers(0, 2**32, 1 << 25, dtype=np.uint32))
    heavy = jax.jit(lambda v: jax.lax.sort(
        (v,), num_keys=1, is_stable=False)[0][-1])
    heavy(x).block_until_ready()
    t0 = time.perf_counter()
    r = heavy(x)
    r.block_until_ready()
    t_compute = time.perf_counter() - t0
    up = rng.integers(0, 2**32, (12 << 20) // 4, dtype=np.uint32)
    d = jax.device_put(up)
    d.block_until_ready()
    t0 = time.perf_counter()
    r = heavy(x)           # dispatch compute first
    d = jax.device_put(up)  # then upload while it runs
    d.block_until_ready()
    r.block_until_ready()
    t_both = time.perf_counter() - t0
    out["compute_s"] = round(t_compute, 3)
    out["compute_plus_upload_s"] = round(t_both, 3)
    out["upload_overlaps_compute"] = bool(
        t_both < t_compute + (12 / out["upload_12mb_mb_s"]) * 0.6)
    print(json.dumps({k: out[k] for k in
                      ("compute_s", "compute_plus_upload_s",
                       "upload_overlaps_compute")}), flush=True)

    # --- 2. count_file with shipped defaults --------------------------
    from kmer_tpu.pipeline import count_file
    from kmer_tpu.utils.logging import StatsCounters

    def run():
        stats = StatsCounters()
        t0 = time.perf_counter()
        res = count_file(PATH, "fastq", K, canonical=True, stats=stats)
        jax.block_until_ready(getattr(res, "counts_lo", None)
                              if hasattr(res, "counts_lo") else res.counts)
        return res, time.perf_counter() - t0

    res_cold, t_cold = run()
    out["cold_e2e_s"] = round(t_cold, 2)
    out["cold_Mkmers_s"] = round(EXPECT_TOTAL / t_cold / 1e6, 2)
    print(json.dumps({k: out[k] for k in ("cold_e2e_s", "cold_Mkmers_s")}),
          flush=True)
    del res_cold

    res, t_warm = run()
    out["warm_e2e_s"] = round(t_warm, 2)
    out["warm_Mkmers_s"] = round(EXPECT_TOTAL / t_warm / 1e6, 2)
    res2, t_warm2 = run()
    out["warm2_e2e_s"] = round(t_warm2, 2)
    out["warm2_Mkmers_s"] = round(EXPECT_TOTAL / t_warm2 / 1e6, 2)
    t = res.trim()
    out["distinct"] = int(t.n_unique)
    c64 = (t.counts64() if hasattr(t, "counts64")
           else np.asarray(t.counts, np.int64))
    out["total"] = int(c64.sum())
    out["route"] = type(res).__name__
    out["exact"] = (out["distinct"] == EXPECT_DISTINCT
                    and out["total"] == EXPECT_TOTAL)
    print(json.dumps(out), flush=True)
    with open("/tmp/probe_r5b.json", "w") as f:
        json.dump(out, f, indent=1)
    print("probe_r5b OK", flush=True)


if __name__ == "__main__":
    main()
