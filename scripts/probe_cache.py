"""Does the JAX persistent compilation cache work through the axon
backend?  Times the fold-step compile with JAX_COMPILATION_CACHE_DIR
set; run twice (two processes) and compare.

Usage: tpu_run.sh scripts/probe_cache.py /tmp/probe_cache1.out
       tpu_run.sh scripts/probe_cache.py /tmp/probe_cache2.out
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)

    from kmer_tpu.ops.wide import WideCounts
    from kmer_tpu.pipeline import _make_fold_step

    B, W = 524288, 160
    step = _make_fold_step(21, True, W)
    acc = WideCounts.empty(1 << 24)
    st = jnp.zeros((3,), jnp.int32)
    combo = jnp.zeros((B, W // 16 + 1), jnp.uint32)
    t0 = time.perf_counter()
    acc, st = step(acc, st, combo)
    jax.block_until_ready(acc.counts_lo)
    dt = time.perf_counter() - t0
    files = len(os.listdir("/tmp/jax_cache")) if os.path.isdir(
        "/tmp/jax_cache") else 0
    print(json.dumps({"first_step_s": round(dt, 2),
                      "cache_files": files}), flush=True)
    print("probe_cache OK", flush=True)


if __name__ == "__main__":
    main()
