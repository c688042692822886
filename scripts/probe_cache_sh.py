"""Is the persistent compilation cache effective for the jit(shard_map)
sharded stream step?  Run twice; compare first_step_s.

Usage: tpu_run.sh scripts/probe_cache_sh.py /tmp/probe_cache_sh1.out
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # explain cache misses in the log
    try:
        jax.config.update("jax_explain_cache_misses", True)
    except Exception:
        pass
    print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)

    import numpy as np

    from kmer_tpu.parallel.mesh import make_mesh
    from kmer_tpu.parallel.streaming import (
        empty_sharded_acc,
        make_sharded_stream_step,
    )

    mesh = make_mesh((1, 1))
    step = make_sharded_stream_step(mesh, 21, True, 8 * 1024 * 1024, 2.0,
                                    packed_width=160)
    acc = empty_sharded_acc(mesh, 8 * 1024 * 1024)
    w = jnp.zeros((65536, 11), jnp.uint32)
    l = jnp.zeros((65536,), jnp.uint16)
    t0 = time.perf_counter()
    acc, ovf = step(acc, jnp.zeros((), jnp.int32), w, l)
    jax.block_until_ready(acc.counts_lo)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    acc, ovf = step(acc, ovf, w, l)
    jax.block_until_ready(acc.counts_lo)
    t2 = time.perf_counter() - t0
    n = len(os.listdir("/tmp/jax_cache")) if os.path.isdir(
        "/tmp/jax_cache") else 0
    print(json.dumps({"first_step_s": round(t1, 2),
                      "second_step_s": round(t2, 2),
                      "cache_files": n}), flush=True)
    print("probe_cache_sh OK", flush=True)


if __name__ == "__main__":
    main()
