"""Round-5 probe G: decompose the distcount (1,1)-mesh step wall.

probe_distcount_hw shows ~4-10s per 65536-read batch where the pencil
says ~0.7s (count 9.2M windows + 16M-row fold merge + 3MB upload).
Times each phase in isolation on the real file feed.

Usage: tpu_run.sh scripts/probe_r5g.py /tmp/probe_r5g.out 1500
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

PATH = "/tmp/ingest_rss/small.fastq"
K = 21
BATCH = 65536
WIDTH = 160
ACC_CAP = 8 * 1024 * 1024


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from kmer_tpu.parallel.mesh import make_mesh
    from kmer_tpu.parallel.streaming import (
        empty_sharded_acc,
        make_sharded_stream_step,
    )
    from kmer_tpu.pipeline import file_batch_feed

    print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)
    out = {}
    mesh = make_mesh((1, 1))

    t0 = time.perf_counter()
    feed, batch, width, _ = file_batch_feed(PATH, "fastq", K, BATCH, WIDTH,
                                            128 << 20)
    host = [(w, l) for w, l in feed]
    out["feed_s"] = round(time.perf_counter() - t0, 2)
    out["n_batches"] = len(host)
    print(json.dumps(out), flush=True)

    step = make_sharded_stream_step(mesh, K, True, ACC_CAP, 2.0,
                                    packed_width=width)
    acc = empty_sharded_acc(mesh, ACC_CAP)
    ovf = jnp.zeros((), jnp.int32)
    t0 = time.perf_counter()
    acc, ovf = step(acc, ovf, jnp.asarray(host[0][0]),
                    jnp.asarray(host[0][1]))
    jax.block_until_ready(acc.counts_lo)
    out["first_step_s"] = round(time.perf_counter() - t0, 2)  # compile?
    t0 = time.perf_counter()
    acc, ovf = step(acc, ovf, jnp.asarray(host[1][0]),
                    jnp.asarray(host[1][1]))
    jax.block_until_ready(acc.counts_lo)
    out["second_step_s"] = round(time.perf_counter() - t0, 2)  # variant 2
    print(json.dumps(out), flush=True)

    # warm steady state: per-batch blocked timing
    times = []
    for w, l in host[2:10]:
        t0 = time.perf_counter()
        acc, ovf = step(acc, ovf, jnp.asarray(w), jnp.asarray(l))
        jax.block_until_ready(acc.counts_lo)
        times.append(round(time.perf_counter() - t0, 3))
    out["steady_blocked_s"] = times
    # pipelined (dispatch all, block once)
    t0 = time.perf_counter()
    for w, l in host[10:16]:
        acc, ovf = step(acc, ovf, jnp.asarray(w), jnp.asarray(l))
    jax.block_until_ready(acc.counts_lo)
    out["pipelined_6_steps_s"] = round(time.perf_counter() - t0, 2)
    out["overflow"] = int(ovf)
    print(json.dumps(out), flush=True)
    with open("/tmp/probe_r5g.json", "w") as f:
        json.dump(out, f, indent=1)
    print("probe_r5g OK", flush=True)


if __name__ == "__main__":
    main()
