"""Steady-state stream-step cost: why does the sustained loop pay
~1.1s/step when the isolated step measures 0.67s?

Measures, at sustained shapes:
  A. isolated step, block every iteration (probe_step's number);
  B. 16-step async loop, one final block (the sustained loop's shape)
     -> amortized per-step cost with dispatch pipelining;
  C. same loop with buffer donation (donate acc+overflow) — donation
     lets XLA reuse the 84MB accumulator buffers in place.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp

print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)

from kmer_tpu.native import pack2bit_rows, device_unpack_rows
from kmer_tpu.parallel.mesh import make_mesh
from kmer_tpu.parallel.streaming import (
    empty_sharded_acc, make_sharded_stream_step,
)

K = 21
B, L = 512 * 1024, 150
CAP = 4 * 1024 * 1024

rng = np.random.default_rng(0)
genome = rng.integers(0, 4, 1_000_000, dtype=np.uint8)
batches = []
for i in range(4):
    starts = rng.integers(0, genome.size - L + 1, B)
    reads = genome[starts[:, None] + np.arange(L)[None, :]]
    words = jnp.asarray(pack2bit_rows(reads))
    codes = device_unpack_rows(words, L)
    codes.block_until_ready()
    batches.append(codes)
lengths = jnp.full((B,), L, jnp.int32)
print("data resident", flush=True)

mesh = make_mesh((1, 1))
step = make_sharded_stream_step(mesh, K, canonical=True, acc_capacity=CAP)

# A: isolated, block each iter
acc = empty_sharded_acc(mesh, CAP)
ovf = jnp.zeros((), jnp.int32)
acc, ovf = step(acc, ovf, batches[0], lengths)
jax.block_until_ready(acc.counts_lo)
for it in range(3):
    t0 = time.perf_counter()
    acc, ovf = step(acc, ovf, batches[it % 4], lengths)
    jax.block_until_ready(acc.counts_lo)
    print(f"A isolated step: {(time.perf_counter()-t0)*1e3:.1f}ms", flush=True)

# B: 16-step async loop, block once
for trial in range(2):
    t0 = time.perf_counter()
    for i in range(16):
        acc, ovf = step(acc, ovf, batches[i % 4], lengths)
    jax.block_until_ready(acc.counts_lo)
    dt = time.perf_counter() - t0
    print(f"B async 16-step loop: {dt*1e3:.0f}ms -> {dt/16*1e3:.1f}ms/step",
          flush=True)

# C: donated variant
try:
    from kmer_tpu.parallel.streaming import WideCounts  # noqa: F401
    import kmer_tpu.parallel.streaming as pstream

    # rebuild the same step with donation on the accumulator args
    raw = make_sharded_stream_step.__wrapped__ if hasattr(
        make_sharded_stream_step, "__wrapped__") else None
    # simplest: wrap the existing jitted fn's underlying shard_map via a
    # fresh jit with donation
    undonated = make_sharded_stream_step(mesh, K, canonical=True,
                                         acc_capacity=CAP)
    inner = undonated.__wrapped__  # the shard_map-wrapped python callable
    dstep = jax.jit(inner, donate_argnums=(0, 1))
    acc2 = empty_sharded_acc(mesh, CAP)
    ovf2 = jnp.zeros((), jnp.int32)
    acc2, ovf2 = dstep(acc2, ovf2, batches[0], lengths)
    jax.block_until_ready(acc2.counts_lo)
    for trial in range(2):
        t0 = time.perf_counter()
        for i in range(16):
            acc2, ovf2 = dstep(acc2, ovf2, batches[i % 4], lengths)
        jax.block_until_ready(acc2.counts_lo)
        dt = time.perf_counter() - t0
        print(f"C donated 16-step loop: {dt*1e3:.0f}ms -> "
              f"{dt/16*1e3:.1f}ms/step", flush=True)
    print(f"C n_unique={int(acc2.n_unique)} ovf={int(ovf2)}", flush=True)
except Exception as e:
    print(f"C donated: FAIL {type(e).__name__}: "
          + str(e).replace(chr(10), ' | ')[:200], flush=True)

print(f"A/B n_unique={int(acc.n_unique)} ovf={int(ovf)}", flush=True)
print("probe_step3 done", flush=True)
