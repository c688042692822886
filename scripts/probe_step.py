"""Decompose the sustained stream step cost on the chip (round 3).

Times, at the sustained run's exact shapes ([512k, 150] reads, k=21
canonical, 4M-slot accumulator, (1,1) mesh):
  1. extract+canonicalize alone
  2. fold_windows_into_wide alone (the fused r3 path)
  3. count_windows alone + merge_into_wide alone (the r2 two-step)
  4. the full shard_map stream step
All consumed via block_until_ready on device (no tunnel transfers).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp

print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)

from kmer_tpu.native import pack2bit_rows, device_unpack_rows
from kmer_tpu.ops.extract import extract_windows_batch, canonicalize
from kmer_tpu.ops.count import count_windows
from kmer_tpu.ops.wide import (
    WideCounts, fold_windows_into_wide, merge_into_wide,
)

K = 21
B, L = 512 * 1024, 150
CAP = 4 * 1024 * 1024

rng = np.random.default_rng(0)
genome = rng.integers(0, 4, 1_000_000, dtype=np.uint8)
starts = rng.integers(0, genome.size - L + 1, B)
reads = genome[starts[:, None] + np.arange(L)[None, :]]
words = jnp.asarray(pack2bit_rows(reads))
codes = device_unpack_rows(words, L)
lengths = jnp.full((B,), L, jnp.int32)
jax.block_until_ready(codes)
print("data resident", flush=True)


def bench(name, fn, *args, iters=3):
    out = fn(*args); jax.block_until_ready(out)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f}ms", flush=True)
    return out


@jax.jit
def extract_jit(codes, lengths):
    wins, valid = extract_windows_batch(codes, lengths, K)
    hi, lo = canonicalize(wins.hi, wins.lo, K)
    return hi, lo, valid


hi, lo, valid = bench("extract+canonical", extract_jit, codes, lengths)
n_win = hi.size
print(f"windows: {n_win}", flush=True)

acc0 = WideCounts.empty(CAP)
acc0 = jax.tree_util.tree_map(jnp.asarray, acc0)
jax.block_until_ready(acc0.hi)

fold_jit = jax.jit(lambda a, h, l, v: fold_windows_into_wide(a, h, l, v, K))
acc1 = bench("fold_windows_into_wide (fused r3)", fold_jit, acc0, hi, lo, valid)
print(f"acc1 n_unique={int(acc1.n_unique)}", flush=True)
# second fold onto a warm accumulator (the steady-state shape)
acc2 = bench("fold again (warm acc)", fold_jit, acc1, hi, lo, valid)

cw_jit = jax.jit(lambda h, l, v: count_windows(h, l, v, K))
table = bench("count_windows (r2 step 1)", cw_jit, hi, lo, valid)
miw_jit = jax.jit(merge_into_wide)
bench("merge_into_wide (r2 step 2)", miw_jit, acc1, table)

# the full stream step as the sustained run drives it
from kmer_tpu.parallel.mesh import make_mesh
from kmer_tpu.parallel.streaming import make_sharded_stream_step, empty_sharded_acc

mesh = make_mesh((1, 1))
step = make_sharded_stream_step(mesh, K, canonical=True, acc_capacity=CAP)
acc = empty_sharded_acc(mesh, CAP)
ovf = jnp.zeros((), jnp.int32)
acc, ovf = step(acc, ovf, codes, lengths)
jax.block_until_ready(acc.counts_lo)
for it in range(3):
    t0 = time.perf_counter()
    acc, ovf = step(acc, ovf, codes, lengths)
    jax.block_until_ready(acc.counts_lo)
    print(f"full stream step iter{it}: {(time.perf_counter()-t0)*1e3:.1f}ms",
          flush=True)
print(f"overflow={int(ovf)} n_unique={int(acc.n_unique)}", flush=True)
print("probe_step done", flush=True)
