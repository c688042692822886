"""Round-4 probe A: blocked-compact fold vs the r3 full-sort compact.

The r3 streaming step paid 350ms of its 668ms re-sorting the whole
66.6M-row batch table just to move ~1M live heads to the front
(PERF.md §6).  ops/wide._narrow_to_cap now routes high-duplication
batches through a per-32-row-block sort + keep-8 candidate extraction
(falls back in-graph when any block holds >8 live heads).  This probe
measures both engines at the exact sustained-run shape (512k x 150bp
reads off a 1 Mbp genome, k=21 canonical, 4M-slot accumulator) and
checks the accumulators agree exactly.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)

import kmer_tpu.ops.wide as wide
from kmer_tpu.native import device_unpack_rows, pack2bit_rows
from kmer_tpu.parallel.mesh import make_mesh
from kmer_tpu.parallel.streaming import empty_sharded_acc, make_sharded_stream_step

K = 21
B, L = 512 * 1024, 150
CAP = 4 * 1024 * 1024

rng = np.random.default_rng(0)
genome = rng.integers(0, 4, 1_000_000, dtype=np.uint8)
batches = []
for i in range(4):
    starts = rng.integers(0, genome.size - L + 1, B)
    reads = genome[starts[:, None] + np.arange(L)[None, :]]
    flip = rng.random(B) < 0.5
    reads[flip] = 3 - reads[flip, ::-1]
    codes = device_unpack_rows(jnp.asarray(pack2bit_rows(reads)), L)
    codes.block_until_ready()
    batches.append(codes)
lengths = jnp.full((B,), L, jnp.int32)
print("data resident", flush=True)

mesh = make_mesh((1, 1))


def run(tag, min_n):
    saved = wide._COMPACT_MIN_N
    wide._COMPACT_MIN_N = min_n
    try:
        step = make_sharded_stream_step(mesh, K, canonical=True,
                                        acc_capacity=CAP)
        acc = empty_sharded_acc(mesh, CAP)
        ovf = jnp.zeros((), jnp.int32)
        acc, ovf = step(acc, ovf, batches[0], lengths)  # compile + warm
        jax.block_until_ready(acc.counts_lo)
        for it in range(3):
            t0 = time.perf_counter()
            acc, ovf = step(acc, ovf, batches[(it + 1) % 4], lengths)
            jax.block_until_ready(acc.counts_lo)
            print(f"{tag} isolated step: "
                  f"{(time.perf_counter() - t0) * 1e3:.1f}ms", flush=True)
        for trial in range(2):
            t0 = time.perf_counter()
            for i in range(16):
                acc, ovf = step(acc, ovf, batches[i % 4], lengths)
            jax.block_until_ready(acc.counts_lo)
            dt = time.perf_counter() - t0
            print(f"{tag} async 16-step loop: {dt * 1e3:.0f}ms -> "
                  f"{dt / 16 * 1e3:.1f}ms/step", flush=True)
        # consume everything: n_unique + weighted checksums
        t = acc
        c64 = (np.asarray(t.counts_hi, np.int64) << 32) + np.asarray(
            t.counts_lo, np.int64)
        live = c64 > 0
        chk1 = int(
            ((np.asarray(t.hi, np.int64)[live] * c64[live]) % (1 << 61)).sum()
            % (1 << 61)
        )
        chk2 = int(c64.sum())
        print(f"{tag}: n_unique={int(t.n_unique)} ovf={int(ovf)} "
              f"total={chk2} chk={chk1 % (1 << 31)}", flush=True)
        return int(t.n_unique), chk2, chk1 % (1 << 31)
    finally:
        wide._COMPACT_MIN_N = saved


new = run("NEW blocked", 1 << 22)
old = run("OLD fullsort", 1 << 62)
assert new == old, (new, old)
print("engines agree exactly; probe_r4a done", flush=True)
