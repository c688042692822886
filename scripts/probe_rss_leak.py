"""Which part of the per-batch count loop leaks host RSS on the tunnel?

Variants, 24 synthetic batches each, RSS printed every 4:
  A upload only (device_put packed words, discard)
  B upload + count jit
  C upload + count + accumulator merge (the full loop)
  D B but re-using ONE preallocated host buffer for the packed words
"""
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)

from kmer_tpu.native import device_unpack_rows, pack2bit_rows
from kmer_tpu.ops.count import count_kmers
from kmer_tpu.ops.wide import WideAccumulator

B, L = 262144, 150
K = 21


def rss_gb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6
    return -1


rng = np.random.default_rng(0)
genome = rng.integers(0, 4, 5_000_000, dtype=np.uint8)
lengths = jnp.full((B,), L, jnp.int32)

step = jax.jit(
    lambda w, l: count_kmers(device_unpack_rows(w, L), l, K, True)
)


def batch_words(out=None):
    starts = rng.integers(0, genome.size - L + 1, B)
    reads = genome[starts[:, None] + np.arange(L)[None, :]]
    w = pack2bit_rows(reads)
    if out is not None:
        out[:] = w
        return out
    return w


def run(tag, mode):
    gc.collect()
    base = rss_gb()
    acc = WideAccumulator(1 << 24) if mode == "C" else None
    buf = np.zeros((B, (L + 15) // 16), np.uint32) if mode == "D" else None
    last = None
    for i in range(24):
        w = batch_words(buf)
        dev = jnp.asarray(w)
        if mode == "A":
            dev.block_until_ready()
            last = dev
        else:
            t = step(dev, lengths)
            if mode == "C":
                acc.add(t)
                jax.block_until_ready(acc._acc.counts_lo)
            else:
                t.counts.block_until_ready()
            last = t
        if (i + 1) % 4 == 0:
            gc.collect()
            print(f"{tag} batch {i+1}: rss {rss_gb():.2f} GB "
                  f"(+{rss_gb()-base:.2f})", flush=True)
    del last, acc
    gc.collect()
    print(f"{tag} end: rss {rss_gb():.2f} GB", flush=True)


run("A upload-only", "A")
run("B upload+count", "B")
run("D reused-buffer", "D")
run("C full loop", "C")
print("probe_rss_leak done", flush=True)
