"""Round-4 probe D2: does doubling the stream batch (512k -> 1M reads)
lift the sustained rate?  Per-window fold cost is ~linear but the merge
(67ms) and dispatch are per-step; pencil ~195M/s at 1M reads.
Runs the full system shape: pacing + snapshot writes at cadence.
"""
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from collections import deque

import numpy as np
import jax
import jax.numpy as jnp

print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)

from kmer_tpu.native import device_unpack_rows, pack2bit_rows
from kmer_tpu.parallel.mesh import make_mesh
from kmer_tpu.parallel.streaming import (
    _StreamSnapshotter, empty_sharded_acc, make_sharded_stream_step,
)

K = 21
L = 150
CAP = 4 * 1024 * 1024

rng = np.random.default_rng(0)
genome = rng.integers(0, 4, 1_000_000, dtype=np.uint8)
mesh = make_mesh((1, 1))


def make_batches(B, n):
    out = []
    for i in range(n):
        starts = rng.integers(0, genome.size - L + 1, B)
        reads = genome[starts[:, None] + np.arange(L)[None, :]]
        flip = rng.random(B) < 0.5
        reads[flip] = 3 - reads[flip, ::-1]
        codes = device_unpack_rows(jnp.asarray(pack2bit_rows(reads)), L)
        codes.block_until_ready()
        out.append(codes)
    return out


def run(B, steps):
    batches = make_batches(B, 4)
    lengths = jnp.full((B,), L, jnp.int32)
    step = make_sharded_stream_step(mesh, K, canonical=True, acc_capacity=CAP)
    acc = empty_sharded_acc(mesh, CAP)
    ovf = jnp.zeros((), jnp.int32)
    acc, ovf = step(acc, ovf, batches[0], lengths)      # warm 1
    acc, ovf = step(acc, ovf, batches[1], lengths)      # warm 2 (committed)
    jax.block_until_ready(acc.counts_lo)
    snapper = _StreamSnapshotter(1, CAP)
    snapper.write(snapper.snapshot(acc), "/tmp/probe_r4d.npz", {})
    acc = empty_sharded_acc(mesh, CAP)
    ovf = jnp.zeros((), jnp.int32)
    inflight = deque()
    thread = None
    last_ck = time.perf_counter()
    writes = 0
    t0 = time.perf_counter()
    for i in range(steps):
        acc, ovf = step(acc, ovf, batches[i % 4], lengths)
        inflight.append(ovf)
        while len(inflight) > 16:
            if inflight[0].is_ready():
                inflight.popleft()
            else:
                time.sleep(0.05)
        if (i + 1) % 8 == 0:
            gap = (snapper.last_cost_s or 0.5) * 9
            if time.perf_counter() - last_ck >= gap:
                last_ck = time.perf_counter()
                if thread is not None:
                    thread.join()
                snap = snapper.snapshot(acc)
                thread = threading.Thread(
                    target=snapper.write,
                    args=(snap, "/tmp/probe_r4d.npz", {}), daemon=True)
                thread.start()
                writes += 1
    if thread is not None:
        thread.join()
    jax.block_until_ready(acc.counts_lo)
    dt = time.perf_counter() - t0
    wins = steps * B * (L - K + 1)
    print(f"B={B}: {dt:.1f}s, {dt/steps*1e3:.0f}ms/step, "
          f"{wins/dt/1e6:.0f}M kmers/s, writes={writes}, "
          f"n_unique={int(acc.n_unique)}", flush=True)


run(512 * 1024, 24)
run(1024 * 1024, 16)
run(2 * 1024 * 1024, 10)
print("probe_r4d done", flush=True)
