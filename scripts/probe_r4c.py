"""Round-4 probe C: what does pacing/checkpointing cost the stream loop?

probe_r4a measured 395ms/step for a free-running 16-step async loop;
the sustained runs keep landing at 0.58-0.63s/step.  Isolate which
ingredient pays: A free-run baseline over the full 151 steps, B the
non-blocking is_ready pacing, C per-8 block_until_ready draining, and
D pacing plus real background snapshot writes at the adaptive cadence.
All variants share one compiled step and the same device batches.
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
B, L = 512 * 1024, 150
CAP = 4 * 1024 * 1024
STEPS = 151

rng = np.random.default_rng(0)
genome = rng.integers(0, 4, 1_000_000, dtype=np.uint8)
batches = []
for i in range(8):
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
step = make_sharded_stream_step(mesh, K, canonical=True, acc_capacity=CAP)

# warm
acc0 = empty_sharded_acc(mesh, CAP)
a, o = step(acc0, jnp.zeros((), jnp.int32), batches[0], lengths)
jax.block_until_ready(a.counts_lo)
print("warm", flush=True)


def run(tag, pacing, snapshots=False):
    acc = empty_sharded_acc(mesh, CAP)
    ovf = jnp.zeros((), jnp.int32)
    snapper = _StreamSnapshotter(1, CAP)
    if snapshots:
        snap = snapper.snapshot(a)
        snapper.write(snap, "/tmp/probe_r4c.npz", {})  # warm snapshot ops
    inflight = deque()
    thread = None
    writes = 0
    last_ck = time.perf_counter()
    t0 = time.perf_counter()
    for i in range(STEPS):
        acc, ovf = step(acc, ovf, batches[i % 8], lengths)
        inflight.append(ovf)
        if pacing == "isready":
            while len(inflight) > 32:
                if inflight[0].is_ready():
                    inflight.popleft()
                else:
                    time.sleep(0.05)
        elif pacing == "block8":
            if len(inflight) >= 40:
                while len(inflight) > 24:
                    jax.block_until_ready(inflight.popleft())
        if snapshots and (i + 1) % 16 == 0:
            gap = (snapper.last_cost_s or 0.5) * 9
            if time.perf_counter() - last_ck >= gap:
                last_ck = time.perf_counter()
                if thread is not None:
                    thread.join()
                snap = snapper.snapshot(acc)
                thread = threading.Thread(
                    target=snapper.write,
                    args=(snap, "/tmp/probe_r4c.npz", {}), daemon=True)
                thread.start()
                writes += 1
    if thread is not None:
        thread.join()
    jax.block_until_ready(acc.counts_lo)
    dt = time.perf_counter() - t0
    print(f"{tag}: {dt:.1f}s total -> {dt/STEPS*1e3:.0f}ms/step "
          f"({STEPS*B*(L-K+1)/dt/1e6:.0f}M kmers/s) writes={writes} "
          f"n_unique={int(acc.n_unique)}", flush=True)


run("A free-run", pacing=None)
run("B is_ready-32", pacing="isready")
run("C block-per-8", pacing="block8")
run("D is_ready + snapshots", pacing="isready", snapshots=True)
print("probe_r4c done", flush=True)
