"""Round-4 probe B: where does a checkpoint's 8s actually go?

Decomposes one save_wide of a realistic 4M-slot / 1M-live sharded
accumulator on the chip: device-side live count, per-lane slab slicing
+ device_get, np compaction, and the npz write (compressed vs not),
plus the same call a second time (eager-op compile caches warm).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)

from kmer_tpu.ops.count import SENTINEL, SENTINEL_LEN
from kmer_tpu.ops.wide import WideCounts
from kmer_tpu.utils.checkpoint import atomic_savez

CAP = 4 * 1024 * 1024
LIVE = 999_980

rng = np.random.default_rng(0)
hi = np.full(CAP, SENTINEL, np.uint32)
lo = np.full(CAP, SENTINEL, np.uint32)
ln = np.full(CAP, SENTINEL_LEN, np.int32)
ch = np.zeros(CAP, np.int32)
cl = np.zeros(CAP, np.uint32)
hi[:LIVE] = np.sort(rng.integers(0, 1 << 32, LIVE).astype(np.uint32))
lo[:LIVE] = rng.integers(0, 1 << 32, LIVE).astype(np.uint32)
ln[:LIVE] = 21
cl[:LIVE] = rng.integers(1, 100_000, LIVE).astype(np.uint32)
acc = WideCounts(
    hi=jnp.asarray(hi), lo=jnp.asarray(lo), length=jnp.asarray(ln),
    counts_hi=jnp.asarray(ch), counts_lo=jnp.asarray(cl),
    n_unique=jnp.asarray(LIVE, jnp.int32),
)
jax.block_until_ready(acc.counts_lo)
print("acc resident", flush=True)


def t(label, fn, n=2):
    for i in range(n):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"{label} [{i}]: {dt*1e3:.0f}ms", flush=True)
    return out


# 1. live counts on device
def live_counts():
    live2 = ((acc.counts_hi > 0) | (acc.counts_lo > 0)).reshape(1, CAP)
    return np.asarray(jax.device_get(jnp.sum(live2, axis=1, dtype=jnp.int32)))

lps = t("live counts", live_counts)
mx = int(lps.max())
print(f"mx={mx}", flush=True)

# 2. slab slicing + device_get, per lane and total
def slab(x, dt_):
    return np.asarray(jax.device_get(jnp.reshape(x, (1, CAP))[:, :mx]), dt_)

out = {}
def all_slabs():
    out["hi"] = slab(acc.hi, np.uint32)
    out["lo"] = slab(acc.lo, np.uint32)
    out["ln"] = slab(acc.length, np.int32)
    out["ch"] = slab(acc.counts_hi, np.int32)
    out["cl"] = slab(acc.counts_lo, np.uint32)
    return out

t("5 slabs device_get", all_slabs)

keep = np.arange(mx)[None, :] < lps[:, None]
arrs = {k: v[keep] for k, v in out.items()}

# 3. npz write: compressed vs plain
def write_compressed():
    atomic_savez("/tmp/probe_r4b_c.npz", **arrs,
                 live_per_shard=lps.astype(np.int64), meta="{}")

def write_plain():
    import tempfile
    fd, tmp = tempfile.mkstemp(dir="/tmp", suffix=".npz.tmp")
    with os.fdopen(fd, "wb") as f:
        np.savez(f, **arrs, live_per_shard=lps.astype(np.int64), meta="{}")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, "/tmp/probe_r4b_p.npz")

t("savez_compressed", write_compressed)
t("savez plain", write_plain)
print(f"sizes: compressed={os.path.getsize('/tmp/probe_r4b_c.npz')/1e6:.1f}MB "
      f"plain={os.path.getsize('/tmp/probe_r4b_p.npz')/1e6:.1f}MB", flush=True)

# 4. whole save_wide for reference
from kmer_tpu.parallel.streaming import save_wide

t("save_wide total", lambda: save_wide(acc, "/tmp/probe_r4b_s.npz",
                                       {"mesh_shape": [1, 1]}))
print("probe_r4b done", flush=True)
