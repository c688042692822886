"""TPU probe: where does the count pipeline's time go, and how does
lax.sort scale with chunking?  Decides the round-2 engine design."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)

N = 1 << 27  # ~the bench's 136M windows

def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[..., -1:])

def bench(fn, *args, iters=2):
    out = fn(*args); sync(out)  # compile
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter(); out = fn(*args); sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out

key = jax.random.PRNGKey(0)
hi = jax.random.bits(key, (N,), jnp.uint32)
lo16 = jax.random.bits(jax.random.PRNGKey(1), (N,), jnp.uint16)
sync(hi); sync(lo16)

# 1. global 2-op sort (the current bench path shape for k=21)
f = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2, is_stable=False))
t, _ = bench(f, hi, lo16)
print(f"sort2_global n=2^27: {t:.3f}s  {N/t/1e6:.0f}M elt/s", flush=True)

# 2. global 1-op sort
f1 = jax.jit(lambda a: jax.lax.sort((a,), num_keys=1, is_stable=False)[0])
t, _ = bench(f1, hi)
print(f"sort1_global n=2^27: {t:.3f}s  {N/t/1e6:.0f}M elt/s", flush=True)

# 3. batched row sorts, 2-op
for logm in (16, 18, 20, 22, 24):
    m = 1 << logm; C = N // m
    fr = jax.jit(lambda a, b: jax.lax.sort(
        (a.reshape(C, m), b.reshape(C, m)), dimension=1, num_keys=2,
        is_stable=False))
    t, _ = bench(fr, hi, lo16)
    print(f"sort2_rows m=2^{logm} C={C}: {t:.3f}s  {N/t/1e6:.0f}M elt/s",
          flush=True)

# 4. segment-count kernel on sorted data
sh, sl = f(hi, lo16)
sl32 = (sl.astype(jnp.uint32) << jnp.uint32(16))
sync(sh)
from kmer_tpu.pallas.segment_counts import segment_counts_sorted
fs = jax.jit(lambda a, b: segment_counts_sorted(a, b))
t, _ = bench(fs, sh, sl32)
print(f"segment_counts n=2^27: {t:.3f}s", flush=True)

# 5. extraction+canonicalize (the bench's extract_place, all chunks)
from kmer_tpu.native import device_unpack_rows, pack2bit_rows
from kmer_tpu.ops.extract import canonicalize, extract_windows_batch, simulate_reads
read_len, k = 150, 21
n_reads = 1 << 20
chunk = 1 << 17
wpr = read_len - k + 1
words = jnp.asarray(pack2bit_rows(simulate_reads(chunk, read_len, seed=0)))
lengths = jnp.full((chunk,), read_len, jnp.int32)
total = n_reads * wpr

def extract_place(bh, bl, w, start):
    codes = device_unpack_rows(w, read_len)
    wins, _ = extract_windows_batch(codes, lengths, k)
    h, l = canonicalize(wins.hi, wins.lo, k)
    return (jax.lax.dynamic_update_slice(bh, h.ravel(), (start,)),
            jax.lax.dynamic_update_slice(bl, l.ravel(), (start,)))
ep = jax.jit(extract_place, donate_argnums=(0, 1))

def all_extract():
    bh = jnp.zeros((total,), jnp.uint32)
    bl = jnp.zeros((total,), jnp.uint32)
    for i in range(n_reads // chunk):
        bh, bl = ep(bh, bl, words, i * chunk * wpr)
    return bh
t, _ = bench(all_extract)
print(f"extract+canon+place 136M windows: {t:.3f}s", flush=True)

print("done", flush=True)
