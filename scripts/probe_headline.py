"""TPU head-to-head: honest end-to-end headline (n_unique sync — nothing
DCE-able) for group-sort iters4 vs plain 2-key sort, plus honest phase
costs via max-reduction consumption of both lanes."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp

print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)

def bench(name, fn, *args, iters=3):
    out = fn(*args)
    out = int(out) if hasattr(out, "item") else out
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        r = int(r) if hasattr(r, "item") else r
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f}ms (out={out})", flush=True)
    return best

from kmer_tpu.native import pack2bit_rows, device_unpack_rows
from kmer_tpu.ops.extract import canonicalize, extract_windows_batch, simulate_reads

read_len, k = 150, 21
n_reads = 1 << 20
total = n_reads * (read_len - k + 1)
words = jnp.asarray(pack2bit_rows(simulate_reads(n_reads, read_len, seed=0)))
lengths = jnp.full((n_reads,), read_len, jnp.int32)
np.asarray(words[-1:, -1:])

def make_count_all():
    from kmer_tpu.ops.count import count_windows

    def count_all(w):
        codes = device_unpack_rows(w, read_len)
        wins, _ = extract_windows_batch(codes, lengths, k)
        h, l = canonicalize(wins.hi, wins.lo, k)
        return count_windows(h.ravel(), l.ravel(), None, k).n_unique
    return jax.jit(count_all)

import kmer_tpu.ops.count as cm

# A: plain 2-key sort engine
os.environ["KMER_TPU_NO_GROUPSORT"] = "1"
tA = bench("A_headline_sort2", make_count_all(), words)
del os.environ["KMER_TPU_NO_GROUPSORT"]

# B: group sort, iters4
tB = bench("B_headline_groupsort4", make_count_all(), words)

# C: group sort, iters2 (runs <= 4; riskier but cheaper)
cm._FIXUP_ITERS = 2
tC = bench("C_headline_groupsort2", make_count_all(), words)
cm._FIXUP_ITERS = 4

for nm, t in [("A", tA), ("B", tB), ("C", tC)]:
    print(f"{nm}: {total/t/1e6:.0f}M kmers/s", flush=True)

# honest isolated phases (max-reduce both lanes)
@jax.jit
def extract_all(w):
    codes = device_unpack_rows(w, read_len)
    wins, _ = extract_windows_batch(codes, lengths, k)
    h, l = canonicalize(wins.hi, wins.lo, k)
    return h.ravel(), (l.ravel() >> jnp.uint32(16)).astype(jnp.uint16)

hi, lo16 = extract_all(words)
np.asarray(hi[-1:]); np.asarray(lo16[-1:])

def use2(a, b):
    return jnp.maximum(jnp.max(a), jnp.max(b).astype(jnp.uint32))

bench("P_sort2_honest", jax.jit(
    lambda a, b: use2(*jax.lax.sort((a, b), num_keys=2, is_stable=False))), hi, lo16)
bench("P_sort1pay_honest", jax.jit(
    lambda a, b: use2(*jax.lax.sort((a, b), num_keys=1, is_stable=False))), hi, lo16)
bench("P_groupsort4_honest", jax.jit(
    lambda a, b: use2(*cm.group_sort_pairs(a, b))), hi, lo16)
bench("P_sort1_nopay", jax.jit(
    lambda a: jnp.max(jax.lax.sort((a,), num_keys=1, is_stable=False)[0])), hi)

print("done", flush=True)
