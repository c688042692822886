"""TPU probe: honest isolated phase costs (max-reduce both lanes) +
gather/compaction primitive rates (collision-patch feasibility record)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp

print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)

def bench(name, fn, *args, iters=3):
    try:
        out = fn(*args); np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
        best = 1e9
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best*1e3:.1f}ms", flush=True)
        return best
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: "
              + str(e).replace(chr(10), ' | ')[:150], flush=True)
        return None

from kmer_tpu.native import pack2bit_rows, device_unpack_rows
from kmer_tpu.ops.extract import canonicalize, extract_windows_batch, simulate_reads
import kmer_tpu.ops.count as cm

read_len, k = 150, 21
n_reads = 1 << 20
words = jnp.asarray(pack2bit_rows(simulate_reads(n_reads, read_len, seed=0)))
lengths = jnp.full((n_reads,), read_len, jnp.int32)

@jax.jit
def extract_all(w):
    codes = device_unpack_rows(w, read_len)
    wins, _ = extract_windows_batch(codes, lengths, k)
    h, l = canonicalize(wins.hi, wins.lo, k)
    return h.ravel(), (l.ravel() >> jnp.uint32(16)).astype(jnp.uint16)

hi, lo16 = extract_all(words)
np.asarray(hi[-1:]); np.asarray(lo16[-1:])
n = hi.shape[0]

def use2(a, b):
    return jnp.maximum(jnp.max(a), jnp.max(b).astype(jnp.uint32))

bench("P_extract", jax.jit(lambda w: use2(*extract_all(w))), words)
bench("P_sort2", jax.jit(
    lambda a, b: use2(*jax.lax.sort((a, b), num_keys=2, is_stable=False))), hi, lo16)
bench("P_sort1pay", jax.jit(
    lambda a, b: use2(*jax.lax.sort((a, b), num_keys=1, is_stable=False))), hi, lo16)
bench("P_groupsort4", jax.jit(lambda a, b: use2(*cm.group_sort_pairs(a, b))), hi, lo16)
bench("P_sort1_nopay", jax.jit(
    lambda a: jnp.max(jax.lax.sort((a,), num_keys=1, is_stable=False)[0])), hi)

from kmer_tpu.pallas.segment_counts import segment_counts_sorted
shi, slo16 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2, is_stable=False))(hi, lo16)
np.asarray(shi[-1:])
bench("P_segcounts_pallas", jax.jit(
    lambda a, b: segment_counts_sorted(a, b.astype(jnp.uint32) << jnp.uint32(16), sentinel=None)[1]),
    shi, slo16)

# gather/compaction primitive rates
m = n // 16
small = jax.random.bits(jax.random.PRNGKey(10), (m,), jnp.uint32).astype(jnp.uint16)
ridx = (jax.random.bits(jax.random.PRNGKey(9), (n,), jnp.uint32) % jnp.uint32(m)).astype(jnp.int32)
np.asarray(small[-1:]); np.asarray(ridx[-1:])
bench("G_gather_136M_from_8.5M", jax.jit(lambda t, i: jnp.max(t[i])), small, ridx)
mask = lo16 < jnp.uint16(2048)
np.asarray(mask[-1:])
bench("G_cumsum_136M", jax.jit(lambda x: jnp.cumsum(x.astype(jnp.int32))[-1]), mask)
bench("G_nonzero_sized", jax.jit(lambda x: jnp.nonzero(x, size=m, fill_value=n)[0][-1]), mask)

print("done", flush=True)
