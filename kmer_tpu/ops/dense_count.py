"""Dense MXU-histogram counting for small k (4^k bins fit in memory).

For k <= DENSE_MAX_K the whole key space is small enough to count into a
dense [4^k] table — and on TPU the fastest exact histogram is a *matmul*:
split the 2k-bit key into high/low halves, one-hot encode each half per
block of windows, and accumulate ``onehot_hi^T @ onehot_lo`` on the MXU
(f32 accumulation of 0/1 products is exact below 2^24 per bin).  This
replaces the sort entirely: counting becomes systolic-array FLOPs at
hundreds of GMAC/s instead of a comparison sort.

This is the engine's fast path for the reference's own configs[0]
workload (generate_kmers k=8 + GROUP BY): 4^8 = 65,536 bins, split
256 x 256.

Cost scales n * (2^hb + 2^lb) one-hot lanes per window, so the MXU wins
only while the one-hot halves stay narrow.  Measured on v5e at 18.7M
windows: k=4 dense 29 ms vs sort 54 ms; k=8 dense 122 ms vs sort 52 ms;
k=10 dense 246 ms vs sort 53 ms — crossover near k=6.  DENSE_ROUTE_K
is the automatic-routing threshold (KmerCounter); DENSE_MAX_K caps the
path's validity (f32-exactness + memory), usable explicitly beyond the
routing point.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .count import CountTable
from .extract import canonicalize, extract_windows_batch

DENSE_MAX_K = 10
DENSE_ROUTE_K = 6  # auto-routing threshold: dense beats sort up to here
_BLOCK = 1 << 16  # windows per one-hot block

# f32 accumulation of 0/1 products is exact strictly below 2^24 per bin;
# at exactly 2^24 the next +1 is rounded away (silent saturation), so an
# observed count of 2^24 is ambiguous and must be rejected.
DENSE_EXACT_LIMIT = 1 << 24


def check_dense_exact(table: CountTable) -> CountTable:
    """Raise if any bin may have saturated f32 accumulation (host-side).

    Saturation is detectable post-hoc: +1 accumulation cannot pass
    2^24, so a saturated bin reads exactly DENSE_EXACT_LIMIT.
    """
    if int(np.max(np.asarray(table.counts), initial=0)) >= DENSE_EXACT_LIMIT:
        raise ValueError(
            "dense histogram bin reached 2^24: f32 accumulation saturates "
            "beyond this — recount via the sort path (count_kmers)"
        )
    return table


def _split_bits(k: int) -> tuple[int, int]:
    """Split 2k key bits into (hi_bits, lo_bits) halves, each <= 10 bits."""
    total = 2 * k
    lo = total // 2
    return total - lo, lo


def dense_histogram(values, valid, k: int):
    """Exact [4^k] histogram of 2k-bit values via blocked one-hot matmuls.

    values: [n] uint32 right-aligned keys (< 4^k); valid: [n] bool.
    Returns float32 [4^k] counts (exact integers below 2^24).
    """
    hb, lb = _split_bits(k)
    H, L = 1 << hb, 1 << lb
    n = values.shape[0]
    nblocks = -(-n // _BLOCK)
    pad = nblocks * _BLOCK - n
    values = jnp.pad(values.astype(jnp.uint32), (0, pad))
    valid = jnp.pad(jnp.asarray(valid, bool), (0, pad))
    vb = values.reshape(nblocks, _BLOCK)
    mb = valid.reshape(nblocks, _BLOCK)

    iota_h = jnp.arange(H, dtype=jnp.uint32)
    iota_l = jnp.arange(L, dtype=jnp.uint32)

    def body(acc, args):
        v, m = args
        vhi = (v >> jnp.uint32(lb)).astype(jnp.uint32)
        vlo = (v & jnp.uint32(L - 1)).astype(jnp.uint32)
        # one-hot halves; validity folded into the hi half
        oh = ((vhi[:, None] == iota_h[None, :]) & m[:, None]).astype(jnp.bfloat16)
        ol = (vlo[:, None] == iota_l[None, :]).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            oh, ol,
            dimension_numbers=(((0,), (0,)), ((), ())),  # [H,B]x[B,L] -> [H,L]
            preferred_element_type=jnp.float32,
        )
        return acc, None

    acc0 = jnp.zeros((H, L), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (vb, mb))
    return acc.reshape(-1)


def right_aligned_keys(hi, lo, k: int):
    """Left-aligned (hi, lo) lanes -> right-aligned 2k-bit uint32 (k <= 16)."""
    assert k <= 16
    del lo  # bases 0..15 live entirely in the hi lane
    return jnp.asarray(hi, jnp.uint32) >> jnp.uint32(32 - 2 * k)


def dense_to_table(dense, k: int) -> CountTable:
    """Dense [4^k] counts -> CountTable (keys = left-aligned bin ids)."""
    nbins = dense.shape[0]
    counts = jnp.round(dense).astype(jnp.int32)
    bins = jnp.arange(nbins, dtype=jnp.uint32)
    hi = bins << jnp.uint32(32 - 2 * k)
    lo = jnp.zeros_like(hi)
    length = jnp.full((nbins,), k, jnp.int32)
    n_unique = jnp.sum((counts > 0).astype(jnp.int32))
    return CountTable(hi=hi, lo=lo, length=length, counts=counts, n_unique=n_unique)


@functools.partial(jax.jit, static_argnames=("k", "canonical"))
def count_kmers_dense(reads_codes, lengths, k: int, canonical: bool = False) -> CountTable:
    """Fixed-k counting through the MXU histogram (k <= DENSE_MAX_K)."""
    if not (0 < k <= DENSE_MAX_K):
        raise ValueError(f"dense path requires k <= {DENSE_MAX_K}")
    wins, valid = extract_windows_batch(reads_codes, lengths, k)
    hi, lo = wins.hi, wins.lo
    if canonical:
        hi, lo = canonicalize(hi, lo, k)
    v = right_aligned_keys(hi, lo, k)
    dense = dense_histogram(v.ravel(), valid.ravel(), k)
    return dense_to_table(dense, k)
