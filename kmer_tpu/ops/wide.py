"""64-bit-exact count accumulation in two 32-bit lanes.

Per-batch counts are int32-safe by construction (a segment's count is
bounded by the batch's array size < 2^31), but a long-running
accumulator — pod-scale streaming (BASELINE configs[3]), or one skewed
poly-A genome — overflows int32 within minutes at north-star rates.
JAX's int64 needs global x64 mode (which drags f64 onto TPU, where it
is unsupported), so the TPU-native fix is explicit pair arithmetic:
a count is ``hi * 2**32 + lo`` with ``hi: int32`` / ``lo: uint32`` lanes
and carry/borrow handled in uint32 compares.  All ops are jit-safe and
exact up to 2^63 totals.

Replaces the int32-only merge path flagged in round 1
(ops/count.py:110 weighted cumsum): ``count_packed_wide`` /
``merge_into_wide`` are the accumulator-side equivalents of
``count_packed`` / ``merge_tables``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..packed import PackedKmers
from .count import SENTINEL, SENTINEL_LEN, CountTable, _boundaries


def _pair_add(ah, al, bh, bl):
    """(ah,al) + (bh,bl) with carry; lo lanes uint32, hi lanes int32."""
    lo = al + bl
    carry = (lo < al).astype(jnp.int32)
    return ah + bh + carry, lo


def _pair_sub(ah, al, bh, bl):
    """(ah,al) - (bh,bl) with borrow (callers guarantee a >= b)."""
    lo = al - bl
    borrow = (al < bl).astype(jnp.int32)
    return ah - bh - borrow, lo


def _pair_cumsum(wh, wl):
    """Inclusive 64-bit cumsum via log-step shifted pair adds.

    O(n log n) adds — acceptable on the (cold) merge path; the hot
    unit-weight path never needs it.
    """
    n = wl.shape[0]
    s = 1
    while s < n:
        sh = jnp.concatenate([jnp.zeros((s,), wh.dtype), wh[:-s]])
        sl = jnp.concatenate([jnp.zeros((s,), wl.dtype), wl[:-s]])
        wh, wl = _pair_add(wh, wl, sh, sl)
        s *= 2
    return wh, wl


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WideCounts:
    """Compacted (keys, 64-bit counts) table, ascending key order.

    Unlike CountTable's sorted-run layout, slots here are deduplicated:
    slot i is live iff i < n_unique; dead slots hold sentinel keys and
    zero counts.  ``capacity`` is the fixed slot count (static shape).
    """

    hi: jax.Array
    lo: jax.Array
    length: jax.Array
    counts_hi: jax.Array  # int32 lane: count // 2**32
    counts_lo: jax.Array  # uint32 lane: count % 2**32
    n_unique: jax.Array

    @property
    def capacity(self) -> int:
        return int(self.hi.shape[-1])

    def counts64(self) -> np.ndarray:
        """Host-side exact counts (numpy int64), one per slot."""
        return (
            np.asarray(self.counts_hi, np.int64) << np.int64(32)
        ) + np.asarray(self.counts_lo, np.int64)

    def trim(self) -> "WideCounts":
        """Host-side: compact to live slots.

        Selects by ``counts > 0`` rather than ``[:n_unique]``: a
        *sharded* accumulator gathered to host has live slots at the
        front of each shard, not globally, and its n_unique is the
        global psum.
        """
        ch = np.asarray(self.counts_hi)
        cl = np.asarray(self.counts_lo)
        live = (ch > 0) | (cl > 0)
        return WideCounts(
            hi=np.asarray(self.hi)[live],
            lo=np.asarray(self.lo)[live],
            length=np.asarray(self.length)[live],
            counts_hi=ch[live],
            counts_lo=cl[live],
            n_unique=np.int64(live.sum()),
        )

    def to_dict(self) -> dict[str, int]:
        t = self.trim()
        strs = PackedKmers(hi=t.hi, lo=t.lo, length=t.length).to_strings()
        return {s: int(c) for s, c in zip(strs, t.counts64())}

    def total(self) -> int:
        return int(self.trim().counts64().sum())

    def distinct(self) -> int:
        return int(self.n_unique)

    @staticmethod
    def empty(capacity: int) -> "WideCounts":
        return WideCounts(
            hi=jnp.full((capacity,), SENTINEL, jnp.uint32),
            lo=jnp.full((capacity,), SENTINEL, jnp.uint32),
            length=jnp.full((capacity,), SENTINEL_LEN, jnp.int32),
            counts_hi=jnp.zeros((capacity,), jnp.int32),
            counts_lo=jnp.zeros((capacity,), jnp.uint32),
            n_unique=jnp.zeros((), jnp.int32),
        )


def count_packed_wide(hi, lo, length, w_hi, w_lo, capacity: int) -> WideCounts:
    """64-bit weighted GROUP BY, output compacted to ``capacity`` slots.

    Slots with zero weight are absent.  If the number of distinct keys
    exceeds capacity the surplus (largest) keys are dropped — callers
    detect this via ``n_unique > capacity`` (kept exact in n_unique).
    """
    hi = jnp.asarray(hi, jnp.uint32).ravel()
    lo = jnp.asarray(lo, jnp.uint32).ravel()
    length = jnp.asarray(length, jnp.int32).ravel()
    w_hi = jnp.asarray(w_hi, jnp.int32).ravel()
    w_lo = jnp.asarray(w_lo, jnp.uint32).ravel()
    n = hi.shape[0]

    live = (w_hi > 0) | (w_lo > 0)
    hi = jnp.where(live, hi, jnp.uint32(SENTINEL))
    lo = jnp.where(live, lo, jnp.uint32(SENTINEL))
    length = jnp.where(live, length, jnp.int32(SENTINEL_LEN))

    shi, slo, sln, swh, swl = jax.lax.sort(
        (hi, lo, length, w_hi, w_lo), num_keys=3, is_stable=False
    )
    new = _boundaries(shi, slo, sln)
    # segment totals at heads: csum[end] - csum[i] + w[i], all pair math
    pos = jnp.arange(n, dtype=jnp.int32)
    b = jnp.where(new, pos, n)
    sufmin = jax.lax.cummin(b, reverse=True)
    nxt = jnp.concatenate([sufmin[1:], jnp.full((1,), n, jnp.int32)])
    ch, cl = _pair_cumsum(swh, swl)
    end = jnp.clip(nxt - 1, 0, n - 1)
    dh, dl = _pair_sub(ch[end], cl[end], ch, cl)
    th, tl = _pair_add(dh, dl, swh, swl)

    slive = sln != jnp.int32(SENTINEL_LEN)
    head = new & slive
    th = jnp.where(head, th, 0)
    tl = jnp.where(head, tl, jnp.uint32(0))
    n_unique = jnp.sum(head.astype(jnp.int32))

    # compact: non-head / dead slots fold to sentinel keys, one more sort
    # moves the deduplicated groups to the front in key order
    khi = jnp.where(head, shi, jnp.uint32(SENTINEL))
    klo = jnp.where(head, slo, jnp.uint32(SENTINEL))
    kln = jnp.where(head, sln, jnp.int32(SENTINEL_LEN))
    # tag lane breaks ties between a real all-sentinel-bit key and dead
    # slots so live groups always sort first
    tag = jnp.where(head, jnp.int32(0), jnp.int32(1))
    _, khi, klo, kln, th, tl = jax.lax.sort(
        (tag, khi, klo, kln, th, tl), num_keys=4, is_stable=False
    )

    def fit(x, fill):
        if x.shape[0] >= capacity:
            return x[:capacity]
        return jnp.concatenate([x, jnp.full((capacity - x.shape[0],), fill, x.dtype)])

    return WideCounts(
        hi=fit(khi, SENTINEL),
        lo=fit(klo, SENTINEL),
        length=fit(kln, SENTINEL_LEN),
        counts_hi=fit(th, 0),
        counts_lo=fit(tl, 0),
        n_unique=n_unique,
    )


def wide_from_table(table: CountTable, capacity: int | None = None) -> WideCounts:
    """Lift a CountTable (int32 sorted-run) into compacted wide form."""
    cap = table.hi.shape[-1] if capacity is None else capacity
    return count_packed_wide(
        table.hi,
        table.lo,
        table.length,
        jnp.zeros_like(jnp.asarray(table.counts, jnp.int32)),
        jnp.asarray(table.counts, jnp.int32).astype(jnp.uint32),
        cap,
    )


def merge_into_wide(acc: WideCounts, table: CountTable) -> WideCounts:
    """Accumulate a per-batch CountTable into a wide accumulator.

    Result keeps ``acc.capacity`` (static shapes for jit loops);
    ``n_unique`` stays exact, so overflow is ``n_unique > capacity``.
    """
    hi = jnp.concatenate([acc.hi, jnp.asarray(table.hi, jnp.uint32)])
    lo = jnp.concatenate([acc.lo, jnp.asarray(table.lo, jnp.uint32)])
    ln = jnp.concatenate([acc.length, jnp.asarray(table.length, jnp.int32)])
    tc = jnp.asarray(table.counts, jnp.int32)
    wh = jnp.concatenate([acc.counts_hi, jnp.zeros_like(tc)])
    wl = jnp.concatenate([acc.counts_lo, tc.astype(jnp.uint32)])
    return count_packed_wide(hi, lo, ln, wh, wl, acc.capacity)


def merge_wide(a: WideCounts, b: WideCounts, capacity: int | None = None) -> WideCounts:
    """Associative merge of two wide tables."""
    cap = a.capacity if capacity is None else capacity
    return count_packed_wide(
        jnp.concatenate([a.hi, b.hi]),
        jnp.concatenate([a.lo, b.lo]),
        jnp.concatenate([a.length, b.length]),
        jnp.concatenate([a.counts_hi, b.counts_hi]),
        jnp.concatenate([a.counts_lo, b.counts_lo]),
        cap,
    )
