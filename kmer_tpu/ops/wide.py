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
from .count import SENTINEL, SENTINEL_LEN, CountTable, _boundaries, _segment_counts


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


def _normalize_live(hi, lo, length, w_hi, w_lo):
    """Ravel/cast the five lanes and fold zero-weight slots to sentinels."""
    hi = jnp.asarray(hi, jnp.uint32).ravel()
    lo = jnp.asarray(lo, jnp.uint32).ravel()
    length = jnp.asarray(length, jnp.int32).ravel()
    w_hi = jnp.asarray(w_hi, jnp.int32).ravel()
    w_lo = jnp.asarray(w_lo, jnp.uint32).ravel()
    live = (w_hi > 0) | (w_lo > 0)
    hi = jnp.where(live, hi, jnp.uint32(SENTINEL))
    lo = jnp.where(live, lo, jnp.uint32(SENTINEL))
    length = jnp.where(live, length, jnp.int32(SENTINEL_LEN))
    return hi, lo, length, w_hi, w_lo


def _compact_fit(head, shi, slo, sln, th, tl, capacity: int) -> WideCounts:
    """Shared tail: keep totals at heads, compact live groups to the
    front in key order (tag-sort), pad/trim to ``capacity`` slots."""
    th = jnp.where(head, th, 0)
    tl = jnp.where(head, tl, jnp.uint32(0))
    n_unique = jnp.sum(head.astype(jnp.int32))

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


def _merge_unique_sources(hi, lo, length, w_hi, w_lo, capacity: int) -> WideCounts:
    """64-bit GROUP BY when each key holds nonzero weight in at most TWO
    input slots — true for every merge path here: a compacted WideCounts
    and a sorted-run CountTable each carry a key's total in exactly one
    slot.  Segment totals are then one neighbor pair-add at the segment
    head, replacing count_packed_wide's O(n log n) 64-bit cumsum with a
    single O(n) pass (the merge runs every streaming batch — this is
    the difference between a ~free fold and a second sort-sized cost).
    """
    hi, lo, length, w_hi, w_lo = _normalize_live(hi, lo, length, w_hi, w_lo)
    shi, slo, sln, swh, swl = jax.lax.sort(
        (hi, lo, length, w_hi, w_lo), num_keys=3, is_stable=False
    )
    new = _boundaries(shi, slo, sln)
    # slot i+1 belongs to the same segment iff it is not a head
    nxt_same = jnp.concatenate([~new[1:], jnp.zeros((1,), bool)])
    nwh = jnp.concatenate([swh[1:], jnp.zeros((1,), swh.dtype)])
    nwl = jnp.concatenate([swl[1:], jnp.zeros((1,), swl.dtype)])
    th, tl = _pair_add(
        swh,
        swl,
        jnp.where(nxt_same, nwh, 0),
        jnp.where(nxt_same, nwl, jnp.uint32(0)),
    )
    head = new & (sln != jnp.int32(SENTINEL_LEN))
    return _compact_fit(head, shi, slo, sln, th, tl, capacity)


def fold_windows_into_wide(acc: WideCounts, hi, lo, valid, k: int) -> WideCounts:
    """One-sort fold of raw extraction windows into a wide accumulator.

    Replaces ``count_windows(batch)`` + ``merge_into_wide(acc, table)``
    — a batch sort PLUS a merge sort — with a single combined sort:
    windows enter the merge sort directly at unit weight (a step's
    per-segment increment is bounded by the batch size, so the int32
    positional segment count stays exact), and the accumulator
    contributes at most one wide entry per key, which a trailing tag
    sort key pins to its segment head (one neighbor-free pair-add — no
    64-bit cumsum).  This is the single-device streaming hot path; the
    multi-device path still needs the per-batch table for all_to_all
    hash routing and keeps the two-step shape.

    Sort-lane narrowing mirrors count_windows: the lo lane is dropped
    when k makes it identically zero, rides as uint16 when only its top
    half is used, and the length lane is only materialized for k == 32
    (where a real all-t key is bitwise equal to the sentinel).
    """
    cap = acc.capacity
    hi = jnp.asarray(hi, jnp.uint32).ravel()
    lo = jnp.asarray(lo, jnp.uint32).ravel()
    masked = valid is not None
    if masked:
        v = jnp.asarray(valid).ravel()
        hi = jnp.where(v, hi, jnp.uint32(SENTINEL))
        lo = jnp.where(v, lo, jnp.uint32(SENTINEL))
    n_w = hi.shape[0]
    tag = jnp.concatenate(
        [jnp.zeros((cap,), jnp.uint8), jnp.ones((n_w,), jnp.uint8)]
    )
    wh = jnp.concatenate([acc.counts_hi, jnp.zeros((n_w,), jnp.int32)])
    wl = jnp.concatenate([acc.counts_lo, jnp.zeros((n_w,), jnp.uint32)])
    ah = jnp.concatenate([acc.hi, hi])
    al = jnp.concatenate([acc.lo, lo])

    # Narrowing bounds differ from count_windows: dead accumulator slots
    # mean sentinel keys are ALWAYS present here, so each tier must keep
    # enough lanes to separate a real all-t key from the sentinel:
    # k <= 15 leaves zero low bits in hi; k <= 23 leaves them in lo16;
    # k <= 31 leaves them in lo; k == 32 needs the length lane.
    if k <= 15:
        sh, stag, swh, swl = jax.lax.sort(
            (ah, tag, wh, wl), num_keys=2, is_stable=False
        )
        sl = jnp.zeros_like(sh)
        new = jnp.concatenate([jnp.ones((1,), bool), sh[1:] != sh[:-1]])
        is_sent = sh == jnp.uint32(SENTINEL)
    elif k <= 23:
        lo16 = (al >> jnp.uint32(16)).astype(jnp.uint16)
        sh, sl16, stag, swh, swl = jax.lax.sort(
            (ah, lo16, tag, wh, wl), num_keys=3, is_stable=False
        )
        sl = sl16.astype(jnp.uint32) << jnp.uint32(16)
        new = jnp.concatenate(
            [jnp.ones((1,), bool),
             (sh[1:] != sh[:-1]) | (sl16[1:] != sl16[:-1])]
        )
        is_sent = (sh == jnp.uint32(SENTINEL)) & (sl16 == jnp.uint16(0xFFFF))
    elif k < 32:
        sh, sl, stag, swh, swl = jax.lax.sort(
            (ah, al, tag, wh, wl), num_keys=3, is_stable=False
        )
        new = jnp.concatenate(
            [jnp.ones((1,), bool),
             (sh[1:] != sh[:-1]) | (sl[1:] != sl[:-1])]
        )
        is_sent = (sh == jnp.uint32(SENTINEL)) & (sl == jnp.uint32(SENTINEL))
    else:
        # k == 32: a real all-t key is bitwise all-ones — only the
        # length lane separates it from sentinels
        wln = jnp.full((n_w,), k, jnp.int32)
        if masked:
            wln = jnp.where(v, wln, jnp.int32(SENTINEL_LEN))
        aln = jnp.concatenate([acc.length, wln])
        sh, sl, sln, stag, swh, swl = jax.lax.sort(
            (ah, al, aln, tag, wh, wl), num_keys=4, is_stable=False
        )
        new = _boundaries(sh, sl, sln)
        is_sent = sln == jnp.int32(SENTINEL_LEN)

    ucnt = _segment_counts(new, stag.astype(jnp.int32))
    at_acc_head = new & (stag == 0)
    th, tl = _pair_add(
        jnp.where(at_acc_head, swh, 0),
        jnp.where(at_acc_head, swl, jnp.uint32(0)),
        jnp.zeros_like(swh),
        jnp.where(new, ucnt, 0).astype(jnp.uint32),
    )
    head = new & ~is_sent
    if k == 32:
        return _compact_fit(head, sh, sl, sln, th, tl, cap)

    # narrowed compaction for k < 32: non-heads fold to all-sentinel
    # keys, which real keys cannot equal (zero padding bits), so the
    # dead slots sort last with no tag or length lane; lo rides as
    # uint16 when k allows
    th = jnp.where(head, th, 0)
    tl = jnp.where(head, tl, jnp.uint32(0))
    n_unique = jnp.sum(head.astype(jnp.int32))
    khi = jnp.where(head, sh, jnp.uint32(SENTINEL))

    def fit(x, fill):
        if x.shape[0] >= cap:
            return x[:cap]
        return jnp.concatenate([x, jnp.full((cap - x.shape[0],), fill, x.dtype)])

    if k <= 15:
        khi, th, tl = jax.lax.sort((khi, th, tl), num_keys=1, is_stable=False)
        klo = jnp.zeros_like(khi)
        ksent = khi == jnp.uint32(SENTINEL)
    elif k <= 23:
        klo16 = jnp.where(head, (sl >> jnp.uint32(16)).astype(jnp.uint16),
                          jnp.uint16(0xFFFF))
        khi, klo16, th, tl = jax.lax.sort(
            (khi, klo16, th, tl), num_keys=2, is_stable=False
        )
        klo = klo16.astype(jnp.uint32) << jnp.uint32(16)
        ksent = (khi == jnp.uint32(SENTINEL)) & (klo16 == jnp.uint16(0xFFFF))
    else:
        klo = jnp.where(head, sl, jnp.uint32(SENTINEL))
        khi, klo, th, tl = jax.lax.sort(
            (khi, klo, th, tl), num_keys=2, is_stable=False
        )
        ksent = (khi == jnp.uint32(SENTINEL)) & (klo == jnp.uint32(SENTINEL))
    kln = jnp.where(ksent, jnp.int32(SENTINEL_LEN), jnp.int32(k))
    return WideCounts(
        hi=fit(khi, SENTINEL),
        lo=fit(klo, SENTINEL),
        length=fit(kln, SENTINEL_LEN),
        counts_hi=fit(th, 0),
        counts_lo=fit(tl, 0),
        n_unique=n_unique,
    )


def count_packed_wide(hi, lo, length, w_hi, w_lo, capacity: int) -> WideCounts:
    """64-bit weighted GROUP BY, output compacted to ``capacity`` slots.

    Slots with zero weight are absent.  If the number of distinct keys
    exceeds capacity the surplus (largest) keys are dropped — callers
    detect this via ``n_unique > capacity`` (kept exact in n_unique).
    """
    hi, lo, length, w_hi, w_lo = _normalize_live(hi, lo, length, w_hi, w_lo)
    n = hi.shape[0]

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

    head = new & (sln != jnp.int32(SENTINEL_LEN))
    return _compact_fit(head, shi, slo, sln, th, tl, capacity)


def wide_from_table(table: CountTable, capacity: int | None = None) -> WideCounts:
    """Lift a CountTable (int32 sorted-run) into compacted wide form."""
    cap = table.hi.shape[-1] if capacity is None else capacity
    return _merge_unique_sources(
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
    Both sources are per-key-deduplicated, so the fast ≤2-slots-per-
    segment merge applies.
    """
    hi = jnp.concatenate([acc.hi, jnp.asarray(table.hi, jnp.uint32)])
    lo = jnp.concatenate([acc.lo, jnp.asarray(table.lo, jnp.uint32)])
    ln = jnp.concatenate([acc.length, jnp.asarray(table.length, jnp.int32)])
    tc = jnp.asarray(table.counts, jnp.int32)
    wh = jnp.concatenate([acc.counts_hi, jnp.zeros_like(tc)])
    wl = jnp.concatenate([acc.counts_lo, tc.astype(jnp.uint32)])
    return _merge_unique_sources(hi, lo, ln, wh, wl, acc.capacity)


def merge_wide(a: WideCounts, b: WideCounts, capacity: int | None = None) -> WideCounts:
    """Associative merge of two wide tables."""
    cap = a.capacity if capacity is None else capacity
    return _merge_unique_sources(
        jnp.concatenate([a.hi, b.hi]),
        jnp.concatenate([a.lo, b.lo]),
        jnp.concatenate([a.length, b.length]),
        jnp.concatenate([a.counts_hi, b.counts_hi]),
        jnp.concatenate([a.counts_lo, b.counts_lo]),
        cap,
    )


def pad_wide(acc: WideCounts, capacity: int) -> WideCounts:
    """Re-home a compacted accumulator into a larger capacity (sentinel
    padding; live slots are already at the front in key order)."""
    if capacity <= acc.capacity:
        return acc
    pad = capacity - acc.capacity

    def ext(x, fill, dtype):
        return jnp.concatenate(
            [jnp.asarray(x, dtype), jnp.full((pad,), fill, dtype)]
        )

    return WideCounts(
        hi=ext(acc.hi, SENTINEL, jnp.uint32),
        lo=ext(acc.lo, SENTINEL, jnp.uint32),
        length=ext(acc.length, SENTINEL_LEN, jnp.int32),
        counts_hi=ext(acc.counts_hi, 0, jnp.int32),
        counts_lo=ext(acc.counts_lo, 0, jnp.uint32),
        n_unique=jnp.asarray(acc.n_unique, jnp.int32),
    )


_merge_into_wide_jit = jax.jit(merge_into_wide)
_pad_wide_jit = jax.jit(pad_wide, static_argnames=("capacity",))


class WideAccumulator:
    """Streaming 64-bit-exact accumulator with fixed-capacity merges and
    geometric growth — the universal replacement for the r1/r2
    growing-CountTable anti-pattern (O(B²) recompiles + int32 overflow).

    ``add(table)`` folds a per-batch sorted-run CountTable into a
    compacted WideCounts of static capacity, so every merge at a given
    (capacity, batch-shape) pair reuses one compiled program.  Growth
    never drops keys: a merge could only overflow when the host-side
    upper bound (last-synced n_unique + windows added since) crosses
    capacity; at that point the true n_unique is synced once and, if
    needed, the accumulator is re-homed into the next power-of-two
    capacity BEFORE the merge.  Compile count is therefore
    O(log distinct_keys x distinct batch shapes), and counts stay exact
    past 2^31 (the reference's GROUP BY totals are unbounded —
    kmer-tests.sql:1107-1214).
    """

    def __init__(self, capacity: int = 1 << 16):
        self._cap = 1 << max(3, int(capacity - 1).bit_length())
        self._acc: WideCounts | None = None
        self._bound = 0  # upper bound on current n_unique (host-side)

    @property
    def capacity(self) -> int:
        return self._cap

    @property
    def empty(self) -> bool:
        return self._acc is None

    def seed(self, acc: WideCounts) -> None:
        """Adopt an existing accumulator (checkpoint resume)."""
        self._cap = acc.capacity
        self._acc = WideCounts(
            hi=jnp.asarray(np.asarray(acc.hi), jnp.uint32),
            lo=jnp.asarray(np.asarray(acc.lo), jnp.uint32),
            length=jnp.asarray(np.asarray(acc.length), jnp.int32),
            counts_hi=jnp.asarray(np.asarray(acc.counts_hi), jnp.int32),
            counts_lo=jnp.asarray(np.asarray(acc.counts_lo), jnp.uint32),
            n_unique=jnp.asarray(int(acc.n_unique), jnp.int32),
        )
        self._bound = int(acc.n_unique)

    def add(self, table: CountTable) -> None:
        """Fold one per-batch CountTable (sorted-run layout) in, exactly."""
        batch_cap = int(np.asarray(table.hi).shape[-1])
        if self._acc is None:
            self._acc = WideCounts.empty(self._cap)
        if self._bound + batch_cap > self._cap:
            n = int(self._acc.n_unique)  # one sync, only near capacity
            if n + batch_cap > self._cap:
                new_cap = 1 << int(n + batch_cap - 1).bit_length()
                self._acc = _pad_wide_jit(self._acc, capacity=new_cap)
                self._cap = new_cap
            self._bound = n
        self._acc = _merge_into_wide_jit(self._acc, table)
        self._bound += batch_cap

    def result(self) -> WideCounts:
        if self._acc is None:
            raise ValueError("empty accumulator")
        return self._acc
