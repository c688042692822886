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
        """Compact to live slots (host result).

        Device-resident accumulators verify the front-compaction
        invariant ON DEVICE (two cheap reductions) and transfer only the
        ``n_unique`` live rows — a full-capacity device_get of a 16M-slot
        accumulator moved 335 MB over the host link just to mask most of
        it away.  Arrays that fail the check (e.g. a *sharded*
        accumulator gathered to host, whose live slots sit at the front
        of each shard, not globally) fall back to the host-side
        ``counts > 0`` mask.
        """
        if isinstance(self.hi, jax.Array) and not isinstance(
            self.hi, np.ndarray
        ):
            n = int(self.n_unique)
            live = (self.counts_hi > 0) | (self.counts_lo > 0)
            front_ok = bool(live[:n].all()) if n else True
            rest_ok = not bool(live[n:].any())
            if front_ok and rest_ok:
                # one packed transfer RPC for all five lanes (the host
                # link charges ~0.2s fixed per transfer; five separate
                # n-row fetches paid that five times)
                packed = jnp.stack([
                    jnp.asarray(self.hi[:n], jnp.uint32),
                    jnp.asarray(self.lo[:n], jnp.uint32),
                    jax.lax.bitcast_convert_type(
                        jnp.asarray(self.length[:n], jnp.int32), jnp.uint32),
                    jax.lax.bitcast_convert_type(
                        jnp.asarray(self.counts_hi[:n], jnp.int32),
                        jnp.uint32),
                    jnp.asarray(self.counts_lo[:n], jnp.uint32),
                ])
                host = np.asarray(jax.device_get(packed), np.uint32)
                return WideCounts(
                    hi=host[0],
                    lo=host[1],
                    length=host[2].view(np.int32),
                    counts_hi=host[3].view(np.int32),
                    counts_lo=host[4],
                    n_unique=np.int64(n),
                )
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


# Blocked-compact tuning (see _narrow_to_cap): 32-row blocks, keep 8.
# With live-head density p per row, a block violates when it holds > 8
# live heads — P ~ Poisson(32p) tail; at the streaming steady state
# (coverage genomes, p ~ 1-2%) that is ~1e-9 per block, while uniform
# data (p ~ 1) routes to the full sort via the in-graph check.
_COMPACT_BLOCK = 32
_COMPACT_LMAX = 8
_COMPACT_MIN_N = 1 << 22  # below this a full narrowing sort is sub-ms


def _narrow_to_cap(keys: tuple, cnt, cap: int, nkeys: int) -> tuple:
    """Compact a sorted-run batch table to live-first order, ``min(n, cap)``
    rows.  ``keys`` are the sort lanes with dead slots already folded to
    their all-ones sentinels; ``cnt`` holds each live group's total (>0)
    and 0 at dead slots.  Returns (*keys, cnt) compacted.

    Full path: one narrowing sort over all n rows — measured at 350ms of
    the 668ms r3 streaming fold (PERF.md §6), i.e. a second sort of the
    whole batch purely to move ~1.5%-dense live heads to the front.

    Blocked path (high-duplication data, the streaming steady state):
    sort each 32-row block along its own axis — batched row sorts run
    ~an order of magnitude above the global sort's rate (PERF.md §5.1)
    — then keep only each block's first 8 rows, which hold ALL its live
    heads whenever no block has more than 8 (live heads on a coverage
    genome are sparse in the sorted run), and run the narrowing sort on
    that 4x-smaller candidate array.  A per-block live-count maximum is
    checked in-graph and a lax.cond routes to the full sort when any
    block exceeds the limit, so the result is exact on every input
    distribution (uniform data simply always takes the full sort).
    """
    n = keys[0].shape[0]
    target = min(n, cap)

    def fit(x, fill):
        if x.shape[0] >= target:
            return x[:target]
        return jnp.concatenate(
            [x, jnp.full((target - x.shape[0],), fill, x.dtype)]
        )

    def key_fill(x):
        return jnp.iinfo(x.dtype).max

    def full_sort(ops):
        ks, c = ops
        srt = jax.lax.sort(ks + (c,), num_keys=nkeys, is_stable=False)
        return tuple(fit(s, key_fill(s)) for s in srt[:-1]) + (fit(srt[-1], 0),)

    if n < _COMPACT_MIN_N:
        return full_sort((keys, cnt))

    B, L = _COMPACT_BLOCK, _COMPACT_LMAX
    pad = (-n) % B
    if pad:
        keys = tuple(
            jnp.concatenate([x, jnp.full((pad,), key_fill(x), x.dtype)])
            for x in keys
        )
        cnt = jnp.concatenate([cnt, jnp.zeros((pad,), cnt.dtype)])
    nb = (n + pad) // B
    per_block = jnp.sum((cnt > 0).reshape(nb, B).astype(jnp.int32), axis=1)
    ok = jnp.max(per_block) <= L

    def blocked(ops):
        ks, c = ops
        rows = tuple(x.reshape(nb, B) for x in ks) + (c.reshape(nb, B),)
        srt = jax.lax.sort(rows, dimension=1, num_keys=nkeys, is_stable=False)
        cand = tuple(s[:, :L].reshape(-1) for s in srt)
        srt2 = jax.lax.sort(cand, num_keys=nkeys, is_stable=False)
        return tuple(fit(s, key_fill(s)) for s in srt2[:-1]) + (
            fit(srt2[-1], 0),
        )

    return jax.lax.cond(ok, blocked, full_sort, (keys, cnt))


def fold_windows_into_wide(acc: WideCounts, hi, lo, valid, k: int) -> WideCounts:
    """Fold raw extraction windows into a wide accumulator — the
    single-device streaming hot path.

    Measured composition (scripts/probe_step2.py, v5e, 68M windows into
    a 4M-slot accumulator): count the batch with the production engine
    (group sort + Pallas segment counts, 257ms), tag-compact the
    sorted-run table down to ``acc.capacity`` slots (one narrowed sort,
    350ms — dead slots fold to sentinel keys, which real keys cannot
    equal below k=32), then merge two COMPACTED tables (2*cap rows,
    67ms).  Both merge sources are per-key-deduplicated, so a segment
    has at most two slots and totals are one neighbor pair-add — no
    64-bit cumsum, no tag lane (addition commutes), and crucially none
    of the weighted-``_segment_counts`` ``csum[end]`` gather that made
    the naive fused one-sort fold 2.7s (XLA gathers run ~0.1G elt/s,
    PERF.md §3/§5).

    Sort lanes narrow by k: hi-only for k <= 15, (hi, lo16) for
    k <= 23, (hi, lo) for k <= 31; k == 32 adds the length lane
    (a real all-t 32-mer is bitwise equal to the sentinel).

    ``n_unique`` is exact whenever it fits ``acc.capacity``; if the
    batch table alone overflows capacity the surplus keys are dropped
    and ``n_unique`` is a lower bound that still exceeds capacity, so
    the caller's ``n_unique > capacity`` overflow check always fires.
    """
    from .count import count_windows

    cap = acc.capacity
    table = count_windows(hi, lo, valid, k)
    tcnt = jnp.asarray(table.counts, jnp.int32)
    dead = tcnt <= 0
    thi = jnp.where(dead, jnp.uint32(SENTINEL), jnp.asarray(table.hi, jnp.uint32))
    tlo = jnp.where(dead, jnp.uint32(SENTINEL), jnp.asarray(table.lo, jnp.uint32))
    n_live = jnp.sum((~dead).astype(jnp.int32))

    if k <= 15:
        # lo identically zero for real keys; hi has >= 2 zero low bits,
        # so the all-ones sentinel is unreachable
        chi, ccnt = _narrow_to_cap((thi,), tcnt, cap, nkeys=1)
        ah = jnp.concatenate([acc.hi, chi])
        al16 = None
        al = None
        ops = (ah,)
        nkeys = 1
    elif k <= 23:
        t16 = (tlo >> jnp.uint32(16)).astype(jnp.uint16)
        chi, c16, ccnt = _narrow_to_cap((thi, t16), tcnt, cap, nkeys=2)
        ah = jnp.concatenate([acc.hi, chi])
        al16 = jnp.concatenate(
            [(acc.lo >> jnp.uint32(16)).astype(jnp.uint16), c16])
        al = None
        ops = (ah, al16)
        nkeys = 2
    elif k <= 31:
        chi, clo, ccnt = _narrow_to_cap((thi, tlo), tcnt, cap, nkeys=2)
        ah = jnp.concatenate([acc.hi, chi])
        al16 = None
        al = jnp.concatenate([acc.lo, clo])
        ops = (ah, al)
        nkeys = 2
    else:
        tln = jnp.where(dead, jnp.int32(SENTINEL_LEN),
                        jnp.asarray(table.length, jnp.int32))
        chi, clo, cln, ccnt = _narrow_to_cap((thi, tlo, tln), tcnt, cap,
                                             nkeys=3)
        merged = _merge_unique_sources(
            jnp.concatenate([acc.hi, chi]),
            jnp.concatenate([acc.lo, clo]),
            jnp.concatenate([acc.length, cln]),
            jnp.concatenate([acc.counts_hi, jnp.zeros_like(ccnt)]),
            jnp.concatenate([acc.counts_lo, ccnt.astype(jnp.uint32)]),
            cap,
        )
        n_unique = jnp.maximum(jnp.asarray(merged.n_unique, jnp.int32), n_live)
        return dataclasses.replace(merged, n_unique=n_unique)

    wh = jnp.concatenate([acc.counts_hi, jnp.zeros_like(ccnt)])
    wl = jnp.concatenate([acc.counts_lo, ccnt.astype(jnp.uint32)])
    srt = jax.lax.sort(ops + (wh, wl), num_keys=nkeys, is_stable=False)
    sh = srt[0]
    swh, swl = srt[-2], srt[-1]
    if nkeys == 1:
        new = jnp.concatenate([jnp.ones((1,), bool), sh[1:] != sh[:-1]])
        is_sent = sh == jnp.uint32(SENTINEL)
        sl16 = None
        sl = jnp.zeros_like(sh)
    elif al16 is not None:
        sl16 = srt[1]
        new = jnp.concatenate(
            [jnp.ones((1,), bool),
             (sh[1:] != sh[:-1]) | (sl16[1:] != sl16[:-1])])
        is_sent = (sh == jnp.uint32(SENTINEL)) & (sl16 == jnp.uint16(0xFFFF))
        sl = sl16.astype(jnp.uint32) << jnp.uint32(16)
    else:
        sl = srt[1]
        sl16 = None
        new = jnp.concatenate(
            [jnp.ones((1,), bool),
             (sh[1:] != sh[:-1]) | (sl[1:] != sl[:-1])])
        is_sent = (sh == jnp.uint32(SENTINEL)) & (sl == jnp.uint32(SENTINEL))
    # both sources deduplicated: a segment holds at most 2 slots, and
    # addition commutes, so the head's total is one neighbor pair-add
    nxt_same = jnp.concatenate([~new[1:], jnp.zeros((1,), bool)])
    nwh = jnp.concatenate([swh[1:], jnp.zeros((1,), swh.dtype)])
    nwl = jnp.concatenate([swl[1:], jnp.zeros((1,), swl.dtype)])
    th, tl = _pair_add(swh, swl, jnp.where(nxt_same, nwh, 0),
                       jnp.where(nxt_same, nwl, jnp.uint32(0)))
    head = new & ~is_sent & ((th > 0) | (tl > 0))

    th = jnp.where(head, th, 0)
    tl = jnp.where(head, tl, jnp.uint32(0))
    n_unique = jnp.maximum(jnp.sum(head.astype(jnp.int32)), n_live)
    khi = jnp.where(head, sh, jnp.uint32(SENTINEL))

    def fit(x, fill):
        if x.shape[0] >= cap:
            return x[:cap]
        return jnp.concatenate([x, jnp.full((cap - x.shape[0],), fill, x.dtype)])

    if nkeys == 1:
        khi, th, tl = jax.lax.sort((khi, th, tl), num_keys=1, is_stable=False)
        ksent = khi == jnp.uint32(SENTINEL)
        # dead slots must hold the documented all-SENTINEL pattern, not
        # the tier's implicit zero lo
        klo = jnp.where(ksent, jnp.uint32(SENTINEL), jnp.uint32(0))
    elif sl16 is not None:
        kl16 = jnp.where(head, sl16, jnp.uint16(0xFFFF))
        khi, kl16, th, tl = jax.lax.sort(
            (khi, kl16, th, tl), num_keys=2, is_stable=False)
        ksent = (khi == jnp.uint32(SENTINEL)) & (kl16 == jnp.uint16(0xFFFF))
        klo = jnp.where(
            ksent, jnp.uint32(SENTINEL),
            kl16.astype(jnp.uint32) << jnp.uint32(16),
        )
    else:
        klo = jnp.where(head, sl, jnp.uint32(SENTINEL))
        khi, klo, th, tl = jax.lax.sort(
            (khi, klo, th, tl), num_keys=2, is_stable=False)
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

    Unlike ``_merge_unique_sources`` (which requires each key to appear
    in at most TWO input slots), this is the fully general path — a key
    may carry weight in any number of slots — at the cost of an
    O(n log n) two-lane cumsum.  It is the device-side K-way merge of
    spill runs (``merge_runs``): K deduplicated runs can hold the same
    key K times.
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


# a device K-way run merge beyond this size would not fit comfortably
# next to the working set; the host numpy path takes over
_DEVICE_MERGE_MAX_ROWS = 1 << 26


def merge_runs(runs: list[WideCounts], prefer_device: bool = True) -> WideCounts:
    """Exact K-way merge of spilled runs (VERDICT r3 missing #3).

    Each run is a (possibly trimmed) WideCounts; a key may appear in up
    to K runs.  Small unions merge on device through the general
    weighted GROUP BY (``count_packed_wide`` — the >2-slots-per-key
    path); large unions merge on host with numpy int64 (lexsort +
    reduceat), which is unbounded by HBM — the whole point of spilling.
    Returns a host-resident trimmed WideCounts either way.
    """
    # always trim: an untrimmed host table (e.g. a loaded run file's
    # expanded shards) carries dead sentinel slots that the host merge
    # path would otherwise emit as zero-count groups
    trims = [r.trim() for r in runs]
    trims = [t for t in trims if np.asarray(t.hi).size]
    if not trims:
        return WideCounts.empty(8).trim()
    hi = np.concatenate([np.asarray(t.hi, np.uint32) for t in trims])
    lo = np.concatenate([np.asarray(t.lo, np.uint32) for t in trims])
    ln = np.concatenate([np.asarray(t.length, np.int32) for t in trims])
    ch = np.concatenate([np.asarray(t.counts_hi, np.int32) for t in trims])
    cl = np.concatenate([np.asarray(t.counts_lo, np.uint32) for t in trims])
    n = hi.size
    if prefer_device and n <= _DEVICE_MERGE_MAX_ROWS:
        merged = count_packed_wide(
            jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(ln),
            jnp.asarray(ch), jnp.asarray(cl), capacity=n,
        )
        return merged.trim()
    c64 = (ch.astype(np.int64) << np.int64(32)) + cl.astype(np.int64)
    order = np.lexsort((ln, lo, hi))
    hi, lo, ln, c64 = hi[order], lo[order], ln[order], c64[order]
    head = np.ones(n, bool)
    head[1:] = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1]) | (ln[1:] != ln[:-1])
    starts = np.flatnonzero(head)
    totals = np.add.reduceat(c64, starts)
    return WideCounts(
        hi=hi[starts], lo=lo[starts], length=ln[starts],
        counts_hi=(totals >> np.int64(32)).astype(np.int32),
        counts_lo=(totals & np.int64(0xFFFFFFFF)).astype(np.uint32),
        n_unique=np.int64(starts.size),
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

    def __init__(self, capacity: int = 1 << 16,
                 max_capacity: int | None = None,
                 spill_dir: str | None = None):
        """``max_capacity`` is the device budget in slots: instead of
        growing past it, the accumulator SPILLS its live slots to host
        (or to npz files under ``spill_dir``) as a deduplicated sorted
        run, resets, and keeps counting — ``result()`` finishes with an
        exact K-way merge (merge_runs).  Cardinality is then bounded by
        host RAM/disk, not HBM (VERDICT r3 missing #3: the reference
        inherits hash-agg spill from Postgres).  None = never spill
        (the r3 geometric-growth behavior)."""
        self._cap = 1 << max(3, int(capacity - 1).bit_length())
        self._acc: WideCounts | None = None
        self._bound = 0  # upper bound on current n_unique (host-side)
        if max_capacity is not None:
            # round DOWN to a power of two: growth always doubles from a
            # power-of-two capacity, so a non-pow2 budget would otherwise
            # be overshot by the post-spill growth loop (the budget is a
            # device-HBM bound — exceeding it defeats the parameter).
            # The starting capacity clamps to the budget (it rounds UP,
            # so capacity == max_capacity non-pow2 must not contradict
            # our own rounding).
            max_capacity = max(8, 1 << (int(max_capacity).bit_length() - 1))
            self._cap = min(self._cap, max_capacity)
        self._max_cap = max_capacity
        self._spill_dir = spill_dir
        self._runs: list = []  # host WideCounts or npz paths

    @property
    def capacity(self) -> int:
        return self._cap

    @property
    def n_spills(self) -> int:
        return len(self._runs)

    @property
    def empty(self) -> bool:
        return self._acc is None and not self._runs

    def _spill(self) -> None:
        t = self._acc.trim()  # device -> host, live slots only
        if self._spill_dir is not None:
            import os

            from ..utils.checkpoint import atomic_savez

            path = os.path.join(
                self._spill_dir, f"spill_{len(self._runs):05d}.npz"
            )
            atomic_savez(
                path, compress=False,
                hi=np.asarray(t.hi, np.uint32),
                lo=np.asarray(t.lo, np.uint32),
                length=np.asarray(t.length, np.int32),
                counts_hi=np.asarray(t.counts_hi, np.int32),
                counts_lo=np.asarray(t.counts_lo, np.uint32),
            )
            self._runs.append(path)
        else:
            self._runs.append(t)
        self._acc = None
        self._bound = 0

    def _load_runs(self) -> list:
        out = []
        for r in self._runs:
            if isinstance(r, str):
                with np.load(r, allow_pickle=False) as z:
                    out.append(WideCounts(
                        hi=z["hi"], lo=z["lo"], length=z["length"],
                        counts_hi=z["counts_hi"], counts_lo=z["counts_lo"],
                        n_unique=np.int64(z["hi"].size),
                    ))
            else:
                out.append(r)
        return out

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
                if self._max_cap is not None and new_cap > self._max_cap:
                    if n > 0:
                        self._spill()
                        self._acc = WideCounts.empty(self._cap)
                    if batch_cap > self._max_cap:
                        raise ValueError(
                            f"one batch table ({batch_cap} slots) exceeds "
                            f"max_capacity {self._max_cap}; shrink the batch"
                        )
                    while self._cap < batch_cap:
                        self._cap *= 2
                        self._acc = _pad_wide_jit(self._acc,
                                                  capacity=self._cap)
                else:
                    self._acc = _pad_wide_jit(self._acc, capacity=new_cap)
                    self._cap = new_cap
                    self._bound = n
            else:
                self._bound = n
        self._acc = _merge_into_wide_jit(self._acc, table)
        self._bound += batch_cap

    def result(self) -> WideCounts:
        """The exact accumulated table.  Without spills this is the
        device accumulator; with spills it is the host-side K-way merge
        of all runs plus the live accumulator (merge_runs)."""
        if self.empty:
            raise ValueError("empty accumulator")
        if not self._runs:
            return self._acc
        runs = self._load_runs()
        if self._acc is not None:
            runs.append(self._acc.trim())
        return merge_runs(runs)
