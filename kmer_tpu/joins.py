"""Join kernels over kmer columns.

The reference's secondary suite (/root/reference/kmer-test.sql:104-407)
exercises inner/left/right joins on every predicate: ``a.kmer = b.kmer``,
``equals``, ``starts_with``, ``^@``, ``contains``/``@>``.  In Postgres
these run as hash joins (via kmer_hash_ops) or nested loops; the engine's
equivalents are sort-merge joins over the packed key order — build the
sorted radix index on the right column once, then batch-range-lookup
every left key (vectorized searchsorted), expanding ranges to pairs.

All joins return an int64 [n_pairs, 2] array of (left_row, right_row)
ids, sorted by (left, right).
"""

from __future__ import annotations

import numpy as np

from . import codec
from .index import KmerIndex
from .packed import PackedKmers
from .types import Qkmer


def _expand_ranges(left_ids, starts, ends, right_order) -> np.ndarray:
    """(per-left [start, end) into right_order) -> (left, right) pairs."""
    counts = ends - starts
    total = int(counts.sum())
    if total == 0:
        return np.zeros((0, 2), np.int64)
    li = np.repeat(left_ids, counts)
    # positions within each range
    offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(total, dtype=np.int64) - np.repeat(offs, counts) + np.repeat(
        starts, counts
    )
    ri = right_order[pos]
    pairs = np.stack([li, ri], axis=1)
    order = np.lexsort((pairs[:, 1], pairs[:, 0]))
    return pairs[order]


def join_eq(left: PackedKmers, right: PackedKmers) -> np.ndarray:
    """Pairs (i, j) with left[i] = right[j] (hash-join equivalent)."""
    idx = KmerIndex.build(right)
    lk = left.to_numpy().key64()
    ll = np.asarray(left.length, np.int64)
    # range by key64, then refine by length (secondary sort key)
    s = np.searchsorted(idx.sorted_keys, lk, side="left")
    e = np.searchsorted(idx.sorted_keys, lk, side="right")
    starts = np.empty_like(s)
    ends = np.empty_like(e)
    for i in range(lk.size):  # lengths within a key64 group are few; cheap
        lens = idx.sorted_lens[s[i] : e[i]]
        starts[i] = s[i] + np.searchsorted(lens, ll[i], side="left")
        ends[i] = s[i] + np.searchsorted(lens, ll[i], side="right")
    return _expand_ranges(
        np.arange(lk.size, dtype=np.int64), starts, ends, idx.row_ids
    )


def join_right_starts_with_left(left: PackedKmers, right: PackedKmers) -> np.ndarray:
    """Pairs (i, j) where right[j] ^@ left[i] (left values are prefixes).

    Covers the reference's ``starts_with(a.kmer, b.kmer)`` /
    ``b.kmer ^@ a.kmer`` join shapes.
    """
    idx = KmerIndex.build(right)
    lk = left.to_numpy().key64()
    ll = np.asarray(left.length, np.int64)
    n = len(idx)
    starts = np.searchsorted(idx.sorted_keys, lk, side="left")
    pairs = []
    for i in range(lk.size):
        p = int(ll[i])
        if p == 0:
            s, e = 0, n
        elif p == 32:
            s = int(starts[i])
            e = int(np.searchsorted(idx.sorted_keys, lk[i], side="right"))
        else:
            upper = int(lk[i]) + (1 << (64 - 2 * p))
            s = int(starts[i])
            e = n if upper >= 1 << 64 else int(
                np.searchsorted(idx.sorted_keys, np.uint64(upper), side="left")
            )
        if s < e:
            sel = idx.sorted_lens[s:e] >= p
            for j in idx.row_ids[s:e][sel]:
                pairs.append((i, int(j)))
    if not pairs:
        return np.zeros((0, 2), np.int64)
    out = np.asarray(pairs, np.int64)
    return out[np.lexsort((out[:, 1], out[:, 0]))]


def join_pattern(qkmers: list[Qkmer], right: PackedKmers) -> np.ndarray:
    """Pairs (i, j) where qkmers[i] @> right[j] (pattern join)."""
    idx = KmerIndex.build(right)
    pairs = []
    for i, qk in enumerate(qkmers):
        for j in idx.search_pattern(qk):
            pairs.append((i, int(j)))
    if not pairs:
        return np.zeros((0, 2), np.int64)
    out = np.asarray(pairs, np.int64)
    return out[np.lexsort((out[:, 1], out[:, 0]))]


def outer_extend(pairs: np.ndarray, n_left: int, n_right: int, how: str) -> list[tuple]:
    """LEFT/RIGHT/FULL join row lists with None for non-matches."""
    rows = [(int(a), int(b)) for a, b in pairs]
    if how in ("left", "full"):
        matched = set(pairs[:, 0].tolist())
        rows += [(i, None) for i in range(n_left) if i not in matched]
    if how in ("right", "full"):
        matched = set(pairs[:, 1].tolist())
        rows += [(None, j) for j in range(n_right) if j not in matched]
    return sorted(rows, key=lambda t: (t[0] is None, t[0], t[1] is None, t[1]))
