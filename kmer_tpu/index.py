"""Sorted radix index — the TPU-native replacement for the SP-GiST trie.

The reference implements a byte-wise radix trie through five SP-GiST
callbacks driven per-tuple by the Postgres index AM
(/root/reference/kmer_spgist.c:102-566), supporting strategies
= (3), @> (7), <@ (8), ^@ (28) (kmer--1.0.0.sql:174-185).

A pointer-chasing trie is the wrong shape for a vector machine.  Because
our 2-bit code order equals lexicographic byte order and packed keys are
left-aligned with zero padding (codec.py), *every* trie query becomes a
contiguous range of a sorted key array:

* equality      -> binary-search the (key64, length) pair;
* ^@ prefix p   -> keys in [pack(p), pack(p) + 4^(32-|p|)), then filter
                   length >= |p| (short keys that are prefixes of p land
                   in the range but must not match — same rule as
                   kmer_leaf_consistent's prefix case, kmer_spgist.c:520-536);
* qkmer @>      -> prune to the range of the longest determinate leading
                   run (the analogue of inner_consistent's prefix pruning,
                   kmer_spgist.c:395-444), then a vectorized positionwise
                   IUPAC mask check over the candidate range.

Index build is a bulk sort (np.lexsort host-side; jax.lax.sort on device)
instead of per-tuple choose/picksplit inserts — rebuild-on-ingest is the
idiomatic TPU design (SURVEY.md §3.4).

Parity contract: index search results equal scan results (kmer-tests.sql
TEST 14's seq-scan vs index-scan equivalence).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import codec
from .packed import PackedKmers
from .types import Kmer, Qkmer


@dataclasses.dataclass
class KmerIndex:
    """Host-built sorted index over a kmer column.

    sorted_keys:  [N] uint64 left-aligned packed keys, ascending
    sorted_lens:  [N] int32 lengths (secondary sort key)
    row_ids:      [N] int64 original row positions
    """

    sorted_keys: np.ndarray
    sorted_lens: np.ndarray
    row_ids: np.ndarray

    # --- build ---------------------------------------------------------------

    @classmethod
    def build(cls, column: PackedKmers) -> "KmerIndex":
        col = column.to_numpy()
        keys = codec.join_key64(col.hi, col.lo)
        lens = np.asarray(col.length, np.int32)
        order = np.lexsort((lens, keys))  # primary: keys, secondary: lens
        return cls(
            sorted_keys=keys[order],
            sorted_lens=lens[order],
            row_ids=order.astype(np.int64),
        )

    @classmethod
    def from_strings(cls, kmers) -> "KmerIndex":
        return cls.build(PackedKmers.from_strings(kmers))

    def __len__(self) -> int:
        return int(self.sorted_keys.size)

    # --- range helpers -------------------------------------------------------

    def _key_range(self, key: np.uint64, length: int) -> tuple[int, int]:
        """[l, r) of rows with exactly this (key, length)."""
        l = int(np.searchsorted(self.sorted_keys, key, side="left"))
        r = int(np.searchsorted(self.sorted_keys, key, side="right"))
        if l == r:
            return l, r
        lens = self.sorted_lens[l:r]
        l2 = l + int(np.searchsorted(lens, length, side="left"))
        r2 = l + int(np.searchsorted(lens, length, side="right"))
        return l2, r2

    def _prefix_range(self, codes: np.ndarray) -> tuple[int, int]:
        """[l, r) of rows whose key starts with the given code prefix.

        Computed in Python ints to dodge uint64 overflow when the prefix
        is all-t's (upper bound 2^64).
        """
        p = int(codes.size)
        if p == 0:
            return 0, len(self)
        base = int(codec.pack_key64(codes))
        span = 1 << (64 - 2 * p)
        l = int(np.searchsorted(self.sorted_keys, np.uint64(base), side="left"))
        upper = base + span
        if upper >= 1 << 64:
            r = len(self)
        else:
            r = int(np.searchsorted(self.sorted_keys, np.uint64(upper), side="left"))
        return l, r

    # --- queries (strategies 3, 28, 7/8) ------------------------------------

    def search_eq(self, kmer) -> np.ndarray:
        """Row ids where row = kmer (strategy 3, kmer_spgist.c:510-519)."""
        km = Kmer(kmer)
        l, r = self._key_range(km.key64, len(km))
        return np.sort(self.row_ids[l:r])

    def search_prefix(self, prefix) -> np.ndarray:
        """Row ids where row ^@ prefix (strategy 28, kmer_spgist.c:520-536)."""
        pf = Kmer(prefix)
        l, r = self._prefix_range(pf.codes)
        lens = self.sorted_lens[l:r]
        hit = lens >= len(pf)
        return np.sort(self.row_ids[l:r][hit])

    def search_pattern(self, qkmer) -> np.ndarray:
        """Row ids where qkmer @> row (strategies 7/8, kmer_spgist.c:537-556)."""
        qk = Qkmer(qkmer)
        qlen = len(qk)
        lead = qk.leading_exact_codes()
        l, r = self._prefix_range(lead)
        keys = self.sorted_keys[l:r]
        lens = self.sorted_lens[l:r]
        ok = lens == qlen
        for i in range(len(lead), qlen):
            shift = np.uint64(62 - 2 * i)
            code = ((keys >> shift) & np.uint64(3)).astype(np.uint8)
            ok = ok & (((qk.masks[i] >> code) & 1) != 0)
        return np.sort(self.row_ids[l:r][ok])


# --- device-side range lookup ------------------------------------------------
#
# Batched lexicographic binary search over device-resident sorted
# (hi, lo, length) arrays: 64 fori iterations of a tuple-compare, fully
# vectorized across a query batch — the device analogue of searchsorted
# for our 65-bit-wide composite keys (no uint64 needed on TPU).


def _lex_less(ahi, alo, aln, bhi, blo, bln, or_equal):
    lt = (ahi < bhi) | ((ahi == bhi) & ((alo < blo) | ((alo == blo) & (aln < bln))))
    if or_equal:
        eq = (ahi == bhi) & (alo == blo) & (aln == bln)
        return lt | eq
    return lt


def searchsorted_packed(shi, slo, sln, qhi, qlo, qln, side: str = "left"):
    """Insertion positions of queries (qhi,qlo,qln)[M] into the sorted
    (shi,slo,sln)[N] column; jit-compatible, vectorized over M."""
    n = shi.shape[0]
    qhi = jnp.asarray(qhi, jnp.uint32)
    qlo = jnp.asarray(qlo, jnp.uint32)
    qln = jnp.asarray(qln, jnp.int32)
    lo_b = jnp.zeros(qhi.shape, jnp.int32)
    hi_b = jnp.full(qhi.shape, n, jnp.int32)
    steps = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)

    def body(_, carry):
        lo_b, hi_b = carry
        active = lo_b < hi_b
        mid = (lo_b + hi_b) // 2
        safe = jnp.clip(mid, 0, n - 1)
        mhi = shi[safe]
        mlo = slo[safe]
        mln = sln[safe]
        if side == "left":
            go_right = _lex_less(mhi, mlo, mln, qhi, qlo, qln, or_equal=False)
        else:
            go_right = _lex_less(mhi, mlo, mln, qhi, qlo, qln, or_equal=True)
        lo_b = jnp.where(active & go_right, mid + 1, lo_b)
        hi_b = jnp.where(active & ~go_right, mid, hi_b)
        return lo_b, hi_b

    lo_b, hi_b = jax.lax.fori_loop(0, steps, body, (lo_b, hi_b))
    return lo_b


def device_sort_column(col: PackedKmers) -> tuple[PackedKmers, jnp.ndarray]:
    """On-device index build: sort (hi, lo, length) + carry row ids."""
    n = col.hi.shape[0]
    rid = jnp.arange(n, dtype=jnp.int32)
    shi, slo, sln, srid = jax.lax.sort(
        (
            jnp.asarray(col.hi, jnp.uint32),
            jnp.asarray(col.lo, jnp.uint32),
            jnp.asarray(col.length, jnp.int32),
            rid,
        ),
        num_keys=3,
    )
    return PackedKmers(hi=shi, lo=slo, length=sln), srid
