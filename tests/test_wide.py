"""64-bit two-lane count accumulation (ops/wide.py).

VERDICT r1 missing #5: one merge whose total weight exceeds 2^31 must
stay exact.  The oracle is host-side numpy int64.
"""

import jax.numpy as jnp
import numpy as np

from kmer_tpu.ops.count import count_column, count_packed
from kmer_tpu.ops.wide import (
    WideCounts,
    _pair_add,
    _pair_cumsum,
    _pair_sub,
    count_packed_wide,
    merge_into_wide,
    merge_wide,
    wide_from_table,
)
from kmer_tpu.packed import PackedKmers


def _pack_col(strs):
    return PackedKmers.from_strings(strs)


class TestPairArithmetic:
    def test_add_carry(self):
        ah, al = _pair_add(
            jnp.asarray([0, 1], jnp.int32),
            jnp.asarray([0xFFFFFFFF, 0xFFFFFFFE], jnp.uint32),
            jnp.asarray([0, 0], jnp.int32),
            jnp.asarray([1, 1], jnp.uint32),
        )
        assert ah.tolist() == [1, 1] and al.tolist() == [0, 0xFFFFFFFF]

    def test_sub_borrow(self):
        bh, bl = _pair_sub(
            jnp.asarray([1], jnp.int32),
            jnp.asarray([0], jnp.uint32),
            jnp.asarray([0], jnp.int32),
            jnp.asarray([1], jnp.uint32),
        )
        assert bh.tolist() == [0] and bl.tolist() == [0xFFFFFFFF]

    def test_cumsum_matches_int64(self):
        rng = np.random.default_rng(0)
        w = rng.integers(0, 2**31 - 1, 257, dtype=np.int64)
        ch, cl = _pair_cumsum(
            jnp.zeros(257, jnp.int32), jnp.asarray(w.astype(np.uint32))
        )
        got = (np.asarray(ch, np.int64) << 32) + np.asarray(cl, np.int64)
        np.testing.assert_array_equal(got, np.cumsum(w))


class TestWideCounts:
    def test_merge_total_over_2_31(self):
        """Two tables summing past int32 range merge exactly."""
        col = _pack_col(["acgt", "acgt", "ttt"])
        big = 2**31 - 100
        a = count_packed(col.hi, col.lo, col.length,
                         jnp.asarray([big, 7, 5], jnp.int32))
        b = count_packed(col.hi, col.lo, col.length,
                         jnp.asarray([big, 11, 9], jnp.int32))
        acc = wide_from_table(a, capacity=8)
        acc = merge_into_wide(acc, b)
        d = acc.to_dict()
        assert d["acgt"] == 2 * big + 18  # > 2**32: exercises the hi lane
        assert d["ttt"] == 14
        assert acc.total() == 2 * big + 32
        assert acc.distinct() == 2

    def test_matches_count_packed_small(self):
        rng = np.random.default_rng(1)
        n = 300
        hi = rng.integers(0, 5, n).astype(np.uint32) << np.uint32(28)
        lo = np.zeros(n, np.uint32)
        ln = np.full(n, 2, np.int32)
        w = rng.integers(0, 50, n).astype(np.int32)
        ref = count_packed(jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(ln),
                           jnp.asarray(w)).to_dict()
        got = count_packed_wide(
            jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(ln),
            jnp.zeros(n, jnp.int32), jnp.asarray(w.astype(np.uint32)),
            capacity=n,
        ).to_dict()
        assert got == ref

    def test_accumulate_many_batches(self):
        """32 repeated batch merges == 32x the single-batch dict."""
        col = _pack_col(["aa", "cc", "aa", "gg", "t"])
        batch = count_column(col)
        acc = WideCounts.empty(16)
        for _ in range(32):
            acc = merge_into_wide(acc, batch)
        ref = batch.to_dict()
        assert acc.to_dict() == {k: 32 * v for k, v in ref.items()}
        assert int(acc.n_unique) == len(ref)

    def test_capacity_overflow_detected(self):
        col = _pack_col(["aa", "cc", "gg", "tt", "at"])
        acc = WideCounts.empty(3)
        acc = merge_into_wide(acc, count_column(col))
        assert int(acc.n_unique) == 5 > acc.capacity  # overflow signalled

    def test_merge_wide_associative(self):
        a = wide_from_table(count_column(_pack_col(["aa", "cc"])), 8)
        b = wide_from_table(count_column(_pack_col(["cc", "gg"])), 8)
        c = wide_from_table(count_column(_pack_col(["gg", "aa", "aa"])), 8)
        left = merge_wide(merge_wide(a, b), c)
        right = merge_wide(a, merge_wide(b, c))
        assert left.to_dict() == right.to_dict() == {"aa": 3, "cc": 2, "gg": 2}

    def test_empty_accumulator(self):
        acc = WideCounts.empty(4)
        assert acc.to_dict() == {}
        assert acc.total() == 0
