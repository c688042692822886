"""Index tests — TEST 14's property: index results == scan results.

The reference demonstrates seq-scan vs SP-GiST index-scan equivalence on
100k random rows (kmer-tests.sql:1296-1353); here the oracle is the
vectorized scan path (itself pinned to the reference by the predicate
tests), checked against the sorted radix index on data shaped like
data_generator.py output.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from kmer_tpu import Kmer, KmerIndex, PackedKmers, Qkmer
from kmer_tpu.index import DeviceIndex, device_sort_column, searchsorted_packed
from kmer_tpu.io import generate_test_rows
from kmer_tpu.ops.predicates import (
    contains,
    equals,
    qkmer_mask_vector,
    starts_with_op,
    v_contains,
    v_equals,
    v_starts_with,
)


@pytest.fixture(scope="module")
def dataset():
    rows = generate_test_rows(n_rows=1500, seed=11)
    kmers = [r[1].lower() for r in rows]
    # sprinkle edge cases the random generator can't produce
    kmers += ["", "a", "acga", "acga", "acgattac", "t" * 32, "a" * 32]
    col = PackedKmers.from_strings(kmers)
    return kmers, col, KmerIndex.build(col)


def scan_eq(kmers, q):
    return np.array([i for i, s in enumerate(kmers) if equals(s, q)], dtype=np.int64)


def scan_prefix(kmers, p):
    return np.array(
        [i for i, s in enumerate(kmers) if starts_with_op(s, p)], dtype=np.int64
    )


def scan_pattern(kmers, q):
    return np.array([i for i, s in enumerate(kmers) if contains(q, s)], dtype=np.int64)


class TestIndexEquivalence:
    def test_eq(self, dataset):
        kmers, col, idx = dataset
        for q in ["acga", "", "a", "t" * 32, "acgattac", "gggg"]:
            assert (idx.search_eq(q) == scan_eq(kmers, q)).all(), q

    def test_eq_existing_keys_sample(self, dataset):
        kmers, col, idx = dataset
        for q in kmers[::97]:
            got = idx.search_eq(q)
            assert (got == scan_eq(kmers, q)).all(), q
            assert len(got) >= 1

    def test_prefix(self, dataset):
        kmers, col, idx = dataset
        for p in ["", "a", "ac", "acga", "ttttt", "t" * 32, "g" * 10]:
            assert (idx.search_prefix(p) == scan_prefix(kmers, p)).all(), p

    def test_prefix_all_t_upper_bound(self, dataset):
        # all-t prefix exercises the 2^64 range-overflow branch
        kmers, col, idx = dataset
        for p in ["t", "tt", "t" * 31]:
            assert (idx.search_prefix(p) == scan_prefix(kmers, p)).all(), p

    def test_pattern(self, dataset):
        kmers, col, idx = dataset
        pats = ["angry", "nnnn", "acgan", "r", "n", "wsbd", "acga", "t" * 32, "u" * 4]
        for q in pats:
            assert (idx.search_pattern(q) == scan_pattern(kmers, q)).all(), q

    def test_pattern_fully_degenerate_leading(self, dataset):
        # 'nnn...' defeats prefix pruning -> full-range masked compare
        kmers, col, idx = dataset
        for q in ["nacg", "nnra", "nnnnnnnnnn"]:
            assert (idx.search_pattern(q) == scan_pattern(kmers, q)).all(), q


class TestScanPathEquivalence:
    """The vectorized scan path agrees with the scalar oracle on the dataset."""

    def _jcol(self, col):
        return PackedKmers(
            hi=jnp.asarray(col.hi), lo=jnp.asarray(col.lo), length=jnp.asarray(col.length)
        )

    def test_v_equals(self, dataset):
        kmers, col, _ = dataset
        jcol = self._jcol(col)
        q = PackedKmers.single(Kmer("acga"))
        got = np.flatnonzero(
            np.asarray(
                v_equals(
                    jcol,
                    PackedKmers(
                        hi=jnp.uint32(q.hi[0]),
                        lo=jnp.uint32(q.lo[0]),
                        length=jnp.int32(q.length[0]),
                    ),
                )
            )
        )
        assert (got == scan_eq(kmers, "acga")).all()

    def test_v_contains_pattern(self, dataset):
        kmers, col, _ = dataset
        jcol = self._jcol(col)
        masks, qlen = qkmer_mask_vector("angry")
        got = np.flatnonzero(np.asarray(v_contains(jcol, jnp.asarray(masks), qlen)))
        assert (got == scan_pattern(kmers, "angry")).all()


class TestDeviceIndex:
    def test_device_sort_matches_host(self, dataset):
        kmers, col, idx = dataset
        jcol = PackedKmers(
            hi=jnp.asarray(col.hi), lo=jnp.asarray(col.lo), length=jnp.asarray(col.length)
        )
        sorted_col, rid = device_sort_column(jcol)
        from kmer_tpu.codec import join_key64

        dev_keys = join_key64(np.asarray(sorted_col.hi), np.asarray(sorted_col.lo))
        assert (dev_keys == idx.sorted_keys).all()
        assert (np.asarray(sorted_col.length) == idx.sorted_lens).all()

    def test_searchsorted_packed(self, dataset):
        kmers, col, idx = dataset
        jcol = PackedKmers(
            hi=jnp.asarray(col.hi), lo=jnp.asarray(col.lo), length=jnp.asarray(col.length)
        )
        sorted_col, _ = device_sort_column(jcol)
        queries = ["acga", "", "a", "t" * 32, "zzz-not-real"[:0] or "gg", "ca"]
        qcol = PackedKmers.from_strings(queries)
        left = np.asarray(
            searchsorted_packed(
                sorted_col.hi, sorted_col.lo, sorted_col.length,
                jnp.asarray(qcol.hi), jnp.asarray(qcol.lo), jnp.asarray(qcol.length),
                side="left",
            )
        )
        right = np.asarray(
            searchsorted_packed(
                sorted_col.hi, sorted_col.lo, sorted_col.length,
                jnp.asarray(qcol.hi), jnp.asarray(qcol.lo), jnp.asarray(qcol.length),
                side="right",
            )
        )
        for i, q in enumerate(queries):
            want = len(scan_eq(kmers, q))
            assert right[i] - left[i] == want, q


class TestDeviceIndexServing:
    """DeviceIndex: batched device-resident queries == host index == scan."""

    @pytest.fixture(scope="class")
    def didx(self, dataset):
        kmers, col, idx = dataset
        from kmer_tpu.index import DeviceIndex

        jcol = PackedKmers(
            hi=jnp.asarray(col.hi), lo=jnp.asarray(col.lo),
            length=jnp.asarray(col.length),
        )
        return DeviceIndex.build(jcol)

    def test_batched_eq(self, dataset, didx):
        kmers, col, idx = dataset
        queries = ["acga", "", "a", "t" * 32, "gggg", "acgattac"] + kmers[::131]
        qcol = PackedKmers.from_strings(queries)
        left, right = didx.eq_ranges(
            jnp.asarray(qcol.hi), jnp.asarray(qcol.lo), jnp.asarray(qcol.length)
        )
        rows, valid = didx.gather_rows(left, right, cap=16)
        rows, valid = np.asarray(rows), np.asarray(valid)
        for i, q in enumerate(queries):
            got = np.sort(rows[i][valid[i]])
            assert (got == scan_eq(kmers, q)).all(), q

    def test_batched_prefix(self, dataset, didx):
        kmers, col, idx = dataset
        queries = ["ac", "", "a", "t" * 32, "acg", "tttt", "ca", "g"]
        qcol = PackedKmers.from_strings(queries)
        left, right = didx.prefix_ranges(
            jnp.asarray(qcol.hi), jnp.asarray(qcol.lo), jnp.asarray(qcol.length)
        )
        left, right = np.asarray(left), np.asarray(right)
        cap = int((right - left).max()) + 1
        rows, valid = didx.gather_rows(jnp.asarray(left), jnp.asarray(right), cap=cap)
        rows, valid = np.asarray(rows), np.asarray(valid)
        for i, q in enumerate(queries):
            got = np.sort(rows[i][valid[i]])
            want = scan_prefix(kmers, q)
            assert (got == want).all(), (q, len(got), len(want))

    def test_prefix_short_key_exclusion(self, didx, dataset):
        # keys "ac" and "aca" pack identically; prefix "aca" must not
        # return the shorter "ac" (kmer_spgist.c:520-536 length rule)
        kmers, col, idx = dataset
        from kmer_tpu.index import DeviceIndex

        col2 = PackedKmers.from_strings(["ac", "aca", "acaa", "acg", "a"])
        d2 = DeviceIndex.build(
            PackedKmers(
                hi=jnp.asarray(col2.hi), lo=jnp.asarray(col2.lo),
                length=jnp.asarray(col2.length),
            )
        )
        q = PackedKmers.from_strings(["aca"])
        left, right = d2.prefix_ranges(
            jnp.asarray(q.hi), jnp.asarray(q.lo), jnp.asarray(q.length)
        )
        rows, valid = d2.gather_rows(left, right, cap=8)
        got = sorted(np.asarray(rows)[0][np.asarray(valid)[0]].tolist())
        assert got == [1, 2]  # "aca" and "acaa", not "ac"

    def test_batched_pattern(self, dataset, didx):
        kmers, col, idx = dataset
        patterns = ["acgr", "nnnn", "rycw", "acga"]  # shared qlen=4
        masks = np.stack([qkmer_mask_vector(p)[0] for p in patterns])
        rows, hit, truncated = didx.pattern_hits(
            jnp.asarray(masks), qlen=4, cap=len(didx)
        )
        rows, hit = np.asarray(rows), np.asarray(hit)
        assert not np.asarray(truncated).any()
        for i, p in enumerate(patterns):
            got = np.sort(rows[i][hit[i]])
            assert (got == scan_pattern(kmers, p)).all(), p

    def test_pattern_truncation_flag(self, dataset, didx):
        masks = np.stack([qkmer_mask_vector("nnnn")[0]])
        rows, hit, truncated = didx.pattern_hits(jnp.asarray(masks), qlen=4, cap=4)
        assert bool(np.asarray(truncated)[0])


class TestDeviceHashIndex:
    def test_eq_matches_host_index(self, dataset):
        from kmer_tpu.index import DeviceHashIndex

        kmers, col, idx = dataset
        h = DeviceHashIndex.build(col)
        assert h.max_chain >= 1
        queries = list(dict.fromkeys(kmers))[::37] + ["gggg", "c" * 31]
        qcol = PackedKmers.from_strings(queries)
        start, count, found = h.lookup_eq(
            jnp.asarray(qcol.hi), jnp.asarray(qcol.lo), jnp.asarray(qcol.length)
        )
        cap = int(np.asarray(count).max()) or 1
        rows, valid = h.gather_rows(start, count, cap)
        rows, valid = np.asarray(rows), np.asarray(valid)
        for i, q in enumerate(queries):
            want = idx.search_eq(q)
            if want.size == 0:
                assert not bool(np.asarray(found)[i]), q
            else:
                assert bool(np.asarray(found)[i]), q
                got = np.sort(rows[i][valid[i]])
                assert (got == want).all(), q

    def test_duplicate_groups(self):
        from kmer_tpu.index import DeviceHashIndex

        col = PackedKmers.from_strings(["acgt", "acgt", "acgt", "tt", "acg"])
        h = DeviceHashIndex.build(col)
        assert h.n_unique == 3
        q = PackedKmers.from_strings(["acgt"])
        start, count, found = h.lookup_eq(
            jnp.asarray(q.hi), jnp.asarray(q.lo), jnp.asarray(q.length)
        )
        assert bool(found[0]) and int(count[0]) == 3
        rows, valid = h.gather_rows(start, count, 4)
        assert sorted(np.asarray(rows)[0][np.asarray(valid)[0]].tolist()) == [0, 1, 2]

    def test_empty_string_key(self):
        from kmer_tpu.index import DeviceHashIndex

        col = PackedKmers.from_strings(["", "a", ""])
        h = DeviceHashIndex.build(col)
        q = PackedKmers.from_strings([""])
        start, count, found = h.lookup_eq(
            jnp.asarray(q.hi), jnp.asarray(q.lo), jnp.asarray(q.length)
        )
        assert bool(found[0]) and int(count[0]) == 2

    def test_forced_chaining(self):
        # tiny load -> nb small -> collisions force chains; stays exact
        from kmer_tpu.index import DeviceHashIndex

        import random

        rng = random.Random(5)
        ks = list({"".join(rng.choice("acgt") for _ in range(12)) for _ in range(200)})
        col = PackedKmers.from_strings(ks)
        h = DeviceHashIndex.build(col, load=4.0)  # ~25 keys per bucket of 8
        assert h.max_chain > 1
        q = PackedKmers.from_strings(ks)
        start, count, found = h.lookup_eq(
            jnp.asarray(q.hi), jnp.asarray(q.lo), jnp.asarray(q.length)
        )
        assert bool(np.asarray(found).all())
        assert (np.asarray(count) == 1).all()


class TestSearchFence:
    def test_fenced_matches_unfenced(self, dataset):
        from kmer_tpu.index import DeviceIndex, SearchFence

        kmers, col, _ = dataset
        idx = DeviceIndex.build(col)
        fence = idx.build_fence(bits=10)
        assert fence.steps >= 1
        rng = np.random.default_rng(3)
        sel = rng.integers(0, len(kmers), 200)
        qcol = PackedKmers.from_strings([kmers[i] for i in sel])
        qhi, qlo, qln = (
            jnp.asarray(qcol.hi), jnp.asarray(qcol.lo), jnp.asarray(qcol.length)
        )
        for fn in (idx.eq_ranges, idx.prefix_ranges):
            l0, r0 = fn(qhi, qlo, qln)
            l1, r1 = fn(qhi, qlo, qln, fence=fence)
            np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
            np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))

    def test_fence_on_skewed_keys(self):
        from kmer_tpu.index import DeviceIndex

        # all keys share the same top bits -> one giant fence bucket
        ks = ["aaaaaaaaaaaa" + s for s in ("acgt", "cggt", "tttt", "acga", "acgt")]
        col = PackedKmers.from_strings(ks)
        idx = DeviceIndex.build(col)
        fence = idx.build_fence(bits=8)
        q = PackedKmers.from_strings([ks[0], "gggg"])
        l0, r0 = idx.eq_ranges(jnp.asarray(q.hi), jnp.asarray(q.lo), jnp.asarray(q.length))
        l1, r1 = idx.eq_ranges(
            jnp.asarray(q.hi), jnp.asarray(q.lo), jnp.asarray(q.length), fence=fence
        )
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
        np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))


class TestPatternRecovery:
    """search_pattern_batch: exact results despite cap truncation."""

    def test_degenerate_pattern_regrows_cap(self):
        rows = [r[1].lower() for r in generate_test_rows(600, seed=31)]
        rows += ["acga"] * 40  # heavy duplication under one prefix
        col = PackedKmers.from_strings(rows)
        didx = DeviceIndex.build(col)
        host = KmerIndex.build(col)
        # 'nnnn' has no determinate prefix: candidates = whole table
        probes = ["nnnn", "angr", "rygw", "acga", "n"]
        got = didx.search_pattern_batch(probes, cap=4)  # force truncation
        for q, g in zip(probes, got):
            want = host.search_pattern(q)
            assert g.tolist() == want.tolist(), q

    def test_mixed_lengths_and_empty(self):
        col = PackedKmers.from_strings(["", "a", "acga", "acgt", ""])
        didx = DeviceIndex.build(col)
        got = didx.search_pattern_batch(["", "n", "acgn"], cap=1)
        assert got[0].tolist() == [0, 4]
        assert got[1].tolist() == [1]
        assert got[2].tolist() == [2, 3]
