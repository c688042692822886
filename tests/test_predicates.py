"""Predicate parity tests — golden data from kmer-tests.sql TESTs 6-11."""

import jax.numpy as jnp
import numpy as np

from kmer_tpu import (
    Kmer,
    PackedKmers,
    Qkmer,
    contains,
    containing,
    equals,
    kmer_hash,
    starts_with,
    starts_with_op,
)
from kmer_tpu.ops.predicates import (
    qkmer_mask_vector,
    v_contains,
    v_equals,
    v_hash,
    v_starts_with,
)


class TestEquals:
    def test_basic(self):
        # TEST 6.1 / 7.1
        assert equals("ACGTACGT", "ACGTACGT") is True

    def test_nulls_propagate(self):
        # TEST 6.2 / 7.2: STRICT semantics -> None
        assert equals(None, "ACGTA") is None
        assert equals(None, None) is None
        assert equals("", None) is None

    def test_empty(self):
        # TEST 6.3 / 7.3: '' = '' -> true ; TEST 6.4 / 7.4: 'a' = '' -> false
        assert equals("", "") is True
        assert equals("A", "") is False

    def test_length_sensitive(self):
        assert equals("acg", "acgt") is False


class TestStartsWith:
    def test_basic(self):
        # TEST 8.1: starts_with(prefix, kmer)
        assert starts_with("ACG", "ACGTACGT") is True

    def test_nulls(self):
        # TEST 8.2
        assert starts_with(None, "ACGT") is None
        assert starts_with("ACGT", None) is None

    def test_empty_prefix(self):
        # TEST 8.3: starts_with('', 'AGT') -> true
        assert starts_with("", "AGT") is True

    def test_prefix_longer_than_kmer(self):
        # TEST 8.4: starts_with('ACGTACGT', 'AC') -> false
        assert starts_with("ACGTACGT", "AC") is False

    def test_op_swapped_args(self):
        # TEST 9.1/9.2: kmer ^@ prefix
        assert starts_with_op("ACGTACGT", "ACG") is True
        assert starts_with_op("ACGT", "AC") is True
        # TEST 9.4: '' ^@ 'AGT' -> false
        assert starts_with_op("", "AGT") is False
        # TEST 9.5: 'AC' ^@ 'ACGTACGT' -> false
        assert starts_with_op("AC", "ACGTACGT") is False
        # TEST 9.3
        assert starts_with_op(None, "ACGT") is None
        assert starts_with_op("ACGT", None) is None


class TestContains:
    def test_basic(self):
        # TEST 10.1: contains('ACNTANGT', 'ACGTACGT') -> true
        assert contains("ACNTANGT", "ACGTACGT") is True

    def test_nulls(self):
        # TEST 10.2
        assert contains(None, "ACGT") is None
        assert contains("ACGT", None) is None

    def test_empty_qkmer_vs_nonempty(self):
        # TEST 10.3: contains('', 'AGT') -> FALSE (length mismatch)
        assert contains("", "AGT") is False
        assert contains("", "") is True

    def test_length_mismatch(self):
        # TEST 10.4 / 11.1 / 11.2 / 11.5
        assert contains("ACGTACGT", "AC") is False
        assert contains("ACG", "ACGTACGT") is False
        assert contains("ACGT", "AC") is False

    def test_iupac_degenerate(self):
        # TEST 11.6: 'RCGT' @> 'ACGT' -> true
        assert contains("RCGT", "ACGT") is True
        # 'angry' example (TEST 10.6): a [acgt] g [ag] [ct]
        assert contains("ANGRY", "AGGGT") is True
        assert contains("ANGRY", "AAGAT") is True
        assert contains("ANGRY", "ATGAT") is True
        assert contains("ANGRY", "ACGTT") is False  # pos 3 't' not in r={a,g}

    def test_u_matches_nothing(self):
        # Reference quirk (kmer.h:50-51): 'u' accepted on input, matches nothing
        assert str(Qkmer("U")) == "u"
        assert contains("U", "A") is False
        assert contains("U", "C") is False
        assert contains("U", "G") is False
        assert contains("U", "T") is False

    def test_containing_swapped(self):
        assert containing("ACGT", "RCGT") is True
        assert containing("ACGT", "") is False
        assert containing(None, "ACGT") is None


class TestIupacTable:
    def test_every_code_against_every_base(self):
        # Exhaustive check of the mask table vs the reference switch (kmer.h:21-53)
        expected = {
            "a": "a", "c": "c", "g": "g", "t": "t",
            "r": "ag", "y": "ct", "k": "gt", "m": "ac",
            "s": "cg", "w": "at", "b": "cgt", "d": "agt",
            "h": "act", "v": "acg", "n": "acgt", "u": "",
        }
        for pat, allowed in expected.items():
            for base in "acgt":
                assert contains(pat, base) is (base in allowed), (pat, base)


class TestVectorized:
    def _col(self, strs):
        col = PackedKmers.from_strings(strs)
        return PackedKmers(
            hi=jnp.asarray(col.hi), lo=jnp.asarray(col.lo), length=jnp.asarray(col.length)
        )

    def test_v_equals_matches_scalar(self):
        strs = ["acga", "acg", "", "acgt" * 8, "tttt", "acga"]
        col = self._col(strs)
        q = PackedKmers.single(Kmer("ACGA"))
        got = np.asarray(v_equals(col, PackedKmers(
            hi=jnp.uint32(q.hi[0]), lo=jnp.uint32(q.lo[0]), length=jnp.int32(q.length[0])
        )))
        want = np.array([equals(s, "acga") for s in strs])
        assert (got == want).all()

    def test_v_starts_with_matches_scalar(self):
        strs = ["acga", "acg", "", "ac", "acgattacaa", "tacga", "a" * 32]
        col = self._col(strs)
        for prefix in ["", "a", "acga", "acgat", "t" * 20]:
            q = PackedKmers.single(Kmer(prefix))
            got = np.asarray(
                v_starts_with(
                    col,
                    PackedKmers(
                        hi=jnp.uint32(q.hi[0]),
                        lo=jnp.uint32(q.lo[0]),
                        length=jnp.int32(q.length[0]),
                    ),
                )
            )
            want = np.array([starts_with_op(s, prefix) for s in strs])
            assert (got == want).all(), prefix

    def test_v_contains_matches_scalar(self):
        strs = ["agggt", "aagac", "aagat", "atgat", "acgtt", "angry"[:0] or "aaaaa", "ag"]
        col = self._col(strs)
        for pat in ["ANGRY", "NNNNN", "acgtr", "u" * 5, ""]:
            masks, qlen = qkmer_mask_vector(pat)
            got = np.asarray(v_contains(col, jnp.asarray(masks), qlen))
            want = np.array([contains(pat, s) for s in strs])
            assert (got == want).all(), pat

    def test_v_contains_positions_past_16(self):
        # exercise the lo lane (positions 16..31)
        base = "acgtacgtacgtacgt"  # 16
        strs = [base + "acgt", base + "tcgt", base + "aaaa"]
        col = self._col(strs)
        pat = base + "rcgt"
        masks, qlen = qkmer_mask_vector(pat)
        got = np.asarray(v_contains(col, jnp.asarray(masks), qlen))
        want = np.array([contains(pat, s) for s in strs])
        assert (got == want).all()

    def test_hash_consistency(self):
        # host and device hashes agree; equal kmers hash equal
        strs = ["", "a", "acga", "acgt" * 8, "t" * 32]
        col = self._col(strs)
        dev = np.asarray(v_hash(col))
        host = np.array([kmer_hash(s) for s in strs], dtype=np.int32)
        assert (dev == host).all()
        assert kmer_hash("ACGA") == kmer_hash("acga")
        assert kmer_hash("acga") != kmer_hash("acg")
