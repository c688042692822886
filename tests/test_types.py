"""Type layer parity tests — golden data from kmer-tests.sql TESTs 1-4."""

import numpy as np
import pytest

from kmer_tpu import (
    Dna,
    InvalidDnaSequenceError,
    InvalidQkmerSequenceError,
    Kmer,
    KmerTooLongError,
    Qkmer,
    QkmerTooLongError,
    length,
)


class TestDna:
    def test_valid_lowercased(self):
        # TEST 1.1 (kmer-tests.sql:12-17)
        assert str(Dna("AAAACCCCGGGGTTTT")) == "aaaaccccggggtttt"
        assert str(Dna("ACGTTGCA")) == "acgttgca"

    def test_invalid_character(self):
        # TEST 1.2 (kmer-tests.sql:32-39)
        with pytest.raises(InvalidDnaSequenceError) as e:
            Dna("ACGTN")
        assert str(e.value) == "Invalid DNA Sequence"
        assert e.value.detail == "Valid characters are A, C, G, T (case-insensitive)."

    def test_unbounded_length(self):
        s = "acgt" * 100
        assert str(Dna(s)) == s
        assert len(Dna(s)) == 400

    def test_empty(self):
        assert str(Dna("")) == ""
        assert len(Dna("")) == 0


class TestKmer:
    def test_valid_32(self):
        # TEST 2.1 (kmer-tests.sql:51-57)
        assert (
            str(Kmer("AAAACCCCGGGGTTTTAAAACCCCGGGGTTTT"))
            == "aaaaccccggggttttaaaaccccggggtttt"
        )
        assert str(Kmer("GATTACA")) == "gattaca"

    def test_too_long(self):
        # TEST 2.2 (kmer-tests.sql:70-77): 33 chars
        with pytest.raises(KmerTooLongError) as e:
            Kmer("AAAAAAAACCCCCCCCGGGGGGGGTTTTTTTTT")
        assert str(e.value) == "KMer Sequence larger than length 32"

    def test_length_check_precedes_alphabet_check(self):
        # kmer_in checks length before validate_sequence (kmer.c:115-122)
        with pytest.raises(KmerTooLongError):
            Kmer("N" * 33)

    def test_invalid_character(self):
        # TEST 2.3 (kmer-tests.sql:83-90)
        with pytest.raises(InvalidDnaSequenceError):
            Kmer("AGTCN")

    def test_empty(self):
        assert str(Kmer("")) == ""
        assert Kmer("") == Kmer("")

    def test_packing_roundtrip(self):
        for s in ["", "a", "t", "acgt", "g" * 32, "acgtacgtacgtacgtacgtacgtacgtacgt"]:
            km = Kmer(s)
            assert str(Kmer.from_key64(km.key64, len(km))) == s

    def test_packing_preserves_order(self):
        strs = ["", "a", "aa", "ac", "acgt", "c", "ca", "t" * 32, "g" * 16]
        packed = sorted((int(Kmer(s).key64), len(s)) for s in strs)
        by_str = sorted(strs)
        unpacked = [
            str(Kmer.from_key64(np.uint64(k), ln)) for k, ln in packed
        ]
        assert unpacked == by_str


class TestQkmer:
    def test_valid(self):
        # TEST 3.1 (kmer-tests.sql:99-105)
        assert str(Qkmer("ACGT")) == "acgt"
        assert (
            str(Qkmer("AAAAAAAACCCCCCCCGGGGGGGGTTTTTTTT"))
            == "aaaaaaaaccccccccggggggggtttttttt"
        )

    def test_all_iupac_roundtrip(self):
        s = "acgturykmswbdhvn"
        assert str(Qkmer(s.upper())) == s

    def test_too_long(self):
        # TEST 3.2 (kmer-tests.sql:121-127)
        with pytest.raises(QkmerTooLongError) as e:
            Qkmer("AAAAAAAACCCCCCCCGGGGGGGGTTTTTTTTT")
        assert str(e.value) == "QKMer Sequence larger than length 32"

    def test_invalid_character(self):
        # TEST 3.2b (kmer-tests.sql:131-138)
        with pytest.raises(InvalidQkmerSequenceError) as e:
            Qkmer("ACGT123")
        assert str(e.value) == "Invalid QKMer Sequence"

    def test_length_check_precedes_alphabet_check(self):
        with pytest.raises(QkmerTooLongError):
            Qkmer("1" * 33)


class TestLength:
    def test_basic(self):
        # TEST 4.1 (kmer-tests.sql:148-154)
        assert length(Dna("ACGTACGT")) == 8
        assert length(Kmer("ACGTACGT")) == 8
        assert length(Qkmer("RYN")) == 3

    def test_empty(self):
        # TEST 4.2 (kmer-tests.sql:168-176)
        assert length(Dna("")) == 0
        assert length(Kmer("")) == 0
        assert length(Qkmer("")) == 0
