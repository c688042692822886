"""generate_kmers parity tests — golden data from kmer-tests.sql TEST 5."""

import jax.numpy as jnp
import numpy as np
import pytest

from kmer_tpu import Dna, InvalidKmerLengthError, generate_kmers
from kmer_tpu.codec import join_key64, unpack_key64, decode_codes
from kmer_tpu.ops.extract import (
    canonicalize,
    extract_to_strings,
    extract_windows,
    extract_windows_batch,
    revcomp_packed,
)


class TestGenerateKmers:
    def test_k_zero_errors(self):
        # TEST 5.1
        with pytest.raises(InvalidKmerLengthError) as e:
            generate_kmers("ACGT", 0)
        assert str(e.value) == "Invalid KMER Length"

    def test_len_less_than_k_errors(self):
        # TEST 5.2.1
        with pytest.raises(InvalidKmerLengthError):
            generate_kmers("AC", 5)

    def test_k_gt_32_errors(self):
        with pytest.raises(InvalidKmerLengthError):
            generate_kmers("A" * 40, 33)

    def test_negative_k_errors(self):
        with pytest.raises(InvalidKmerLengthError):
            generate_kmers("ACGT", -1)

    def test_order_and_duplicates(self):
        # TEST 5.2.2: 6 windows in order, duplicates preserved
        assert extract_to_strings("ACGTACGT", 3) == [
            "acg", "cgt", "gta", "tac", "acg", "cgt",
        ]

    def test_k_equals_len(self):
        # TEST 5.2.3
        assert extract_to_strings("ACGTACGT", 8) == ["acgtacgt"]

    def test_count_formula(self):
        # len - k + 1 windows (kmer.c:316)
        for n, k in [(10, 3), (32, 32), (50, 1)]:
            assert len(generate_kmers("a" * n, k)) == n - k + 1


class TestVectorizedExtraction:
    def _windows_str(self, seq, k):
        d = Dna(seq)
        hi, lo = extract_windows(jnp.asarray(d.codes), k)
        keys = join_key64(np.asarray(hi), np.asarray(lo))
        return [decode_codes(unpack_key64(key, k)) for key in keys]

    def test_matches_scalar_small_k(self):
        seq = "ACGTACGTTGCAACGT"
        for k in [1, 2, 3, 8, 16]:
            assert self._windows_str(seq, k) == extract_to_strings(seq, k)

    def test_matches_scalar_large_k(self):
        # k > 16 exercises the lo lane
        seq = "ACGTACGTTGCAACGTAGGTCCATTGACGTAC"
        for k in [17, 21, 31, 32]:
            assert self._windows_str(seq, k) == extract_to_strings(seq, k)

    def test_batch_extraction_valid_mask(self):
        seqs = ["ACGTACGT", "ACGT", "ACGTA"]
        k = 4
        width = 8
        codes = np.zeros((3, width), np.uint8)
        lens = np.array([8, 4, 5], np.int32)
        for i, s in enumerate(seqs):
            codes[i, : len(s)] = Dna(s).codes
        wins, valid = extract_windows_batch(jnp.asarray(codes), jnp.asarray(lens), k)
        valid = np.asarray(valid)
        assert valid.sum(axis=1).tolist() == [5, 1, 2]
        keys = join_key64(np.asarray(wins.hi), np.asarray(wins.lo))
        for i, s in enumerate(seqs):
            want = extract_to_strings(s, k)
            got = [
                decode_codes(unpack_key64(keys[i, j], k))
                for j in range(valid.shape[1])
                if valid[i, j]
            ]
            assert got == want


class TestRevcomp:
    def _rc_str(self, s):
        comp = {"a": "t", "c": "g", "g": "c", "t": "a"}
        return "".join(comp[c] for c in reversed(s.lower()))

    def test_revcomp_matches_string_rc(self):
        for s in ["a", "acgt", "acgtacgtacgtacgta", "g" * 32, "ttagcc"]:
            k = len(s)
            hi, lo = extract_windows(jnp.asarray(Dna(s).codes), k)
            rh, rl = revcomp_packed(hi, lo, k)
            key = join_key64(np.asarray(rh), np.asarray(rl))[0]
            assert decode_codes(unpack_key64(key, k)) == self._rc_str(s)

    def test_canonical_is_min(self):
        for s in ["acgt", "ttta", "gggcc", "acgtacgtacgtacgtacgta"]:
            k = len(s)
            hi, lo = extract_windows(jnp.asarray(Dna(s).codes), k)
            ch, cl = canonicalize(hi, lo, k)
            key = join_key64(np.asarray(ch), np.asarray(cl))[0]
            got = decode_codes(unpack_key64(key, k))
            assert got == min(s.lower(), self._rc_str(s))

    def test_canonical_idempotent_on_palindrome(self):
        s = "acgt"  # its own revcomp
        hi, lo = extract_windows(jnp.asarray(Dna(s).codes), 4)
        ch, cl = canonicalize(hi, lo, 4)
        assert int(ch[0]) == int(hi[0]) and int(cl[0]) == int(lo[0])


class TestPackedWordExtraction:
    def test_matches_flat_extraction(self):
        import collections

        from kmer_tpu.native import pack2bit_rows
        from kmer_tpu.ops.extract import extract_from_words, phase_major_valid
        from kmer_tpu.codec import join_key64

        rng = np.random.default_rng(0)
        n_reads, L = 6, 50
        reads = rng.integers(0, 4, (n_reads, L), np.uint8)
        stream = reads.reshape(-1)
        words = pack2bit_rows(stream[None, :])[0]
        for k in [1, 5, 16, 17, 21, 32]:
            hi, lo = extract_from_words(jnp.asarray(words), k)
            valid = phase_major_valid(words.size, L, n_reads, k)
            got = collections.Counter()
            keys = join_key64(np.asarray(hi), np.asarray(lo))
            v = np.asarray(valid)
            for r in range(16):
                for w in range(words.size):
                    if v[r, w]:
                        got[int(keys[r, w])] += 1
            want = collections.Counter()
            for row in reads:
                h2, l2 = extract_windows(jnp.asarray(row), k)
                for key in join_key64(np.asarray(h2), np.asarray(l2)):
                    want[int(key)] += 1
            assert got == want, k
