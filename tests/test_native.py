"""Native C loader vs numpy fallback equivalence."""

import numpy as np
import pytest

from kmer_tpu import codec
from kmer_tpu.errors import InvalidDnaSequenceError
from kmer_tpu.native import (
    _fasta_encode_py,
    _fastq_encode_py,
    encode_dna_fast,
    encode_skip_invalid,
    fasta_encode,
    fastq_encode,
    native_available,
)

FASTA = b""">read1 desc
ACGTACGT
TTGG
>read2
acgt
>empty

>read3
NNACGTNN
"""


class TestNativeEncode:
    def test_available(self):
        # the image ships cc; the native path should build
        assert native_available()

    def test_encode_matches_codec(self):
        rng = np.random.default_rng(0)
        s = rng.choice(np.frombuffer(b"ACGTacgt", np.uint8), 10000).tobytes()
        np.testing.assert_array_equal(encode_dna_fast(s), codec.encode_dna(s))

    def test_encode_invalid_raises(self):
        with pytest.raises(InvalidDnaSequenceError):
            encode_dna_fast(b"ACGTNACGT")

    def test_encode_skip(self):
        out = encode_skip_invalid(b"NNAcGtNN")
        np.testing.assert_array_equal(out, np.array([0, 1, 2, 3], np.uint8))


class TestFasta:
    def test_parse(self):
        codes, offsets = fasta_encode(FASTA)
        assert offsets.tolist() == [0, 12, 16, 16, 20]
        reads = [
            codec.decode_codes(codes[offsets[i] : offsets[i + 1]])
            for i in range(len(offsets) - 1)
        ]
        assert reads == ["acgtacgtttgg", "acgt", "", "acgt"]

    def test_native_matches_python(self):
        n_codes, n_off = fasta_encode(FASTA)
        p_codes, p_off = _fasta_encode_py(FASTA, skip_invalid=True)
        np.testing.assert_array_equal(n_codes, p_codes)
        np.testing.assert_array_equal(n_off, p_off)

    def test_strict_mode_raises(self):
        with pytest.raises(InvalidDnaSequenceError):
            fasta_encode(b">r\nACGTN\n", skip_invalid=False)

    def test_headerless_plain_sequence(self):
        codes, offsets = fasta_encode(b"ACGT\nACGT\n")
        assert offsets.tolist() == [0, 8]


# quality line of read1 starts with '@' — must not be parsed as a header
FASTQ = b"""@read1 desc
ACGTACGT
+
@IIIIIII
@read2
acgtNN
+read2
IIIIII
"""


class TestFastq:
    def test_parse(self):
        codes, offsets = fastq_encode(FASTQ)
        assert offsets.tolist() == [0, 8, 12]
        reads = [
            codec.decode_codes(codes[offsets[i] : offsets[i + 1]])
            for i in range(len(offsets) - 1)
        ]
        assert reads == ["acgtacgt", "acgt"]

    def test_native_matches_python(self):
        n_codes, n_off = fastq_encode(FASTQ)
        p_codes, p_off = _fastq_encode_py(FASTQ, skip_invalid=True)
        np.testing.assert_array_equal(n_codes, p_codes)
        np.testing.assert_array_equal(n_off, p_off)

    def test_strict_mode_raises(self):
        with pytest.raises(InvalidDnaSequenceError):
            fastq_encode(b"@r\nACGTN\n+\nIIIII\n", skip_invalid=False)

    def test_bad_record_raises(self):
        with pytest.raises(InvalidDnaSequenceError):
            fastq_encode(b"ACGT\n")  # no @header

    def test_crlf(self):
        codes, offsets = fastq_encode(b"@r\r\nACGT\r\n+\r\nIIII\r\n")
        assert offsets.tolist() == [0, 4]
        assert codec.decode_codes(codes) == "acgt"


class TestPack2Bit:
    def test_roundtrip_via_device_unpack(self):
        import jax.numpy as jnp

        from kmer_tpu.native import device_unpack_rows, pack2bit_rows

        rng = np.random.default_rng(1)
        for L in [1, 15, 16, 17, 50, 150]:
            codes = rng.integers(0, 4, (5, L), np.uint8)
            w = pack2bit_rows(codes)
            assert w.shape == (5, (L + 15) // 16)
            back = np.asarray(device_unpack_rows(jnp.asarray(w), L))
            np.testing.assert_array_equal(back, codes)

    def test_matches_native_c(self):
        import ctypes

        from kmer_tpu.native import _load, pack2bit_rows

        lib = _load()
        if lib is None:
            pytest.skip("no native lib")
        rng = np.random.default_rng(2)
        codes = rng.integers(0, 4, 100, np.uint8)
        out = np.zeros(7, np.uint32)
        lib.kn_pack2bit(
            codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            100,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        )
        np.testing.assert_array_equal(out, pack2bit_rows(codes[None, :])[0])
