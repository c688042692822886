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


class TestMtParsers:
    """Multithreaded parsers == sequential parsers, byte-identical."""

    def _gen_fasta(self, n_reads, seed):
        rng = np.random.default_rng(seed)
        parts = []
        for i in range(n_reads):
            ln = int(rng.integers(30, 400))
            seq = bytes(rng.choice(np.frombuffer(b"ACGTacgtN", np.uint8), ln))
            parts.append(b">read%d some description\n" % i)
            # multi-line records with \r\n mixed in
            parts.append(seq[: ln // 2] + b"\r\n" + seq[ln // 2 :] + b"\n")
        return b"".join(parts)

    def _gen_fastq(self, n_reads, seed):
        rng = np.random.default_rng(seed)
        parts = []
        for i in range(n_reads):
            ln = int(rng.integers(30, 200))
            seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), ln))
            # quality lines deliberately start with '@' half the time
            q = (b"@" if i % 2 else b"I") + b"I" * (ln - 1)
            parts.append(b"@r%d\n%s\n+\n%s\n" % (i, seq, q))
        return b"".join(parts)

    def test_fasta_mt_matches_sequential(self):
        import ctypes

        from kmer_tpu import native

        lib = native._load()
        if lib is None:
            pytest.skip("no native toolchain")
        data = self._gen_fasta(12000, seed=0)  # ~3 MB: engages threading
        assert len(data) > (1 << 20)

        def run(fn, *extra):
            n = len(data)
            codes = np.empty(n, np.uint8)
            offs = np.empty(1 << 20, np.int64)
            r = fn(data, n,
                   codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                   offs.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
                   1 << 20, 1, *extra)
            assert r >= 0
            total = int(offs[r])
            return codes[:total].copy(), offs[: r + 1].copy()

        c1, o1 = run(lib.kn_fasta_encode)
        c8, o8 = run(lib.kn_fasta_encode_mt, 8)
        assert np.array_equal(o1, o8)
        assert np.array_equal(c1, c8)

    def test_fastq_mt_matches_sequential(self):
        import ctypes

        from kmer_tpu import native

        lib = native._load()
        if lib is None:
            pytest.skip("no native toolchain")
        data = self._gen_fastq(20000, seed=1)  # '@'-leading quality lines
        assert len(data) > (1 << 20)

        def run(fn, *extra):
            n = len(data)
            codes = np.empty(n, np.uint8)
            offs = np.empty(1 << 20, np.int64)
            r = fn(data, n,
                   codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                   offs.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
                   1 << 20, 1, *extra)
            assert r >= 0
            total = int(offs[r])
            return codes[:total].copy(), offs[: r + 1].copy()

        c1, o1 = run(lib.kn_fastq_encode)
        for t in (2, 5, 8):
            ct, ot = run(lib.kn_fastq_encode_mt, t)
            assert np.array_equal(o1, ot), t
            assert np.array_equal(c1, ct), t

    def test_fastq_mt_huge_final_record_at_quality_line(self):
        """A chunk split landing inside one huge final record whose quality
        line starts with '@' (Phred 31) must not emit a phantom read.

        Regression for the fastq_boundary j >= n acceptance: with the
        last record larger than n/threads, every split lands inside it
        and the '@'-leading quality line near EOF used to validate as a
        record start (no '+' line follows within the buffer)."""
        import ctypes

        from kmer_tpu import native

        lib = native._load()
        if lib is None:
            pytest.skip("no native toolchain")
        rng = np.random.default_rng(7)
        small = self._gen_fastq(5000, seed=7)
        ln = 1 << 20  # one ~2 MB final record: exceeds n/threads for all t
        seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), ln))
        q = b"@" + b"I" * (ln - 1)  # '@'-leading quality line (Phred 31)
        data = small + b"@huge read\n%s\n+\n%s\n" % (seq, q)

        def run(fn, *extra):
            n = len(data)
            codes = np.empty(n, np.uint8)
            offs = np.empty(1 << 20, np.int64)
            r = fn(data, n,
                   codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                   offs.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
                   1 << 20, 1, *extra)
            assert r >= 0
            total = int(offs[r])
            return r, codes[:total].copy(), offs[: r + 1].copy()

        r1, c1, o1 = run(lib.kn_fastq_encode)
        assert r1 == 5001
        for t in (2, 3, 8):
            rt, ct, ot = run(lib.kn_fastq_encode_mt, t)
            assert rt == r1, t
            assert np.array_equal(o1, ot), t
            assert np.array_equal(c1, ct), t

    def test_mt_via_python_api(self, monkeypatch):
        from kmer_tpu.native import fasta_encode, fastq_encode, native_available

        if not native_available():
            pytest.skip("no native toolchain")
        monkeypatch.setenv("KMER_TPU_PARSE_THREADS", "8")
        fa = self._gen_fasta(6000, seed=2)
        codes, offs = fasta_encode(fa)
        monkeypatch.setenv("KMER_TPU_PARSE_THREADS", "1")
        codes1, offs1 = fasta_encode(fa)
        assert np.array_equal(codes, codes1) and np.array_equal(offs, offs1)
        fq = self._gen_fastq(8000, seed=3)
        monkeypatch.setenv("KMER_TPU_PARSE_THREADS", "8")
        codes, offs = fastq_encode(fq)
        monkeypatch.setenv("KMER_TPU_PARSE_THREADS", "1")
        codes1, offs1 = fastq_encode(fq)
        assert np.array_equal(codes, codes1) and np.array_equal(offs, offs1)

    def test_mt_invalid_base_strict(self):
        import ctypes

        from kmer_tpu import native

        lib = native._load()
        if lib is None:
            pytest.skip("no native toolchain")
        data = self._gen_fasta(12000, seed=4)
        bad = bytearray(data)
        # inject an invalid byte inside a sequence line of a late record
        idx = data.rindex(b"\n>") - 5
        bad[idx : idx + 1] = b"X"
        n = len(bad)
        codes = np.empty(n, np.uint8)
        offs = np.empty(1 << 20, np.int64)
        r = lib.kn_fasta_encode_mt(
            bytes(bad), n,
            codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            1 << 20, 0, 8)
        r1 = lib.kn_fasta_encode(
            bytes(bad), n,
            codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            1 << 20, 0)
        assert r == r1 < 0  # same error index as the sequential scan
