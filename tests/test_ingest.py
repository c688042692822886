"""Out-of-core chunked ingestion (io/ingest.py) vs the whole-file parse.

The contract (VERDICT r3 missing #2): a file streamed through bounded
record-aligned windows must produce byte-identical reads — and therefore
byte-identical count tables and fixed-shape batch sequences — to the
whole-file path, at peak memory ~one window.
"""

import gzip

import numpy as np
import pytest

from kmer_tpu.io.ingest import ReadPool, iter_encoded_chunks, iter_record_chunks
from kmer_tpu.native import fasta_encode, fastq_encode, record_boundary

BASES = "acgt"


def _rand_reads(rng, n, lo=30, hi=180):
    return ["".join(rng.choice(list("ACGT"), rng.integers(lo, hi)))
            for _ in range(n)]


def _fasta_bytes(reads, wrap=None):
    out = []
    for i, r in enumerate(reads):
        out.append(f">read{i} desc\n")
        if wrap:
            out.extend(r[j : j + wrap] + "\n" for j in range(0, len(r), wrap))
        else:
            out.append(r + "\n")
    return "".join(out).encode()


def _fastq_bytes(reads, qual_char="@"):
    # quality lines deliberately START with '@' (Phred 31) — the classic
    # boundary-scanner trap
    out = []
    for i, r in enumerate(reads):
        out.append(f"@read{i}\n{r}\n+\n{qual_char * len(r)}\n")
    return "".join(out).encode()


def _decode_all(codes, offs):
    return [
        "".join(BASES[b] for b in codes[offs[i] : offs[i + 1]])
        for i in range(offs.size - 1)
    ]


class TestRecordChunks:
    @pytest.mark.parametrize("fmt,maker,enc", [
        ("fasta", _fasta_bytes, fasta_encode),
        ("fastq", _fastq_bytes, fastq_encode),
    ])
    def test_chunked_reads_equal_whole_file(self, tmp_path, fmt, maker, enc):
        rng = np.random.default_rng(0)
        reads = _rand_reads(rng, 400)
        data = maker(reads)
        p = tmp_path / f"r.{fmt}"
        p.write_bytes(data)

        whole = _decode_all(*enc(data))
        for chunk_bytes in (513, 4096, 1 << 20):
            got = []
            for c, o in iter_encoded_chunks(str(p), fmt, chunk_bytes):
                got.extend(_decode_all(c, o))
            assert got == whole, chunk_bytes

    def test_multiline_fasta(self, tmp_path):
        rng = np.random.default_rng(1)
        reads = _rand_reads(rng, 120, lo=100, hi=400)
        data = _fasta_bytes(reads, wrap=60)
        p = tmp_path / "wrapped.fasta"
        p.write_bytes(data)
        whole = _decode_all(*fasta_encode(data))
        got = []
        for c, o in iter_encoded_chunks(str(p), "fasta", 777):
            got.extend(_decode_all(c, o))
        assert got == whole

    def test_gz_stream(self, tmp_path):
        rng = np.random.default_rng(2)
        reads = _rand_reads(rng, 200)
        data = _fastq_bytes(reads)
        p = tmp_path / "r.fastq.gz"
        p.write_bytes(gzip.compress(data))
        whole = _decode_all(*fastq_encode(data))
        got = []
        for c, o in iter_encoded_chunks(str(p), "fastq", 2048):
            got.extend(_decode_all(c, o))
        assert got == whole

    def test_record_larger_than_chunk(self, tmp_path):
        rng = np.random.default_rng(3)
        big = "".join(rng.choice(list("ACGT"), 50_000))
        reads = ["ACGTACGT", big, "TTTTCCCC"]
        data = _fasta_bytes(reads, wrap=80)
        p = tmp_path / "big.fasta"
        p.write_bytes(data)
        whole = _decode_all(*fasta_encode(data))
        got = []
        for c, o in iter_encoded_chunks(str(p), "fasta", 1024):
            got.extend(_decode_all(c, o))
        assert got == whole

    def test_windows_cover_file_exactly(self, tmp_path):
        data = _fastq_bytes(_rand_reads(np.random.default_rng(4), 100))
        p = tmp_path / "c.fastq"
        p.write_bytes(data)
        windows = list(iter_record_chunks(str(p), "fastq", 1000))
        assert b"".join(windows) == data
        # every window starts at a validated record boundary
        for w in windows:
            assert w.startswith(b"@")

    def test_boundary_rejects_quality_at(self):
        """A '@'-leading quality line must not be taken as a record."""
        data = _fastq_bytes(["ACGTACGTAC"], qual_char="@")
        # position 1 is inside the header; the next record start is EOF
        b = record_boundary(data, 1, "fastq")
        assert b == len(data)


class TestChunkedFeedParity:
    def test_cli_batches_count_parity(self, tmp_path):
        from collections import Counter

        from kmer_tpu.cli import _reads_file_batches

        rng = np.random.default_rng(5)
        reads = _rand_reads(rng, 300, lo=12, hi=90)
        p = tmp_path / "r.fasta"
        p.write_bytes(_fasta_bytes(reads))

        def count(batches, k=7):
            c = Counter()
            for rows, lens in batches:
                for row, ln in zip(rows, lens):
                    s = "".join(BASES[b] for b in row[: int(ln)])
                    for i in range(max(0, int(ln) - k + 1)):
                        c[s[i : i + k]] += 1
            return c

        big = count(_reads_file_batches(str(p), "fasta", 7, batch=64,
                                        chunk_bytes=1 << 30))
        small = count(_reads_file_batches(str(p), "fasta", 7, batch=64,
                                          chunk_bytes=997))
        oracle = Counter()
        for r in reads:
            s = r.lower()
            for i in range(len(s) - 6):
                oracle[s[i : i + 7]] += 1
        assert big == oracle
        assert small == oracle

    def test_fixed_batches_byte_identical(self, tmp_path):
        """file_batches_fixed must emit the SAME batch sequence chunked
        as unchunked (reads are whole within windows, split_long_reads
        is per-read, order preserved)."""
        from kmer_tpu.parallel.driver import file_batches_fixed

        rng = np.random.default_rng(6)
        reads = _rand_reads(rng, 150, lo=20, hi=600)
        p = tmp_path / "r.fastq"
        p.write_bytes(_fastq_bytes(reads))

        a = list(file_batches_fixed(str(p), "fastq", 9, batch=32, width=128,
                                    chunk_bytes=1 << 30))
        b = list(file_batches_fixed(str(p), "fastq", 9, batch=32, width=128,
                                    chunk_bytes=1499))
        assert len(a) == len(b)
        for (ra, la), (rb, lb) in zip(a, b):
            np.testing.assert_array_equal(ra, rb)
            np.testing.assert_array_equal(la, lb)


class TestReadPool:
    def test_keep_only_compacts(self):
        pool = ReadPool()
        codes = np.arange(20, dtype=np.uint8) % 4
        offs = np.asarray([0, 5, 9, 14, 20], np.int64)
        pool.add(codes, offs)
        stream, starts, lens = pool.merged()
        pool.keep_only(stream, starts, lens, np.asarray([1, 3]))
        s2, st2, ln2 = pool.merged()
        assert pool.n_reads == 2
        np.testing.assert_array_equal(ln2, [4, 6])
        np.testing.assert_array_equal(s2[st2[0] : st2[0] + 4], codes[5:9])
        np.testing.assert_array_equal(s2[st2[1] : st2[1] + 6], codes[14:20])
