"""Streaming / sharded-query tests."""

import collections

import numpy as np
import pytest

from kmer_tpu.codec import decode_codes
from kmer_tpu.ops.extract import extract_to_strings
from kmer_tpu.packed import PackedKmers
from kmer_tpu.streaming import count_long_sequence, count_read_stream, iter_chunks_with_overlap


class TestChunkIterator:
    def test_covers_every_window_once(self):
        rng = np.random.default_rng(0)
        codes = rng.integers(0, 4, 1000, np.uint8)
        k = 7
        total = 0
        for part, n_new in iter_chunks_with_overlap(codes, chunk=128, k=k):
            assert part.size >= k
            total += part.size - k + 1
        assert total == 1000 - k + 1

    def test_short_sequence(self):
        assert list(iter_chunks_with_overlap(np.zeros(3, np.uint8), 128, 5)) == []


class TestLongSequence:
    def test_matches_oracle(self):
        rng = np.random.default_rng(3)
        codes = rng.integers(0, 4, 5000, np.uint8)
        k = 9
        table = count_long_sequence(codes, k, chunk=512)
        want = collections.Counter(extract_to_strings(decode_codes(codes), k))
        assert table.to_dict() == dict(want)

    def test_resumable(self, tmp_path):
        from kmer_tpu.utils.checkpoint import ResumableCount

        rng = np.random.default_rng(4)
        codes = rng.integers(0, 4, 2000, np.uint8)
        k = 5
        path = str(tmp_path / "s.npz")
        rc = ResumableCount(path)
        # simulate a crash after 2 chunks by limiting iteration manually
        it = iter_chunks_with_overlap(codes, 256, k)
        import jax.numpy as jnp

        from kmer_tpu.ops.count import count_kmers_jit

        for i, (part, _) in enumerate(it):
            if i >= 2:
                break
            buf = np.zeros((1, 256), np.uint8)
            buf[0, : part.size] = part
            rc.update(i, count_kmers_jit(jnp.asarray(buf), jnp.asarray([part.size], np.int32), k, False))
        rc.checkpoint()

        rc2 = ResumableCount(path)
        table = count_long_sequence(codes, k, chunk=256, resumable=rc2)
        want = collections.Counter(extract_to_strings(decode_codes(codes), k))
        assert table.to_dict() == dict(want)


class TestReadStream:
    def test_matches_oracle(self):
        rng = np.random.default_rng(5)
        batches = []
        want = collections.Counter()
        k = 6
        for _ in range(3):
            codes = rng.integers(0, 4, (16, 30), np.uint8)
            lengths = np.full(16, 30, np.int32)
            batches.append((codes, lengths))
            for row in codes:
                want.update(extract_to_strings(decode_codes(row), k))
        table = count_read_stream(iter(batches), k)
        assert table.to_dict() == dict(want)


class TestShardedQuery:
    def test_filter_sharded_matches_scan(self):
        import jax

        from kmer_tpu.parallel.mesh import make_mesh
        from kmer_tpu.parallel.query import filter_sharded
        from kmer_tpu.io import generate_test_rows

        mesh = make_mesh((8, 1), jax.devices()[:8])
        kmers = [r[1].lower() for r in generate_test_rows(501, seed=8)]  # 501 % 8 != 0
        kmers += ["acga", "acgatt"]
        col = PackedKmers.from_strings(kmers)

        from kmer_tpu.ops.predicates import contains, equals, starts_with_op

        got = filter_sharded(col, "eq", "acga", mesh)
        want = [i for i, s in enumerate(kmers) if equals(s, "acga")]
        assert got.tolist() == want

        got = filter_sharded(col, "prefix", "ac", mesh)
        want = [i for i, s in enumerate(kmers) if starts_with_op(s, "ac")]
        assert got.tolist() == want

        got = filter_sharded(col, "pattern", "angry", mesh)
        want = [i for i, s in enumerate(kmers) if contains("angry", s)]
        assert got.tolist() == want
