"""Dense MXU-histogram counting vs the sort-based oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from kmer_tpu.ops.count import count_kmers_jit
from kmer_tpu.ops.dense_count import DENSE_MAX_K, count_kmers_dense
from kmer_tpu.ops.extract import simulate_reads


class TestDenseCount:
    @pytest.mark.parametrize("k", [1, 2, 4, 8])
    def test_matches_sort_path(self, k):
        reads = simulate_reads(32, 40, seed=k)
        lengths = np.full(32, 40, np.int32)
        dense = count_kmers_dense(jnp.asarray(reads), jnp.asarray(lengths), k, False)
        sorted_ = count_kmers_jit(jnp.asarray(reads), jnp.asarray(lengths), k, False)
        assert dense.to_dict() == sorted_.to_dict()

    def test_canonical_matches(self):
        k = 7
        reads = simulate_reads(16, 30, seed=9)
        lengths = np.full(16, 30, np.int32)
        dense = count_kmers_dense(jnp.asarray(reads), jnp.asarray(lengths), k, True)
        sorted_ = count_kmers_jit(jnp.asarray(reads), jnp.asarray(lengths), k, True)
        assert dense.to_dict() == sorted_.to_dict()

    def test_ragged_lengths(self):
        k = 5
        reads = simulate_reads(8, 20, seed=2)
        lengths = np.array([20, 5, 4, 20, 11, 7, 19, 20], np.int32)
        dense = count_kmers_dense(jnp.asarray(reads), jnp.asarray(lengths), k, False)
        sorted_ = count_kmers_jit(jnp.asarray(reads), jnp.asarray(lengths), k, False)
        assert dense.to_dict() == sorted_.to_dict()

    def test_k_too_large_rejected(self):
        reads = simulate_reads(4, 20, seed=0)
        lengths = np.full(4, 20, np.int32)
        with pytest.raises(ValueError):
            count_kmers_dense(jnp.asarray(reads), jnp.asarray(lengths), DENSE_MAX_K + 1, False)

    def test_table_totals(self):
        k = 8
        reads = simulate_reads(64, 50, seed=3)
        lengths = np.full(64, 50, np.int32)
        t = count_kmers_dense(jnp.asarray(reads), jnp.asarray(lengths), k, False)
        assert t.total() == 64 * (50 - k + 1)


def test_dense_saturation_guard():
    import jax.numpy as jnp

    from kmer_tpu.ops.count import CountTable
    from kmer_tpu.ops.dense_count import DENSE_EXACT_LIMIT, check_dense_exact

    ok = CountTable(
        hi=jnp.zeros(2, jnp.uint32), lo=jnp.zeros(2, jnp.uint32),
        length=jnp.full(2, 4, jnp.int32),
        counts=jnp.asarray([5, DENSE_EXACT_LIMIT - 1], jnp.int32),
        n_unique=jnp.asarray(2),
    )
    assert check_dense_exact(ok) is ok
    bad = CountTable(
        hi=ok.hi, lo=ok.lo, length=ok.length,
        counts=jnp.asarray([5, DENSE_EXACT_LIMIT], jnp.int32),
        n_unique=ok.n_unique,
    )
    with pytest.raises(ValueError, match="2\\^24"):
        check_dense_exact(bad)
