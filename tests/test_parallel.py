"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Exercises the halo exchange and collective table merge without TPU pod
hardware (SURVEY.md §4's CI strategy).
"""

import collections

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kmer_tpu.codec import decode_codes
from kmer_tpu.ops.count import count_kmers_jit
from kmer_tpu.ops.extract import extract_to_strings, simulate_reads
from kmer_tpu.parallel import count_kmers_sharded, make_mesh, mesh_shape_for


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest should provide 8 virtual CPU devices"
    return devs


def _oracle(reads, lengths, k, canonical=False):
    comp = {"a": "t", "c": "g", "g": "c", "t": "a"}
    want = collections.Counter()
    for row, ln in zip(reads, lengths):
        s = decode_codes(row[:ln])
        if ln < k:
            continue
        for km in extract_to_strings(s, k):
            if canonical:
                rc = "".join(comp[c] for c in reversed(km))
                km = min(km, rc)
            want[km] += 1
    return dict(want)


class TestShardedCount:
    def test_data_parallel_only(self, devices):
        mesh = make_mesh((8, 1), devices)
        reads = simulate_reads(num_reads=32, read_len=24, seed=1)
        lengths = np.full(32, 24, np.int32)
        k = 5
        table = count_kmers_sharded(reads, lengths, k, mesh)
        assert table.to_dict() == _oracle(reads, lengths, k)

    def test_seq_parallel_halo(self, devices):
        # L=32 sharded over 4 seq shards of 8 -> windows cross shard edges
        mesh = make_mesh((2, 4), devices)
        reads = simulate_reads(num_reads=8, read_len=32, seed=2)
        lengths = np.full(8, 32, np.int32)
        for k in [2, 5, 9]:  # k-1 halo of 1, 4, 8 (halo == full shard width)
            table = count_kmers_sharded(reads, lengths, k, mesh)
            assert table.to_dict() == _oracle(reads, lengths, k), k

    def test_ragged_lengths_across_shards(self, devices):
        mesh = make_mesh((2, 4), devices)
        reads = simulate_reads(num_reads=8, read_len=32, seed=3)
        lengths = np.array([32, 3, 9, 17, 25, 32, 5, 30], np.int32)
        k = 4
        table = count_kmers_sharded(reads, lengths, k, mesh)
        assert table.to_dict() == _oracle(reads, lengths, k)

    def test_canonical_sharded(self, devices):
        mesh = make_mesh((4, 2), devices)
        reads = simulate_reads(num_reads=16, read_len=20, seed=4)
        lengths = np.full(16, 20, np.int32)
        k = 7
        table = count_kmers_sharded(reads, lengths, k, mesh, canonical=True)
        assert table.to_dict() == _oracle(reads, lengths, k, canonical=True)

    def test_matches_single_device(self, devices):
        mesh = make_mesh((8, 1), devices)
        reads = simulate_reads(num_reads=64, read_len=30, seed=5)
        lengths = np.full(64, 30, np.int32)
        k = 11
        sharded = count_kmers_sharded(reads, lengths, k, mesh)
        single = count_kmers_jit(jnp.asarray(reads), jnp.asarray(lengths), k, False)
        assert sharded.to_dict() == single.to_dict()


class TestMeshHelpers:
    def test_mesh_shape_for(self):
        assert mesh_shape_for(8) == (8, 1)
        assert mesh_shape_for(8, seq_parallel=4) == (2, 4)
        with pytest.raises(ValueError):
            mesh_shape_for(8, seq_parallel=3)
