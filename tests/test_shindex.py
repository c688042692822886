"""Sharded index serving vs the host index oracle (8-shard CPU mesh).

The parity contract is kmer-tests.sql TEST 14's index==scan equivalence,
here at the pod-scale layout: per-shard local sorts, shard-relative
ranges, global row-id union.
"""

import numpy as np
import pytest

from kmer_tpu.index import KmerIndex
from kmer_tpu.io import generate_test_rows
from kmer_tpu.packed import PackedKmers
from kmer_tpu.parallel import make_mesh
from kmer_tpu.parallel.shindex import ShardedIndex


@pytest.fixture(scope="module")
def setup():
    rows = generate_test_rows(4096, seed=21)
    kmers = [r[1].lower() for r in rows] + ["acga", "acga", "", "t" * 32]
    col = PackedKmers.from_strings(kmers)
    mesh = make_mesh((8, 1))
    return kmers, KmerIndex.build(col), ShardedIndex.build(col, mesh)


def test_build_shards_and_padding(setup):
    kmers, _, sidx = setup
    assert len(sidx) == len(kmers)
    live = np.asarray(sidx.live)
    assert live.sum() == len(kmers)
    assert live.size == 8


def test_eq_matches_host_index(setup):
    kmers, host, sidx = setup
    rng = np.random.default_rng(0)
    probes = [kmers[i] for i in rng.integers(0, len(kmers), 32)] + [
        "acga", "", "t" * 32, "c" * 31  # absent key
    ]
    got = sidx.search_eq(probes, cap=4)  # tiny cap: force auto-regrow
    for p, g in zip(probes, got):
        want = host.search_eq(p)
        assert g.tolist() == want.tolist(), p


def test_prefix_matches_host_index(setup):
    kmers, host, sidx = setup
    rng = np.random.default_rng(1)
    probes = [kmers[i][: int(rng.integers(1, max(len(kmers[i]), 2)))]
              for i in rng.integers(0, len(kmers), 24) if kmers[i]]
    probes += ["", "a", "t" * 32, "ttt"]
    got = sidx.search_prefix(probes, cap=8)
    for p, g in zip(probes, got):
        want = host.search_prefix(p)
        assert g.tolist() == want.tolist(), p


def test_exact_counts_even_when_capped(setup):
    kmers, host, sidx = setup
    # counts come from psum(right-left): exact regardless of cap
    rows, count = sidx._lookup("prefix", ["", "a"], cap=2048)
    assert count[0] == len(kmers)
    assert count[1] == len(host.search_prefix("a"))


@pytest.mark.slow
def test_sharded_build_1M_keys():
    """configs[4]-shaped: sharded build + serving at 1M keys, 8 shards."""
    rng = np.random.default_rng(3)
    n = 1 << 20
    hi = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    lo = np.zeros(n, np.uint32)
    ln = np.full(n, 16, np.int32)
    col = PackedKmers(hi=hi, lo=lo, length=ln)
    mesh = make_mesh((8, 1))
    sidx = ShardedIndex.build(col, mesh)
    assert np.asarray(sidx.live).sum() == n
    # every probe's psum count equals the true multiplicity
    probes = [int(i) for i in rng.integers(0, n, 16)]
    import collections

    from kmer_tpu.codec import decode_codes

    qs = []
    for i in probes:
        codes = np.array(
            [(int(hi[i]) >> (30 - 2 * j)) & 3 for j in range(16)], np.uint8
        )
        qs.append(decode_codes(codes))
    truth = collections.Counter(
        (int(h), int(l)) for h, l in zip(hi, lo)
    )
    rows, count = sidx._lookup("eq", qs, cap=64)
    for q_i, i in enumerate(probes):
        assert count[q_i] == truth[(int(hi[i]), int(lo[i]))]
        assert len(rows[q_i]) == count[q_i]


def test_pattern_matches_host_index(setup):
    kmers, host, sidx = setup
    rng = np.random.default_rng(2)
    # few probes: each distinct (qlen, cap) compiles a sharded kernel
    rows = generate_test_rows(8, seed=22)
    probes = [r[2].lower() for r in rows] + ["nnnn", "angr", "", "n", "r" * 32]
    got = sidx.search_pattern(probes, cap=4)  # tiny cap: force regrowth
    for p, g in zip(probes, got):
        want = host.search_pattern(p)
        assert g.tolist() == want.tolist(), p


def test_2d_mesh_seq_axis_replication():
    """Regression: arrays shard over 'data' only, so shard size must be
    n/dp — on a (4,2) or (2,4) mesh the seq axis replicates and the cap
    ceiling must still cover a whole data shard (was n/(dp*sp), which
    accepted truncated pattern results silently)."""
    kmers = [r[1].lower() for r in generate_test_rows(63, seed=41)]
    col = PackedKmers.from_strings(kmers)
    host = KmerIndex.build(col)
    for shape in [(4, 2), (2, 4)]:
        sidx = ShardedIndex.build(col, make_mesh(shape))
        got = sidx.search_pattern(["nnnn", "n"], cap=1)
        assert got[0].tolist() == host.search_pattern("nnnn").tolist(), shape
        assert got[1].tolist() == host.search_pattern("n").tolist(), shape
        eq = sidx.search_eq([kmers[0]], cap=1)
        assert eq[0].tolist() == host.search_eq(kmers[0]).tolist(), shape
        pre = sidx.search_prefix(["a"], cap=1)
        assert pre[0].tolist() == host.search_prefix("a").tolist(), shape


class TestCompileLadder:
    """VERDICT r2 weak #7: serving kernels compile from a fixed cap
    ladder, so a mixed workload can only mint an enumerable kernel set."""

    def test_ladder_cap_values(self):
        from kmer_tpu.index import ladder_cap

        assert ladder_cap(1, 1 << 20) == 8
        assert ladder_cap(8, 1 << 20) == 8
        assert ladder_cap(9, 1 << 20) == 32
        assert ladder_cap(33, 1 << 20) == 128
        assert ladder_cap(1000, 1 << 20) == 2048
        assert ladder_cap(1000, 100) == 100  # clamped to the shard size

    def test_mixed_workload_bounded_kernel_set(self):
        import jax

        from kmer_tpu.io import generate_test_rows
        from kmer_tpu.packed import PackedKmers
        from kmer_tpu.parallel import make_mesh
        from kmer_tpu.parallel.shindex import (
            ShardedIndex, _make_lookup, _make_pattern_lookup,
        )

        mesh = make_mesh((8, 1), jax.devices()[:8])
        kmers = [r[1].lower() for r in generate_test_rows(300, seed=3)]
        sidx = ShardedIndex.build(PackedKmers.from_strings(kmers), mesh)

        eq_before = _make_lookup.cache_info().currsize
        pat_before = _make_pattern_lookup.cache_info().currsize
        # odd user caps all snap to ladder rungs
        for cap in (3, 5, 8, 17, 29, 32):
            sidx.search_eq(kmers[:4], cap=cap)
        for cap in (7, 100, 128):
            sidx.search_prefix(["ac", "a"], cap=cap)
        # patterns of many lengths with odd caps
        pats = ["n", "rn", "acn", "nnnn", "rykms", "acgtan", "nnnnnnn"]
        for cap in (9, 50, 64):
            sidx.search_pattern(pats, cap=cap)
        eq_new = _make_lookup.cache_info().currsize - eq_before
        pat_new = _make_pattern_lookup.cache_info().currsize - pat_before
        # eq/prefix: caps {3,5,8,17,29,32,7,100,128} snap to {8, 32, 38(=shard
        # clamp), 128->38} -> few rungs x 2 ops; patterns: 7 lengths x <=2 rungs
        assert eq_new <= 6, eq_new
        assert pat_new <= 2 * len(pats), pat_new
