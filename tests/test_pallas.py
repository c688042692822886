"""Pallas kernel correctness vs the pure-JAX reference path.

Runs in interpreter mode on CPU (SURVEY.md §5.2); the compiled TPU path
is exercised by bench.py on hardware.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from kmer_tpu.pallas import pallas_available

pytestmark = pytest.mark.skipif(not pallas_available(), reason="pallas unavailable")

# NOTE: the round-1 Pallas extraction kernel (extract_stream_pallas) was
# deleted in round 2: measured compiled on TPU v5e it ran 1297M windows/s
# vs 1245M for the same-input XLA extraction, while the production path
# extracts from 2-bit packed words at 4110M/s including canonicalization
# (scripts/probe_r2.py E/E2/B lines) — the kernel had no winning role.


class TestSegmentCounts:
    """segment_counts_sorted (interpret mode) vs a host Counter oracle."""

    def _check(self, hi, lo, sentinel=None, block_rows=8):
        from collections import Counter

        from kmer_tpu.pallas.segment_counts import segment_counts_sorted

        order = np.lexsort((lo, hi))
        shi, slo = hi[order], lo[order]
        counts, n_unique = segment_counts_sorted(
            jnp.asarray(shi), jnp.asarray(slo), sentinel=sentinel,
            interpret=True, block_rows=block_rows,
        )
        counts = np.asarray(counts)
        keys = list(zip(shi.tolist(), slo.tolist()))
        oracle = Counter(keys)
        if sentinel is not None:
            oracle.pop(sentinel, None)
        got = {}
        for i in np.nonzero(counts > 0)[0]:
            key = keys[i]
            assert key not in got, "one nonzero count per segment"
            got[key] = int(counts[i])
        assert got == dict(oracle)
        assert int(n_unique) == len(oracle)

    def test_random_with_duplicates(self):
        rng = np.random.default_rng(0)
        n = 5000  # crosses several 1024-element blocks at block_rows=8
        hi = rng.integers(0, 7, n).astype(np.uint32)
        lo = rng.integers(0, 5, n).astype(np.uint32)
        self._check(hi, lo)

    def test_segment_spanning_blocks(self):
        n = 4096
        hi = np.zeros(n, np.uint32)
        lo = np.zeros(n, np.uint32)
        hi[-1] = 9  # one giant segment + one singleton
        self._check(hi, lo)

    def test_block_aligned_n(self):
        rng = np.random.default_rng(1)
        n = 8 * 128 * 2
        hi = rng.integers(0, 3, n).astype(np.uint32)
        lo = np.zeros(n, np.uint32)
        self._check(hi, lo)

    def test_all_unique(self):
        n = 1500
        hi = np.arange(n, dtype=np.uint32)
        lo = np.arange(n, dtype=np.uint32)
        self._check(hi, lo)

    def test_sentinel_folding(self):
        rng = np.random.default_rng(2)
        n = 3000
        hi = rng.integers(0, 5, n).astype(np.uint32)
        lo = rng.integers(0, 3, n).astype(np.uint32)
        hi[:700] = 0xFFFFFFFF
        lo[:700] = 0xFFFF0000
        self._check(hi, lo, sentinel=(0xFFFFFFFF, 0xFFFF0000))

    def test_tiny(self):
        self._check(np.array([5], np.uint32), np.array([0], np.uint32))
        self._check(np.array([5, 5], np.uint32), np.array([0, 1], np.uint32))

    def test_block_rows_must_be_sublane_multiple(self):
        from kmer_tpu.pallas.segment_counts import segment_counts_sorted

        with pytest.raises(ValueError, match="multiple of 8"):
            segment_counts_sorted(
                jnp.zeros(16, jnp.uint32), jnp.zeros(16, jnp.uint32),
                interpret=True, block_rows=6,
            )

    def test_count_windows_dispatch_matches(self, monkeypatch):
        """count_windows via the kernel (forced) == XLA path, all widths."""
        import kmer_tpu.ops.count as count_mod
        from kmer_tpu.pallas.segment_counts import segment_counts_sorted

        rng = np.random.default_rng(3)
        n = 2000
        for k, shift in [(8, 16), (21, 22), (30, 4)]:
            hi = (rng.integers(0, 50, n).astype(np.uint64) << np.uint64(shift)).astype(np.uint32)
            lo = np.zeros(n, np.uint32)
            if k > 16:
                lo = (rng.integers(0, 4, n).astype(np.uint64) << np.uint64(64 - 2 * k)).astype(np.uint32)
            valid = rng.integers(0, 2, n).astype(bool)
            ref = count_mod.count_windows(jnp.asarray(hi), jnp.asarray(lo),
                                          jnp.asarray(valid), k)
            monkeypatch.setattr(count_mod, "_use_pallas_counts", lambda: True)
            monkeypatch.setattr(
                "kmer_tpu.pallas.segment_counts.segment_counts_sorted",
                lambda shi, slo, sentinel=None: segment_counts_sorted(
                    shi, slo, sentinel=sentinel, interpret=True, block_rows=8
                ),
            )
            got = count_mod.count_windows(jnp.asarray(hi), jnp.asarray(lo),
                                          jnp.asarray(valid), k)
            monkeypatch.undo()
            assert got.to_dict() == ref.to_dict()
            assert int(got.n_unique) == int(ref.n_unique)


@pytest.mark.skipif(
    __import__("jax").default_backend() != "tpu",
    reason="compiled Mosaic lowering needs a real TPU",
)
class TestCompiledOnTPU:
    """Compiled Mosaic lowering vs interpret mode (ADVICE r1: the roll on
    lanes, SMEM carry across grid steps, and halo reads are otherwise
    never exercised compiled in CI)."""

    def test_segment_counts_compiled_matches_interpret(self):
        from kmer_tpu.pallas.segment_counts import segment_counts_sorted

        rng = np.random.default_rng(7)
        n = 512 * 128 * 2 + 333  # >2 grid steps at default block_rows
        hi = np.sort(rng.integers(0, 1 << 20, n).astype(np.uint32))
        lo = np.zeros(n, np.uint32)
        ci, ui = segment_counts_sorted(jnp.asarray(hi), jnp.asarray(lo),
                                       interpret=True)
        cc, uc = segment_counts_sorted(jnp.asarray(hi), jnp.asarray(lo))
        assert int(ui) == int(uc)
        np.testing.assert_array_equal(np.asarray(ci), np.asarray(cc))


def test_use_pallas_flag_gates_backend():
    """EngineConfig.use_pallas drives the segment-count backend choice."""
    import kmer_tpu.ops.count as count_mod
    from kmer_tpu.config import EngineConfig

    try:
        EngineConfig(use_pallas=False).activate()
        assert count_mod._use_pallas_counts() is False
        EngineConfig(use_pallas=True).activate()
        # auto mode: on only when a TPU backend is present
        import jax

        expected = jax.default_backend() == "tpu"
        assert count_mod._use_pallas_counts() == expected
    finally:
        count_mod.set_pallas_counts(None)
