"""Pallas kernel correctness vs the pure-JAX reference path.

Runs in interpreter mode on CPU (SURVEY.md §5.2); the compiled TPU path
is exercised by bench.py on hardware.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from kmer_tpu.ops.extract import extract_windows
from kmer_tpu.pallas import extract_stream_pallas, pallas_available

pytestmark = pytest.mark.skipif(not pallas_available(), reason="pallas unavailable")


def _ref_windows(codes, k):
    """Oracle: pure-JAX extraction, padded to stream semantics."""
    n = codes.shape[0]
    padded = np.concatenate([codes, np.zeros(k - 1, np.uint8)]) if k > 1 else codes
    hi, lo = extract_windows(jnp.asarray(padded), k)
    return np.asarray(hi)[:n], np.asarray(lo)[:n]


class TestExtractKernel:
    @pytest.mark.parametrize("k", [1, 2, 5, 16, 17, 21, 32])
    def test_matches_reference(self, k):
        rng = np.random.default_rng(k)
        n = 1000
        codes = rng.integers(0, 4, n, dtype=np.uint8)
        hi, lo = extract_stream_pallas(jnp.asarray(codes), k, interpret=True,
                                       block_rows=8)
        rhi, rlo = _ref_windows(codes, k)
        np.testing.assert_array_equal(np.asarray(hi), rhi)
        np.testing.assert_array_equal(np.asarray(lo), rlo)

    def test_multi_block_boundaries(self):
        # stream spanning several grid blocks; windows cross block edges
        rng = np.random.default_rng(0)
        n = 8 * 128 * 3 + 77  # 3+ blocks with ragged tail at block_rows=8
        codes = rng.integers(0, 4, n, dtype=np.uint8)
        k = 21
        hi, lo = extract_stream_pallas(jnp.asarray(codes), k, interpret=True,
                                       block_rows=8)
        rhi, rlo = _ref_windows(codes, k)
        np.testing.assert_array_equal(np.asarray(hi), rhi)
        np.testing.assert_array_equal(np.asarray(lo), rlo)

    def test_tail_padding_is_zero_extension(self):
        codes = np.array([3, 3, 3], np.uint8)  # "ttt"
        hi, lo = extract_stream_pallas(jnp.asarray(codes), 2, interpret=True,
                                       block_rows=8)
        # window 2 = codes[2:4] = [t, pad] -> 't' + zero bits
        assert int(np.asarray(hi)[2]) == (3 << 30)
