"""Scale parity harness in CI at a CI-sized row count.

The full 100k-row run (kmer-tests.sql's real table size) is the CLI
form `python -m kmer_tpu parity --scale 100000`; CI keeps the identical
checks at 20k rows to stay fast.
"""

import pytest

from kmer_tpu.parity import run_scale_parity


@pytest.mark.slow
def test_scale_parity_20k():
    assert run_scale_parity(n_rows=20_000, seed=7, n_probes=24, verbose=False)


def test_scale_parity_2k():
    assert run_scale_parity(n_rows=2_000, seed=8, n_probes=12, verbose=False)
