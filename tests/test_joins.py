"""Join kernels vs nested-loop oracle (kmer-test.sql:104-407 workloads)."""

import numpy as np
import pytest

from kmer_tpu import PackedKmers, Qkmer, contains, equals, starts_with
from kmer_tpu.io import generate_test_rows
from kmer_tpu.joins import join_eq, join_pattern, join_right_starts_with_left, outer_extend


@pytest.fixture(scope="module")
def cols():
    rows = generate_test_rows(120, seed=5)
    left = [r[1].lower() for r in rows[:60]] + ["acga", "", "acga"]
    right = [r[1].lower() for r in rows[60:]] + ["acga", "acgatt", ""]
    return left, right


def test_join_eq_matches_oracle(cols):
    left, right = cols
    got = join_eq(PackedKmers.from_strings(left), PackedKmers.from_strings(right))
    want = sorted(
        (i, j)
        for i, a in enumerate(left)
        for j, b in enumerate(right)
        if equals(a, b)
    )
    assert [tuple(p) for p in got] == want


def test_join_starts_with_matches_oracle(cols):
    left, right = cols
    got = join_right_starts_with_left(
        PackedKmers.from_strings(left), PackedKmers.from_strings(right)
    )
    want = sorted(
        (i, j)
        for i, a in enumerate(left)
        for j, b in enumerate(right)
        if starts_with(a, b)  # right[j] starts with left[i]
    )
    assert [tuple(p) for p in got] == want


def test_join_pattern_matches_oracle(cols):
    left, right = cols
    rows = generate_test_rows(40, seed=6)
    qk = [Qkmer(r[2]) for r in rows] + [Qkmer("nn"), Qkmer("angry")]
    got = join_pattern(qk, PackedKmers.from_strings(right))
    want = sorted(
        (i, j)
        for i, q in enumerate(qk)
        for j, b in enumerate(right)
        if contains(q, b)
    )
    assert [tuple(p) for p in got] == want


def test_join_eq_scale_10k():
    """10k x 10k eq join vs a hash-map oracle (kmer-test.sql joins at scale)."""
    rows_l = generate_test_rows(10_000, seed=11)
    rows_r = generate_test_rows(10_000, seed=12)
    left = [r[1].lower() for r in rows_l]
    right = [r[1].lower() for r in rows_r]
    got = join_eq(PackedKmers.from_strings(left), PackedKmers.from_strings(right))
    by_val: dict = {}
    for j, b in enumerate(right):
        by_val.setdefault(b, []).append(j)
    want = sorted((i, j) for i, a in enumerate(left) for j in by_val.get(a, ()))
    assert got.shape[0] == len(want)
    assert [tuple(p) for p in got] == want


def test_join_starts_with_scale_10k():
    """10k x 10k prefix join vs a prefix-map oracle."""
    rows_l = generate_test_rows(10_000, seed=13)
    rows_r = generate_test_rows(10_000, seed=14)
    left = [r[1].lower()[:6] for r in rows_l]  # short prefixes -> real fanout
    right = [r[1].lower() for r in rows_r]
    got = join_right_starts_with_left(
        PackedKmers.from_strings(left), PackedKmers.from_strings(right)
    )
    by_prefix: dict = {}
    for j, b in enumerate(right):
        for p in range(len(b) + 1):
            by_prefix.setdefault(b[:p], []).append(j)
    want = sorted((i, j) for i, a in enumerate(left) for j in by_prefix.get(a, ()))
    assert got.shape[0] == len(want)
    assert [tuple(p) for p in got] == want


def test_outer_extend():
    pairs = np.array([[0, 1], [2, 0]], np.int64)
    rows = outer_extend(pairs, n_left=4, n_right=3, how="left")
    assert (1, None) in rows and (3, None) in rows and (0, 1) in rows
    rows = outer_extend(pairs, n_left=4, n_right=3, how="right")
    assert (None, 2) in rows
    rows = outer_extend(pairs, n_left=4, n_right=3, how="full")
    assert (1, None) in rows and (None, 2) in rows
