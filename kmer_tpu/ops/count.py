"""Exact k-mer counting — GROUP BY / COUNT / DISTINCT semantics on device.

The reference counts via Postgres HashAggregate (hash opclass,
kmer--1.0.0.sql:188-192; plan at kmer-tests.sql:1176-1214).  A hash table
with per-row probes is hostile to a vector machine, so the TPU-native
design is *sort-based*: lexicographically sort the packed (hi, lo, length)
keys with XLA's variadic sort (a single fused multi-key sort on device),
mark segment boundaries, and segment-sum weights.  This is exact, handles
duplicate weights (so partial tables merge associatively), and every step
is a dense vector op.

All functions are jit-compatible with static shapes: results are padded to
the input size with an ``n_unique`` scalar; unique keys occupy the first
``n_unique`` slots in ascending key order.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .. import codec
from ..packed import PackedKmers
from .extract import canonicalize, extract_windows_batch

# Sentinel key for invalid/padding slots: sorts after every real key
# (real length <= 32 < SENTINEL_LEN).
SENTINEL = np.uint32(0xFFFFFFFF)
SENTINEL_LEN = np.int32(0x7FFFFFFF)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CountTable:
    """Padded (keys, counts) table; first n_unique slots are the real groups."""

    hi: jax.Array
    lo: jax.Array
    length: jax.Array
    counts: jax.Array
    n_unique: jax.Array

    @property
    def capacity(self) -> int:
        return int(self.hi.shape[-1])

    def trim(self) -> "CountTable":
        """Host-side: slice off padding (returns numpy-backed table)."""
        n = int(self.n_unique)
        return CountTable(
            hi=np.asarray(self.hi)[:n],
            lo=np.asarray(self.lo)[:n],
            length=np.asarray(self.length)[:n],
            counts=np.asarray(self.counts)[:n],
            n_unique=np.int64(n),
        )

    def keys(self) -> PackedKmers:
        t = self.trim()
        return PackedKmers(hi=t.hi, lo=t.lo, length=t.length)

    def to_dict(self) -> dict[str, int]:
        """{kmer string: count} — the GROUP BY result as a host dict."""
        t = self.trim()
        strs = PackedKmers(hi=t.hi, lo=t.lo, length=t.length).to_strings()
        return {s: int(c) for s, c in zip(strs, np.asarray(t.counts))}

    def total(self) -> int:
        """COUNT(*) — total weight across groups."""
        t = self.trim()
        return int(np.asarray(t.counts, dtype=np.int64).sum())

    def distinct(self) -> int:
        """COUNT(DISTINCT kmer)."""
        return int(self.n_unique)


def count_packed(hi, lo, length, weights) -> CountTable:
    """Group identical (hi, lo, length) keys and sum their int32 weights.

    Slots with weight 0 are treated as absent.  Jit-compatible; the result
    has the same capacity as the input, groups sorted ascending.
    """
    hi = jnp.asarray(hi, jnp.uint32).ravel()
    lo = jnp.asarray(lo, jnp.uint32).ravel()
    length = jnp.asarray(length, jnp.int32).ravel()
    weights = jnp.asarray(weights, jnp.int32).ravel()
    n = hi.shape[0]

    live = weights > 0
    hi = jnp.where(live, hi, jnp.uint32(SENTINEL))
    lo = jnp.where(live, lo, jnp.uint32(SENTINEL))
    length = jnp.where(live, length, jnp.int32(SENTINEL_LEN))

    shi, slo, sln, sw = jax.lax.sort(
        (hi, lo, length, weights), num_keys=3, is_stable=False
    )

    first = jnp.ones((1,), bool)
    new = jnp.concatenate(
        [
            first,
            (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1]) | (sln[1:] != sln[:-1]),
        ]
    )
    seg = jnp.cumsum(new.astype(jnp.int32)) - 1

    counts = jnp.zeros((n,), jnp.int32).at[seg].add(sw)
    # representative keys: all writes within a segment carry the same value
    uhi = jnp.full((n,), SENTINEL, jnp.uint32).at[seg].set(shi, mode="drop")
    ulo = jnp.full((n,), SENTINEL, jnp.uint32).at[seg].set(slo, mode="drop")
    uln = jnp.full((n,), SENTINEL_LEN, jnp.int32).at[seg].set(sln, mode="drop")

    n_unique = jnp.sum((counts > 0).astype(jnp.int32))
    return CountTable(hi=uhi, lo=ulo, length=uln, counts=counts, n_unique=n_unique)


def count_column(col: PackedKmers, valid=None) -> CountTable:
    """GROUP BY over a kmer column (mixed lengths OK) — TEST 13 semantics."""
    w = (
        jnp.ones(jnp.asarray(col.hi).shape, jnp.int32)
        if valid is None
        else jnp.asarray(valid, jnp.int32)
    )
    return count_packed(col.hi, col.lo, col.length, w)


def merge_tables(a: CountTable, b: CountTable) -> CountTable:
    """Associative merge of two padded count tables (counts add per key)."""
    hi = jnp.concatenate([a.hi, b.hi])
    lo = jnp.concatenate([a.lo, b.lo])
    ln = jnp.concatenate([a.length, b.length])
    w = jnp.concatenate([a.counts, b.counts])
    return count_packed(hi, lo, ln, w)


def count_kmers(reads_codes, lengths, k: int, canonical: bool = False) -> CountTable:
    """Extract all k-windows from padded reads and count them.

    reads_codes: [B, L] 2-bit codes; lengths: [B]; k static.
    canonical=True counts min(kmer, revcomp) — the north-star metric's
    mode; off for reference parity.
    """
    wins, valid = extract_windows_batch(reads_codes, lengths, k)
    hi, lo = wins.hi, wins.lo
    if canonical:
        hi, lo = canonicalize(hi, lo, k)
    length = jnp.full(hi.shape, k, jnp.int32)
    return count_packed(hi, lo, length, valid.astype(jnp.int32))


count_kmers_jit = jax.jit(count_kmers, static_argnames=("k", "canonical"))


def count_dna(dna, k: int, canonical: bool = False) -> CountTable:
    """Single-sequence convenience: generate_kmers + GROUP BY in one shot."""
    from ..types import Dna

    d = Dna(dna)
    codes = jnp.asarray(d.codes)[None, :]
    lengths = jnp.asarray([len(d)], jnp.int32)
    return count_kmers_jit(codes, lengths, k, canonical)
