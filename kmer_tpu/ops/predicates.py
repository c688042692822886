"""Predicates: length / equals / starts_with / contains / hash.

Scalar forms mirror the reference SQL functions one-for-one
(/root/reference/kmer.c:201-285, kmer--1.0.0.sql:58-136); vectorized
``v_*`` forms are the engine's real compute path, operating on
``PackedKmers`` columns as pure elementwise jnp ops (VPU-friendly,
fusable by XLA into surrounding kernels).

Argument-order quirks preserved from the reference:
* ``starts_with(prefix, kmer)`` — prefix FIRST (kmer.c:248-255).
* ``starts_with_op(kmer, prefix)`` — the ``^@`` operator, args swapped
  (kmer.c:258-265).
* ``contains(qkmer, kmer)`` is ``@>``; ``containing(kmer, qkmer)`` is
  ``<@`` (kmer.c:268-285); both require equal lengths and positionwise
  IUPAC match.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import codec
from ..packed import PackedKmers
from ..types import Dna, Kmer, Qkmer

_U32 = jnp.uint32


# --- scalar forms (parity surface) -------------------------------------------


def length(value) -> int:
    """length(dna|kmer|qkmer) — payload char count (kmer.c:201-221)."""
    if isinstance(value, (Dna, Kmer, Qkmer)):
        return len(value)
    raise TypeError(f"length() expects Dna/Kmer/Qkmer, got {type(value)!r}")


def equals(a, b) -> bool | None:
    """equals(kmer, kmer) — STRICT: NULL (None) propagates (kmer--1.0.0.sql:75-78)."""
    if a is None or b is None:
        return None
    a, b = Kmer(a), Kmer(b)
    return a == b


def starts_with(prefix, kmer) -> bool | None:
    """starts_with(prefix, kmer) — prefix is the FIRST argument (kmer.c:248-255)."""
    if prefix is None or kmer is None:
        return None
    prefix, kmer = Kmer(prefix), Kmer(kmer)
    if len(prefix) > len(kmer):
        return False
    return bool(np.array_equal(prefix.codes, kmer.codes[: len(prefix)]))


def starts_with_op(kmer, prefix) -> bool | None:
    """kmer ^@ prefix — same predicate, swapped args (kmer.c:258-265)."""
    if prefix is None or kmer is None:
        return None
    return starts_with(prefix, kmer)


def _match_positionwise(qk: Qkmer, km: Kmer) -> bool:
    """kmer_query (kmer.c:59-79): equal lengths + IUPAC match at every position."""
    if len(qk) != len(km):
        return False
    if len(qk) == 0:
        return True
    # match(pattern, base) == (mask >> code) & 1  (kmer.h:21-53)
    return bool(np.all((qk.masks >> km.codes) & 1))


def contains(qkmer, kmer) -> bool | None:
    """contains(qkmer, kmer) == qkmer @> kmer (kmer.c:278-285)."""
    if qkmer is None or kmer is None:
        return None
    return _match_positionwise(Qkmer(qkmer), Kmer(kmer))


def containing(kmer, qkmer) -> bool | None:
    """containing(kmer, qkmer) == kmer <@ qkmer (kmer.c:268-275)."""
    if qkmer is None or kmer is None:
        return None
    return _match_positionwise(Qkmer(qkmer), Kmer(kmer))


def kmer_hash(kmer) -> int:
    """hash(kmer) -> int32.

    The reference uses Postgres hash_any (kmer.c:353-365); the contract is
    only "a stable hash consistent with equality" (it powers hash joins /
    HashAggregate), not a specific function.  We use the same 64->32-bit
    finalizer as the device path so host and device hashes agree.
    """
    km = Kmer(kmer)
    hi, lo = km.hi_lo
    h = _hash_finalize_np(
        np.asarray([hi], np.uint32), np.asarray([lo], np.uint32),
        np.asarray([len(km)], np.int32),
    )[0]
    return int(np.int32(h))


# --- vectorized forms (device path) ------------------------------------------


def _prefix_lane_masks(p):
    """For prefix length p (array or scalar), the (hi, lo) bit masks covering
    the first p bases. hi covers bases 0..15, lo bases 16..31."""
    p = jnp.asarray(p, jnp.int32)
    nhi = jnp.minimum(p, 16) * 2          # bits of hi covered
    nlo = jnp.maximum(p - 16, 0) * 2      # bits of lo covered
    full = jnp.uint32(0xFFFFFFFF)
    # mask with top n bits set; n in [0, 32]
    def top(n):
        n = n.astype(jnp.uint32)
        return jnp.where(n == 0, jnp.uint32(0), full << (jnp.uint32(32) - n))
    return top(nhi), top(nlo)


def v_equals(col: PackedKmers, other: PackedKmers):
    """Elementwise kmer equality (broadcasts a single query against a column)."""
    return (
        (col.hi == other.hi) & (col.lo == other.lo) & (col.length == other.length)
    )


def v_starts_with(col: PackedKmers, prefix: PackedKmers):
    """Elementwise `col ^@ prefix`: first len(prefix) bases equal, len >= p."""
    mh, ml = _prefix_lane_masks(prefix.length)
    ok = ((col.hi & mh) == prefix.hi) & ((col.lo & ml) == prefix.lo)
    return ok & (col.length >= prefix.length)


def v_contains(col: PackedKmers, qmasks, qlen: int):
    """Elementwise `qkmer @> col`: equal length + positionwise IUPAC match.

    qmasks: [MAX_K] uint32/int32 array of 4-bit masks (padded with anything
    beyond qlen); qlen: static int.  Vectorizes kmer_query (kmer.c:59-79).
    """
    ok = col.length == qlen
    qmasks = jnp.asarray(qmasks, _U32)
    for i in range(int(qlen)):
        lane = col.hi if i < 16 else col.lo
        shift = jnp.uint32(30 - 2 * (i % 16))
        code = (lane >> shift) & jnp.uint32(3)
        ok = ok & (((qmasks[i] >> code) & jnp.uint32(1)) != 0)
    return ok


def v_hash(col: PackedKmers):
    """Vectorized 32-bit hash of packed kmers (murmur3-style finalizer)."""
    h = _mix32(col.hi ^ jnp.uint32(0x9E3779B9))
    h = _mix32(h ^ col.lo)
    h = _mix32(h ^ col.length.astype(_U32))
    return h.astype(jnp.int32)


def _mix32(x):
    x = jnp.asarray(x, _U32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _mix32_np(x):
    x = np.asarray(x, np.uint32)
    x = x ^ (x >> np.uint32(16))
    x = (x * np.uint32(0x85EBCA6B)).astype(np.uint32)
    x = x ^ (x >> np.uint32(13))
    x = (x * np.uint32(0xC2B2AE35)).astype(np.uint32)
    x = x ^ (x >> np.uint32(16))
    return x


def _hash_finalize_np(hi, lo, length):
    h = _mix32_np(np.asarray(hi, np.uint32) ^ np.uint32(0x9E3779B9))
    h = _mix32_np(h ^ np.asarray(lo, np.uint32))
    h = _mix32_np(h ^ np.asarray(length, np.int32).astype(np.uint32))
    return h


def qkmer_mask_vector(qkmer) -> tuple[np.ndarray, int]:
    """Qkmer -> ([MAX_K] uint32 mask vector, qlen) for v_contains."""
    qk = Qkmer(qkmer)
    out = np.zeros(codec.MAX_K, dtype=np.uint32)
    out[: len(qk)] = qk.masks
    return out, len(qk)
