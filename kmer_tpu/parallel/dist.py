"""Distributed extraction + counting over a ("data", "seq") mesh.

Green-field layer (the reference is single-process; SURVEY.md §2.2).
Design per BASELINE.json: read batches stream data-parallel, the
sequence axis shards with a k-1 halo exchange between ring neighbors
(jax.lax.ppermute over ICI), per-shard count tables are built with the
local sort-based kernel, and tables merge via collectives.

Merging strategy (round 1): all_gather the local (key, count) tables
over both mesh axes and re-run the weighted count locally — exact,
replicated output, and the gathered payload is the *deduplicated* local
table, not the raw windows.  A hash-partitioned all_to_all +
reduce-scatter merge (each device owning a key range) is the planned
upgrade for pod-scale cardinalities.

All collective code is pure shard_map + lax collectives: no NCCL/MPI
analogue exists or is needed — XLA lowers these to ICI/DCN transfers.
"""

from __future__ import annotations

import functools
import inspect

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.count import CountTable, count_packed, count_windows
from ..ops.extract import canonicalize
from .mesh import AXIS_DATA, AXIS_SEQ


def _shard_map(f, mesh, in_specs, out_specs):
    """shard_map across jax versions (check_rep was renamed check_vma)."""
    kwargs = dict(mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    params = inspect.signature(jax.shard_map).parameters
    if "check_vma" in params:
        kwargs["check_vma"] = False
    elif "check_rep" in params:
        kwargs["check_rep"] = False
    return jax.shard_map(f, **kwargs)


def _extract_with_halo(codes_l, lengths_l, k: int, seq_size: int, canonical: bool):
    """Local windows of a sequence-sharded read batch.

    codes_l: [b_loc, l_loc] local chunk of the base axis; each device owns
    the windows *starting* in its chunk, which need the first k-1 bases of
    the right neighbor (ring halo exchange; wrap-around data is never
    used because windows past a read's length are masked invalid).
    """
    b_loc, l_loc = codes_l.shape
    if seq_size > 1 and k > 1:
        halo = jax.lax.ppermute(
            codes_l[:, : k - 1],
            AXIS_SEQ,
            perm=[((s + 1) % seq_size, s) for s in range(seq_size)],
        )
        ext = jnp.concatenate([codes_l, halo], axis=1)
    else:
        ext = codes_l if k == 1 else jnp.pad(codes_l, ((0, 0), (0, k - 1)))
    # windows starting at local columns 0..l_loc-1
    hi = jnp.zeros((b_loc, l_loc), jnp.uint32)
    lo = jnp.zeros((b_loc, l_loc), jnp.uint32)
    for j in range(k):
        c = ext[:, j : j + l_loc].astype(jnp.uint32)
        if j < 16:
            hi = hi | (c << jnp.uint32(30 - 2 * j))
        else:
            lo = lo | (c << jnp.uint32(30 - 2 * (j - 16)))
    s_idx = jax.lax.axis_index(AXIS_SEQ)
    global_start = s_idx * l_loc + jnp.arange(l_loc, dtype=jnp.int32)[None, :]
    valid = global_start <= (lengths_l.astype(jnp.int32)[:, None] - k)
    if canonical:
        hi, lo = canonicalize(hi, lo, k)
    return hi, lo, valid


def make_sharded_count_step(mesh, k: int, canonical: bool = False):
    """Build the jitted multi-device counting step.

    Returns step(codes [B, L], lengths [B]) -> CountTable (replicated).
    B shards over "data", L over "seq"; lengths shard over "data" and
    replicate over "seq".
    """
    dp, sp = mesh.devices.shape

    def local_step(codes_l, lengths_l):
        hi, lo, valid = _extract_with_halo(codes_l, lengths_l, k, sp, canonical)
        table = count_windows(hi, lo, valid, k)
        # merge: gather deduplicated local tables over both axes, recount
        axes = (AXIS_DATA, AXIS_SEQ)
        ghi = jax.lax.all_gather(table.hi, axes, tiled=True)
        glo = jax.lax.all_gather(table.lo, axes, tiled=True)
        gln = jax.lax.all_gather(table.length, axes, tiled=True)
        gct = jax.lax.all_gather(table.counts, axes, tiled=True)
        return count_packed(ghi, glo, gln, gct)

    sharded = _shard_map(
        local_step,
        mesh,
        in_specs=(P(AXIS_DATA, AXIS_SEQ), P(AXIS_DATA)),
        out_specs=CountTable(hi=P(), lo=P(), length=P(), counts=P(), n_unique=P()),
    )
    return jax.jit(sharded)


def count_kmers_sharded(codes, lengths, k: int, mesh, canonical: bool = False) -> CountTable:
    """One-shot sharded count (builds + runs the step)."""
    step = make_sharded_count_step(mesh, k, canonical)
    return step(jnp.asarray(codes), jnp.asarray(lengths))
