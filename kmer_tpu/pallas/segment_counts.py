"""Pallas kernel: segment counts over sorted key lanes.

Post-sort counting for the sort-based GROUP BY (ops/count.py).  The
reference's HashAggregate derives counts by bucket probes
(/root/reference/kmer.c:353-365 hash + kmer-tests.sql:1176-1214 plan);
the sort-based engine instead needs, per element of a *sorted* (hi, lo)
key stream, the total size of its equal-key segment.  In XLA that chain
(boundary compare -> reverse cummin -> positional subtract) compiles to
several unfused HBM passes costing ~25% of the whole count; this kernel
does it in ONE bandwidth-bound pass.

Form: counts are emitted at each segment's TAIL (last occurrence), 0
elsewhere — equivalent to the head form for every consumer (keys are
duplicated across the segment, liveness is ``counts > 0``), and it is
the form computable in a single forward pass: a segment's head position
is carried forward in SMEM across the sequential TPU grid, while its
tail is visible locally (next element differs, via a one-block halo).

Per grid step the kernel also emits the block's unique-segment count so
``n_unique`` is a trivial host-side sum of a [grid] vector.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas is TPU/interpret-only in some builds; degrade gracefully
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

LANES = 128
BLOCK_ROWS = 512


def _scan_max(x, axis):
    """Inclusive running max along axis via log-step shift-max.

    Written with roll/where/iota only — primitives with guaranteed
    Mosaic lowerings (lax.cummax's reduce_window form is not one).
    """
    n = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    s = 1
    while s < n:
        shifted = jnp.roll(x, s, axis=axis)
        x = jnp.where(idx >= s, jnp.maximum(x, shifted), x)
        s *= 2
    return x


def _kernel(n, block_rows, sentinel, hi_ref, lo_ref, nhi_ref, nlo_ref,
            cnt_ref, uniq_ref, carry_ref, prev_ref):
    i = pl.program_id(0)
    br, lanes = block_rows, LANES

    @pl.when(i == 0)
    def _init():
        carry_ref[0] = jnp.int32(-1)
        carry_ref[1] = jnp.int32(0)
        prev_ref[0] = jnp.uint32(0)
        prev_ref[1] = jnp.uint32(0)

    hi = hi_ref[...]
    lo = lo_ref[...]
    row = jax.lax.broadcasted_iota(jnp.int32, (br, lanes), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (br, lanes), 1)
    pos = i * (br * lanes) + row * lanes + col

    # previous element in flattened order: (r, c-1), or (r-1, 127) at
    # c == 0 (block-crossing value carried in SMEM)
    ph = jnp.roll(hi, 1, axis=1)
    plo = jnp.roll(lo, 1, axis=1)
    ph_sd = jnp.concatenate([jnp.full((1, lanes), prev_ref[0]), ph[:-1]], axis=0)
    plo_sd = jnp.concatenate([jnp.full((1, lanes), prev_ref[1]), plo[:-1]], axis=0)
    prev_hi = jnp.where(col > 0, ph, ph_sd)
    prev_lo = jnp.where(col > 0, plo, plo_sd)
    new = (pos == 0) | (hi != prev_hi) | (lo != prev_lo)

    # next element: (r, c+1), or (r+1, 0) at c == 127 (halo row supplies
    # the next block's first element for the last row)
    nh = jnp.roll(hi, -1, axis=1)
    nlo = jnp.roll(lo, -1, axis=1)
    nh_su = jnp.concatenate([nh[1:], jnp.full((1, lanes), nhi_ref[0, 0])], axis=0)
    nlo_su = jnp.concatenate([nlo[1:], jnp.full((1, lanes), nlo_ref[0, 0])], axis=0)
    next_hi = jnp.where(col < lanes - 1, nh, nh_su)
    next_lo = jnp.where(col < lanes - 1, nlo, nlo_su)
    tail = (hi != next_hi) | (lo != next_lo) | (pos == n - 1)

    # running head position: in-block 2D scan + cross-block SMEM carry.
    # All intermediates stay full-width [br, lanes] — Mosaic rejects
    # skinny [br, 1] concats ("offset mismatch on non-concat dimension").
    heads = jnp.where(new, pos, jnp.int32(-1))
    m1 = _scan_max(heads, axis=1)
    rowmax = jnp.broadcast_to(jnp.max(m1, axis=1, keepdims=True), (br, lanes))
    # inclusive scan over rows via log-step shift-down-max
    rs = rowmax
    s = 1
    while s < br:
        rs = jnp.maximum(
            rs,
            jnp.concatenate([jnp.full((s, lanes), jnp.int32(-1)), rs[:-s]], axis=0),
        )
        s *= 2
    # exclusive over rows, lower-bounded by the cross-block carry (a
    # segment head may lie many blocks back)
    rs_ex = jnp.concatenate([jnp.full((1, lanes), jnp.int32(-1)), rs[:-1]], axis=0)
    head_pos = jnp.maximum(m1, jnp.maximum(rs_ex, carry_ref[0]))

    live = pos < n
    if sentinel is not None:
        live = live & ~((hi == jnp.uint32(sentinel[0])) & (lo == jnp.uint32(sentinel[1])))
    cnt_ref[...] = jnp.where(tail & live, pos - head_pos + 1, 0).astype(jnp.int32)
    # running unique total in SMEM; the (1, 1) output is rewritten every
    # step (same block), so the final step's value is the grand total
    carry_ref[1] = carry_ref[1] + jnp.sum((new & live).astype(jnp.int32))
    uniq_ref[0, 0] = carry_ref[1]

    carry_ref[0] = head_pos[br - 1, lanes - 1]
    prev_ref[0] = hi[br - 1, lanes - 1]
    prev_ref[1] = lo[br - 1, lanes - 1]


@functools.partial(
    jax.jit, static_argnames=("sentinel", "interpret", "block_rows")
)
def segment_counts_sorted(shi, slo, sentinel=None, interpret: bool = False,
                          block_rows: int = BLOCK_ROWS):
    """Counts + unique total for a sorted (hi, lo) uint32 key stream.

    shi, slo: [n] uint32, sorted lexicographically by (hi, lo).
    sentinel: optional static (hi, lo) pair; matching slots count as
    absent (0 count, excluded from n_unique) — the masked-slot fold of
    ops/count.py.

    Returns (counts int32 [n] — segment totals at segment tails, 0
    elsewhere; n_unique int32 scalar).
    """
    if block_rows % 8:
        # the halo BlockSpec index map divides by 8 (TPU sublane tiling);
        # a non-multiple would misalign the halo and corrupt counts
        raise ValueError("block_rows must be a multiple of 8")
    n = shi.shape[0]
    block = LANES * block_rows
    nblocks = max(1, -(-n // block))
    rows = nblocks * block_rows
    padded = rows * LANES

    def _pad(x):
        x = x.ravel()
        return jnp.concatenate(
            [x, jnp.zeros((padded + 8 * LANES - n,), jnp.uint32)]
        ).reshape(rows + 8, LANES)

    hi2 = _pad(jnp.asarray(shi, jnp.uint32))
    lo2 = _pad(jnp.asarray(slo, jnp.uint32))

    kern = functools.partial(_kernel, n, block_rows, sentinel)
    halo = pl.BlockSpec(
        (8, LANES),
        lambda i: ((i * block_rows + block_rows) // 8, 0),
        memory_space=pltpu.VMEM,
    )
    main = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    counts, uniq = pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[main, main, halo, halo],
        out_specs=[
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SMEM((2,), jnp.uint32),
        ],
        interpret=interpret,
    )(hi2, lo2, hi2, lo2)
    return counts.reshape(-1)[:n], uniq[0, 0]
