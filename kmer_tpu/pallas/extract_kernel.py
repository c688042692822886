"""Fused Pallas sliding-window extraction kernel.

TPU-native replacement for the reference's per-tuple SRF hot loop
(/root/reference/kmer.c:287-351, one palloc+memcpy+executor round trip
per k-mer).  The code stream lives in HBM as a [R, 128] int32 lane
layout; each grid step loads a [BR, 128] block (plus a one-row halo for
windows crossing the 128-lane boundary) into VMEM and produces the
packed (hi, lo) uint32 window lanes for all BR*128 positions with k
static shift-or steps on the VPU — no scan, no per-window control flow.

Window at flattened position p packs codes[p : p+k] left-aligned
(identical layout to ops.extract.extract_windows).  Validity of windows
that cross read boundaries is the caller's concern (a cheap elementwise
mask), keeping the kernel branch-free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..codec import MAX_K

try:  # pallas is TPU/interpret-only in some builds; degrade gracefully
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def pallas_available() -> bool:
    return _PALLAS_OK


LANES = 128
BLOCK_ROWS = 256  # rows of 128 lanes per grid step (128 KiB int32 in VMEM)


def _extract_kernel(k: int, block_rows: int, x_ref, nxt_ref, hi_ref, lo_ref):
    x = x_ref[...].astype(jnp.uint32)            # [BR, 128]
    nxt = nxt_ref[0:1].astype(jnp.uint32)        # first halo row of [8, 128]
    x_ext = jnp.concatenate([x, nxt], axis=0)    # [BR+1, 128]
    col = jax.lax.broadcasted_iota(jnp.int32, (block_rows, LANES), 1)
    hi = jnp.zeros((block_rows, LANES), jnp.uint32)
    lo = jnp.zeros((block_rows, LANES), jnp.uint32)
    for j in range(k):
        if j == 0:
            s = x_ext[:block_rows]
        else:
            a = jnp.roll(x_ext, -j, axis=1)      # a[r, c] = x_ext[r, (c+j) % 128]
            # flat shift by j: element (r*128 + c + j)
            s = jnp.where(col < LANES - j, a[:block_rows], a[1 : block_rows + 1])
        if j < 16:
            hi = hi | (s << jnp.uint32(30 - 2 * j))
        else:
            lo = lo | (s << jnp.uint32(30 - 2 * (j - 16)))
    hi_ref[...] = hi
    lo_ref[...] = lo


@functools.partial(jax.jit, static_argnames=("k", "interpret", "block_rows"))
def extract_stream_pallas(codes, k: int, interpret: bool = False,
                          block_rows: int = BLOCK_ROWS):
    """Packed windows of a flat code stream via the Pallas kernel.

    codes: [n] integer array of 2-bit codes, n a multiple of 128*block_rows
    is NOT required — the stream is padded internally.  Returns
    (hi, lo) uint32 arrays of shape [n]: window i packs codes[i:i+k]
    (windows whose tail crosses the end read zero padding; callers mask
    them invalid).
    """
    if not (0 < k <= MAX_K):
        raise ValueError(f"k must be in 1..{MAX_K}")
    codes = jnp.asarray(codes)
    if block_rows % 8:
        raise ValueError("block_rows must be a multiple of 8 (TPU sublane tiling)")
    n = codes.shape[0]
    block = LANES * block_rows
    rows = max(1, -(-n // block)) * block_rows   # ceil to whole blocks
    padded = rows * LANES
    # pad by 8 halo rows: the halo BlockSpec is an (8, 128) tile (TPU
    # requires sublane counts divisible by 8) of which the kernel reads
    # only the first row
    x = jnp.zeros((padded + 8 * LANES,), jnp.int32).at[:n].set(codes.astype(jnp.int32))
    x = x.reshape(rows + 8, LANES)
    grid = rows // block_rows

    kern = functools.partial(_extract_kernel, k, block_rows)
    hi, lo = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda i: ((i * block_rows + block_rows) // 8, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
        ],
        interpret=interpret,
    )(x, x)
    return hi.reshape(-1)[:n], lo.reshape(-1)[:n]
