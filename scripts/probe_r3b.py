"""TPU probe r3b: close the remaining unmeasured legs of the
partition-merge evaluation (PERF.md §5):

1. Pallas HBM->HBM dynamic-offset DMA — r3a's 1-D fori_loop kernel
   crashed the Mosaic compiler on every config; try 2-D refs, grid-per-
   copy, and static-offset variants to find a compiling shape and
   measure the descriptor issue rate.
2. Block gather (vmap of dynamic_slice == XLA gather with big
   slice_sizes) — the no-Pallas redistribution candidate.
3. Stage-1 alternates at R=130: 1-key sort with u32 payload, and 3-lane
   (key + 2 payloads).
4. Segment counts on batched rows (stage-3 shape) for the pencil.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp

print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)

def sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(jax.device_get(leaf))
        break

def bench(name, fn, *args, iters=3, total=None):
    try:
        out = fn(*args); sync(out)
        best = 1e9
        for _ in range(iters):
            t0 = time.perf_counter(); out = fn(*args); sync(out)
            best = min(best, time.perf_counter() - t0)
        rate = f" -> {total/best/1e6:.0f}M/s" if total else ""
        print(f"{name}: {best*1e3:.1f}ms{rate}", flush=True)
        return best, out
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: "
              + str(e).replace(chr(10), ' | ')[:160], flush=True)
        return None, None

N = 130 * (1 << 20)  # 136.3M, bench-sized
rng = np.random.default_rng(0)
hi = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint64).astype(np.uint32))
lo16 = jnp.asarray(rng.integers(0, 2**16, N, dtype=np.uint32).astype(np.uint16))
sync(hi); sync(lo16)

# --- 3: stage-1 alternates at R=130 -------------------------------------
R = 130; C = N // R
def consume2(a, b):
    return jnp.maximum(jnp.max(a), b.max().astype(jnp.uint32))

bench("G_rowsort_1key_u32pay_R130", jax.jit(
    lambda h, l: consume2(*jax.lax.sort(
        (h.reshape(R, C), l.reshape(R, C).astype(jnp.uint32)),
        dimension=1, num_keys=1, is_stable=False))),
    hi, lo16, total=N)
bench("G_rowsort_1key_u16pay_R130", jax.jit(
    lambda h, l: consume2(*jax.lax.sort(
        (h.reshape(R, C), l.reshape(R, C)),
        dimension=1, num_keys=1, is_stable=False))),
    hi, lo16, total=N)

# --- 2: block gather (vmap dynamic_slice) -------------------------------
for n_slices, seg in ((16640, 8192), (133120, 1536), (133120, 1024),
                      (532480, 384)):
    starts = jnp.asarray(
        rng.integers(0, N - seg, n_slices, dtype=np.int64).astype(np.int32))
    f = jax.jit(lambda s, x, seg=seg: jnp.max(
        jax.vmap(lambda st: jax.lax.dynamic_slice(x, (st,), (seg,)))(s)))
    bench(f"H_blockgather_{n_slices}x{seg}", f, starts, hi,
          total=n_slices * seg)

# --- 4: per-row boundaries+counts at stage-3 shape ----------------------
from kmer_tpu.ops.count import _segment_counts

def rowcounts(h):
    x = h.reshape(1024, N // 1024)
    new = jnp.concatenate(
        [jnp.ones((1024, 1), bool), x[:, 1:] != x[:, :-1]], axis=1)
    pos = jnp.arange(N // 1024, dtype=jnp.int32)[None, :]
    b = jnp.where(new, pos, N // 1024)
    sufmin = jax.lax.cummin(b, axis=1, reverse=True)
    nxt = jnp.concatenate(
        [sufmin[:, 1:], jnp.full((1024, 1), N // 1024, jnp.int32)], axis=1)
    cnt = jnp.where(new, nxt - pos, 0)
    return jnp.max(cnt) + jnp.sum(new.astype(jnp.int32))
bench("I_row_segment_counts_1024", jax.jit(rowcounts), hi, total=N)

# --- 1: Pallas DMA variants ---------------------------------------------
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = N // 128  # 2-D view [M, 128]
hi2d = hi.reshape(M, 128)
sync(hi2d)

# 1a: single static copy, 1-D refs
def mk_static1d(seg):
    def kernel(in_ref, out_ref):
        def body(sem):
            pltpu.make_async_copy(
                in_ref.at[pl.ds(0, seg)], out_ref.at[pl.ds(0, seg)], sem
            ).start()
            pltpu.make_async_copy(
                in_ref.at[pl.ds(0, seg)], out_ref.at[pl.ds(0, seg)], sem
            ).wait()
        pl.run_scoped(body, pltpu.SemaphoreType.DMA(()))
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((seg,), jnp.uint32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
bench("J_dma_static_1d_single", jax.jit(
    lambda x: jnp.max(mk_static1d(1024)(x))), hi, total=1)

# 1b: single dynamic-offset copy, 1-D refs, scalar prefetch
def mk_dyn1d(seg):
    def kernel(off_ref, in_ref, out_ref):
        def body(sem):
            d = pltpu.make_async_copy(
                in_ref.at[pl.ds(off_ref[0], seg)],
                out_ref.at[pl.ds(0, seg)], sem)
            d.start(); d.wait()
        pl.run_scoped(body, pltpu.SemaphoreType.DMA(()))
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY)),
        out_shape=jax.ShapeDtypeStruct((seg,), jnp.uint32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
off1 = jnp.asarray([12345], jnp.int32)
bench("J_dma_dyn_1d_single", jax.jit(
    lambda o, x: jnp.max(mk_dyn1d(1024)(o, x))), off1, hi, total=1)

# 1c: fori_loop of dynamic copies, 1-D refs (r3a shape, small G)
def mk_loop1d(G, seg, n_out):
    def kernel(in_off_ref, out_off_ref, in_ref, out_ref):
        def body(sem):
            def loop(g, _):
                d = pltpu.make_async_copy(
                    in_ref.at[pl.ds(in_off_ref[g], seg)],
                    out_ref.at[pl.ds(out_off_ref[g], seg)], sem)
                d.start(); d.wait()
                return 0
            jax.lax.fori_loop(0, G, loop, 0)
        pl.run_scoped(body, pltpu.SemaphoreType.DMA(()))
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY)),
        out_shape=jax.ShapeDtypeStruct((n_out,), jnp.uint32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
G = 256; seg = 1024
ioff = jnp.asarray(rng.integers(0, N - seg, G, dtype=np.int64).astype(np.int32))
ooff = jnp.asarray((np.arange(G) * seg).astype(np.int32))
bench("J_dma_loop_1d_G256", jax.jit(
    lambda a, b, x: jnp.max(mk_loop1d(G, seg, G * seg)(a, b, x))),
    ioff, ooff, hi, total=G)

# 1d: grid-per-copy, 2-D refs, row-aligned dynamic offsets
def mk_grid2d(G, segrows, n_out_rows):
    def kernel(in_off_ref, out_off_ref, in_ref, out_ref):
        g = pl.program_id(0)
        def body(sem):
            d = pltpu.make_async_copy(
                in_ref.at[pl.ds(in_off_ref[g], segrows), :],
                out_ref.at[pl.ds(out_off_ref[g], segrows), :], sem)
            d.start(); d.wait()
        pl.run_scoped(body, pltpu.SemaphoreType.DMA(()))
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(G,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY)),
        out_shape=jax.ShapeDtypeStruct((n_out_rows, 128), jnp.uint32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
for G, segrows in ((1024, 8), (16384, 8), (16384, 12), (131072, 8)):
    n_out_rows = G * segrows
    if n_out_rows > M:
        continue
    ioff = jnp.asarray(
        rng.integers(0, M - segrows, G, dtype=np.int64).astype(np.int32))
    ooff = jnp.asarray((np.arange(G) * segrows).astype(np.int32))
    bench(f"K_dma_grid2d_G{G}_rows{segrows}", jax.jit(
        lambda a, b, x, G=G, s=segrows, n=n_out_rows: jnp.max(
            mk_grid2d(G, s, n)(a, b, x))),
        ioff, ooff, hi2d, total=G)

# 1e: fori_loop 2-D double-buffered (the real redistribution shape)
def mk_loop2d(G, segrows, n_out_rows):
    def kernel(in_off_ref, out_off_ref, in_ref, out_ref):
        def body(sem):
            def get(g, slot):
                return pltpu.make_async_copy(
                    in_ref.at[pl.ds(in_off_ref[g], segrows), :],
                    out_ref.at[pl.ds(out_off_ref[g], segrows), :],
                    sem.at[slot])
            get(0, 0).start()
            def loop(g, _):
                @pl.when(g + 1 < G)
                def _():
                    get(g + 1, (g + 1) % 2).start()
                get(g, g % 2).wait()
                return 0
            jax.lax.fori_loop(0, G, loop, 0)
        pl.run_scoped(body, pltpu.SemaphoreType.DMA((2,)))
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY)),
        out_shape=jax.ShapeDtypeStruct((n_out_rows, 128), jnp.uint32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
for G, segrows in ((16384, 8), (131072, 8)):
    n_out_rows = G * segrows
    if n_out_rows > M:
        continue
    ioff = jnp.asarray(
        rng.integers(0, M - segrows, G, dtype=np.int64).astype(np.int32))
    ooff = jnp.asarray((np.arange(G) * segrows).astype(np.int32))
    bench(f"L_dma_loop2d_G{G}_rows{segrows}", jax.jit(
        lambda a, b, x, G=G, s=segrows, n=n_out_rows: jnp.max(
            mk_loop2d(G, s, n)(a, b, x))),
        ioff, ooff, hi2d, total=G)

print("probe_r3b done", flush=True)
