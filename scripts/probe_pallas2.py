"""TPU probe #3: fixed Mosaic capability tests + honest primitive rates."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)

def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[..., -1:])

def bench(fn, *args, iters=3):
    out = fn(*args); sync(out)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter(); out = fn(*args); sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out

def try_kernel(name, kern, out_shape, *inputs, **kw):
    try:
        f = pl.pallas_call(kern, out_shape=out_shape, **kw)
        r = jax.jit(f)(*inputs)
        sync(r)
        print(f"{name}: OK", flush=True)
        return r
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return None

R, L = 64, 128
VM = pl.BlockSpec(memory_space=pltpu.VMEM)
x = jnp.arange(R * L, dtype=jnp.uint32).reshape(R, L)

# (a1) take_along_axis along lanes
idx = jnp.asarray(np.random.default_rng(0).integers(0, L, (R, L)), jnp.int32)
def k_gl(x_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)
r = try_kernel("gather_lanes", k_gl, jax.ShapeDtypeStruct((R, L), jnp.uint32),
               x, idx, in_specs=[VM, VM], out_specs=VM)
if r is not None:
    print("  correct:", np.array_equal(np.asarray(r),
          np.take_along_axis(np.asarray(x), np.asarray(idx), 1)), flush=True)

# (a2) along sublanes
idx0 = jnp.asarray(np.random.default_rng(1).integers(0, R, (R, L)), jnp.int32)
def k_gr(x_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)
r = try_kernel("gather_rows", k_gr, jax.ShapeDtypeStruct((R, L), jnp.uint32),
               x, idx0, in_specs=[VM, VM], out_specs=VM)
if r is not None:
    print("  correct:", np.array_equal(np.asarray(r),
          np.take_along_axis(np.asarray(x), np.asarray(idx0), 0)), flush=True)

# (b) dynamic roll on lanes
shv = jnp.asarray([3], jnp.int32)
def k_dr(s_ref, x_ref, o_ref):
    o_ref[...] = pltpu.roll(x_ref[...], s_ref[0], axis=1)
r = try_kernel("dynamic_roll_lanes", k_dr,
               jax.ShapeDtypeStruct((R, L), jnp.uint32), shv, x,
               in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), VM],
               out_specs=VM)
if r is not None:
    a = np.asarray(r); b = np.asarray(x)
    print("  matches roll(+3):", np.array_equal(a, np.roll(b, 3, 1)),
          " roll(-3):", np.array_equal(a, np.roll(b, -3, 1)), flush=True)

# (g) in-kernel jnp.sort along lanes
def k_sort(x_ref, o_ref):
    o_ref[...] = jnp.sort(x_ref[...], axis=1)
try_kernel("inkernel_sort_lanes", k_sort,
           jax.ShapeDtypeStruct((R, L), jnp.uint32), x,
           in_specs=[VM], out_specs=VM)

# (c) primitive-rate microbenches: one launch, many in-kernel stages on a
# resident [1024,128] 2-lane block
BR = 1024
STAGES = 256
hh = jax.random.bits(jax.random.PRNGKey(0), (BR, L), jnp.uint32)
ll = jax.random.bits(jax.random.PRNGKey(1), (BR, L), jnp.uint32)

def rate(name, kern):
    try:
        f = pl.pallas_call(
            kern, out_shape=[jax.ShapeDtypeStruct((BR, L), jnp.uint32)] * 2,
            in_specs=[VM, VM], out_specs=[VM, VM])
        t, _ = bench(jax.jit(f), hh, ll)
        n = BR * L * STAGES
        print(f"{name}: {t*1e3:.2f}ms -> {n/t/1e9:.1f}G cmpex/s", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: "
              + str(e).replace(chr(10), ' | ')[:160], flush=True)

def k_roll_lanes(h_ref, l_ref, oh, ol):
    h, l = h_ref[...], l_ref[...]
    for s in range(STAGES):
        d = 1 << (s % 7)
        ph, plo = jnp.roll(h, d, axis=1), jnp.roll(l, d, axis=1)
        take = (ph < h) | ((ph == h) & (plo < l))
        h = jnp.where(take, ph, h); l = jnp.where(take, plo, l)
    oh[...] = h; ol[...] = l
rate("cmpex_jnp_roll_lanes", k_roll_lanes)

def k_ptpu_roll_lanes(h_ref, l_ref, oh, ol):
    h, l = h_ref[...], l_ref[...]
    for s in range(STAGES):
        d = 1 << (s % 7)
        ph, plo = pltpu.roll(h, d, axis=1), pltpu.roll(l, d, axis=1)
        take = (ph < h) | ((ph == h) & (plo < l))
        h = jnp.where(take, ph, h); l = jnp.where(take, plo, l)
    oh[...] = h; ol[...] = l
rate("cmpex_pltpu_roll_lanes", k_ptpu_roll_lanes)

def k_roll_rows(h_ref, l_ref, oh, ol):
    h, l = h_ref[...], l_ref[...]
    for s in range(STAGES):
        d = 1 << (s % 7)
        ph, plo = jnp.roll(h, d, axis=0), jnp.roll(l, d, axis=0)
        take = (ph < h) | ((ph == h) & (plo < l))
        h = jnp.where(take, ph, h); l = jnp.where(take, plo, l)
    oh[...] = h; ol[...] = l
rate("cmpex_jnp_roll_rows", k_roll_rows)

def k_concat_rows(h_ref, l_ref, oh, ol):
    h, l = h_ref[...], l_ref[...]
    for s in range(STAGES):
        d = 1 << (s % 7)
        ph = jnp.concatenate([h[d:], h[:d]], axis=0)
        plo = jnp.concatenate([l[d:], l[:d]], axis=0)
        take = (ph < h) | ((ph == h) & (plo < l))
        h = jnp.where(take, ph, h); l = jnp.where(take, plo, l)
    oh[...] = h; ol[...] = l
rate("cmpex_concat_rows", k_concat_rows)

# single-lane variant: how much does the 2nd lane cost?
def rate1(name, kern):
    try:
        f = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((BR, L), jnp.uint32),
                           in_specs=[VM], out_specs=VM)
        t, _ = bench(jax.jit(f), hh)
        n = BR * L * STAGES
        print(f"{name}: {t*1e3:.2f}ms -> {n/t/1e9:.1f}G cmpex/s", flush=True)
    except Exception as e:
        print(f"{name}: FAIL", str(e).replace(chr(10), ' | ')[:120], flush=True)

def k_roll_rows1(h_ref, oh):
    h = h_ref[...]
    for s in range(STAGES):
        d = 1 << (s % 7)
        ph = jnp.roll(h, d, axis=0)
        h = jnp.minimum(ph, h)
    oh[...] = h
rate1("minex_roll_rows_1lane", k_roll_rows1)

# (f) dynamic-offset DMA via scalar prefetch
N = 1 << 16
CH = 1024
src = jnp.arange(N, dtype=jnp.uint32).reshape(N // 256, 256)
offs = jnp.asarray([13, 1029, 777, 40000], jnp.int32)  # row offsets
def k_dma(off_ref, src_ref, o_ref, sem):
    i = pl.program_id(0)
    start = off_ref[i] // 256  # row index
    cp = pltpu.make_async_copy(src_ref.at[pl.ds(start, CH // 256)],
                               o_ref, sem)
    cp.start(); cp.wait()
try:
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((CH // 256, 256), lambda i, off: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    f = pl.pallas_call(k_dma, grid_spec=gs,
                       out_shape=jax.ShapeDtypeStruct((CH // 256, 256), jnp.uint32))
    r = jax.jit(f)(offs, src)
    sync(r)
    exp = np.asarray(src).reshape(-1)[(40000 // 256) * 256:][:CH].reshape(CH // 256, 256)
    print("dyn_dma_prefetch: OK correct:", np.array_equal(np.asarray(r), exp), flush=True)
except Exception as e:
    print("dyn_dma_prefetch: FAIL", str(e).replace(chr(10), ' | ')[:200], flush=True)

# (h) MXU reference rate: bf16 [G,128,128] @ [G,128,128]
G = 64
A = jax.random.normal(jax.random.PRNGKey(2), (G, 128, 128), jnp.bfloat16)
B = jax.random.normal(jax.random.PRNGKey(3), (G, 128, 128), jnp.bfloat16)
def mm(a, b):
    return jax.lax.dot_general(a, b, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)
t, _ = bench(jax.jit(mm), A, B)
macs = G * 128 ** 3
print(f"mxu_bmm_bf16: {t*1e3:.3f}ms -> {2*macs/t/1e12:.1f} TFLOPs", flush=True)

print("done", flush=True)
