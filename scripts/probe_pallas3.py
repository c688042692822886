"""TPU probe #4: gather axis-0 retest, honest primitive rates, dynamic
DMA, dispatch overhead, and one-jit pipeline restructure."""
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

VM = pl.BlockSpec(memory_space=pltpu.VMEM)

# (0) dispatch overhead: trivial kernel, 3 sizes
for shp in [(8, 128), (1024, 128)]:
    x0 = jnp.zeros(shp, jnp.uint32)
    def k0(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1
    f0 = jax.jit(pl.pallas_call(k0, out_shape=jax.ShapeDtypeStruct(shp, jnp.uint32),
                                in_specs=[VM], out_specs=VM))
    t, _ = bench(f0, x0)
    print(f"dispatch_overhead {shp}: {t*1e3:.2f}ms", flush=True)

# (1) axis-0 gather retests
def try_it(name, fn, *args, oracle=None):
    try:
        r = jax.jit(fn)(*args); sync(r)
        ok = "" if oracle is None else f" correct: {bool(oracle(np.asarray(r)))}"
        print(f"{name}: OK{ok}", flush=True)
        return r
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: "
              + str(e).replace(chr(10), ' | ')[:150], flush=True)
        return None

for R, dt in [(8, jnp.int32), (64, jnp.int32), (512, jnp.uint32), (64, jnp.float32)]:
    L = 128
    xx = jnp.arange(R * L).reshape(R, L).astype(dt)
    ii = jnp.asarray(np.random.default_rng(R).integers(0, R, (R, L)), jnp.int32)
    def kg(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)
    fn = pl.pallas_call(kg, out_shape=jax.ShapeDtypeStruct((R, L), dt),
                        in_specs=[VM, VM], out_specs=VM)
    try_it(f"gather_axis0 R={R} {dt.__name__}", fn, xx, ii,
           oracle=lambda r, xx=xx, ii=ii: np.array_equal(
               r, np.take_along_axis(np.asarray(xx), np.asarray(ii), 0)))

# transpose-based fallback for axis0
R, L = 64, 128
xx = jnp.arange(R * L, dtype=jnp.uint32).reshape(R, L)
ii = jnp.asarray(np.random.default_rng(3).integers(0, R, (R, L)), jnp.int32)
def kt(x_ref, i_ref, o_ref):
    xt = x_ref[...].T  # [L, R]
    it = i_ref[...].T
    g = jnp.take_along_axis(xt, it, axis=1)
    o_ref[...] = g.T
fn = pl.pallas_call(kt, out_shape=jax.ShapeDtypeStruct((R, L), jnp.uint32),
                    in_specs=[VM, VM], out_specs=VM)
try_it("gather_axis0_via_transpose", fn, xx, ii,
       oracle=lambda r: np.array_equal(
           r, np.take_along_axis(np.asarray(xx), np.asarray(ii), 0)))

# (2) amplified rates: grid of 128 blocks [512,128] resident in HBM,
# in-kernel loop of 128 steps -> total = 128*512*128*128 = 1.07G ops/call
BR, L, G, STEPS = 512, 128, 128, 128
big = jax.random.bits(jax.random.PRNGKey(0), (G * BR, L), jnp.uint32)
idxb = jax.random.bits(jax.random.PRNGKey(1), (G * BR, L), jnp.uint32) % BR
gspec = pl.BlockSpec((BR, L), lambda i: (i, 0), memory_space=pltpu.VMEM)

def rate(name, kern, nin, total_ops):
    ins = [big, jnp.asarray(idxb, jnp.int32)][:nin]
    try:
        f = jax.jit(pl.pallas_call(
            kern, grid=(G,), out_shape=jax.ShapeDtypeStruct((G * BR, L), jnp.uint32),
            in_specs=[gspec] * nin, out_specs=gspec))
        t, _ = bench(f, *ins)
        print(f"{name}: {t*1e3:.2f}ms -> {total_ops/t/1e9:.1f}G/s", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: "
              + str(e).replace(chr(10), ' | ')[:150], flush=True)

TOT = G * BR * L * STEPS

def k_cmpex1(x_ref, o_ref):
    h = x_ref[...]
    for s in range(STEPS):
        d = 1 << (s % 7)
        ph = jnp.roll(h, d, axis=1)
        h = jnp.minimum(ph, h) + 1
    o_ref[...] = h
rate("cmpex1_roll_lanes(amplified)", k_cmpex1, 1, TOT)

def k_cmpex1r(x_ref, o_ref):
    h = x_ref[...]
    for s in range(STEPS):
        d = 1 << (s % 7)
        ph = jnp.roll(h, d, axis=0)
        h = jnp.minimum(ph, h) + 1
    o_ref[...] = h
rate("cmpex1_roll_rows(amplified)", k_cmpex1r, 1, TOT)

def k_gather1(x_ref, i_ref, o_ref):
    h = x_ref[...]
    i = i_ref[...] % L
    for s in range(STEPS):
        h = jnp.take_along_axis(h, i, axis=1) + 1
    o_ref[...] = h
rate("gather_lanes(amplified)", k_gather1, 2, TOT)

def k_gather0(x_ref, i_ref, o_ref):
    h = x_ref[...]
    i = i_ref[...]  # already < BR
    for s in range(STEPS):
        h = jnp.take_along_axis(h, i, axis=0) + 1
    o_ref[...] = h
rate("gather_rows(amplified)", k_gather0, 2, TOT)

def k_add(x_ref, o_ref):
    h = x_ref[...]
    for s in range(STEPS):
        h = h + 1
    o_ref[...] = h
rate("plain_add(amplified)", k_add, 1, TOT)

# (3) dynamic-offset DMA from an ANY/HBM ref driven by an SMEM input
N = 1 << 14
src = jnp.arange(N, dtype=jnp.uint32).reshape(N // 128, 128)
offs = jnp.asarray([96, 0, 24, 64], jnp.int32)  # row offsets per grid step
def k_dma(off_ref, src_ref, o_ref):
    i = pl.program_id(0)
    def body(scr, sem):
        cp = pltpu.make_async_copy(src_ref.at[pl.ds(off_ref[i], 8)], scr, sem)
        cp.start(); cp.wait()
        o_ref[...] = scr[...]
    pl.run_scoped(body, scr=pltpu.VMEM((8, 128), jnp.uint32),
                  sem=pltpu.SemaphoreType.DMA(()))
try:
    f = jax.jit(pl.pallas_call(
        k_dma, grid=(4,),
        out_shape=jax.ShapeDtypeStruct((4 * 8, 128), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)))
    r = f(offs, src); sync(r)
    exp = np.concatenate([np.asarray(src)[o:o+8] for o in [96, 0, 24, 64]])
    print("dyn_dma_smem_offsets: OK correct:",
          np.array_equal(np.asarray(r), exp), flush=True)
except Exception as e:
    print("dyn_dma_smem_offsets: FAIL", str(e).replace(chr(10), ' | ')[:200], flush=True)

# (4) one-jit full count pipeline (phase-major stream mode), k=21 canonical
from kmer_tpu.native import pack2bit_rows
from kmer_tpu.ops.count import count_windows
from kmer_tpu.ops.extract import canonicalize, extract_from_words, phase_major_valid, simulate_reads
read_len, k = 150, 21
n_reads = 1 << 20
total = n_reads * (read_len - k + 1)
nw_total = n_reads * read_len // 16
words = jnp.asarray(pack2bit_rows(simulate_reads(n_reads, read_len, seed=0).reshape(1, -1))[0])
def count_all(w):
    h, l = extract_from_words(w, k)
    h, l = canonicalize(h, l, k)
    valid = phase_major_valid(nw_total, read_len, n_reads, k)
    return count_windows(h.ravel(), l.ravel(), valid.ravel(), k).n_unique
t, r = bench(jax.jit(count_all), words)
print(f"one_jit_stream_count: {t:.3f}s -> {total/t/1e6:.0f}M kmers/s "
      f"(n_unique={int(r)})", flush=True)

print("done", flush=True)
