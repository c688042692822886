"""TPU probe #2: Mosaic capability + throughput checks that decide the
merge-sort engine design.

(a) per-lane dynamic gather (jnp.take_along_axis / x[idx]) in VMEM
(b) dynamic roll (pltpu.roll with traced shift)
(c) VPU compare-exchange throughput on [rows,128] uint32 lanes
(d) MXU int8 one-hot batched permute throughput
(e) leftover round-1 measurements: segment_counts + extraction phases
"""
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

def try_kernel(name, kern, out_shape, *inputs, grid=None, **kw):
    try:
        f = pl.pallas_call(kern, out_shape=out_shape, grid=grid, **kw)
        r = jax.jit(f)(*inputs)
        sync(r)
        print(f"{name}: OK", flush=True)
        return r
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return None

R, L = 64, 128

# (a1) take_along_axis along lanes
x = jnp.arange(R * L, dtype=jnp.uint32).reshape(R, L)
idx = jnp.asarray(np.random.default_rng(0).integers(0, L, (R, L)), jnp.int32)
def k_gather_lanes(x_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)
r = try_kernel("gather_lanes(take_along_axis axis=1)", k_gather_lanes,
               jax.ShapeDtypeStruct((R, L), jnp.uint32), x, idx,
               in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
               out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
if r is not None:
    ok = np.array_equal(np.asarray(r), np.take_along_axis(np.asarray(x), np.asarray(idx), 1))
    print(f"  correct: {ok}", flush=True)

# (a2) gather along sublanes (axis=0)
idx0 = jnp.asarray(np.random.default_rng(1).integers(0, R, (R, L)), jnp.int32)
def k_gather_rows(x_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)
r = try_kernel("gather_rows(take_along_axis axis=0)", k_gather_rows,
               jax.ShapeDtypeStruct((R, L), jnp.uint32), x, idx0,
               in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
               out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
if r is not None:
    ok = np.array_equal(np.asarray(r), np.take_along_axis(np.asarray(x), np.asarray(idx0), 0))
    print(f"  correct: {ok}", flush=True)

# (a3) flat 1D-style gather from a big VMEM table: x.reshape? try 2D table row-0
tab = jnp.arange(8 * 128, dtype=jnp.uint32).reshape(8, 128)
idx2 = jnp.asarray(np.random.default_rng(2).integers(0, 8 * 128, (R, L)), jnp.int32)
def k_gather_table(t_ref, i_ref, o_ref):
    t = t_ref[...].reshape(-1)
    o_ref[...] = t[i_ref[...]]
r = try_kernel("gather_flat_table(x[idx] 1D)", k_gather_table,
               jax.ShapeDtypeStruct((R, L), jnp.uint32), tab, idx2,
               in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
               out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
if r is not None:
    ok = np.array_equal(np.asarray(r), np.asarray(tab).reshape(-1)[np.asarray(idx2)])
    print(f"  correct: {ok}", flush=True)

# (b) dynamic roll
sh = jnp.asarray([[3]], jnp.int32)
def k_dynroll(x_ref, s_ref, o_ref):
    o_ref[...] = pltpu.roll(x_ref[...], s_ref[0, 0], axis=1)
r = try_kernel("dynamic_roll(lanes)", k_dynroll,
               jax.ShapeDtypeStruct((R, L), jnp.uint32), x, sh,
               in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                         pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
               out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
if r is not None:
    ok = np.array_equal(np.asarray(r), np.roll(np.asarray(x), -0, 1) if False else np.roll(np.asarray(x), 3, 1))
    print(f"  correct(+3): {ok}  (semantics may be -3: "
          f"{np.array_equal(np.asarray(r), np.roll(np.asarray(x), -3, 1))})", flush=True)

# (c) VPU compare-exchange throughput: 64 bitonic-like stages over a
# resident [1024,128] block, uint32 2-lane keys
BR = 1024
def k_vpu(h_ref, l_ref, oh_ref, ol_ref):
    h = h_ref[...]; l = l_ref[...]
    for s in range(64):
        d = 1 << (s % 7)
        ph = pltpu.roll(h, d, axis=1); plo = pltpu.roll(l, d, axis=1)
        take = (ph < h) | ((ph == h) & (plo < l))
        h = jnp.where(take, ph, h); l = jnp.where(take, plo, l)
    oh_ref[...] = h; ol_ref[...] = l
hh = jax.random.bits(jax.random.PRNGKey(0), (BR, L), jnp.uint32)
ll = jax.random.bits(jax.random.PRNGKey(1), (BR, L), jnp.uint32)
spec = pl.BlockSpec(memory_space=pltpu.VMEM)
f = pl.pallas_call(k_vpu, out_shape=[jax.ShapeDtypeStruct((BR, L), jnp.uint32)] * 2,
                   in_specs=[spec, spec], out_specs=[spec, spec])
REP = 64
def many(h, l):
    for _ in range(REP):
        h, l = f(h, l)
    return h, l
t, _ = bench(jax.jit(many), hh, ll)
n_ops = BR * L * 64 * REP  # compare-exchange count
print(f"vpu_cmpex: {t*1e3:.2f}ms for {n_ops/1e9:.2f}G cmpex -> {n_ops/t/1e12:.2f}T cmpex/s", flush=True)

# (d) MXU int8 batched one-hot permute: [G,128,128] i8 @ [G,128,8] i8
G = 256
P = jax.random.bits(jax.random.PRNGKey(2), (G, 128, 128), jnp.uint32).astype(jnp.int8)
V = jax.random.bits(jax.random.PRNGKey(3), (G, 128, 8), jnp.uint32).astype(jnp.int8)
def mm(p, v):
    return jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.int32)
t, _ = bench(jax.jit(mm), P, V)
macs = G * 128 * 128 * 8
print(f"mxu_bmm_i8 [G,128,128]x[G,128,8]: {t*1e3:.3f}ms -> {macs/t/1e12:.2f}TMAC/s "
      f"({G*128} elts permuted -> {G*128/t/1e6:.0f}M elt/s)", flush=True)

# (e) leftovers: segment_counts + extraction timing
from kmer_tpu.pallas.segment_counts import segment_counts_sorted
N = 1 << 27
hi = jax.random.bits(jax.random.PRNGKey(4), (N,), jnp.uint32)
sh_, = jax.lax.sort((hi,), num_keys=1)
sync(sh_)
fs = jax.jit(lambda a: segment_counts_sorted(a, jnp.zeros_like(a)))
t, _ = bench(fs, sh_)
print(f"segment_counts n=2^27: {t:.3f}s", flush=True)

from kmer_tpu.native import device_unpack_rows, pack2bit_rows
from kmer_tpu.ops.extract import canonicalize, extract_windows_batch, simulate_reads, extract_from_words, phase_major_valid
read_len, k = 150, 21
chunk = 1 << 17
wpr = read_len - k + 1
words = jnp.asarray(pack2bit_rows(simulate_reads(chunk, read_len, seed=0)))
lengths = jnp.full((chunk,), read_len, jnp.int32)
total = (1 << 20) * wpr
def extract_place(bh, bl, w, start):
    codes = device_unpack_rows(w, read_len)
    wins, _ = extract_windows_batch(codes, lengths, k)
    h, l = canonicalize(wins.hi, wins.lo, k)
    return (jax.lax.dynamic_update_slice(bh, h.ravel(), (start,)),
            jax.lax.dynamic_update_slice(bl, l.ravel(), (start,)))
ep = jax.jit(extract_place, donate_argnums=(0, 1))
def all_extract():
    bh = jnp.zeros((total,), jnp.uint32)
    bl = jnp.zeros((total,), jnp.uint32)
    for i in range(8):
        bh, bl = ep(bh, bl, words, i * chunk * wpr)
    return bh
t, _ = bench(all_extract)
print(f"extract+canon+place 136M windows (8 chunks): {t:.3f}s", flush=True)

# phase-major single-shot extraction (no unpack, no chunk loop)
n_reads_s = 1 << 20
words1 = jnp.asarray(pack2bit_rows(simulate_reads(n_reads_s, read_len, seed=0).reshape(1, -1))[0])
def ext_stream(w):
    h, l = extract_from_words(w, k)
    h, l = canonicalize(h, l, k)
    return h, l
t, _ = bench(jax.jit(ext_stream), words1)
print(f"extract_from_words+canon (phase-major, 157M slots): {t:.3f}s", flush=True)

print("done", flush=True)
