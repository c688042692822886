"""TPU probe r3a: foundation measurements for the sample-partition merge
engine (VERDICT r3 item #1 — the last identified lever on the sort floor).

Plan under evaluation (DESIGN.md §8):
  stage 1: batched row sort of [R, C] window lanes (measured 3-6x the
           global sort's per-element rate at some shapes);
  splitters: P global hi-splitters from a strided sample of the sorted
           rows; per-row partition offsets via searchsorted;
  stage 2: Pallas DMA redistribution of the R*P sorted segments into P
           contiguous partitions (descriptor-issue-bound: this probe
           measures the issue rate);
  stage 3: per-partition row sort.  With P >= 1024 the partition-relative
           key fits u32 ((hi-base)<<10 | lo>>22 for canonical k=21), so
           stage 3 can be a 1-key NO-PAYLOAD sort.

Decision gate: stage1 + stage3 row-sort rates + DMA issue cost must
pencil to >= 1.3x the measured global group-sort before the kernel gets
built.  All sorts consume every output lane (PERF.md §2 DCE traps).
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
              + str(e).replace(chr(10), ' | ')[:200], flush=True)
        return None, None

from kmer_tpu.native import pack2bit_rows
from kmer_tpu.ops.extract import canonicalize, extract_from_words

read_len, k = 150, 21
n_reads = 1 << 20
n_bases = n_reads * read_len
nw = n_bases // 16
reads_np = np.random.default_rng(0).integers(0, 4, (n_reads, read_len), np.uint8)
words = jnp.asarray(pack2bit_rows(reads_np.reshape(1, -1))[0])
sync(words)

# real canonical bench lanes, device-resident (slots incl. phase-major
# sentinels trimmed: keep an R-friendly N)
def extract_lanes(w):
    h, l = extract_from_words(w, k)
    h, l = canonicalize(h, l, k)
    return h.ravel(), l.ravel()

hi_full, lo_full = jax.jit(extract_lanes)(words)
N = (nw * 16 // (130 * (1 << 13))) * (130 * (1 << 13))
hi = hi_full[:N]; lo16 = (lo_full[:N] >> jnp.uint32(16)).astype(jnp.uint16)
sync(hi); sync(lo16)
print(f"N = {N}", flush=True)

# --- A: global baselines on these lanes ---------------------------------
def consume2(a, b):
    return jnp.maximum(jnp.max(a), b.max().astype(jnp.uint32))

bench("A_sort2key_global", jax.jit(
    lambda h, l: consume2(*jax.lax.sort((h, l), num_keys=2, is_stable=False))),
    hi, lo16, total=N)
bench("A_sort1key_pay_global", jax.jit(
    lambda h, l: consume2(*jax.lax.sort((h, l), num_keys=1, is_stable=False))),
    hi, lo16, total=N)
bench("A_sort1key_nopay_global", jax.jit(
    lambda h: jnp.max(jax.lax.sort((h,), num_keys=1, is_stable=False)[0])),
    hi, total=N)

# --- B: batched row sorts (2-key with u16 payload), stage-1 candidates --
for R in (130, 260, 520, 1040, 2080, 4160, 8320, 16640):
    C = N // R
    bench(f"B_rowsort2k_R{R}_C{C}", jax.jit(
        lambda h, l, R=R, C=C: consume2(
            *jax.lax.sort((h.reshape(R, C), l.reshape(R, C)),
                          dimension=1, num_keys=2, is_stable=False))),
        hi, lo16, total=N)

# --- C: batched row sorts 1-key u32 NO payload (stage-3 rel-key shape) --
for R in (130, 260, 520, 1040, 2080, 4160, 8320, 16640):
    C = N // R
    bench(f"C_rowsort1k_R{R}_C{C}", jax.jit(
        lambda h, R=R, C=C: jnp.max(
            jax.lax.sort((h.reshape(R, C),), dimension=1, num_keys=1,
                         is_stable=False)[0])),
        hi, total=N)

# --- D: emulated u64 single-lane global sort ----------------------------
try:
    jax.config.update("jax_enable_x64", True)
    hi64 = (hi.astype(jnp.uint64) << jnp.uint64(16)) | lo16.astype(jnp.uint64)
    sync(hi64)
    bench("D_sort_u64_global", jax.jit(
        lambda h: jnp.max(jax.lax.sort((h,), num_keys=1, is_stable=False)[0])),
        hi64, total=N)
    del hi64
finally:
    jax.config.update("jax_enable_x64", False)

# --- E: splitter searchsorted over sorted rows --------------------------
R, P = 130, 1024
C = N // R
srt = jax.jit(lambda h: jax.lax.sort((h.reshape(R, C),), num_keys=1,
                                     is_stable=False)[0])(hi)
sync(srt)
splitters = srt[0, :: C // P][:P]  # crude quantiles; timing is what matters
sync(splitters)
bench("E_searchsorted_offsets", jax.jit(
    lambda rows, s: jnp.max(
        jax.vmap(lambda r: jnp.searchsorted(r, s, side="left"))(rows)
        .astype(jnp.int32))),
    srt, splitters, total=R * P)

# --- F: Pallas DMA issue rate (HBM->HBM dynamic-offset copies) ----------
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def make_copier(G, SEG, n_in, n_out, double=True):
    def kernel(in_off_ref, out_off_ref, in_ref, out_ref):
        def body(sem):
            def get_dma(g, slot):
                return pltpu.make_async_copy(
                    in_ref.at[pl.ds(in_off_ref[g], SEG)],
                    out_ref.at[pl.ds(out_off_ref[g], SEG)],
                    sem.at[slot],
                )
            if double:
                get_dma(0, 0).start()
                def loop(g, _):
                    @pl.when(g + 1 < G)
                    def _():
                        get_dma(g + 1, (g + 1) % 2).start()
                    get_dma(g, g % 2).wait()
                    return 0
                jax.lax.fori_loop(0, G, loop, 0)
            else:
                def loop(g, _):
                    d = get_dma(g, 0)
                    d.start(); d.wait()
                    return 0
                jax.lax.fori_loop(0, G, loop, 0)
        pl.run_scoped(body, pltpu.SemaphoreType.DMA((2,)))

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        out_shape=jax.ShapeDtypeStruct((n_out,), jnp.uint32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

rng = np.random.default_rng(1)
for G, SEG in ((4096, 1024), (4096, 2048), (16384, 1024), (16384, 2048),
               (16384, 8192), (32768, 1024)):
    n_out = G * SEG
    if n_out > N:
        continue
    in_off = jnp.asarray(
        rng.integers(0, N - SEG, G, dtype=np.int64).astype(np.int32))
    out_off = jnp.asarray((np.arange(G, dtype=np.int64) * SEG).astype(np.int32))
    try:
        cp = make_copier(G, SEG, N, n_out)
        f = jax.jit(lambda io, oo, x: jnp.max(cp(io, oo, x)))
        bench(f"F_dma_G{G}_SEG{SEG}", f, in_off, out_off, hi, total=G)
    except Exception as e:
        print(f"F_dma_G{G}_SEG{SEG}: FAIL {type(e).__name__}: "
              + str(e).replace(chr(10), ' | ')[:200], flush=True)

print("probe_r3a done", flush=True)
