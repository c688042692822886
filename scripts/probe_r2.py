"""TPU probe r2: phase breakdown of the stream count pipeline, sort-shape
variants, compiled Pallas extraction, and in-kernel cmpex with static
shifts (Pallas-sort feasibility)."""
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
              + str(e).replace(chr(10), ' | ')[:180], flush=True)
        return None, None

from kmer_tpu.native import pack2bit_rows
from kmer_tpu.ops.count import count_windows
from kmer_tpu.ops.extract import (
    canonicalize, extract_from_words, phase_major_valid, simulate_reads)

read_len, k = 150, 21
n_reads = 1 << 20
total = n_reads * (read_len - k + 1)          # 136.3M windows
n_bases = n_reads * read_len
nw = n_bases // 16
reads = simulate_reads(n_reads, read_len, seed=0)
words = jnp.asarray(pack2bit_rows(reads.reshape(1, -1))[0])
sync(words)

# A: full stream pipeline (one jit): extract->canon->count
def count_all(w):
    h, l = extract_from_words(w, k)
    h, l = canonicalize(h, l, k)
    valid = phase_major_valid(nw, read_len, n_reads, k)
    t = count_windows(h.ravel(), l.ravel(), valid.ravel(), k)
    return t.n_unique
bench("A_stream_full", jax.jit(count_all), words, total=total)

# B: extract+canonicalize only (reduction sync to defeat DCE)
def extract_only(w):
    h, l = extract_from_words(w, k)
    h, l = canonicalize(h, l, k)
    return jnp.bitwise_xor(jnp.max(h), jnp.max(l))
bench("B_extract_canon", jax.jit(extract_only), words, total=total)

# B2: extract only, no canonicalize
def extract_nc(w):
    h, l = extract_from_words(w, k)
    return jnp.bitwise_xor(jnp.max(h), jnp.max(l))
bench("B2_extract_only", jax.jit(extract_nc), words, total=total)

# C: sort variants on 2^27 synthetic
n = 1 << 27
key = jax.random.bits(jax.random.PRNGKey(0), (n,), jnp.uint32)
pay16 = (jax.random.bits(jax.random.PRNGKey(1), (n,), jnp.uint32) & 0x3FF).astype(jnp.uint16)
sync(key); sync(pay16)

bench("C_sort2_u32_u16", jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2, is_stable=False)[0][:8]),
      key, pay16, total=n)
bench("C2_sort1_u32", jax.jit(lambda a: jax.lax.sort((a,), num_keys=1, is_stable=False)[0][:8]),
      key, total=n)
bench("C3_sort1key_u16pay", jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1, is_stable=False)[0][:8]),
      key, pay16, total=n)
rows = key.reshape(-1, 2048)
p16r = pay16.reshape(-1, 2048)
bench("C4_sort2_rows2048", jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2, is_stable=False, dimension=1)[0][:, :1]),
      rows, p16r, total=n)
bench("C5_sort1_rows2048", jax.jit(lambda a: jax.lax.sort((a,), num_keys=1, is_stable=False, dimension=1)[0][:, :1]),
      rows, total=n)
rows8 = key.reshape(-1, 8192)
bench("C6_sort1_rows8192", jax.jit(lambda a: jax.lax.sort((a,), num_keys=1, is_stable=False, dimension=1)[0][:, :1]),
      rows8, total=n)

# D: segment-count backends on sorted data
skey, spay = jax.lax.sort((key, pay16), num_keys=2, is_stable=False)
sync(skey); sync(spay)
from kmer_tpu.pallas.segment_counts import segment_counts_sorted
bench("D_segcounts_pallas", jax.jit(lambda a, b: segment_counts_sorted(a, (b.astype(jnp.uint32) << jnp.uint32(16)), sentinel=None)[1]),
      skey, spay, total=n)
os.environ["KMER_TPU_NO_PALLAS_COUNTS"] = "1"
def seg_xla(a, b):
    new = jnp.concatenate([jnp.ones((1,), bool), (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
    pos = jnp.arange(n, dtype=jnp.int32)
    bnd = jnp.where(new, pos, n)
    sufmin = jax.lax.cummin(bnd, reverse=True)
    nxt = jnp.concatenate([sufmin[1:], jnp.full((1,), n, jnp.int32)])
    cnt = jnp.where(new, nxt - pos, 0)
    return jnp.sum((cnt > 0).astype(jnp.int32))
bench("D2_segcounts_xla", jax.jit(seg_xla), skey, spay, total=n)
del os.environ["KMER_TPU_NO_PALLAS_COUNTS"]
del skey, spay

# E: compiled Pallas extraction vs XLA on the same byte-code input
codes_flat = jnp.asarray(reads.reshape(-1)[: 1 << 25], jnp.int32)  # 33.5M codes
sync(codes_flat)
ne = codes_flat.shape[0]
try:
    # the r1 Pallas extraction kernel was deleted after this probe's E/E2
    # numbers showed it tied the XLA path (results recorded in PERF.md);
    # guard so the committed script still runs end to end
    from kmer_tpu.pallas.extract_kernel import extract_stream_pallas

    bench("E_pallas_extract_2^25codes",
          jax.jit(lambda c: jnp.bitwise_xor(*[jnp.max(v) for v in extract_stream_pallas(c, k)])),
          codes_flat, total=ne)
except ImportError:
    print("E_pallas_extract: kernel deleted in r2 (see PERF.md)", flush=True)
from kmer_tpu.ops.extract import extract_windows
bench("E2_xla_extract_2^25codes",
      jax.jit(lambda c: jnp.bitwise_xor(jnp.max(extract_windows(c, k)[0]), jnp.max(extract_windows(c, k)[1]))),
      codes_flat, total=ne)

# F: count_windows alone on pre-extracted lanes (u32, u32 with top-10-bit lo)
hi_pre = key
lo_pre = (pay16.astype(jnp.uint32) << jnp.uint32(22))
sync(lo_pre)
bench("F_count_windows_k21", jax.jit(lambda a, b: count_windows(a, b, None, k).n_unique),
      hi_pre, lo_pre, total=n)

# G: in-kernel cmpex with static concat shifts (no jnp.roll), amplified
try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    BR, L, G_, STEPS = 512, 128, 64, 128
    big = jax.random.bits(jax.random.PRNGKey(2), (G_ * BR, L), jnp.uint32)
    gspec = pl.BlockSpec((BR, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    def k_cmpex(x_ref, o_ref):
        h = x_ref[...]
        for s in range(STEPS):
            d = 1 << (s % 7)
            sh = jnp.concatenate([h[:, d:], h[:, :d]], axis=1)
            h = jnp.minimum(h, sh) + jnp.uint32(1)
        o_ref[...] = h
    f = jax.jit(pl.pallas_call(
        k_cmpex, grid=(G_,),
        out_shape=jax.ShapeDtypeStruct((G_ * BR, L), jnp.uint32),
        in_specs=[gspec], out_specs=gspec))
    tot = G_ * BR * L * STEPS
    t, _ = bench("G_cmpex_static_concat", f, big, total=tot)
    # row-pair cmpex via sublane concat (axis=0 static shift)
    def k_cmpex0(x_ref, o_ref):
        h = x_ref[...]
        for s in range(STEPS):
            d = 8 << (s % 4)
            sh = jnp.concatenate([h[d:], h[:d]], axis=0)
            h = jnp.minimum(h, sh) + jnp.uint32(1)
        o_ref[...] = h
    f0 = jax.jit(pl.pallas_call(
        k_cmpex0, grid=(G_,),
        out_shape=jax.ShapeDtypeStruct((G_ * BR, L), jnp.uint32),
        in_specs=[gspec], out_specs=gspec))
    bench("G2_cmpex_static_axis0", f0, big, total=tot)
except Exception as e:
    print("G: setup FAIL", str(e)[:150], flush=True)

print("done", flush=True)
