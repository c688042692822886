"""TPU probe: honest (DCE-proof) fixup-sweep costs + variants.

Earlier probes returned only shi[:8], letting XLA eliminate the sweeps —
every variant here folds BOTH outputs into reductions.
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

def bench(name, fn, *args, iters=3):
    try:
        out = fn(*args); sync(out)
        best = 1e9
        for _ in range(iters):
            t0 = time.perf_counter(); out = fn(*args); sync(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best*1e3:.1f}ms", flush=True)
        return best, out
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: "
              + str(e).replace(chr(10), ' | ')[:180], flush=True)
        return None, None

from kmer_tpu.native import pack2bit_rows, device_unpack_rows
from kmer_tpu.ops.extract import canonicalize, extract_windows_batch, simulate_reads

read_len, k = 150, 21
n_reads = 1 << 20
words = jnp.asarray(pack2bit_rows(simulate_reads(n_reads, read_len, seed=0)))
lengths = jnp.full((n_reads,), read_len, jnp.int32)

@jax.jit
def extract_all(w):
    codes = device_unpack_rows(w, read_len)
    wins, _ = extract_windows_batch(codes, lengths, k)
    h, l = canonicalize(wins.hi, wins.lo, k)
    return h.ravel(), (l.ravel() >> jnp.uint32(16)).astype(jnp.uint16)

hi, lo16 = extract_all(words)
sync(hi); sync(lo16)
n = hi.shape[0]
assert n % 2 == 0

def use(shi, slo):  # anti-DCE: cheap reductions over both outputs
    return jnp.max(shi) + slo.astype(jnp.uint32)[::65537].sum()

ORACLE = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2, is_stable=False))(hi, lo16)
sync(ORACLE)

def check(name, fn):
    g = jax.jit(fn)(hi, lo16)
    ok = bool(jnp.all(g[0] == ORACLE[0])) and bool(jnp.all(g[1] == ORACLE[1]))
    print(f"  {name}_exact={ok}", flush=True)

# w5: full 2-key reference
bench("w5_sort2", jax.jit(lambda a, b: use(*jax.lax.sort((a, b), num_keys=2, is_stable=False))), hi, lo16)

# w0: sort1 only (slo NOT fixed; inexact — cost floor)
bench("w0_sort1_floor", jax.jit(lambda a, b: use(*jax.lax.sort((a, b), num_keys=1, is_stable=False))), hi, lo16)

# concat-form sweeps (current impl)
def concat_sweeps(iters):
    def f(hi, lo):
        shi, slo = jax.lax.sort((hi, lo), num_keys=1, is_stable=False)
        eqv = shi[1:] == shi[:-1]
        par = jnp.arange(n - 1, dtype=jnp.int32) & 1
        eq0 = eqv & (par == 0)
        eq1 = eqv & (par == 1)
        def sweep(lo_c, eqp):
            do = eqp & (lo_c[:-1] > lo_c[1:])
            up = jnp.concatenate([jnp.zeros((1,), bool), do])
            down = jnp.concatenate([do, jnp.zeros((1,), bool)])
            nxt = jnp.concatenate([lo_c[1:], lo_c[-1:]])
            prv = jnp.concatenate([lo_c[:1], lo_c[:-1]])
            return jnp.where(down, nxt, jnp.where(up, prv, lo_c))
        slo = jax.lax.fori_loop(0, iters, lambda _, l: sweep(sweep(l, eq0), eq1), slo)
        return shi, slo
    return f

for it in (4, 8):
    f = concat_sweeps(it)
    bench(f"w1_concat_iters{it}", jax.jit(lambda a, b, f=f: use(*f(a, b))), hi, lo16)
check("w1_iters4", concat_sweeps(4))

# pair-reshape sweeps
def pair_sweeps(iters):
    def f(hi, lo):
        shi, slo = jax.lax.sort((hi, lo), num_keys=1, is_stable=False)
        eqv = shi[1:] == shi[:-1]
        eq_e = eqv[0::2]                     # pairs (0,1),(2,3),...
        eq_o = eqv[1::2]                     # pairs (1,2),(3,4),...
        def sweep_e(lo_c):
            v = lo_c.reshape(-1, 2)
            a, b = v[:, 0], v[:, 1]
            do = eq_e & (a > b)
            return jnp.stack(
                [jnp.where(do, b, a), jnp.where(do, a, b)], axis=1
            ).reshape(-1)
        def sweep_o(lo_c):
            mid = lo_c[1:-1].reshape(-1, 2)
            a, b = mid[:, 0], mid[:, 1]
            do = eq_o[: a.shape[0]] & (a > b)
            mid = jnp.stack(
                [jnp.where(do, b, a), jnp.where(do, a, b)], axis=1
            ).reshape(-1)
            return jnp.concatenate([lo_c[:1], mid, lo_c[-1:]])
        slo = jax.lax.fori_loop(0, iters, lambda _, l: sweep_o(sweep_e(l)), slo)
        return shi, slo
    return f

for it in (4, 8):
    f = pair_sweeps(it)
    bench(f"w2_pairs_iters{it}", jax.jit(lambda a, b, f=f: use(*f(a, b))), hi, lo16)
check("w2_iters4", pair_sweeps(4))

# w4: collision-patch primitive rates
r_idx = jax.random.bits(jax.random.PRNGKey(9), (n,), jnp.uint32) % jnp.uint32(n // 16)
small = jax.random.bits(jax.random.PRNGKey(10), (n // 16,), jnp.uint32).astype(jnp.uint16)
sync(r_idx); sync(small)
bench("w4a_gather_136M_from_8.5M", jax.jit(lambda t, i: use(i, t[i.astype(jnp.int32)])), small, r_idx)
mask = (lo16 < jnp.uint16(2048))  # ~3% true
sync(mask)
bench("w4b_cumsum_136M", jax.jit(lambda m: jnp.cumsum(m.astype(jnp.int32))[-1]), mask)
bench("w4c_nonzero_size", jax.jit(lambda m: jnp.nonzero(m, size=n // 16, fill_value=n)[0][-5:]), mask)

print("done", flush=True)
