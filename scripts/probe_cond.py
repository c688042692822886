"""TPU probe: cost of the unsorted-check + fallback mechanisms around the
group sort (the lax.cond measured +245ms in the bench even when untaken)."""
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

def sweeps(shi, slo):
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
    slo = jax.lax.fori_loop(0, 8, lambda _, l: sweep(sweep(l, eq0), eq1), slo)
    return slo, eqv

# v0: no check, no fallback (reference point; exact on this data)
def v0(hi, lo):
    shi, slo = jax.lax.sort((hi, lo), num_keys=1, is_stable=False)
    slo, _ = sweeps(shi, slo)
    return shi, slo
bench("v0_no_check", jax.jit(lambda a, b: v0(a, b)[0][:8]), hi, lo16)

# v1: check only (any reduction), no fallback
def v1(hi, lo):
    shi, slo = jax.lax.sort((hi, lo), num_keys=1, is_stable=False)
    slo, eqv = sweeps(shi, slo)
    unsorted = jnp.any(eqv & (slo[:-1] > slo[1:]))
    return shi, slo, unsorted
_, o = bench("v1_check_only", jax.jit(lambda a, b: (v1(a, b)[0][:8], v1(a, b)[2])), hi, lo16)
if o is not None:
    print(f"  unsorted={bool(o[1])}", flush=True)

# v2: check + lax.cond fallback (current committed shape)
def v2(hi, lo):
    shi, slo = jax.lax.sort((hi, lo), num_keys=1, is_stable=False)
    slo, eqv = sweeps(shi, slo)
    unsorted = jnp.any(eqv & (slo[:-1] > slo[1:]))
    return jax.lax.cond(
        unsorted,
        lambda h, l: jax.lax.sort((h, l), num_keys=2, is_stable=False),
        lambda h, l: (h, l),
        shi, slo)
bench("v2_cond", jax.jit(lambda a, b: v2(a, b)[0][:8]), hi, lo16)

# v3: check + while_loop execute-at-most-once fallback
def v3(hi, lo):
    shi, slo = jax.lax.sort((hi, lo), num_keys=1, is_stable=False)
    slo, eqv = sweeps(shi, slo)
    unsorted = jnp.any(eqv & (slo[:-1] > slo[1:]))
    def body(s):
        h, l, _ = s
        h2, l2 = jax.lax.sort((h, l), num_keys=2, is_stable=False)
        return h2, l2, jnp.asarray(False)
    h, l, _ = jax.lax.while_loop(lambda s: s[2], body, (shi, slo, unsorted))
    return h, l
bench("v3_while_once", jax.jit(lambda a, b: v3(a, b)[0][:8]), hi, lo16)

# v4: force the fallback taken (worst case cost) via impossible sweeps
def v4(hi, lo):
    shi, slo = jax.lax.sort((hi, lo), num_keys=1, is_stable=False)
    slo, eqv = sweeps(shi, slo)
    unsorted = jnp.asarray(True)  # pretend
    def body(s):
        h, l, _ = s
        h2, l2 = jax.lax.sort((h, l), num_keys=2, is_stable=False)
        return h2, l2, jnp.asarray(False)
    h, l, _ = jax.lax.while_loop(lambda s: s[2], body, (shi, slo, unsorted))
    return h, l
bench("v4_while_taken", jax.jit(lambda a, b: v4(a, b)[0][:8]), hi, lo16)

# correctness of v3 vs 2-key oracle
g = jax.jit(v3)(hi, lo16)
w = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2, is_stable=False))(hi, lo16)
print("v3_exact:", bool(jnp.all(g[0] == w[0])) and bool(jnp.all(g[1] == w[1])), flush=True)

print("done", flush=True)
