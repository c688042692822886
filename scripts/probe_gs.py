"""TPU probe: diagnose group_sort_pairs cost on realistic canonical data
and race it against fixup variants."""
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

from kmer_tpu.native import pack2bit_rows, device_unpack_rows
from kmer_tpu.ops.extract import canonicalize, extract_windows_batch, simulate_reads

read_len, k = 150, 21
n_reads = 1 << 20
total = n_reads * (read_len - k + 1)
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
print(f"n={n}", flush=True)

# (a) 1-key sort alone
bench("a_sort1key_pay", jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1, is_stable=False)[0][:8]),
      hi, lo16, total=n)

# (a2) 2-key global (old path)
bench("a2_sort2key", jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2, is_stable=False)[0][:8]),
      hi, lo16, total=n)

# (b) current group_sort_pairs
from kmer_tpu.ops.count import group_sort_pairs
bench("b_group_sort_current", jax.jit(lambda a, b: group_sort_pairs(a, b)[0][:8]),
      hi, lo16, total=n)

# (c) debug: iteration count + fallback flag
def gs_debug(hi, lo):
    shi, slo = jax.lax.sort((hi, lo), num_keys=1, is_stable=False)
    eq = shi[1:] == shi[:-1]
    parity = jnp.arange(n - 1, dtype=jnp.int32) & 1
    def sweep(lo_c, par):
        left, right = lo_c[:-1], lo_c[1:]
        do = eq & (parity == par) & (left > right)
        up = jnp.concatenate([jnp.zeros((1,), bool), do])
        down = jnp.concatenate([do, jnp.zeros((1,), bool)])
        nxt = jnp.concatenate([lo_c[1:], lo_c[-1:]])
        prv = jnp.concatenate([lo_c[:1], lo_c[:-1]])
        return jnp.where(down, nxt, jnp.where(up, prv, lo_c)), jnp.any(do)
    def body(state):
        lo_c, _, it = state
        lo_c, s0 = sweep(lo_c, 0)
        lo_c, s1 = sweep(lo_c, 1)
        return lo_c, s0 | s1, it + 1
    def cond(state):
        _, swapped, it = state
        return swapped & (it < 16)
    slo, swapped, iters = jax.lax.while_loop(
        cond, body, (slo, jnp.asarray(True), jnp.asarray(0, jnp.int32)))
    return iters, swapped
_, out = bench("c_debug_while", jax.jit(gs_debug), hi, lo16)
if out is not None:
    print(f"  iters={int(out[0])} hit_cap(fallback)={bool(out[1])}", flush=True)

# (d) row-fixup variant: sort1 + two phase-shifted 2-key row sorts
C = 2048
def gs_rows(hi, lo):
    shi, slo = jax.lax.sort((hi, lo), num_keys=1, is_stable=False)
    def rowsort(h, l):
        h2, l2 = jax.lax.sort((h.reshape(-1, C), l.reshape(-1, C)),
                              num_keys=2, is_stable=False, dimension=1)
        return h2.reshape(-1), l2.reshape(-1)
    shi, slo = rowsort(shi, slo)
    h_mid, l_mid = rowsort(shi[C // 2 : -(C // 2)], slo[C // 2 : -(C // 2)])
    shi = jnp.concatenate([shi[: C // 2], h_mid, shi[-(C // 2):]])
    slo = jnp.concatenate([slo[: C // 2], l_mid, slo[-(C // 2):]])
    return shi, slo
bench("d_rowfix", jax.jit(lambda a, b: gs_rows(a, b)[0][:8]), hi, lo16, total=n)

# equality check d vs a2
g = jax.jit(gs_rows)(hi, lo16)
w = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2, is_stable=False))(hi, lo16)
eq_ok = bool(jnp.all(g[0] == w[0])) and bool(jnp.all(g[1] == w[1]))
print(f"d_rowfix_exact={eq_ok}", flush=True)

# (e) lean while: fold parity into eq, fori fixed 6 iterations, no any()
def gs_lean(hi, lo):
    shi, slo = jax.lax.sort((hi, lo), num_keys=1, is_stable=False)
    eqv = shi[1:] == shi[:-1]
    par = (jnp.arange(n - 1, dtype=jnp.int32) & 1)
    eq0 = eqv & (par == 0)
    eq1 = eqv & (par == 1)
    def sweep(lo_c, eqp):
        do = eqp & (lo_c[:-1] > lo_c[1:])
        up = jnp.concatenate([jnp.zeros((1,), bool), do])
        down = jnp.concatenate([do, jnp.zeros((1,), bool)])
        nxt = jnp.concatenate([lo_c[1:], lo_c[-1:]])
        prv = jnp.concatenate([lo_c[:1], lo_c[:-1]])
        return jnp.where(down, nxt, jnp.where(up, prv, lo_c))
    def body(_, lo_c):
        return sweep(sweep(lo_c, eq0), eq1)
    slo = jax.lax.fori_loop(0, 6, body, slo)
    return shi, slo
bench("e_lean_fori6", jax.jit(lambda a, b: gs_lean(a, b)[0][:8]), hi, lo16, total=n)
g2 = jax.jit(gs_lean)(hi, lo16)
print(f"e_lean_exact={bool(jnp.all(g2[1] == w[1]))}", flush=True)

# (f) single sweep cost in isolation (amortize: 1 iteration fori)
def gs_1iter(hi, lo):
    shi, slo = jax.lax.sort((hi, lo), num_keys=1, is_stable=False)
    return shi, slo
t1, _ = bench("f_sortonly_again", jax.jit(lambda a, b: gs_1iter(a, b)[0][:8]), hi, lo16)

print("done", flush=True)
