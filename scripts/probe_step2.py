"""Step-cost variants (follow-up to probe_step): find the cheapest exact
(1,1)-mesh accumulation step at the sustained shapes.

Measured so far: fused fold 2692ms; two-step (count 257 + merge 1328)
1585ms.  Hypotheses: the fold's u8 tag lane and/or 3-key comparator are
pathological, and sentinel-heavy inputs sort cheaper than diverse keys.

Variants, all validated against the production fold result:
  V1 fold with the tag folded into lo16 bit0 (real keys have 6 zero low
     bits at k=21): sort (hi, lo16tag, wh, wl) 2-key, narrow compact.
  V2 narrowed two-step merge: merge_into_wide's sort with u16 lo+tagbit
     (4 operands 2 keys) + narrow compact.
  V3 compact-then-merge: count_windows -> tag-compact the table to CAP
     slots (one (khi,klo16,cnt) 2-key sort, mostly sentinels) -> tiny
     8.4M merge with the accumulator.
  D  reference: plain 2-key 4-operand sort of the concat (diverse keys)
     to isolate comparator-count vs operand-count effects.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp

print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)

from kmer_tpu.native import pack2bit_rows, device_unpack_rows
from kmer_tpu.ops.extract import extract_windows_batch, canonicalize
from kmer_tpu.ops.count import (
    SENTINEL, SENTINEL_LEN, count_windows, _segment_counts,
)
from kmer_tpu.ops.wide import WideCounts, _pair_add, fold_windows_into_wide

K = 21
SMALL = bool(os.environ.get("KMER_PROBE_SMALL"))
B, L = (2048, 150) if SMALL else (512 * 1024, 150)
CAP = 8192 if SMALL else 4 * 1024 * 1024
SENT16 = jnp.uint16(0xFFFF)

rng = np.random.default_rng(0)
genome = rng.integers(0, 4, 5_000 if SMALL else 1_000_000, dtype=np.uint8)
starts = rng.integers(0, genome.size - L + 1, B)
reads = genome[starts[:, None] + np.arange(L)[None, :]]
words = jnp.asarray(pack2bit_rows(reads))
codes = device_unpack_rows(words, L)
lengths = jnp.full((B,), L, jnp.int32)
jax.block_until_ready(codes)
print("data resident", flush=True)


def bench(name, fn, *args, iters=3):
    try:
        out = fn(*args); jax.block_until_ready(out)
        best = 1e9
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args); jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best*1e3:.1f}ms", flush=True)
        return out
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: "
              + str(e).replace(chr(10), ' | ')[:200], flush=True)
        return None


@jax.jit
def extract_jit(codes, lengths):
    wins, valid = extract_windows_batch(codes, lengths, K)
    hi, lo = canonicalize(wins.hi, wins.lo, K)
    return hi.ravel(), lo.ravel(), valid.ravel()


hi, lo, valid = extract_jit(codes, lengths)
jax.block_until_ready(hi)

acc0 = jax.tree_util.tree_map(jnp.asarray, WideCounts.empty(CAP))
fold_jit = jax.jit(lambda a, h, l, v: fold_windows_into_wide(a, h, l, v, K))
ref_acc = fold_jit(acc0, hi, lo, valid)
jax.block_until_ready(ref_acc.hi)


def summarize(acc):
    t = acc
    live = (np.asarray(t.counts_hi) > 0) | (np.asarray(t.counts_lo) > 0)
    c64 = (np.asarray(t.counts_hi, np.int64) << 32) + np.asarray(
        t.counts_lo, np.int64)
    c1 = np.uint32(
        int((np.asarray(t.hi, np.uint64) * c64.astype(np.uint64)).sum())
        & 0xFFFFFFFF)
    return int(t.n_unique), int(c64.sum()), int(c1)


REF = summarize(jax.tree_util.tree_map(np.asarray, ref_acc))
print(f"ref: n_unique={REF[0]} total={REF[1]} c1={REF[2]}", flush=True)


def check(name, acc):
    if acc is None:
        return
    got = summarize(jax.tree_util.tree_map(np.asarray, acc))
    print(f"{name}: {'exact OK' if got == REF else 'MISMATCH %s vs %s' % (got, REF)}",
          flush=True)


def narrow_compact(head, sh, sl16, th, tl, cap):
    th = jnp.where(head, th, 0)
    tl = jnp.where(head, tl, jnp.uint32(0))
    n_unique = jnp.sum(head.astype(jnp.int32))
    khi = jnp.where(head, sh, jnp.uint32(SENTINEL))
    kl16 = jnp.where(head, sl16, SENT16)
    khi, kl16, th, tl = jax.lax.sort((khi, kl16, th, tl), num_keys=2,
                                     is_stable=False)

    def fit(x, fill):
        return x[:cap] if x.shape[0] >= cap else jnp.concatenate(
            [x, jnp.full((cap - x.shape[0],), fill, x.dtype)])

    ksent = (khi == jnp.uint32(SENTINEL)) & (kl16 == SENT16)
    kln = jnp.where(ksent, jnp.int32(SENTINEL_LEN), jnp.int32(K))
    return WideCounts(
        hi=fit(khi, SENTINEL),
        lo=fit(kl16.astype(jnp.uint32) << jnp.uint32(16), SENTINEL),
        length=fit(kln, SENTINEL_LEN),
        counts_hi=fit(th, 0), counts_lo=fit(tl, 0), n_unique=n_unique)


# --- V1: fold with tag in lo16 bit0 --------------------------------------
def fold_v1(acc, hi, lo, valid):
    h = jnp.where(valid, hi, jnp.uint32(SENTINEL))
    l16 = jnp.where(valid, (lo >> jnp.uint32(16)).astype(jnp.uint16)
                    | jnp.uint16(1), SENT16)
    ah = jnp.concatenate([acc.hi, h])
    al16 = jnp.concatenate(
        [(acc.lo >> jnp.uint32(16)).astype(jnp.uint16), l16])
    wh = jnp.concatenate([acc.counts_hi, jnp.zeros_like(hi, jnp.int32)])
    wl = jnp.concatenate([acc.counts_lo, jnp.zeros_like(hi)])
    sh, sl16, swh, swl = jax.lax.sort((ah, al16, wh, wl), num_keys=2,
                                      is_stable=False)
    key16 = sl16 | jnp.uint16(1)  # strip the tag bit for key equality
    new = jnp.concatenate(
        [jnp.ones((1,), bool),
         (sh[1:] != sh[:-1]) | (key16[1:] != key16[:-1])])
    stag = (sl16 & jnp.uint16(1)).astype(jnp.int32)  # 1 = window element
    ucnt = _segment_counts(new, stag)
    at_acc_head = new & (stag == 0)
    th, tl = _pair_add(
        jnp.where(at_acc_head, swh, 0),
        jnp.where(at_acc_head, swl, jnp.uint32(0)),
        jnp.zeros_like(swh),
        jnp.where(new, ucnt, 0).astype(jnp.uint32))
    is_sent = (sh == jnp.uint32(SENTINEL)) & (key16 == SENT16)
    return narrow_compact(new & ~is_sent, sh, key16 & jnp.uint16(0xFFFE)
                          | jnp.uint16(0), th, tl, acc.capacity)


# note: real keys have bit0 == 0; compact stores lo16 with tag stripped
v1_jit = jax.jit(fold_v1)
acc_v1 = bench("V1 fold tagbit 2key4op", v1_jit, acc0, hi, lo, valid)
check("V1", acc_v1)

# --- V2: two-step with narrowed merge ------------------------------------
cw_jit = jax.jit(lambda h, l, v: count_windows(h, l, v, K))
table = cw_jit(hi, lo, valid)
jax.block_until_ready(table.hi)


def merge_narrow(acc, thi, tlo, tcnt):
    # table entries: tag bit0 = 1; acc entries: 0 (both deduplicated)
    t16 = (tlo >> jnp.uint32(16)).astype(jnp.uint16) | jnp.uint16(1)
    dead = tcnt <= 0
    th16 = jnp.where(dead, SENT16, t16)
    thh = jnp.where(dead, jnp.uint32(SENTINEL), thi)
    ah = jnp.concatenate([acc.hi, thh])
    al16 = jnp.concatenate(
        [(acc.lo >> jnp.uint32(16)).astype(jnp.uint16), th16])
    wh = jnp.concatenate([acc.counts_hi, jnp.zeros_like(tcnt)])
    wl = jnp.concatenate([acc.counts_lo, tcnt.astype(jnp.uint32)])
    sh, sl16, swh, swl = jax.lax.sort((ah, al16, wh, wl), num_keys=2,
                                      is_stable=False)
    key16 = sl16 | jnp.uint16(1)
    new = jnp.concatenate(
        [jnp.ones((1,), bool),
         (sh[1:] != sh[:-1]) | (key16[1:] != key16[:-1])])
    nxt_same = jnp.concatenate([~new[1:], jnp.zeros((1,), bool)])
    nwh = jnp.concatenate([swh[1:], jnp.zeros((1,), swh.dtype)])
    nwl = jnp.concatenate([swl[1:], jnp.zeros((1,), swl.dtype)])
    th, tl = _pair_add(swh, swl, jnp.where(nxt_same, nwh, 0),
                       jnp.where(nxt_same, nwl, jnp.uint32(0)))
    is_sent = (sh == jnp.uint32(SENTINEL)) & (key16 == SENT16)
    live = (th > 0) | (tl > 0)
    return narrow_compact(new & ~is_sent & live, sh,
                          key16 & jnp.uint16(0xFFFE), th, tl, acc.capacity)


mn_jit = jax.jit(merge_narrow)
acc_v2 = bench("V2 narrowed merge (after count 257ms)", mn_jit, acc0,
               table.hi, table.lo, table.counts)
check("V2", acc_v2)

# --- V3: compact the table, then a tiny merge ----------------------------
def compact_table(thi, tlo, tcnt, cap):
    dead = tcnt <= 0
    khi = jnp.where(dead, jnp.uint32(SENTINEL), thi)
    kl16 = jnp.where(dead, SENT16,
                     (tlo >> jnp.uint32(16)).astype(jnp.uint16))
    n_live = jnp.sum((~dead).astype(jnp.int32))
    khi, kl16, c = jax.lax.sort((khi, kl16, tcnt), num_keys=2,
                                is_stable=False)
    return khi[:cap], kl16[:cap], c[:cap], n_live


ct_jit = jax.jit(lambda h, l, c: compact_table(h, l, c, CAP))
ct = bench("V3a tag-compact table (68M, mostly sentinel)", ct_jit,
           table.hi, table.lo, table.counts)


def mini_merge(acc, khi, kl16, c):
    return merge_narrow(acc, khi, kl16.astype(jnp.uint32) << jnp.uint32(16),
                        c)


mm_jit = jax.jit(mini_merge)
if ct is not None:
    acc_v3 = bench("V3b mini merge (8.4M)", mm_jit, acc0, ct[0], ct[1], ct[2])
    check("V3", acc_v3)

# --- D: diverse-key sort references --------------------------------------
wh0 = jnp.zeros_like(hi, jnp.int32)
cat_h = jnp.concatenate([acc0.hi, hi])
cat_l16 = jnp.concatenate(
    [(acc0.lo >> jnp.uint32(16)).astype(jnp.uint16),
     (lo >> jnp.uint32(16)).astype(jnp.uint16)])
cat_wh = jnp.concatenate([acc0.counts_hi, wh0])
cat_wl = jnp.concatenate([acc0.counts_lo, wh0.astype(jnp.uint32)])
jax.block_until_ready(cat_h)
def consume_all(*outs):
    # reduce EVERY lane — returning one lane's max lets XLA DCE the
    # others' movement (PERF.md measurement trap)
    return sum(o.max().astype(jnp.uint32) for o in outs)


bench("D 2key4op diverse", jax.jit(
    lambda a, b, c, d: consume_all(*jax.lax.sort(
        (a, b, c, d), num_keys=2, is_stable=False))),
    cat_h, cat_l16, cat_wh, cat_wl)
bench("D 3key5op+u8 diverse (the r3 fold shape)", jax.jit(
    lambda a, b, t, c, d: consume_all(*jax.lax.sort(
        (a, b, t, c, d), num_keys=3, is_stable=False))),
    cat_h, cat_l16,
    jnp.concatenate([jnp.zeros((CAP,), jnp.uint8),
                     jnp.ones((hi.size,), jnp.uint8)]),
    cat_wh, cat_wl)
bench("D 3key5op+i32tag diverse", jax.jit(
    lambda a, b, t, c, d: consume_all(*jax.lax.sort(
        (a, b, t, c, d), num_keys=3, is_stable=False))),
    cat_h, cat_l16,
    jnp.concatenate([jnp.zeros((CAP,), jnp.int32),
                     jnp.ones((hi.size,), jnp.int32)]),
    cat_wh, cat_wl)
bench("D 2key2op diverse", jax.jit(
    lambda a, b: consume_all(*jax.lax.sort(
        (a, b), num_keys=2, is_stable=False))),
    cat_h, cat_l16)

print("probe_step2 done", flush=True)
