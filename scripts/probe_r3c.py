"""TPU probe r3c: END-TO-END measured prototype of the sample-partition
merge engine (VERDICT r3 item #1 — settles DESIGN.md §8 route (a)).

Pipeline (pure XLA, exact, one jit, all outputs consumed):
  stage 1: batched row sort [R, C] by hi (1-key, lo16 payload);
  splitters: P-1 quantile splitters from sorted row 0 (a C-element
             random sample of the input);
  offsets:  off[r, p] = searchsorted(row_hi[r], splitters)  (vmap);
  stage 2:  redistribution via vmap(dynamic_slice) block gather of the
            R*P variable-length segments into fixed seg-size slots,
            ordered by (p, r); out-of-window slots -> sentinel;
  stage 3:  row sort [P, R*seg] by (hi, lo16) 2-key — each partition
            row is a disjoint global key range, so per-row segment
            counts are GLOBAL group counts (coverage data: this is the
            global pre-aggregation, free);
  counts:   per-row boundaries + cummin segment totals, sentinels
            excluded.

Two configs (both have R*P = 16640 segments of avg 8192 — the measured
block-gather sweet spot, probe_r3b H):
  A: R=130,  C=1048576, P=128  -> stage3 [128, 130*seg]
  B: R=1040, C=131072,  P=16   -> stage3 [16, 1040*seg]

Baselines on the SAME lanes: global 2-key sort, 1-key+payload,
1-key-no-payload, u64-emulated, group_sort_pairs-based count_windows
(the production engine), plus a monotone-index compaction gather.

Validation: n_unique, total, and two weighted checksums must equal the
production count_windows result on the same lanes.

Workloads: uniform (bench configs[1] canonical lanes) and coverage
(1M reads off a 5 Mbp genome, ~27x duplication).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp
from functools import partial

print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)

SENT_HI = jnp.uint32(0xFFFFFFFF)
SENT_LO = jnp.uint16(0xFFFF)


def sync(x):
    # block, do NOT device_get: a CountTable is ~2.2 GB and the tunnel
    # moves 36 MB/s — the r3c v1 run spent 100% of its budget fetching
    jax.block_until_ready(x)
    return x


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
from kmer_tpu.ops.count import count_windows

READ_LEN, K = 150, 21
SMALL = bool(os.environ.get("KMER_PROBE_SMALL"))  # CPU correctness mode
N = 130 * (1 << 10) if SMALL else 130 * (1 << 20)  # 136.3M full-size


def make_lanes(coverage: bool):
    rng = np.random.default_rng(0 if not coverage else 7)
    n_reads = 1 << 10 if SMALL else 1 << 20
    if coverage:
        genome = rng.integers(0, 4, 5_000 if SMALL else 5_000_000,
                              dtype=np.uint8)
        starts = rng.integers(0, genome.size - READ_LEN + 1, n_reads)
        reads = genome[starts[:, None] + np.arange(READ_LEN)[None, :]]
        flip = rng.random(n_reads) < 0.5
        reads[flip] = 3 - reads[flip, ::-1]
    else:
        reads = rng.integers(0, 4, (n_reads, READ_LEN), np.uint8)
    words = jnp.asarray(pack2bit_rows(reads.reshape(1, -1))[0])

    def extract(w):
        h, l = extract_from_words(w, K)
        h, l = canonicalize(h, l, K)
        return h.ravel(), l.ravel()

    hi, lo = jax.jit(extract)(words)
    hi = hi[:N]
    lo16 = (lo[:N] >> jnp.uint32(16)).astype(jnp.uint16)
    sync((hi, lo16))
    return hi, lo16


def prod_scalars(h, l, k):
    """(n_unique, total, c1, c2) of the production count — on device,
    so benching it never moves the 2.2 GB table over the tunnel."""
    t = count_windows(h, l, None, k)
    cnt = jnp.asarray(t.counts, jnp.uint32)
    c1 = jnp.sum(jnp.asarray(t.hi, jnp.uint32) * cnt)
    c2 = jnp.sum(((jnp.asarray(t.lo, jnp.uint32) >> jnp.uint32(16))
                  + jnp.uint32(1)) * cnt)
    return t.n_unique, jnp.sum(cnt), c1, c2


def make_partition_count(R, C, P, seg):
    """One jitted exact count via sample-partition; returns
    (n_unique, total, c1, c2, max_seg_len) — everything consumed."""
    assert R * C == N

    def run(hi, lo16):
        rows_h = hi.reshape(R, C)
        rows_l = lo16.reshape(R, C)
        # stage 1: 1-key row sort by hi, lo16 payload
        sh, sl = jax.lax.sort((rows_h, rows_l), dimension=1, num_keys=1,
                              is_stable=False)
        # splitters: P-1 quantiles of sorted row 0
        splitters = sh[0, :: C // P][1:P]  # [P-1]
        # offsets: [R, P+1]
        inner = jax.vmap(lambda r: jnp.searchsorted(r, splitters,
                                                    side="left"))(sh)
        off = jnp.concatenate(
            [jnp.zeros((R, 1), inner.dtype), inner,
             jnp.full((R, 1), C, inner.dtype)], axis=1).astype(jnp.int32)
        seg_len = off[:, 1:] - off[:, :-1]          # [R, P]
        max_len = jnp.max(seg_len)
        # stage 2: block gather into [P*R, seg], ordered by (p, r)
        p_idx = jnp.repeat(jnp.arange(P, dtype=jnp.int32), R)   # [P*R]
        r_idx = jnp.tile(jnp.arange(R, dtype=jnp.int32), P)
        o = off[r_idx, p_idx]                        # segment start in row
        L = seg_len[r_idx, p_idx]
        start = jnp.minimum(o, C - seg)              # clamp; window shifts left
        d = o - start                                # in-window offset of seg
        flat_start = r_idx * C + start

        fh = sh.reshape(R * C)
        fl = sl.reshape(R * C)
        gh = jax.vmap(lambda s: jax.lax.dynamic_slice(fh, (s,), (seg,)))(
            flat_start)                              # [P*R, seg]
        gl = jax.vmap(lambda s: jax.lax.dynamic_slice(fl, (s,), (seg,)))(
            flat_start)
        j = jnp.arange(seg, dtype=jnp.int32)[None, :]
        valid = (j >= d[:, None]) & (j < (d + L)[:, None])
        gh = jnp.where(valid, gh, SENT_HI)
        gl = jnp.where(valid, gl, SENT_LO)
        # stage 3: per-partition 2-key row sort
        W = R * seg
        ph = gh.reshape(P, W)
        pl = gl.reshape(P, W)
        qh, ql = jax.lax.sort((ph, pl), dimension=1, num_keys=2,
                              is_stable=False)
        # counts: per-row boundaries, global because partitions are
        # disjoint key ranges
        new = jnp.concatenate(
            [jnp.ones((P, 1), bool),
             (qh[:, 1:] != qh[:, :-1]) | (ql[:, 1:] != ql[:, :-1])], axis=1)
        sent = (qh == SENT_HI) & (ql == SENT_LO)
        pos = jnp.arange(W, dtype=jnp.int32)[None, :]
        b = jnp.where(new, pos, W)
        sufmin = jax.lax.cummin(b, axis=1, reverse=True)
        nxt = jnp.concatenate(
            [sufmin[:, 1:], jnp.full((P, 1), W, jnp.int32)], axis=1)
        cnt = jnp.where(new & ~sent, nxt - pos, 0).astype(jnp.uint32)
        n_unique = jnp.sum((cnt > 0).astype(jnp.int32))
        total = jnp.sum(cnt)
        c1 = jnp.sum(qh * cnt)
        c2 = jnp.sum((ql.astype(jnp.uint32) + 1) * cnt)
        return n_unique, total, c1, c2, max_len

    return jax.jit(run)


# jits are built ONCE and reused across workloads (same shapes — no
# recompiles for the coverage pass)
_prod_jit = jax.jit(partial(prod_scalars, k=K))


def _consume2(a, b):
    return jnp.maximum(jnp.max(a), b.max().astype(jnp.uint32))


_sort2_jit = jax.jit(
    lambda h, l: _consume2(*jax.lax.sort((h, l), num_keys=2, is_stable=False)))
_sort1p_jit = jax.jit(
    lambda h, l: _consume2(*jax.lax.sort((h, l), num_keys=1, is_stable=False)))
_sort1_jit = jax.jit(
    lambda h: jnp.max(jax.lax.sort((h,), num_keys=1, is_stable=False)[0]))

CONFIGS = (
    ("A_R130_P128", 130, 1 << 10, 128, 64),
    ("B_R1040_P16", 1040, 1 << 7, 16, 64),
) if SMALL else (
    ("A_R130_P128", 130, 1 << 20, 128, 9216),
    ("B_R1040_P16", 1040, 1 << 17, 16, 9216),
)
_part_jits = {name: make_partition_count(R, C, P, seg)
              for name, R, C, P, seg in CONFIGS}


def run_workload(tag, hi, lo16):
    print(f"=== workload: {tag} ===", flush=True)
    lo_full = (lo16.astype(jnp.uint32) << jnp.uint32(16))

    # production engine baseline (count_windows -> group_sort path)
    _, t = bench(f"{tag}/count_windows_prod", _prod_jit, hi, lo_full, total=N)
    ref = tuple(int(np.asarray(x)) for x in t)
    print(f"{tag}/ref n_unique={ref[0]} total={ref[1]}", flush=True)

    bench(f"{tag}/sort2key_global", _sort2_jit, hi, lo16, total=N)
    bench(f"{tag}/sort1key_pay_global", _sort1p_jit, hi, lo16, total=N)
    bench(f"{tag}/sort1key_nopay_global", _sort1_jit, hi, total=N)

    for name, R, C, P, seg in CONFIGS:
        fn = _part_jits[name]
        tbest, out = bench(f"{tag}/partition_{name}", fn, hi, lo16, total=N)
        if out is not None:
            got = tuple(int(np.asarray(x)) for x in out)
            ok = got[:4] == ref[:4] if False else (
                got[0] == ref[0] and got[1] == ref[1]
                and got[2] == ref[2] and got[3] == ref[3])
            print(f"{tag}/partition_{name}: max_seg={got[4]} (cap {seg}) "
                  f"exact={'OK' if ok else 'MISMATCH ' + str((got[:4], ref[:4]))}",
                  flush=True)


hi_u, lo_u = make_lanes(coverage=False)
run_workload("uniform", hi_u, lo_u)

# monotone compaction gather: 40M sorted random positions out of N
rngg = np.random.default_rng(3)
midx = jnp.asarray(np.sort(rngg.choice(
    N, size=N // 4 if SMALL else 40 * 1024 * 1024,
    replace=False)).astype(np.int32))
sync(midx)
bench("uniform/monotone_gather_40M", jax.jit(
    lambda ix, x: jnp.max(x[ix])), midx, hi_u, total=40 * 1024 * 1024)
del midx

# u64 emulated global sort
try:
    jax.config.update("jax_enable_x64", True)
    hi64 = (hi_u.astype(jnp.uint64) << jnp.uint64(16)) | lo_u.astype(jnp.uint64)
    sync(hi64)
    bench("uniform/sort_u64_global", jax.jit(
        lambda h: jnp.max(jax.lax.sort((h,), num_keys=1, is_stable=False)[0])),
        hi64, total=N)
    del hi64
finally:
    jax.config.update("jax_enable_x64", False)

del hi_u, lo_u
hi_c, lo_c = make_lanes(coverage=True)
run_workload("coverage", hi_c, lo_c)

print("probe_r3c done", flush=True)
