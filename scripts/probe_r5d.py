"""Round-5 probe D: the merge-cadence lever (VERDICT r4 weak #8).

Hypothesis (r3 ask 1(b), never measured): fold R per-batch compacted
tables and pay the accumulator merge once per R steps, amortizing the
~50ms/step ≤2-slot merge.  The catch: a key can then appear in up to
R+1 sources, so the flush must use the GENERAL weighted GROUP BY
(count_packed_wide) with its O(n log n) two-lane pair cumsum over
(R+1)*cap rows — per-batch merging's ≤2-slots-per-segment trick does
not apply across R sources.

Measures both step compositions on the sustained workload shape
(512k x 150bp coverage reads, k=21 canonical, 4M-slot accumulator),
verifies bit-exactness between them, and reports accept/reject against
the VERDICT threshold (ship if >= 1.15x).

Usage: tpu_run.sh scripts/probe_r5d.py /tmp/probe_r5d.out 1500
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 21
READ_LEN = 150
BATCH = 512 * 1024
GENOME = 1_000_000
CAP = 4 * 1024 * 1024
R = 4
N_STEPS = 12


def main():
    import jax
    import jax.numpy as jnp

    from kmer_tpu.native import device_unpack_rows, pack2bit_rows
    from kmer_tpu.ops.count import SENTINEL, count_windows
    from kmer_tpu.ops.extract import canonicalize, extract_windows_batch
    from kmer_tpu.ops.wide import (
        WideCounts,
        _narrow_to_cap,
        count_packed_wide,
        fold_windows_into_wide,
    )

    print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)
    out = {"batch": BATCH, "cap": CAP, "R": R, "steps": N_STEPS}

    # device-resident coverage batches (sustained_r4 shape)
    genome = np.random.default_rng(0).integers(0, 4, GENOME, dtype=np.uint8)
    lengths = jnp.full((BATCH,), READ_LEN, jnp.int32)
    batches = []
    for i in range(4):
        rng = np.random.default_rng(100 + i)
        starts = rng.integers(0, GENOME - READ_LEN + 1, size=BATCH)
        reads = genome[starts[:, None] + np.arange(READ_LEN)[None, :]]
        flip = rng.random(BATCH) < 0.5
        reads[flip] = 3 - reads[flip, ::-1]
        w = jax.device_put(pack2bit_rows(reads))
        codes = device_unpack_rows(w, READ_LEN)
        codes.block_until_ready()
        batches.append(codes)
    print("batches resident", flush=True)

    def extract(codes):
        wins, valid = extract_windows_batch(codes, lengths, K)
        hi, lo = canonicalize(wins.hi, wins.lo, K)
        return hi, lo, valid

    # --- shipped per-batch fold -----------------------------------
    @jax.jit
    def step_shipped(acc, codes):
        hi, lo, valid = extract(codes)
        return fold_windows_into_wide(acc, hi, lo, valid, K)

    # --- cadence: narrow per batch, general merge once per R ------
    @jax.jit
    def step_narrow(codes):
        hi, lo, valid = extract(codes)
        table = count_windows(hi, lo, valid, K)
        tcnt = jnp.asarray(table.counts, jnp.int32)
        dead = tcnt <= 0
        thi = jnp.where(dead, jnp.uint32(SENTINEL),
                        jnp.asarray(table.hi, jnp.uint32))
        tlo = jnp.where(dead, jnp.uint32(SENTINEL),
                        jnp.asarray(table.lo, jnp.uint32))
        chi, clo, ccnt = _narrow_to_cap((thi, tlo), tcnt, CAP, nkeys=2)
        return chi, clo, ccnt

    @jax.jit
    def flush(acc, segs_hi, segs_lo, segs_cnt):
        hi = jnp.concatenate([acc.hi] + segs_hi)
        lo = jnp.concatenate([acc.lo] + segs_lo)
        ln = jnp.where(hi == jnp.uint32(SENTINEL),
                       jnp.int32(0x7FFFFFFF), jnp.int32(K))
        wh = jnp.concatenate(
            [acc.counts_hi] + [jnp.zeros_like(c) for c in segs_cnt])
        wl = jnp.concatenate(
            [acc.counts_lo] + [c.astype(jnp.uint32) for c in segs_cnt])
        return count_packed_wide(hi, lo, ln, wh, wl, CAP)

    def run_shipped():
        acc = WideCounts.empty(CAP)
        for i in range(N_STEPS):
            acc = step_shipped(acc, batches[i % 4])
        jax.block_until_ready(acc.counts_lo)
        return acc

    def run_cadence():
        acc = WideCounts.empty(CAP)
        segs = []
        for i in range(N_STEPS):
            segs.append(step_narrow(batches[i % 4]))
            if len(segs) == R:
                acc = flush(acc,
                            [s[0] for s in segs], [s[1] for s in segs],
                            [s[2] for s in segs])
                segs = []
        if segs:
            acc = flush(acc, [s[0] for s in segs], [s[1] for s in segs],
                        [s[2] for s in segs])
        jax.block_until_ready(acc.counts_lo)
        return acc

    # warm both, then time
    a = run_shipped()
    b = run_cadence()
    ta = a.trim()
    tb = b.trim()
    exact = (np.array_equal(np.asarray(ta.hi), np.asarray(tb.hi))
             and np.array_equal(ta.counts64(), tb.counts64()))
    out["exact"] = bool(exact)
    print(json.dumps({"exact": out["exact"],
                      "distinct": int(ta.n_unique)}), flush=True)

    t0 = time.perf_counter()
    run_shipped()
    out["shipped_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    run_cadence()
    out["cadence_s"] = round(time.perf_counter() - t0, 2)
    out["shipped_ms_step"] = round(out["shipped_s"] / N_STEPS * 1000, 1)
    out["cadence_ms_step"] = round(out["cadence_s"] / N_STEPS * 1000, 1)
    out["speedup"] = round(out["shipped_s"] / out["cadence_s"], 3)
    out["verdict"] = ("ACCEPT (ship)" if out["speedup"] >= 1.15
                      else "REJECT (measured-shut)")
    print(json.dumps(out), flush=True)
    with open("/tmp/probe_r5d.json", "w") as f:
        json.dump(out, f, indent=1)
    print("probe_r5d OK", flush=True)


if __name__ == "__main__":
    main()
