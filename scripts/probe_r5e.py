"""Round-5 probe E: phase decomposition of count_file's two routes on
the 313 MB FASTQ — where do the seconds go, with run-to-run variance.

Usage: tpu_run.sh scripts/probe_r5e.py /tmp/probe_r5e.out 1800
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PATH = "/tmp/ingest_rss/small.fastq"
K = 21


def main():
    import jax
    import jax.numpy as jnp

    from kmer_tpu.pipeline import (
        _combine,
        _count_single_shot,
        _make_fold_step,
        _make_place_step,
        count_file,
        file_batch_feed,
    )

    print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)
    out = {}

    # --- feed only (host) x2 ------------------------------------------
    for trial in range(2):
        t0 = time.perf_counter()
        feed, batch, width, est = file_batch_feed(PATH, "fastq", K, None,
                                                  None, None)
        host = [(w, l) for w, l in feed]
        out[f"feed{trial}_s"] = round(time.perf_counter() - t0, 2)
    out["batch"] = batch
    out["width"] = width
    out["est_windows"] = est
    out["n_batches"] = len(host)
    print(json.dumps(out), flush=True)

    # --- upload only x2 (the real wire: one combined array per batch) --
    combos = [_combine(np.asarray(w), l) for w, l in host]
    for trial in range(2):
        t0 = time.perf_counter()
        dev = [jax.device_put(c) for c in combos]
        for d in dev:
            d.block_until_ready()
        out[f"upload{trial}_s"] = round(time.perf_counter() - t0, 2)
    mb = sum(c.nbytes for c in combos) / 1e6
    out["upload_mb"] = round(mb, 1)
    print(json.dumps({k: out[k] for k in out if "upload" in k}), flush=True)

    # --- single-shot compute on resident batches (place+count) x2 -----
    from kmer_tpu.ops.count import count_windows

    cw = jax.jit(count_windows, static_argnames=("k",))
    place = _make_place_step(K, True, width)
    spb = batch * (width - K + 1)
    cap = len(dev) * spb
    for trial in range(2):
        t0 = time.perf_counter()
        bh = jnp.zeros((cap,), jnp.uint32)
        bl = jnp.zeros((cap,), jnp.uint32)
        bv = jnp.zeros((cap,), bool)
        for i, d in enumerate(dev):
            bh, bl, bv = place(bh, bl, bv, d, jnp.int32(i * spb))
        table = cw(bh, bl, bv, K)
        table.counts.block_until_ready()
        out[f"ss_compute{trial}_s"] = round(time.perf_counter() - t0, 2)
    out["ss_distinct"] = int(table.n_unique)
    print(json.dumps({k: out[k] for k in out if "ss_" in k}), flush=True)
    del bh, bl, bv, table, dev

    # --- fold compute on resident batches x2 ---------------------------
    from kmer_tpu.ops.wide import WideCounts

    step = _make_fold_step(K, True, width)
    capw = 1 << 24
    devb = [jax.device_put(c) for c in combos]
    for trial in range(2):
        t0 = time.perf_counter()
        acc = WideCounts.empty(capw)
        st = jnp.zeros((3,), jnp.int32)
        for d in devb:
            acc, st = step(acc, st, d)
        jax.block_until_ready(acc.counts_lo)
        out[f"fold_compute{trial}_s"] = round(time.perf_counter() - t0, 2)
    print(json.dumps({k: out[k] for k in out if "fold_" in k}), flush=True)
    del acc, devb

    # --- end-to-end, both routes, x2 each ------------------------------
    for name, kw in (("ss", dict(single_shot=True)),
                     ("stream", dict(single_shot=False))):
        for trial in range(2):
            t0 = time.perf_counter()
            res = count_file(PATH, "fastq", K, canonical=True, **kw)
            jax.block_until_ready(res.counts_lo
                                  if hasattr(res, "counts_lo")
                                  else res.counts)
            out[f"{name}_e2e{trial}_s"] = round(time.perf_counter() - t0, 2)
            del res
    print(json.dumps(out), flush=True)
    with open("/tmp/probe_r5e.json", "w") as f:
        json.dump(out, f, indent=1)
    print("probe_r5e OK", flush=True)


if __name__ == "__main__":
    main()
