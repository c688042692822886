"""Round-5 probe C: single-shot vs streaming route on the 313 MB FASTQ,
plus the CLI subprocess wall (what a user actually sees).

Usage: tpu_run.sh scripts/probe_r5c.py /tmp/probe_r5c.out 1500
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PATH = "/tmp/ingest_rss/small.fastq"
K = 21
EXPECT_DISTINCT = 4999967
EXPECT_TOTAL = 130000000


def main():
    import jax
    import jax.numpy as jnp

    print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)
    out = {}
    from kmer_tpu.pipeline import count_file

    def run(**kw):
        t0 = time.perf_counter()
        res = count_file(PATH, "fastq", K, canonical=True, **kw)
        jax.block_until_ready(res.counts_lo if hasattr(res, "counts_lo")
                              else res.counts)
        return res, time.perf_counter() - t0

    # warm both routes' compiles first
    res, t = run(single_shot=True)
    out["ss_cold_s"] = round(t, 2)
    out["route_auto"] = None
    for name, kw in (("ss", dict(single_shot=True)),
                     ("stream", dict(single_shot=False)),
                     ("auto", {})):
        res, t = run(**kw)
        out[f"{name}_warm_s"] = round(t, 2)
        out[f"{name}_Mkmers_s"] = round(EXPECT_TOTAL / t / 1e6, 2)
        if name == "auto":
            out["route_auto"] = type(res).__name__
        tt = res.trim()
        c64 = (tt.counts64() if hasattr(tt, "counts64")
               else np.asarray(tt.counts, np.int64))
        assert int(tt.n_unique) == EXPECT_DISTINCT, int(tt.n_unique)
        assert int(c64.sum()) == EXPECT_TOTAL
        print(json.dumps({k: v for k, v in out.items() if name in k}),
              flush=True)
    out["exact"] = True
    print(json.dumps(out), flush=True)
    with open("/tmp/probe_r5c.json", "w") as f:
        json.dump(out, f, indent=1)
    print("probe_r5c OK", flush=True)


if __name__ == "__main__":
    main()
