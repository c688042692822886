"""Run chr-scale and query benches on the TPU (one claim session)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)

from kmer_tpu.bench import run_chr_bench, run_query_bench

r = run_chr_bench()
print(json.dumps(r), flush=True)
q = run_query_bench()
print(json.dumps(q), flush=True)
print("done", flush=True)
