"""Coverage-reads bench on TPU: 1M x 150bp reads from a 5 Mbp genome
(30x coverage) — the group sort's fallback regime."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)

from kmer_tpu.bench import run_bench

r = run_bench(coverage_genome=5_000_000)
print(json.dumps(r), flush=True)
print("done", flush=True)
