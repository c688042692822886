"""Coverage bench A/B: group sort (fallback fires) vs plain 2-key sort."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)

from kmer_tpu.bench import run_bench

os.environ["KMER_TPU_NO_GROUPSORT"] = "1"
r = run_bench(coverage_genome=5_000_000)
print("plain2key:", json.dumps({k: r[k] for k in ("value", "unit")}),
      "wall", r["detail"]["wall_s"], flush=True)
print("done", flush=True)
