"""Compiled-vs-interpret parity of the Pallas segment-count kernel on the
real TPU (ADVICE r1: the Mosaic lowering — lane roll, SMEM carry across
grid steps, halo reads — is never exercised compiled in the CPU CI)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp

print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)

from kmer_tpu.pallas.segment_counts import segment_counts_sorted

rng = np.random.default_rng(7)
for name, hi, lo, sent in [
    ("random_runs",
     np.sort(rng.integers(0, 1 << 20, 512 * 128 * 2 + 333).astype(np.uint32)),
     np.zeros(512 * 128 * 2 + 333, np.uint32), None),
    ("two_lane",
     None, None, None),
    ("sentinel_fold",
     None, None, (0xFFFFFFFF, 0xFFFF0000)),
]:
    if hi is None:
        n = 512 * 128 + 77
        h = rng.integers(0, 50, n).astype(np.uint32)
        l = rng.integers(0, 4, n).astype(np.uint32) << np.uint32(16)
        if sent is not None:
            h[: n // 4] = 0xFFFFFFFF
            l[: n // 4] = 0xFFFF0000
        order = np.lexsort((l, h))
        hi, lo = h[order], l[order]
    ci, ui = segment_counts_sorted(jnp.asarray(hi), jnp.asarray(lo),
                                   sentinel=sent, interpret=True)
    cc, uc = segment_counts_sorted(jnp.asarray(hi), jnp.asarray(lo),
                                   sentinel=sent)
    same = np.array_equal(np.asarray(ci), np.asarray(cc)) and int(ui) == int(uc)
    print(f"{name}: compiled==interpret {same} (n_unique={int(uc)})", flush=True)
    assert same, name

# group sort on-device exactness vs the 2-key oracle at a nontrivial size
from kmer_tpu.ops.count import group_sort_pairs

h = rng.integers(0, 1 << 12, 1 << 20).astype(np.uint32)  # heavy runs
l = rng.integers(0, 1 << 16, 1 << 20).astype(np.uint16)
g = jax.jit(group_sort_pairs)(jnp.asarray(h), jnp.asarray(l))
w = jax.lax.sort((jnp.asarray(h), jnp.asarray(l)), num_keys=2, is_stable=False)
ok = bool(jnp.all(g[0] == w[0])) and bool(jnp.all(g[1] == w[1]))
print(f"group_sort_fallback_on_tpu: exact {ok}", flush=True)
assert ok

print("done", flush=True)
