"""Round-5 probe H: is device_put of a 2-D array slower than flat?

probe_r5b measured flat 40MB uploads at 24.8 MB/s; probe_r5e's real
[B, 12] batch uploads ran ~15-16 MB/s.  If 2-D puts pay a layout
penalty, the wire should ship flat and reshape in-graph (free for a
row-major contiguous array).

Usage: tpu_run.sh scripts/probe_r5h.py /tmp/probe_r5h.out 900
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)
    rng = np.random.default_rng(0)
    out = {}
    B, C = 524288, 12
    flat = rng.integers(0, 2**32, B * C, dtype=np.uint32)
    two = flat.reshape(B, C)
    mb = flat.nbytes / 1e6
    # warm
    jax.device_put(flat).block_until_ready()
    jax.device_put(two).block_until_ready()
    for name, arr in (("flat", flat), ("twod", two)):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            d = jax.device_put(arr)
            d.block_until_ready()
            ts.append(time.perf_counter() - t0)
            del d
        out[f"{name}_mb_s"] = round(mb / min(ts), 1)
        out[f"{name}_s"] = [round(t, 2) for t in ts]
    # flat + on-device reshape to [B, C] (cost of the reshape itself)
    resh = jax.jit(lambda x: x.reshape(B, C) + jnp.uint32(0))
    d = jax.device_put(flat)
    resh(d).block_until_ready()
    t0 = time.perf_counter()
    d = jax.device_put(flat)
    r = resh(d)
    r.block_until_ready()
    out["flat_put_plus_reshape_s"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(out), flush=True)
    with open("/tmp/probe_r5h.json", "w") as f:
        json.dump(out, f, indent=1)
    print("probe_r5h OK", flush=True)


if __name__ == "__main__":
    main()
