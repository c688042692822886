"""Throughput benchmark: canonical k-mer counting on one chip.

Workload = BASELINE.json configs[1]: k=21 canonical counting over
simulated 150bp reads.  The reference baseline is Postgres HashAggregate
counting at ~1.3e6 k-mers/s on one CPU core (BASELINE.md: 78.7 ms for
100k rows); vs_baseline is measured k-mers/s over that number.

The pipeline under test is the fused jitted chunk step
(extract -> canonicalize -> sort-count) plus the cross-chunk exact table
merge — i.e. a complete exact global count, not extraction alone.
"""

from __future__ import annotations

import time

import numpy as np

REFERENCE_KMERS_PER_S = 1.3e6


def run_bench(
    n_reads: int = 1 << 20,
    read_len: int = 150,
    k: int = 21,
    canonical: bool = True,
    chunk_reads: int = 1 << 17,
    merge: bool = True,
    seed: int = 0,
) -> dict:
    import jax
    import jax.numpy as jnp

    from .ops.count import count_kmers, merge_tables
    from .ops.extract import simulate_reads

    chunk_reads = min(chunk_reads, n_reads)
    n_chunks = (n_reads + chunk_reads - 1) // chunk_reads
    windows_per_read = read_len - k + 1
    total_kmers = n_reads * windows_per_read

    # input generation off the clock (host RNG); reuse one buffer per chunk
    host_chunks = [
        simulate_reads(chunk_reads, read_len, seed=seed + i) for i in range(n_chunks)
    ]
    lengths = jnp.full((chunk_reads,), read_len, jnp.int32)

    step = jax.jit(lambda c, l: count_kmers(c, l, k, canonical))

    # warmup / compile (int() forces a real host sync; block_until_ready
    # can return early through remote-execution tunnels)
    warm = step(jnp.asarray(host_chunks[0]), lengths)
    int(warm.n_unique)

    t0 = time.perf_counter()
    acc = None
    for i in range(n_chunks):
        table = step(jnp.asarray(host_chunks[i]), lengths)
        if merge:
            acc = table if acc is None else merge_tables(acc, table)
        else:
            acc = table
    n_unique = int(acc.n_unique)  # host sync = true completion
    dt = time.perf_counter() - t0

    kmers_per_s = total_kmers / dt
    return {
        "metric": "canonical_kmers_counted_per_s_chip",
        "value": round(kmers_per_s, 1),
        "unit": "kmers/s",
        "vs_baseline": round(kmers_per_s / REFERENCE_KMERS_PER_S, 2),
        "detail": {
            "n_reads": n_reads,
            "read_len": read_len,
            "k": k,
            "canonical": canonical,
            "chunks": n_chunks,
            "wall_s": round(dt, 3),
            "total_kmers": total_kmers,
            "unique_kmers": n_unique,
            "device": str(jax.devices()[0]),
            "merged": merge,
        },
    }
