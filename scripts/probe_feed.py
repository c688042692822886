"""Host feed-rate measurement (VERDICT r3 item #4 'Done' criterion).

Generates a >=1 GB FASTQ on disk, then measures
  (a) the native MT parse+encode rate (kmer_native fastq_encode), and
  (b) the full _reads_file_batches feed rate: parse + length-bucket
      argsort + one vectorized gather per batch (the arrays a consumer
      would upload).
CPU-only; results go to PERF.md.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from kmer_tpu.cli import _reads_file_batches
from kmer_tpu.native import fastq_encode

PATH = "/tmp/feed_probe.fastq"
N_READS = 3_300_000
READ_LEN = 150

if not os.path.exists(PATH) or os.path.getsize(PATH) < 1 << 30:
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    qual = np.full(READ_LEN, ord("I"), np.uint8).tobytes()
    with open(PATH, "wb") as f:
        chunk = 100_000
        for s in range(0, N_READS, chunk):
            m = min(chunk, N_READS - s)
            seqs = bases[rng.integers(0, 4, (m, READ_LEN))]
            parts = []
            for i in range(m):
                parts.append(b"@r%d\n" % (s + i))
                parts.append(seqs[i].tobytes())
                parts.append(b"\n+\n")
                parts.append(qual)
                parts.append(b"\n")
            f.write(b"".join(parts))
    print(f"wrote {PATH}: {os.path.getsize(PATH)/1e9:.2f} GB", flush=True)

size = os.path.getsize(PATH)
print(f"file: {size/1e9:.2f} GB, {N_READS} reads x {READ_LEN}bp", flush=True)

data = open(PATH, "rb").read()
t0 = time.perf_counter()
codes, offs = fastq_encode(data)
t_parse = time.perf_counter() - t0
print(
    f"native parse+encode: {t_parse*1e3:.0f}ms -> {size/t_parse/1e9:.2f} GB/s "
    f"({offs.size-1} reads)",
    flush=True,
)
del data, codes, offs

for batch in (4096, 65536):
    t0 = time.perf_counter()
    n_rows = 0
    n_bases = 0
    for rows, ls in _reads_file_batches(PATH, "fastq", 21, batch=batch):
        n_rows += rows.shape[0]
        n_bases += int(ls.sum())
    t_feed = time.perf_counter() - t0
    print(
        f"feed batch={batch}: {t_feed*1e3:.0f}ms -> {size/t_feed/1e9:.2f} GB/s "
        f"file-bytes ({n_bases/t_feed/1e6:.0f}M bases/s, {n_rows} reads)",
        flush=True,
    )
