"""Round-5 probe I: kill/resume of the pipelined `count --ckpt` path on
the 9.96 GB FASTQ, driven exactly as a user would (CLI subprocesses).

straight:  count --ckpt s.ck --save s.npz          (uninterrupted)
kill:      count --ckpt k.ck --save k.npz, SIGKILL mid-run
resume:    same command again — must resume from the confirmed-point
           checkpoint and produce a table byte-identical to straight.

The parent never touches the device (single-admission tunnel).

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache python scripts/probe_r5i.py
"""
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FASTQ = "/tmp/ingest_rss/big.fastq"
DIR = "/tmp/count_ckpt_hw"


def args(ckpt, save):
    return [sys.executable, "-m", "kmer_tpu", "count", "--input", FASTQ,
            "-k", "21", "--canonical", "--chunk-mb", "128",
            "--ckpt", ckpt, "--save", save, "--top", "3"]


def run(tag, ckpt, save, kill_after_s=None):
    t0 = time.perf_counter()
    p = subprocess.Popen(args(ckpt, save), cwd=REPO, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
    if kill_after_s is not None:
        time.sleep(kill_after_s)
        p.send_signal(signal.SIGKILL)
        p.wait()
        print(f"{tag}: SIGKILLed after {kill_after_s:.0f}s", flush=True)
        return None
    out_text, _ = p.communicate(timeout=1700)
    dt = time.perf_counter() - t0
    tail = [l for l in out_text.splitlines() if "distinct" in l][-1:]
    print(f"{tag}: rc={p.returncode} {dt:.0f}s :: {tail}", flush=True)
    assert p.returncode == 0, out_text[-2000:]
    return dt


def load(path):
    import numpy as np

    with np.load(path, allow_pickle=False) as z:
        c64 = (z["counts_hi"].astype(np.int64) << 32) + z[
            "counts_lo"].astype(np.int64)
        order = np.lexsort((z["length"], z["lo"], z["hi"]))
        return (z["hi"][order], z["lo"][order], z["length"][order],
                c64[order])


os.makedirs(DIR, exist_ok=True)
for f in os.listdir(DIR):
    os.remove(os.path.join(DIR, f))

straight_s = run("straight", f"{DIR}/s.ck.npz", f"{DIR}/s.npz")
run("kill", f"{DIR}/k.ck.npz", f"{DIR}/k.npz",
    kill_after_s=max(40, straight_s * 0.6))
resume_s = run("resume", f"{DIR}/k.ck.npz", f"{DIR}/k.npz")

import numpy as np

a = load(f"{DIR}/s.npz")
b = load(f"{DIR}/k.npz")
for x, y, name in zip(a, b, ("hi", "lo", "length", "counts")):
    assert np.array_equal(x, y), f"mismatch in {name}"
total = int(a[3].sum())
print(f"verify: resumed count table == straight table "
      f"({a[0].size} groups, total {total})", flush=True)
rec = {"straight_s": round(straight_s, 1), "resume_s": round(resume_s, 1),
       "groups": int(a[0].size), "total": total,
       "kill_resume_bit_exact": True,
       "Mkmers_s_straight": round(total / straight_s / 1e6, 1)}
print(json.dumps(rec), flush=True)
with open("/tmp/count_ckpt_hw.json", "w") as f:
    json.dump(rec, f)
print("probe_r5i OK", flush=True)
