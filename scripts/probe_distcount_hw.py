"""End-to-end distcount on hardware: file -> chunked ingest -> sharded
stream -> packed checkpoints, with a genuine mid-run SIGKILL + resume,
and a bit-exact comparison against an uninterrupted run.

This is the operational entry point (BASELINE configs[3] shape) driven
exactly as a user would: three `python -m kmer_tpu distcount`
subprocesses over the same 313 MB FASTQ.  The parent never touches the
device (the tunnel admits one process).
"""
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FASTQ = "/tmp/ingest_rss/small.fastq"
DIR = "/tmp/distcount_hw"
ARGS = [sys.executable, "-m", "kmer_tpu", "distcount", "--input", FASTQ,
        "-k", "21", "--canonical", "--batch", "65536", "--width", "160",
        "--acc-capacity", "8388608", "--ckpt-every", "4",
        "--chunk-mb", "128"]


def run(tag, ckpt, out, kill_after_s=None):
    cmd = ARGS + ["--ckpt", ckpt, "--out", out]
    t0 = time.perf_counter()
    p = subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
    if kill_after_s is not None:
        time.sleep(kill_after_s)
        p.send_signal(signal.SIGKILL)
        p.wait()
        print(f"{tag}: SIGKILLed after {kill_after_s}s", flush=True)
        return None
    out_text, _ = p.communicate(timeout=1500)
    dt = time.perf_counter() - t0
    tail = [l for l in out_text.splitlines() if l.strip()][-3:]
    print(f"{tag}: rc={p.returncode} {dt:.0f}s :: " + " | ".join(tail),
          flush=True)
    assert p.returncode == 0, out_text[-2000:]
    return dt


def load(out):
    import numpy as np

    with np.load(out + ".rank0.npz", allow_pickle=False) as z:
        live = (z["counts_hi"] > 0) | (z["counts_lo"] > 0)
        c64 = (z["counts_hi"].astype(np.int64) << 32) + z["counts_lo"].astype(
            np.int64)
        order = np.lexsort((z["length"][live], z["lo"][live], z["hi"][live]))
        return (z["hi"][live][order], z["lo"][live][order],
                z["length"][live][order], c64[live][order])


os.makedirs(DIR, exist_ok=True)
for f in os.listdir(DIR):
    os.remove(os.path.join(DIR, f))

straight_s = run("straight", f"{DIR}/s.ck", f"{DIR}/s.out")
# land the SIGKILL mid-stream: past the fixed startup/compile head but
# well before completion (straight runs warm-cached like the kill run)
run("kill", f"{DIR}/k.ck", f"{DIR}/k.out", kill_after_s=max(30, straight_s * 0.55))
resume_s = run("resume", f"{DIR}/k.ck", f"{DIR}/k.out")

import numpy as np

a = load(f"{DIR}/s.out")
b = load(f"{DIR}/k.out")
for x, y, name in zip(a, b, ("hi", "lo", "length", "counts")):
    assert np.array_equal(x, y), f"mismatch in {name}"
total = int(a[3].sum())
print(f"verify: resumed distcount table == straight table "
      f"({a[0].size} groups, total {total})", flush=True)
with open("/tmp/distcount_hw.json", "w") as f:
    json.dump({"straight_s": round(straight_s, 1),
               "resume_s": round(resume_s, 1),
               "groups": int(a[0].size), "total": total,
               "kill_resume_bit_exact": True}, f)
print("probe_distcount_hw OK", flush=True)
