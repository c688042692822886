"""Sustained configs[3]-scale run, round 4 (VERDICT r3 item #1).

Same 1.029e10-kmer workload as scripts/sustained_r3.py — 151 batches of
512k x 150bp reads off one 1 Mbp genome, k=21 canonical, (1,1) mesh,
4M-slot accumulator, checkpoints every 16 batches, genuine os._exit kill
+ bit-exact resume — measured against the r4 engine: the blocked-compact
fold (ops/wide._narrow_to_cap, scripts/probe_r4a.py: 395ms vs 644ms per
step) and overlapped AsyncCheckpointer writes (main-loop stall ~0 vs the
r3 23.6% synchronous charge).

Phases (state under --dir):
  straight : full run, no interruption -> straight.npz + straight.json
  kill     : same stream, os._exit(1) after --kill-after batches
  resume   : resumes from the kill's checkpoint, completes, verifies
             equality with straight.npz, writes SUSTAINED.json
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 21
READ_LEN = 150
BATCH_READS = 512 * 1024
GENOME = 1_000_000
N_SOURCE_BATCHES = 8
ACC_CAP = 4 * 1024 * 1024
CKPT_EVERY = 16
WINDOWS_PER_BATCH = BATCH_READS * (READ_LEN - K + 1)


def make_device_batches():
    """Eight device-resident [B, L] code batches from one genome."""
    import jax.numpy as jnp

    from kmer_tpu.native import device_unpack_rows, pack2bit_rows

    genome = np.random.default_rng(0).integers(0, 4, GENOME, dtype=np.uint8)
    lengths = jnp.full((BATCH_READS,), READ_LEN, jnp.int32)
    out = []
    for i in range(N_SOURCE_BATCHES):
        rng = np.random.default_rng(100 + i)
        starts = rng.integers(0, GENOME - READ_LEN + 1, size=BATCH_READS)
        reads = genome[starts[:, None] + np.arange(READ_LEN)[None, :]]
        flip = rng.random(BATCH_READS) < 0.5
        reads[flip] = 3 - reads[flip, ::-1]
        words = jnp.asarray(pack2bit_rows(reads))
        codes = device_unpack_rows(words, READ_LEN)
        codes.block_until_ready()
        out.append(codes)
        print(f"batch {i} resident", flush=True)
    return out, lengths


def batch_stream(batches, lengths, n_steps, kill_after=None, times=None):
    t0 = time.perf_counter()
    for i in range(n_steps):
        if kill_after is not None and i >= kill_after:
            print(f"KILLING at batch {i} (no graceful checkpoint)", flush=True)
            sys.stdout.flush()
            os._exit(1)
        if times is not None:
            times.append(time.perf_counter())
        if i and i % 20 == 0:
            dt = time.perf_counter() - t0
            print(f"step {i}/{n_steps} t+{dt:.0f}s "
                  f"({i * WINDOWS_PER_BATCH / dt / 1e6:.0f}M kmers/s)",
                  flush=True)
        yield batches[i % len(batches)], lengths


def run(phase, n_steps, kill_after, dirpath):
    import jax

    if os.environ.get("KMER_TPU_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from kmer_tpu.parallel.mesh import make_mesh
    from kmer_tpu.parallel.streaming import (
        ResumableStream, save_wide, stream_sharded_count,
    )

    print(f"claim ok: {float(jnp.ones(2).sum())}", flush=True)
    mesh = make_mesh((1, 1))
    batches, lengths = make_device_batches()
    name = "straight.ckpt.npz" if phase == "straight" else "sustained.ckpt.npz"
    rs = ResumableStream(os.path.join(dirpath, name))
    start_batch = rs.batches_done
    print(f"phase={phase} start_batch={start_batch}", flush=True)

    t_start = time.perf_counter()
    yield_times: list[float] = []
    acc, overflow = stream_sharded_count(
        batch_stream(batches, lengths, n_steps,
                     kill_after=kill_after if phase == "kill" else None,
                     times=yield_times),
        K, mesh, canonical=True, acc_capacity=ACC_CAP,
        resumable=rs, ckpt_every=CKPT_EVERY,
        warmup=(batches[0], lengths),
        ckpt_target_overhead=0.1,
    )
    jax.block_until_ready(acc.counts_lo)
    # wall from the first batch yield: the one-time jit compile runs in
    # the warmup step before the stream starts consuming batches
    wall = time.perf_counter() - (yield_times[0] if yield_times else t_start)

    assert overflow == 0, f"overflow {overflow}"
    steps_run = n_steps - start_batch
    total_kmers = n_steps * WINDOWS_PER_BATCH
    out = {
        "phase": phase,
        "total_kmers": total_kmers,
        "steps": n_steps,
        "steps_run_this_process": steps_run,
        "wall_s": round(wall, 2),
        "kmers_per_s_sustained": round(steps_run * WINDOWS_PER_BATCH / wall, 1),
        "n_checkpoints": rs.n_checkpoints,
        "checkpoint_stall_s": round(rs.ckpt_wait_s, 2),
        "checkpoint_overhead_pct": round(100 * rs.ckpt_wait_s / wall, 1),
        "distinct": int(acc.n_unique),
        "acc_capacity": ACC_CAP,
        "genome_bases": GENOME,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out), flush=True)
    final_path = os.path.join(dirpath, f"{phase}.npz")
    save_wide(acc, final_path, {"n_steps": n_steps})
    with open(os.path.join(dirpath, f"{phase}.json"), "w") as f:
        json.dump(out, f)

    if phase == "resume":
        verify(acc, batches, lengths, dirpath, out, n_steps)
    return 0


def verify(acc, batches, lengths, dirpath, resume_stats, n_steps):
    """resumed == straight, totals exact, sampled-batch recount subset."""
    from kmer_tpu.ops.count import count_kmers_jit
    from kmer_tpu.parallel.streaming import load_wide

    straight, _ = load_wide(os.path.join(dirpath, "straight.npz"))
    st, rt = straight.trim(), acc.trim()
    assert np.array_equal(st.hi, rt.hi), "resume != straight (keys)"
    assert np.array_equal(st.lo, rt.lo)
    assert np.array_equal(st.length, rt.length)
    assert np.array_equal(st.counts64(), rt.counts64()), "resume != straight (counts)"
    total = int(rt.counts64().sum())
    assert total == n_steps * WINDOWS_PER_BATCH, (total, n_steps * WINDOWS_PER_BATCH)
    print("verify: resumed table == straight table; totals exact", flush=True)

    t = count_kmers_jit(batches[3], lengths, k=K, canonical=True).trim()
    final = {}
    for h, l, ln, c in zip(rt.hi, rt.lo, rt.length, rt.counts64()):
        final[(int(h), int(l), int(ln))] = int(c)
    sample_hits = 0
    for h, l, ln, c in zip(
        np.asarray(t.hi)[:5000], np.asarray(t.lo)[:5000],
        np.asarray(t.length)[:5000], np.asarray(t.counts)[:5000],
    ):
        key = (int(h), int(l), int(ln))
        assert key in final and final[key] >= int(c), key
        sample_hits += 1
    print(f"verify: sampled batch recount subset ok ({sample_hits} keys)",
          flush=True)

    straight_stats = json.load(open(os.path.join(dirpath, "straight.json")))
    sustained = {
        "metric": "sustained_kmers_per_s_chip",
        "value": straight_stats["kmers_per_s_sustained"],
        "unit": "kmers/s",
        "total_kmers": straight_stats["total_kmers"],
        "wall_s": straight_stats["wall_s"],
        "checkpoint_overhead_pct": straight_stats["checkpoint_overhead_pct"],
        "checkpoint_stall_s": straight_stats["checkpoint_stall_s"],
        "n_checkpoints": straight_stats["n_checkpoints"],
        "kill_resume_verified": True,
        "resume_stats": resume_stats,
        "distinct": straight_stats["distinct"],
        "genome_bases": GENOME,
        "batch_reads": BATCH_READS,
        "k": K,
        "canonical": True,
        "mesh": [1, 1],
        "device": straight_stats["device"],
        "engine": ("r4: blocked-compact fold (probe_r4a 395ms/step) + "
                   "overlapped AsyncCheckpointer writes"),
    }
    with open("/root/repo/SUSTAINED.json", "w") as f:
        json.dump(sustained, f, indent=1)
    print("SUSTAINED.json written", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["straight", "kill", "resume"],
                    required=True)
    ap.add_argument("--steps", type=int, default=151)  # >=1e10 kmers
    # past the first dispatch-runahead sync (step 40 -> device >= 24),
    # so the step-16 checkpoint's write has landed before the kill
    ap.add_argument("--kill-after", type=int, default=56)
    ap.add_argument("--dir", default="/tmp/sustained_r4")
    ap.add_argument("--batch-reads", type=int, default=None,
                    help="override for CPU smoke tests")
    ap.add_argument("--genome", type=int, default=None)
    ap.add_argument("--acc-cap", type=int, default=None)
    ap.add_argument("--ckpt-every", type=int, default=None)
    a = ap.parse_args()
    if a.batch_reads:
        BATCH_READS = a.batch_reads
        WINDOWS_PER_BATCH = BATCH_READS * (READ_LEN - K + 1)
    if a.genome:
        GENOME = a.genome
    if a.acc_cap:
        ACC_CAP = a.acc_cap
    if a.ckpt_every:
        CKPT_EVERY = a.ckpt_every
    os.makedirs(a.dir, exist_ok=True)
    raise SystemExit(run(a.phase, a.steps, a.kill_after, a.dir))
