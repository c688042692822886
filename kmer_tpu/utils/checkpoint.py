"""Checkpoint / resume for count tables and indexes.

The reference inherits persistence from Postgres heap/WAL storage
(SURVEY.md §5.4).  The engine serializes packed-key arrays, count
tables, and sorted indexes to npz snapshots so long multi-batch counts
and index builds are resumable: counting is associative/idempotent per
input shard, so a run restarts from the last merged snapshot and
replays only the remaining shards.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..index import KmerIndex
from ..ops.count import CountTable

_FORMAT_VERSION = 1


def atomic_savez(path: str, **arrays) -> None:
    """np.savez_compressed with crash-safe replace semantics.

    Writing directly over an existing checkpoint would destroy it if
    the process dies mid-write — the exact event checkpoints exist to
    survive.  Write to a temp file in the same directory, then
    os.replace (atomic on POSIX).
    """
    d = os.path.dirname(os.path.abspath(path)) or "."
    import tempfile

    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez_compressed(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def save_table(table: CountTable, path: str, meta: dict | None = None) -> None:
    """Snapshot a (trimmed) count table + metadata to an .npz file."""
    t = table.trim() if not isinstance(table.hi, np.ndarray) else table
    atomic_savez(
        path,
        hi=np.asarray(t.hi, np.uint32),
        lo=np.asarray(t.lo, np.uint32),
        length=np.asarray(t.length, np.int32),
        counts=np.asarray(t.counts, np.int64),
        meta=json.dumps({"version": _FORMAT_VERSION, **(meta or {})}),
    )


def load_table(path: str) -> tuple[CountTable, dict]:
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        counts = z["counts"].astype(np.int32)
        table = CountTable(
            hi=z["hi"],
            lo=z["lo"],
            length=z["length"],
            counts=counts,
            # derive from the data: an untrimmed (numpy) table saved by
            # save_table may contain dead slots, so hi.size would lie
            n_unique=np.int64((counts > 0).sum()),
        )
    return table, meta


def save_index(index: KmerIndex, path: str, meta: dict | None = None) -> None:
    atomic_savez(
        path,
        sorted_keys=index.sorted_keys,
        sorted_lens=index.sorted_lens,
        row_ids=index.row_ids,
        meta=json.dumps({"version": _FORMAT_VERSION, **(meta or {})}),
    )


def load_index(path: str) -> tuple[KmerIndex, dict]:
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        idx = KmerIndex(
            sorted_keys=z["sorted_keys"],
            sorted_lens=z["sorted_lens"],
            row_ids=z["row_ids"],
        )
    return idx, meta


class ResumableCount:
    """Checkpointed streaming count over an ordered list of input shards.

    Progress = (shards_done, snapshot table).  On restart, completed
    shards are skipped and counting resumes from the snapshot — exactness
    is preserved because table merges are associative.
    """

    def __init__(self, ckpt_path: str):
        self.ckpt_path = ckpt_path
        self.table: CountTable | None = None
        self.shards_done = 0
        if os.path.exists(ckpt_path):
            self.table, meta = load_table(ckpt_path)
            self.shards_done = int(meta.get("shards_done", 0))

    def should_process(self, shard_idx: int) -> bool:
        return shard_idx >= self.shards_done

    def update(self, shard_idx: int, shard_table: CountTable) -> None:
        from ..ops.count import merge_tables
        import jax.numpy as jnp

        if self.table is None:
            self.table = shard_table
        else:
            prev = self.table
            dev_prev = CountTable(
                hi=jnp.asarray(np.asarray(prev.hi)),
                lo=jnp.asarray(np.asarray(prev.lo)),
                length=jnp.asarray(np.asarray(prev.length)),
                counts=jnp.asarray(np.asarray(prev.counts), jnp.int32),
                n_unique=jnp.asarray(int(prev.n_unique)),
            )
            self.table = merge_tables(dev_prev, shard_table)
        self.shards_done = shard_idx + 1

    def checkpoint(self) -> None:
        if self.table is not None:
            save_table(self.table, self.ckpt_path, {"shards_done": self.shards_done})
