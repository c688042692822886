"""Relational facade — the engine's equivalent of the SQL surface.

The reference's API is SQL over a table of (dna, kmer, qkmer) columns
(kmer-tests.sql TEST 6-14 all query the 100k-row ``dna_kmer_test``).
KmerTable mirrors that workload shape: columnar storage (PackedKmers for
the kmer column), vectorized filters for every operator (=, ^@, @>, <@),
GROUP BY via the count kernel, and an optional sorted index that must —
and, by construction, does — return scan-identical results (TEST 14).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .index import KmerIndex
from .ops.count import CountTable, count_column
from .ops.predicates import (
    qkmer_mask_vector,
    v_contains,
    v_equals,
    v_starts_with,
)
from .packed import PackedKmers
from .types import Dna, Kmer, Qkmer


@dataclasses.dataclass
class KmerTable:
    """Columnar (dna, kmer, qkmer) table with scan + index query paths."""

    dna: list[Dna]
    kmer: PackedKmers
    qkmer: list[Qkmer]
    _index: KmerIndex | None = None
    _device_col: PackedKmers | None = None

    @classmethod
    def from_rows(cls, rows) -> "KmerTable":
        """rows: iterable of (dna_str, kmer_str, qkmer_str)."""
        rows = list(rows)
        dna = [Dna(r[0]) for r in rows]
        kmer = PackedKmers.from_strings([r[1] for r in rows])
        qkmer = [Qkmer(r[2]) for r in rows]
        return cls(dna=dna, kmer=kmer, qkmer=qkmer)

    @classmethod
    def from_csv(cls, path: str) -> "KmerTable":
        """Load the reference's CSV fixture shape (header dna,kmer,qkmer).

        Malformed rows raise with the 1-based line number — the
        reference's COPY fails fast on bad input (a silently smaller
        table would be a parity hole in the ingest contract).
        """
        rows = []
        with open(path) as f:
            header = f.readline()
            assert header.strip().lower().startswith("dna")
            for lineno, line in enumerate(f, start=2):
                if not line.strip():
                    continue
                parts = line.rstrip("\n").split(",")
                if len(parts) != 3:
                    raise ValueError(
                        f"{path}:{lineno}: expected 3 comma-separated "
                        f"fields (dna,kmer,qkmer), got {len(parts)}"
                    )
                rows.append(tuple(parts))
        return cls.from_rows(rows)

    def __len__(self) -> int:
        return len(self.dna)

    # --- index management (CREATE INDEX ... USING spgist) --------------------

    def create_index(self) -> None:
        self._index = KmerIndex.build(self.kmer)

    def drop_index(self) -> None:
        self._index = None

    # --- scan-path filters (seq scan) ----------------------------------------

    def _jcol(self) -> PackedKmers:
        # cached device residency: the resident serve path issues one
        # scan per query, and re-uploading the column each call would
        # turn every query into a full host->device transfer
        if self._device_col is None:
            self._device_col = PackedKmers(
                hi=jnp.asarray(self.kmer.hi),
                lo=jnp.asarray(self.kmer.lo),
                length=jnp.asarray(self.kmer.length),
            )
        return self._device_col

    def scan_eq(self, q) -> np.ndarray:
        km = PackedKmers.single(Kmer(q))
        mask = v_equals(
            self._jcol(),
            PackedKmers(
                hi=jnp.uint32(km.hi[0]),
                lo=jnp.uint32(km.lo[0]),
                length=jnp.int32(km.length[0]),
            ),
        )
        return np.flatnonzero(np.asarray(mask))

    def scan_prefix(self, prefix) -> np.ndarray:
        km = PackedKmers.single(Kmer(prefix))
        mask = v_starts_with(
            self._jcol(),
            PackedKmers(
                hi=jnp.uint32(km.hi[0]),
                lo=jnp.uint32(km.lo[0]),
                length=jnp.int32(km.length[0]),
            ),
        )
        return np.flatnonzero(np.asarray(mask))

    def scan_pattern(self, qkmer) -> np.ndarray:
        masks, qlen = qkmer_mask_vector(Qkmer(qkmer))
        mask = v_contains(self._jcol(), jnp.asarray(masks), qlen)
        return np.flatnonzero(np.asarray(mask))

    # --- planner: use index when present (TEST 14 equivalence) ---------------

    def where_eq(self, q) -> np.ndarray:
        if self._index is not None:
            return self._index.search_eq(q)
        return self.scan_eq(q)

    def where_prefix(self, prefix) -> np.ndarray:
        if self._index is not None:
            return self._index.search_prefix(prefix)
        return self.scan_prefix(prefix)

    def where_pattern(self, qkmer) -> np.ndarray:
        if self._index is not None:
            return self._index.search_pattern(qkmer)
        return self.scan_pattern(qkmer)

    # --- aggregates ----------------------------------------------------------

    def count(self) -> int:
        """SELECT COUNT(kmer) FROM t (TEST 12.2)."""
        return len(self)

    def group_by_kmer(self) -> CountTable:
        """SELECT kmer, COUNT(*) GROUP BY kmer (TEST 13.2)."""
        return count_column(self._jcol())

    def distinct_kmers(self) -> int:
        return self.group_by_kmer().distinct()

    def rows(self, ids) -> list[tuple[str, str, str]]:
        strs = self.kmer.to_strings()
        return [(str(self.dna[i]), strs[i], str(self.qkmer[i])) for i in ids]
