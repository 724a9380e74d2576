"""Offsets ledger — the exactly-once commit story.

Reference contract being reproduced (not the mechanics):
- committed offset is always the NEXT offset to read
  (/root/reference/arroyo/backends/abstract.py:22-51, docs/source/offsets.rst)
- sink writes are ordered BEFORE offset commit
  (/root/reference/arroyo/dlq.py:423-436, processor.py:330-337)
- arroyo is at-least-once; we upgrade to effectively-once by making the
  epoch replay idempotent: an epoch whose ledger entry exists is skipped,
  and an epoch's data write is an atomic overwrite of its own directory.

No transactional catalog is assumed (no Iceberg jars in this image): the
commit primitive is POSIX atomic rename of a manifest file. On a real
cluster the same interface is backed by an Iceberg/Delta MERGE keyed on
(job_id, epoch_id) — the TableIO seam is this class.

Crash matrix (epoch e):
  crash before data rename      -> restart replays e, overwrites staging: OK
  crash after data, before ledger -> restart replays e, data dir is
                                     overwritten with identical rows: OK
  crash after ledger            -> restart sees ledger entry, skips: OK
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass


@dataclass
class OffsetsLedger:
    root: str
    job_id: str

    def __post_init__(self) -> None:
        os.makedirs(self._dir(), exist_ok=True)
        # in-memory entry cache (single-writer contract — the driver owns
        # the ledger; a restart constructs a fresh object and re-scans).
        # Without it every entries() call re-reads EVERY epoch json: the
        # per-epoch transform that consults read_output() would pay
        # O(committed epochs) driver FS reads per epoch, O(N^2) per run —
        # a measured chunk of the fixed per-epoch driver cost that caps
        # scaling efficiency (BENCH/epoch_fixed_cost_r4.json).
        self._entries_cache: list[dict] | None = None
        self._compactions_cache: list[dict] | None = None

    def _dir(self) -> str:
        return os.path.join(self.root, "ledger", self.job_id)

    def _path(self, epoch_id: int) -> str:
        return os.path.join(self._dir(), f"epoch-{epoch_id:012d}.json")

    def _cpath(self, upto_epoch: int) -> str:
        return os.path.join(self._dir(), f"compaction-{upto_epoch:012d}.json")

    def is_committed(self, epoch_id: int) -> bool:
        return os.path.exists(self._path(epoch_id))

    def commit(
        self,
        epoch_id: int,
        next_offsets: dict[int, int],
        metrics: dict[str, float] | None = None,
    ) -> None:
        """Atomically record the epoch: write tmp + rename (POSIX atomic)."""
        entry = {
            "job_id": self.job_id,
            "epoch_id": epoch_id,
            "next_offsets": {str(k): v for k, v in next_offsets.items()},
            "committed_at": time.time(),
            "metrics": metrics or {},
        }
        self._write_atomic(self._path(epoch_id), entry)
        if self._entries_cache is not None:
            self._entries_cache = [
                e for e in self._entries_cache if e["epoch_id"] != epoch_id
            ] + [entry]

    def _write_atomic(self, path: str, entry: dict) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entry, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)

    def _load(self, prefix: str) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self._dir())):
            if name.startswith(prefix) and name.endswith(".json"):
                with open(os.path.join(self._dir(), name)) as f:
                    out.append(json.load(f))
        return out

    def entries(self) -> list[dict]:
        if self._entries_cache is None:
            self._entries_cache = self._load("epoch-")
        return list(self._entries_cache)

    # -- compaction records (store-maintenance commits) -------------------
    def record_compaction(self, upto_epoch: int, n_epochs: int, path: str) -> None:
        """Atomically record that every committed epoch <= upto_epoch has
        been rewritten into ``path``. Same rename primitive as commit();
        readers prefer the newest record. Re-recording the same upto_epoch
        (compaction replay after a crash) is an idempotent overwrite."""
        entry = {
            "job_id": self.job_id,
            "upto_epoch": upto_epoch,
            "n_epochs": n_epochs,
            "path": path,
            "committed_at": time.time(),
        }
        self._write_atomic(self._cpath(upto_epoch), entry)
        if self._compactions_cache is not None:
            self._compactions_cache = [
                c for c in self._compactions_cache if c["upto_epoch"] != upto_epoch
            ] + [entry]

    def latest_compaction(self) -> dict | None:
        if self._compactions_cache is None:
            self._compactions_cache = self._load("compaction-")
        if not self._compactions_cache:
            return None
        return max(self._compactions_cache, key=lambda c: c["upto_epoch"])

    def committed_offsets(self) -> dict[int, int]:
        """Max next-offset per partition across all committed epochs."""
        out: dict[int, int] = {}
        for e in self.entries():
            for p, o in e["next_offsets"].items():
                p = int(p)
                out[p] = max(out.get(p, 0), o)
        return out

    def epochs(self) -> list[int]:
        return [e["epoch_id"] for e in self.entries()]

    def metrics_df(self, spark):
        """Per-epoch lineage metrics as a DataFrame: (epoch_id, partition,
        next_offset, committed_at, metric, value) — the queryable analog of
        the reference's metrics backend (arroyo/utils/metric_defs.py)."""
        rows = []
        for e in self.entries():
            offsets = e["next_offsets"] or {"-1": -1}
            for p, o in offsets.items():
                for m, v in e["metrics"].items():
                    rows.append((e["epoch_id"], int(p), o, float(e["committed_at"]), m, float(v)))
        return spark.createDataFrame(
            rows,
            "epoch_id long, partition int, next_offset long, committed_at double, "
            "metric string, value double",
        )
