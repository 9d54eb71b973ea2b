"""Snapshot-versioned table: Iceberg-style commit log + time travel on
plain parquet.

SCALE.md §Iceberg documents what the stage-level emulation
(plans/manifest.py) deliberately does NOT give: snapshot history and
time travel.  This module closes that gap for the single-writer case
with the same two-phase commit Iceberg uses — immutable data dirs
first, then an atomically-renamed LOG RECORD whose appearance is the
commit point (Iceberg: manifest files, then the metadata-pointer swap).

Layout under ``root``::

    snap-<seq>-<uuid>/      immutable data dirs (parquet)
    _log/<seq>-<uuid>/      commit records (parquet), one per snapshot:
                            snapshot_id, seq, ts_ms, operation,
                            data_dirs (the FULL dir list of the
                            snapshot), rows_written, run_id

- a reader resolves the CURRENT snapshot by max seq over committed log
  records — a crash after the data rename but before the log rename
  leaves an orphan data dir that no reader ever sees (GC'd by
  ``expire_snapshots``);
- ``append`` commits a snapshot whose dir list = parent's dirs + the new
  dir (no rewrite of existing data — Iceberg's fast append);
- ``overwrite`` commits a snapshot with only the new dir;
- ``read`` / ``read_as_of(snapshot_id)`` / ``read_as_of_ts(ts_ms)`` give
  current, by-id, and by-timestamp time travel; a reader holding a
  snapshot id keeps a consistent view until ``expire_snapshots`` drops
  it (snapshot isolation for readers);
- ``expire_snapshots(keep_last=n)`` retires old log records and any data
  dir no kept snapshot references.

SINGLE WRITER PER ROOT (the CheckpointManager contract): concurrent
writers would race the seq counter — that last piece, optimistic
commit-retry across writers, is exactly what real Iceberg metadata
transactions add and is documented as the deployment boundary.

Scale note: log records and dir lists are snapshot-count-sized, never
data-sized; ``read`` is ``spark.read.parquet(*dirs)`` so partition
pruning and predicate pushdown hit the scan exactly as for any parquet
read.  Reference parity: the reference has no table versioning at all
(its crawlspace spool overwrites in place, crawler.py:37-43); this is
the BASELINE north_star's "partitioned Iceberg tables" surface.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, root: str, run_id: str | None = None):
        self.root = root
        self.run_id = run_id or uuid.uuid4().hex[:12]
        os.makedirs(os.path.join(root, "_log"), exist_ok=True)

    # -- log ---------------------------------------------------------------
    def _log_dir(self) -> str:
        return os.path.join(self.root, "_log")

    def _committed(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self._log_dir()) if not d.endswith(".tmp")
        )

    def snapshots(self, spark: SparkSession) -> DataFrame:
        """The snapshot log as a DataFrame (Iceberg's ``table.snapshots``
        metadata table)."""
        recs = self._committed()
        if not recs:
            raise FileNotFoundError(f"no snapshots under {self.root}")
        return spark.read.parquet(
            *[os.path.join(self._log_dir(), d) for d in recs]
        )

    def _records(self, spark: SparkSession) -> list:
        return sorted(
            self.snapshots(spark).collect(), key=lambda r: r["seq"]
        )

    # -- commit ------------------------------------------------------------
    def _commit(
        self,
        df: DataFrame,
        operation: str,
        parent_dirs: list[str],
        partition_by: list[str] | None = None,
    ) -> str:
        spark = df.sparkSession
        recs = self._committed()
        seq = (max(int(d.split("-")[0]) for d in recs) + 1) if recs else 1
        snap_id = uuid.uuid4().hex[:16]
        data_name = f"snap-{seq:08d}-{snap_id}"
        data_final = os.path.join(self.root, data_name)
        data_tmp = data_final + ".tmp"
        w = df.write.mode("overwrite")
        if partition_by:
            # hive-style partition dirs inside the snapshot dir: readers
            # get partition PRUNING on the partition columns for free
            # (the north_star's "partitioned Iceberg tables" surface)
            w = w.partitionBy(*partition_by)
        w.parquet(data_tmp)
        rows = spark.read.parquet(data_tmp).count()
        os.rename(data_tmp, data_final)
        # the LOG record rename is the commit point: a kill between the
        # two renames leaves an invisible orphan data dir, never a
        # half-visible snapshot
        rec = spark.createDataFrame(
            [
                (
                    snap_id,
                    seq,
                    int(time.time() * 1000),
                    operation,
                    parent_dirs + [data_name],
                    rows,
                    self.run_id,
                )
            ],
            "snapshot_id string, seq int, ts_ms long, operation string, "
            "data_dirs array<string>, rows_written long, run_id string",
        )
        rec_final = os.path.join(self._log_dir(), f"{seq:08d}-{snap_id}")
        rec_tmp = rec_final + ".tmp"
        rec.coalesce(1).write.mode("overwrite").parquet(rec_tmp)
        os.rename(rec_tmp, rec_final)
        return snap_id

    def overwrite(
        self, df: DataFrame, partition_by: list[str] | None = None
    ) -> str:
        """Commit a snapshot replacing the table contents; returns its id."""
        return self._commit(df, "overwrite", [], partition_by)

    def append(
        self, df: DataFrame, partition_by: list[str] | None = None
    ) -> str:
        """Commit a snapshot adding rows on top of the current one (fast
        append: existing data dirs are referenced, never rewritten)."""
        spark = df.sparkSession
        recs = self._committed()
        parents = []
        if recs:
            cur = self._records(spark)[-1]
            parents = list(cur["data_dirs"])
        return self._commit(df, "append", parents, partition_by)

    # -- read --------------------------------------------------------------
    def _read_dirs(self, spark: SparkSession, dirs: list[str]) -> DataFrame:
        # each snapshot dir is its OWN parquet root (it may carry
        # hive-style partition subdirs): read per root and union, so
        # partition discovery — and partition PRUNING under filters —
        # applies inside every branch; a single multi-path read would
        # raise CONFLICTING_DIRECTORY_STRUCTURES across partitioned roots
        parts = [
            spark.read.parquet(os.path.join(self.root, d)) for d in dirs
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read(self, spark: SparkSession) -> DataFrame:
        """The current snapshot."""
        return self._read_dirs(spark, list(self._records(spark)[-1]["data_dirs"]))

    def read_as_of(self, spark: SparkSession, snapshot_id: str) -> DataFrame:
        """Time travel by snapshot id (``VERSION AS OF``)."""
        for r in self._records(spark):
            if r["snapshot_id"] == snapshot_id:
                return self._read_dirs(spark, list(r["data_dirs"]))
        raise LookupError(f"snapshot {snapshot_id} not found (expired?)")

    def read_as_of_ts(self, spark: SparkSession, ts_ms: int) -> DataFrame:
        """Time travel by timestamp (``TIMESTAMP AS OF``): the latest
        snapshot committed at or before ``ts_ms``."""
        best = None
        for r in self._records(spark):
            if r["ts_ms"] <= ts_ms:
                best = r
        if best is None:
            raise LookupError(f"no snapshot at or before ts {ts_ms}")
        return self._read_dirs(spark, list(best["data_dirs"]))

    # -- retention ----------------------------------------------------------
    def expire_snapshots(self, spark: SparkSession, keep_last: int = 1) -> int:
        """Drop all but the newest ``keep_last`` snapshots and GC every
        data dir (including crash-orphaned ones) no kept snapshot
        references.  Returns the number of snapshots expired."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        recs = self._records(spark)
        keep, drop = recs[-keep_last:], recs[:-keep_last]
        kept_dirs = {d for r in keep for d in r["data_dirs"]}
        for r in drop:
            shutil.rmtree(
                os.path.join(
                    self._log_dir(), f"{r['seq']:08d}-{r['snapshot_id']}"
                ),
                ignore_errors=True,
            )
        for name in os.listdir(self.root):
            if name.startswith("snap-") and name not in kept_dirs:
                # orphans from a crash window are .tmp or unreferenced
                shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)
        return len(drop)
