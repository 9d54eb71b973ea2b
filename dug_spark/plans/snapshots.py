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

Equality-delete merge-on-read (Iceberg v2's delete files): a 100 TB
triple table whose source urls get recrawled cannot rewrite data files
for 1% churn.  ``delta(new_df, delete_keys)`` commits, in ONE snapshot,
a tombstone dir (``del-<seq>-<id>``, a parquet of key values) plus an
appended data dir; ``delete_where(keys)`` commits a tombstone alone.
Readers merge on read: a row is dropped iff some tombstone with a
STRICTLY NEWER commit seq matches its key — so a delta commit's own new
rows survive its own tombstone, and re-deleting later works.  The
per-dir seq is encoded in the dir name; the anti-join is keyed on the
tombstone's columns with the max-tombstone-seq table broadcast
(tombstones are churn-sized, never table-sized).  ``compact()``
materializes the merged view into a fresh overwrite snapshot, clearing
tombstones (Iceberg's rewrite_data_files).  All tombstones of a table
must share one key-column set (checked at commit).

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
from pyspark.sql import functions as F


def _dir_seq(name: str) -> int:
    """Commit seq encoded in a data/tombstone dir name
    (``snap-<seq>-<id>`` / ``del-<seq>-<id>``)."""
    return int(name.split("-")[1])


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
        # mergeSchema: records written before the merge-on-read upgrade
        # lack the delete_dirs column (read back as NULL = no tombstones)
        return spark.read.option("mergeSchema", "true").parquet(
            *[os.path.join(self._log_dir(), d) for d in recs]
        )

    def _records(self, spark: SparkSession) -> list:
        return sorted(
            self.snapshots(spark).collect(), key=lambda r: r["seq"]
        )

    # -- commit ------------------------------------------------------------
    def _commit(
        self,
        df: DataFrame | None,
        operation: str,
        parent_dirs: list[str],
        partition_by: list[str] | None = None,
        delete_keys: DataFrame | None = None,
        parent_deletes: list[str] | None = None,
    ) -> str:
        spark = (df or delete_keys).sparkSession
        recs = self._committed()
        seq = (max(int(d.split("-")[0]) for d in recs) + 1) if recs else 1
        snap_id = uuid.uuid4().hex[:16]
        data_dirs = list(parent_dirs)
        delete_dirs = list(parent_deletes or [])
        rows = 0
        if df is not None:
            data_name = f"snap-{seq:08d}-{snap_id}"
            data_final = os.path.join(self.root, data_name)
            data_tmp = data_final + ".tmp"
            w = df.write.mode("overwrite")
            if partition_by:
                # hive-style partition dirs inside the snapshot dir:
                # readers get partition PRUNING on the partition columns
                # for free (the north_star's "partitioned Iceberg
                # tables" surface)
                w = w.partitionBy(*partition_by)
            w.parquet(data_tmp)
            rows = spark.read.parquet(data_tmp).count()
            os.rename(data_tmp, data_final)
            data_dirs.append(data_name)
        if delete_keys is not None:
            if delete_dirs:
                prev_cols = sorted(
                    spark.read.parquet(
                        os.path.join(self.root, delete_dirs[0])
                    ).columns
                )
                if sorted(delete_keys.columns) != prev_cols:
                    raise ValueError(
                        f"tombstone key columns {sorted(delete_keys.columns)} "
                        f"differ from the table's {prev_cols}"
                    )
            del_name = f"del-{seq:08d}-{snap_id}"
            del_final = os.path.join(self.root, del_name)
            del_tmp = del_final + ".tmp"
            # tombstones are churn-sized; keep them in few files
            delete_keys.distinct().coalesce(4).write.mode("overwrite").parquet(
                del_tmp
            )
            os.rename(del_tmp, del_final)
            delete_dirs.append(del_name)
        # the LOG record rename is the commit point: a kill between the
        # renames leaves invisible orphan dirs, never a half-visible
        # snapshot
        rec = spark.createDataFrame(
            [
                (
                    snap_id,
                    seq,
                    int(time.time() * 1000),
                    operation,
                    data_dirs,
                    delete_dirs,
                    rows,
                    self.run_id,
                )
            ],
            "snapshot_id string, seq int, ts_ms long, operation string, "
            "data_dirs array<string>, delete_dirs array<string>, "
            "rows_written long, run_id string",
        )
        rec_final = os.path.join(self._log_dir(), f"{seq:08d}-{snap_id}")
        rec_tmp = rec_final + ".tmp"
        rec.coalesce(1).write.mode("overwrite").parquet(rec_tmp)
        os.rename(rec_tmp, rec_final)
        return snap_id

    def _parents(self, spark: SparkSession) -> tuple[list[str], list[str]]:
        if not self._committed():
            return [], []
        cur = self._records(spark)[-1].asDict()
        return list(cur["data_dirs"]), list(cur.get("delete_dirs") or [])

    def overwrite(
        self, df: DataFrame, partition_by: list[str] | None = None
    ) -> str:
        """Commit a snapshot replacing the table contents (clears any
        tombstones); returns its id."""
        return self._commit(df, "overwrite", [], partition_by)

    def append(
        self, df: DataFrame, partition_by: list[str] | None = None
    ) -> str:
        """Commit a snapshot adding rows on top of the current one (fast
        append: existing data dirs are referenced, never rewritten)."""
        parents, dels = self._parents(df.sparkSession)
        return self._commit(
            df, "append", parents, partition_by, parent_deletes=dels
        )

    def delete_where(self, delete_keys: DataFrame) -> str:
        """Commit an equality-delete tombstone: rows in EXISTING data dirs
        whose values on ``delete_keys.columns`` match any tombstone row
        disappear from subsequent reads (merge-on-read; no data rewrite)."""
        parents, dels = self._parents(delete_keys.sparkSession)
        return self._commit(
            None, "delete", parents, delete_keys=delete_keys,
            parent_deletes=dels,
        )

    def delta(
        self,
        df: DataFrame,
        delete_keys: DataFrame,
        partition_by: list[str] | None = None,
    ) -> str:
        """ONE commit that tombstones ``delete_keys`` matches in existing
        data AND appends ``df`` — the recrawl-increment primitive: stale
        triples of changed urls vanish, their re-extracted triples land,
        atomically (both visible only at the log-record rename)."""
        parents, dels = self._parents(df.sparkSession)
        return self._commit(
            df, "delta", parents, partition_by, delete_keys=delete_keys,
            parent_deletes=dels,
        )

    def compact(self, spark: SparkSession,
                partition_by: list[str] | None = None) -> str:
        """Materialize the merged (post-tombstone) view into a fresh
        overwrite snapshot — Iceberg's rewrite_data_files.  Run when the
        tombstone count grows enough that the read-side anti-join costs
        more than one rewrite."""
        return self.overwrite(self.read(spark), partition_by)

    # -- read --------------------------------------------------------------
    def _read_dirs(
        self,
        spark: SparkSession,
        dirs: list[str],
        delete_dirs: list[str] | None = None,
    ) -> DataFrame:
        # each snapshot dir is its OWN parquet root (it may carry
        # hive-style partition subdirs): read per root and union, so
        # partition discovery — and partition PRUNING under filters —
        # applies inside every branch; a single multi-path read would
        # raise CONFLICTING_DIRECTORY_STRUCTURES across partitioned roots
        delete_dirs = delete_dirs or []
        if not delete_dirs:
            parts = [
                spark.read.parquet(os.path.join(self.root, d)) for d in dirs
            ]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out
        # merge-on-read: a row survives unless a tombstone from a
        # STRICTLY NEWER commit matches its key.  The per-row commit seq
        # is a literal per data dir (free in codegen, no storage); the
        # tombstone side reduces to (key -> newest tombstone seq), which
        # is churn-sized and broadcasts.
        parts = [
            spark.read.parquet(os.path.join(self.root, d)).withColumn(
                "_dseq", F.lit(_dir_seq(d))
            )
            for d in dirs
        ]
        data = parts[0]
        for p in parts[1:]:
            data = data.unionByName(p)
        dels = [
            spark.read.parquet(os.path.join(self.root, d)).withColumn(
                "_tseq", F.lit(_dir_seq(d))
            )
            for d in delete_dirs
        ]
        tomb = dels[0]
        for t in dels[1:]:
            tomb = tomb.unionByName(t)
        keys = [c for c in tomb.columns if c != "_tseq"]
        tmax = tomb.groupBy(*keys).agg(F.max("_tseq").alias("_tseq"))
        return (
            data.join(F.broadcast(tmax), on=keys, how="left")
            .where(F.col("_tseq").isNull() | (F.col("_tseq") <= F.col("_dseq")))
            .drop("_tseq", "_dseq")
        )

    @staticmethod
    def _rec_dirs(r) -> tuple[list[str], list[str]]:
        d = r.asDict()
        return list(d["data_dirs"]), list(d.get("delete_dirs") or [])

    def read(self, spark: SparkSession) -> DataFrame:
        """The current snapshot (tombstones merged on read)."""
        return self._read_dirs(spark, *self._rec_dirs(self._records(spark)[-1]))

    def read_as_of(self, spark: SparkSession, snapshot_id: str) -> DataFrame:
        """Time travel by snapshot id (``VERSION AS OF``); applies exactly
        that snapshot's tombstone set."""
        for r in self._records(spark):
            if r["snapshot_id"] == snapshot_id:
                return self._read_dirs(spark, *self._rec_dirs(r))
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
        return self._read_dirs(spark, *self._rec_dirs(best))

    # -- retention ----------------------------------------------------------
    def expire_snapshots(self, spark: SparkSession, keep_last: int = 1) -> int:
        """Drop all but the newest ``keep_last`` snapshots and GC every
        data dir (including crash-orphaned ones) no kept snapshot
        references.  Returns the number of snapshots expired."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        recs = self._records(spark)
        keep, drop = recs[-keep_last:], recs[:-keep_last]
        kept_dirs = {
            d
            for r in keep
            for lst in self._rec_dirs(r)
            for d in lst
        }
        for r in drop:
            shutil.rmtree(
                os.path.join(
                    self._log_dir(), f"{r['seq']:08d}-{r['snapshot_id']}"
                ),
                ignore_errors=True,
            )
        for name in os.listdir(self.root):
            if (
                name.startswith("snap-") or name.startswith("del-")
            ) and name not in kept_dirs:
                # orphans from a crash window are .tmp or unreferenced
                shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)
        return len(drop)
