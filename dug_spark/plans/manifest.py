"""Checkpoint manifest: idempotent stage outputs + exact resume with
per-partition lineage and extraction-count metrics.

Replaces the reference's crawlspace file spool (crawler.py:37-43,65,99-107
— JSON per concept/element, skip-if-exists per TranQL query at
concept_expander.py:29-32) and its Redis HTTP memo-cache (factory.py:21-33)
with the Spark-native shape:

- each pipeline stage writes to ``<root>/<stage>/`` atomically (tmp dir +
  rename; parquet ``_SUCCESS`` marker is the commit point — on Iceberg this
  would be a snapshot commit);
- a ``_manifest`` table records one row per (stage, source partition):
  row counts + wall time + run id — the per-partition lineage the BASELINE
  north_rule requires;
- ``run_or_resume`` skips any stage whose commit marker exists, giving
  exact resume: a killed run re-executes only uncommitted stages, and
  re-execution is deterministic so committed outputs never change.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointManager:
    """SINGLE WRITER PER ROOT: one live CheckpointManager (one run) owns a
    checkpoint root at a time — the same contract as the reference's
    crawlspace directory.  Concurrent runs must use distinct roots; the
    stale-tmp GC in ``write_stage`` assumes any other-run tmp dir older
    than ``TMP_GC_AGE_S`` belongs to a DEAD run (a crash before rename),
    and the age threshold is what keeps a briefly-overlapping writer's
    in-flight tmp safe from deletion."""

    #: other-run tmp dirs younger than this are left alone (a live writer
    #: may still be streaming into them); older ones are dead-run debris
    TMP_GC_AGE_S = 3600

    def __init__(self, root: str, run_id: str | None = None):
        self.root = root
        self.run_id = run_id or uuid.uuid4().hex[:12]
        os.makedirs(root, exist_ok=True)

    # -- paths ------------------------------------------------------------
    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_dir(self) -> str:
        return os.path.join(self.root, "_manifest")

    def is_done(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._stage_dir(stage), "_SUCCESS"))

    # -- lineage ----------------------------------------------------------
    def _record(
        self,
        spark: SparkSession,
        stage: str,
        df_written: DataFrame,
        wall_ms: int,
        lineage: dict | None = None,
    ):
        """Manifest rows: one per output partition of the written data
        (scope='output'), plus — when the caller passes the annotate scan's
        lineage accumulator value — one per SOURCE partition with real
        input_rows and extraction counts (scope='source'), satisfying the
        per-partition lineage + extraction-count metric requirement."""
        per_part = (
            df_written.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("output_rows"))
            .withColumn("stage", F.lit(stage))
            .withColumn("scope", F.lit("output"))
            .withColumn("input_rows", F.lit(None).cast("long"))
            .withColumn("wall_ms", F.lit(wall_ms).cast("long"))
            .withColumn("run_id", F.lit(self.run_id))
            .select(
                "stage", "scope", "partition_id", "input_rows",
                "output_rows", "wall_ms", "run_id",
            )
        )
        if lineage:
            src_rows = [
                (stage, "source", int(pid), int(n_in), int(n_out), wall_ms, self.run_id)
                for pid, (n_in, n_out) in sorted(lineage.items())
            ]
            src = spark.createDataFrame(
                src_rows,
                "stage string, scope string, partition_id int, input_rows long, "
                "output_rows long, wall_ms long, run_id string",
            ).withColumn("partition_id", F.col("partition_id").cast("int"))
            per_part = per_part.unionByName(src)
        # ATOMIC manifest record: each _record lands in its own
        # tmp-written-then-renamed subdir.  The record itself is a Spark
        # job (a groupBy over the written data — seconds at 10M+ rows), so
        # a kill mid-record must not leave PARTIAL lineage rows that would
        # read as complete; with rename-commit, an interrupted record is
        # simply absent and run_or_resume's backfill repairs it on resume.
        # (On an object store this rename is the piece Iceberg's snapshot
        # commit would provide — same deviation note as SCALE.md §Iceberg.)
        base = self._manifest_dir()
        # GC record tmp dirs left by killed runs (same age rule as stage
        # tmps: younger ones may belong to a briefly-overlapping writer)
        if os.path.isdir(base):
            now = time.time()
            for name in os.listdir(base):
                if not name.endswith(".tmp"):
                    continue
                path = os.path.join(base, name)
                try:
                    if now - os.path.getmtime(path) > self.TMP_GC_AGE_S:
                        shutil.rmtree(path, ignore_errors=True)
                except OSError:
                    pass
        target = os.path.join(
            base, f"{stage}-{self.run_id}-{uuid.uuid4().hex[:8]}"
        )
        tmp = target + ".tmp"
        per_part.write.mode("overwrite").parquet(tmp)
        os.rename(tmp, target)

    def manifest(self, spark: SparkSession) -> DataFrame:
        base = self._manifest_dir()
        dirs = sorted(
            os.path.join(base, d)
            for d in os.listdir(base)
            if not d.endswith(".tmp")
        )
        if not dirs:
            raise FileNotFoundError(f"no manifest records under {base}")
        return spark.read.parquet(*dirs)

    # -- stage I/O ----------------------------------------------------------
    def write_stage(
        self, stage: str, df: DataFrame, lineage_acc=None
    ) -> DataFrame:
        """Atomic write: tmp dir + rename; returns the re-read DataFrame
        (reading back decouples downstream stages from upstream lineage).
        ``lineage_acc``: a plans.lineage accumulator threaded through the
        stage's annotate scan — its value is read AFTER the write action
        (which materializes the scan) and recorded per source partition."""
        spark = df.sparkSession
        final = self._stage_dir(stage)
        # garbage-collect tmp dirs left by KILLED runs: a crash anywhere
        # before the rename leaves <stage>.tmp-<old-run> with partial (or
        # even complete-but-uncommitted) parquet — never readable state,
        # safe to drop, and dropping keeps resume storage bounded.  Only
        # dirs older than TMP_GC_AGE_S are dropped so that, should two
        # managers ever (against the single-writer contract) share a root,
        # one cannot delete the other's in-flight tmp mid-write
        now = time.time()
        for name in os.listdir(self.root):
            if name.startswith(f"{stage}.tmp-") and name != f"{stage}.tmp-{self.run_id}":
                path = os.path.join(self.root, name)
                try:
                    age = now - os.path.getmtime(path)
                except OSError:
                    continue
                if age > self.TMP_GC_AGE_S:
                    shutil.rmtree(path, ignore_errors=True)
        tmp = final + f".tmp-{self.run_id}"
        # the accumulator is cumulative across every action that executes
        # the annotate scan (e.g. build_triples' eager checkpoint); snapshot
        # before the write so the recorded lineage is exactly this stage's
        # pass over the source partitions
        before = dict(lineage_acc.value) if lineage_acc is not None else {}
        t0 = time.monotonic()
        df.write.mode("overwrite").parquet(tmp)
        wall_ms = int((time.monotonic() - t0) * 1000)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        out = spark.read.parquet(final)
        lineage = None
        if lineage_acc is not None:
            after = dict(lineage_acc.value)
            lineage = {
                pid: (
                    a - before.get(pid, (0, 0))[0],
                    b - before.get(pid, (0, 0))[1],
                )
                for pid, (a, b) in after.items()
                if (a, b) != before.get(pid, (0, 0))
            }
        self._record(spark, stage, out, wall_ms, lineage=lineage)
        return out

    def read_stage(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(self._stage_dir(stage))

    def backfill_manifest(self, spark: SparkSession, stage: str, df: DataFrame):
        """Repair the crash window between a stage's rename-commit and its
        manifest record: if the committed stage has no manifest rows,
        record output-partition rows from the committed data (wall_ms=-1
        sentinel; source-scope lineage from the dead run is unrecoverable
        and stays absent).  Idempotent."""
        if not self._has_manifest_rows(spark, stage):
            self._record(spark, stage, df, wall_ms=-1, lineage=None)

    def _has_manifest_rows(self, spark: SparkSession, stage: str) -> bool:
        from pyspark.errors import AnalysisException

        try:
            return (
                self.manifest(spark)
                .where(F.col("stage") == stage)
                .limit(1)
                .count()
                > 0
            )
        except (FileNotFoundError, AnalysisException):
            # no _manifest dir yet / no readable record files — the
            # legitimate "nothing recorded" states.  Anything else (e.g.
            # corrupt parquet at read time) must SURFACE, not silently
            # trigger a duplicate backfill over real rows.
            return False

    def run_or_resume(
        self, spark: SparkSession, stage: str, build, lineage_acc=None
    ) -> DataFrame:
        """Exact resume: committed stages are read back, not recomputed
        (the skip-if-exists semantics of concept_expander.py:29-32 at
        stage granularity, with lineage recorded per partition).

        Crash-window backfill: the commit point is the rename, and the
        manifest append happens AFTER it — a kill in between leaves a
        committed stage with no lineage rows (observed in the 1.6M-doc
        resume evidence run).  On resume, such a stage gets its
        output-partition manifest rows backfilled from the committed data
        under THIS run id with wall_ms=-1 (the sentinel for "recovered,
        wall time unknown").  Source-scope lineage from the dead run's
        accumulator is genuinely unrecoverable and stays absent — the
        backfill records that honestly rather than inventing it."""
        if self.is_done(stage):
            out = self.read_stage(spark, stage)
            self.backfill_manifest(spark, stage, out)
            return out
        return self.write_stage(stage, build(), lineage_acc=lineage_acc)

    def metrics(self, spark: SparkSession, stage: str | None = None) -> DataFrame:
        m = self.manifest(spark)
        return m.where(F.col("stage") == stage) if stage else m
