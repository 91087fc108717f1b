"""Partitioned lakehouse tables: the DuckLake capability surface
(SURVEY.md §2.1 S8-S13) on partitioned Parquet.

Delta Lake is the production answer (SURVEY §1.3 maps DuckLake →
Delta); it is not installable in this environment, so this module
implements the same *semantics* on plain Parquet + Spark's dynamic
partition overwrite, behind an interface a Delta backend could drop
into:

  - `overwrite_partitions` — the idempotent per-day upsert: replaces
    exactly the partitions present in the incoming frame, atomically
    per partition directory (the replaceWhere / DELETE+INSERT analog,
    mobility_ingestion_pipeline.py:519-533,544-567)
  - `append` — append-only sinks (the quality log)
  - a JSONL snapshot log per table recording every commit
    (version/op/partitions/rows) — the `lakehouse.snapshots()` /
    DESCRIBE HISTORY analog (1_sprint3...ipynb:6274 cell 84)
  - catalog helpers (list_tables / table_schema) — information_schema
    analog (S12)

Scale notes: partition granularity is the reference's own (one DATE
per partition ≈ 10M rows/day at production scale — healthy parquet
partition size); dynamic overwrite touches only the partitions being
replaced, so re-running a day never rewrites the table; writes never
funnel through the driver.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

SNAPSHOT_LOG = "_snapshots.jsonl"


@dataclass
class Lakehouse:
    """A directory-per-table catalog with medallion schema prefixes
    (bronze/silver/gold → subdirectories, the CREATE SCHEMA analog)."""

    root: str

    def _table_dir(self, schema: str, name: str) -> str:
        return os.path.join(self.root, schema, name)

    # -- DDL (S8) ----------------------------------------------------------

    def create_schemas(self, *schemas: str) -> None:
        for s in schemas:
            os.makedirs(os.path.join(self.root, s), exist_ok=True)

    # -- writes (S9/S10/S11/S13) ------------------------------------------

    def overwrite_partitions(
        self,
        df: DataFrame,
        schema: str,
        name: str,
        partition_col: str,
    ) -> None:
        """Idempotent partition upsert: only partitions present in `df`
        are replaced; everything else is untouched."""
        path = self._table_dir(schema, name)
        spark = df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                df.write.mode("overwrite")
                .partitionBy(partition_col)
                .parquet(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        parts = [
            str(r[0])
            for r in df.select(partition_col).distinct().collect()
        ]
        self._log_snapshot(
            path, op="overwrite_partitions",
            partitions=sorted(parts), partition_col=partition_col,
        )

    def overwrite(self, df: DataFrame, schema: str, name: str) -> None:
        path = self._table_dir(schema, name)
        df.write.mode("overwrite").parquet(path)
        self._log_snapshot(path, op="overwrite")

    def append(self, df: DataFrame, schema: str, name: str) -> None:
        path = self._table_dir(schema, name)
        df.write.mode("append").parquet(path)
        self._log_snapshot(path, op="append")

    def compact(
        self,
        spark: SparkSession,
        schema: str,
        name: str,
        partition_col: str | None = None,
        target_files_per_partition: int = 1,
    ) -> dict:
        """OPTIMIZE analog: rewrite each partition's many small files
        into `target_files_per_partition` right-sized ones.

        The small-files problem is the canonical lakehouse failure mode
        at 100 TB — a streaming/daily writer leaves thousands of KB-
        scale files per partition and scan task-scheduling overhead
        swamps I/O.  Compaction reads+rewrites data only (coalesce per
        partition), appends a snapshot entry, and is idempotent.
        Returns {files_before, files_after}.
        """
        path = self._table_dir(schema, name)
        before = _count_data_files(path)
        df = spark.read.parquet(path)
        if partition_col is not None:
            # hash-repartition by the partition column: every value's
            # rows land in ONE task → exactly one file per partition
            # directory after the write (one shuffle total)
            tmp = path + "._compact"
            (
                df.repartition(F.col(partition_col))
                .write.mode("overwrite")
                .partitionBy(partition_col)
                .parquet(tmp)
            )
        else:
            tmp = path + "._compact"
            df.coalesce(target_files_per_partition).write.mode(
                "overwrite"
            ).parquet(tmp)
        # swap via rename-aside: the live directory is only ever absent
        # between two cheap renames, and a crash mid-swap leaves the old
        # data recoverable at `<path>._old` (never deleted before the
        # new copy is in place).  Preserve the snapshot log across the
        # rewrite.
        log_src = os.path.join(path, SNAPSHOT_LOG)
        log_tmp = None
        if os.path.exists(log_src):
            with open(log_src) as f:
                log_tmp = f.read()
        import shutil

        old = path + "._old"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(path, old)
        os.rename(tmp, path)
        if log_tmp is not None:
            with open(log_src, "w") as f:
                f.write(log_tmp)
        shutil.rmtree(old)
        after = _count_data_files(path)
        self._log_snapshot(
            path, op="compact", files_before=before, files_after=after
        )
        return {"files_before": before, "files_after": after}

    # -- reads -------------------------------------------------------------

    def read(self, spark: SparkSession, schema: str, name: str) -> DataFrame:
        return spark.read.parquet(self._table_dir(schema, name))

    # -- catalog / snapshots (S12) ----------------------------------------

    def list_tables(self, schema: str) -> list[str]:
        d = os.path.join(self.root, schema)
        if not os.path.isdir(d):
            return []
        return sorted(
            n for n in os.listdir(d)
            if os.path.isdir(os.path.join(d, n))
        )

    def snapshots(self, schema: str, name: str) -> list[dict]:
        """Commit history for a table (DESCRIBE HISTORY analog)."""
        log = os.path.join(self._table_dir(schema, name), SNAPSHOT_LOG)
        if not os.path.exists(log):
            return []
        with open(log) as f:
            return [json.loads(line) for line in f if line.strip()]

    def _log_snapshot(self, path: str, op: str, **extra) -> None:
        os.makedirs(path, exist_ok=True)
        log = os.path.join(path, SNAPSHOT_LOG)
        version = len(self.snapshots(*_schema_name_from(path, self.root)))
        entry = {
            "version": version,
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "operation": op,
            **extra,
        }
        with open(log, "a") as f:
            f.write(json.dumps(entry) + "\n")


def _schema_name_from(path: str, root: str) -> tuple[str, str]:
    rel = os.path.relpath(path, root)
    schema, name = rel.split(os.sep)[:2]
    return schema, name


# -- data-quality log (S13 + §5 audits) ------------------------------------

QUALITY_LOG_SCHEMA = (
    "check_timestamp timestamp, table_name string, metric_name string, "
    "metric_value double, notes string"
)


def log_metric(
    lake: Lakehouse,
    spark: SparkSession,
    table_name: str,
    metric_name: str,
    metric_value: float,
    notes: str = "",
) -> None:
    """Append one audit metric row (silver.data_quality_log,
    mobility_ingestion_pipeline.py:76-80,362-369)."""
    row = spark.createDataFrame(
        [(None, table_name, metric_name, float(metric_value), notes)],
        QUALITY_LOG_SCHEMA,
    ).withColumn("check_timestamp", F.current_timestamp())
    lake.append(
        row.select(
            "check_timestamp", "table_name", "metric_name",
            "metric_value", "notes",
        ),
        "silver",
        "data_quality_log",
    )


def save_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Bucketed catalog table (CLUSTERED BY ... INTO n BUCKETS).

    Bucketing is the lakehouse answer to repeated fact×fact joins at
    100 TB: both sides pre-hashed into matching bucket files, so the
    join plans as a SortMergeJoin with NO Exchange on either side —
    the shuffle happened once at write time, not on every query.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table_name)


def _count_data_files(path: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(path):
        n += sum(
            1 for f in files if f.endswith(".parquet") and not f.startswith("_")
        )
    return n
