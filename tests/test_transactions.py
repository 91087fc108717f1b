"""Multi-table transaction semantics (S11): the journal line is the
atomic commit point — all tables or none, across crashes."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.sources.lakehouse import Lakehouse
from urban_mobility_data_lakehouse_spark.sources.testdata import load_table


@pytest.fixture()
def lake_and_frames(spark, tmp_path):
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("silver")
    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "value", F.to_date("ts").alias("partition_date")
    )
    day = events.filter(F.col("partition_date") == "2024-01-05")
    audit = spark.createDataFrame(
        [("fact", 1.0)], "table_name string, metric double"
    )
    return lake, day, audit


def test_txn_commits_all_tables(spark, lake_and_frames):
    lake, day, audit = lake_and_frames
    with lake.transaction() as txn:
        txn.overwrite_partitions(day, "silver", "fact", "partition_date")
        txn.append(audit, "silver", "audit_log")
    assert lake.read(spark, "silver", "fact").count() == day.count()
    assert lake.read(spark, "silver", "audit_log").count() == 1
    fact_snaps = lake.snapshots("silver", "fact")
    audit_snaps = lake.snapshots("silver", "audit_log")
    assert fact_snaps[-1]["txn_id"] == audit_snaps[-1]["txn_id"]


def test_txn_abort_leaves_nothing_visible(spark, lake_and_frames):
    lake, day, audit = lake_and_frames
    lake.overwrite_partitions(day, "silver", "fact", "partition_date")
    before = lake.read(spark, "silver", "fact").count()
    with pytest.raises(RuntimeError):
        with lake.transaction() as txn:
            txn.overwrite_partitions(
                day.withColumn("value", F.col("value") * 2),
                "silver", "fact", "partition_date",
            )
            txn.append(audit, "silver", "audit_log")
            raise RuntimeError("boom")
    # fact unchanged, audit table never came into existence
    assert lake.read(spark, "silver", "fact").count() == before
    assert lake.snapshots("silver", "audit_log") == []
    with pytest.raises(FileNotFoundError):
        lake.read(spark, "silver", "audit_log")


def test_txn_crash_after_journal_heals_every_table(spark, lake_and_frames):
    """Crash between the journal append (commit point) and the
    per-table log appends: every table must still see the txn on its
    next access."""
    lake, day, audit = lake_and_frames
    txn = lake.transaction()
    txn.overwrite_partitions(day, "silver", "fact", "partition_date")
    txn.append(audit, "silver", "audit_log")
    txn._commit_journal()  # ← crash happens right after this line

    assert lake.read(spark, "silver", "fact").count() == day.count()
    assert lake.read(spark, "silver", "audit_log").count() == 1
    # healing is idempotent
    assert len(lake.snapshots("silver", "fact")) == 1
    assert len(lake.snapshots("silver", "fact")) == 1


def test_txn_one_write_per_table(lake_and_frames):
    lake, day, _audit = lake_and_frames
    with pytest.raises(ValueError):
        with lake.transaction() as txn:
            txn.overwrite_partitions(
                day, "silver", "fact", "partition_date"
            )
            txn.overwrite_partitions(
                day, "silver", "fact", "partition_date"
            )


def test_txn_then_plain_writes_interleave(spark, lake_and_frames):
    """Version numbering stays consistent when plain commits follow a
    healed transaction."""
    lake, day, audit = lake_and_frames
    txn = lake.transaction()
    txn.append(audit, "silver", "audit_log")
    txn._commit_journal()  # crash before table log
    # plain write heals first (snapshots() runs inside the write path)
    lake.append(audit, "silver", "audit_log")
    snaps = lake.snapshots("silver", "audit_log")
    assert [e["version"] for e in snaps] == [0, 1]
    assert lake.read(spark, "silver", "audit_log").count() == 2
