"""Optimistic-concurrency tests for the lakehouse commit protocol.

The reference's cloud mode runs 8 parallel day-writers against one
shared catalog (docs/report/main.tex:260, utils_db.py:49-84); these
tests pin the equivalent guarantees here: disjoint-partition writers
merge into a linear history with no lost update, overlapping writers
conflict deterministically and succeed on retry.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.sources.lakehouse import (
    ConcurrentWriteError,
    Lakehouse,
)


def _day_df(spark, day: str, values):
    return spark.createDataFrame(
        [(i, float(v), day) for i, v in enumerate(values)],
        "event_id long, value double, partition_date string",
    ).withColumn("partition_date", F.to_date("partition_date"))


def test_concurrent_disjoint_day_writers_all_commit(spark, tmp_path):
    """8 threads each overwrite a different day concurrently: every
    commit lands, history is linear (versions 0..7, no duplicates, no
    lost update), and the table reads back all 8 days."""
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("silver")
    days = [f"2024-01-{d:02d}" for d in range(1, 9)]

    def write(day):
        lake.overwrite_partitions(
            _day_df(spark, day, [1, 2, 3]), "silver", "fact",
            partition_col="partition_date",
        )

    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(write, days))  # raises if any writer raised

    snaps = lake.snapshots("silver", "fact")
    assert [e["version"] for e in snaps] == list(range(8))
    got = lake.read(spark, "silver", "fact")
    assert got.select("partition_date").distinct().count() == 8
    assert got.count() == 24
    # every day's partition is mapped exactly once (no lost update)
    part_map, _, _ = lake._manifest("silver", "fact")
    assert sorted(part_map) == days


def test_same_partition_race_conflicts_then_retries(spark, tmp_path):
    """A writer whose base snapshot predates an interleaved commit to
    the SAME partition must get ConcurrentWriteError (not silently
    lose either write); a plain retry — re-staged against the new
    base — succeeds."""
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("silver")
    lake.overwrite_partitions(
        _day_df(spark, "2024-01-01", [1]), "silver", "f",
        partition_col="partition_date",
    )

    # stage a write of day-1 against base version 1...
    base, data_dir = lake._next_data_dir("silver", "f")
    entry = lake._stage_overwrite_partitions(
        _day_df(spark, "2024-01-01", [10]), "silver", "f",
        "partition_date", data_dir,
    )
    # ...then an interleaved writer commits day-1 first
    lake.overwrite_partitions(
        _day_df(spark, "2024-01-01", [99]), "silver", "f",
        partition_col="partition_date",
    )
    with pytest.raises(ConcurrentWriteError):
        lake._commit("silver", "f", entry, base)

    # the failed commit left no visible change
    assert [r["value"] for r in lake.read(spark, "silver", "f").collect()] \
        == [99.0]
    # retry = normal re-staged write against the current snapshot
    lake.overwrite_partitions(
        _day_df(spark, "2024-01-01", [10]), "silver", "f",
        partition_col="partition_date",
    )
    assert [r["value"] for r in lake.read(spark, "silver", "f").collect()] \
        == [10.0]
    assert [e["version"] for e in lake.snapshots("silver", "f")] == [0, 1, 2]


def test_append_never_conflicts_with_partition_overwrite(spark, tmp_path):
    """Appends commute with partition overwrites in the replay algebra,
    so an append staged before an interleaved overwrite still commits."""
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("silver")
    lake.overwrite_partitions(
        _day_df(spark, "2024-01-01", [1]), "silver", "g",
        partition_col="partition_date",
    )

    base, data_dir = lake._next_data_dir("silver", "g")
    entry = lake._stage_full_write(
        _day_df(spark, "2024-01-02", [7]), "silver", "g", "append", data_dir
    )
    lake.overwrite_partitions(
        _day_df(spark, "2024-01-01", [5]), "silver", "g",
        partition_col="partition_date",
    )
    lake._commit("silver", "g", entry, base)  # must NOT raise
    got = sorted(
        r["value"] for r in lake.read(spark, "silver", "g").collect()
    )
    assert got == [5.0, 7.0]


def test_full_table_ops_conflict_with_everything(spark, tmp_path):
    """overwrite/restore span the whole table: any interleaved commit
    invalidates them."""
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("silver")
    lake.overwrite(_day_df(spark, "2024-01-01", [1]), "silver", "h")

    base, data_dir = lake._next_data_dir("silver", "h")
    entry = lake._stage_full_write(
        _day_df(spark, "2024-01-01", [2]), "silver", "h", "overwrite",
        data_dir,
    )
    lake.append(_day_df(spark, "2024-01-02", [3]), "silver", "h")
    with pytest.raises(ConcurrentWriteError):
        lake._commit("silver", "h", entry, base)
