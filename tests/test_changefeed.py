"""Exactly-once CDC pipe (sources/changefeed.py): initial snapshot,
per-window deltas, idempotent re-poll, vacuumed-window refusal."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.sources.changefeed import (
    ChangeFeedPipe,
)
from urban_mobility_data_lakehouse_spark.sources.lakehouse import (
    HistoryUnavailableError,
    Lakehouse,
)


@pytest.fixture()
def lake(tmp_path):
    lk = Lakehouse(str(tmp_path / "lake"))
    lk.create_schemas("silver", "gold")
    return lk


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") % 2).cast("string").alias("p"),
        (F.col("id") * 2.0).alias("v"),
    )


def _pipe(lake):
    # audit-log consumer: record every change event, tagged
    return ChangeFeedPipe(
        lake,
        source=("silver", "t"),
        sink=("gold", "audit"),
        transform=lambda cdc: cdc.select(
            "id", "p", "v", "_change_type"
        ),
    )


def test_initial_snapshot_then_deltas(spark, lake):
    lake.overwrite_partitions(_rows(spark, 0, 20), "silver", "t", "p")
    pipe = _pipe(lake)
    out = pipe.poll(spark)
    assert out["status"] == "initial" and out["rows"] == 20

    # delete 3 rows → 3 delete events
    lake.delete_where(
        spark, "silver", "t", F.col("id") < 3, partition_col="p"
    )
    out = pipe.poll(spark)
    assert out["status"] == "delta" and out["rows"] == 3
    audit = lake.read(spark, "gold", "audit")
    assert audit.filter(F.col("_change_type") == "delete").count() == 3
    assert audit.count() == 23

    # append 5 → 5 inserts
    lake.append(_rows(spark, 100, 105), "silver", "t")
    out = pipe.poll(spark)
    assert out["status"] == "delta" and out["rows"] == 5
    assert lake.read(spark, "gold", "audit").count() == 28


def test_repoll_is_noop(spark, lake):
    lake.overwrite_partitions(_rows(spark, 0, 10), "silver", "t", "p")
    pipe = _pipe(lake)
    pipe.poll(spark)
    versions = [e["version"] for e in lake.snapshots("gold", "audit")]
    assert pipe.poll(spark)["status"] == "noop"
    assert [e["version"] for e in lake.snapshots("gold", "audit")] == versions


def test_two_pipes_track_independent_offsets(spark, lake):
    lake.overwrite_partitions(_rows(spark, 0, 10), "silver", "t", "p")
    a = _pipe(lake)
    b = ChangeFeedPipe(
        lake, source=("silver", "t"), sink=("gold", "inserts_only"),
        transform=lambda cdc: cdc.filter(
            F.col("_change_type") == "insert"
        ).select("id", "v"),
    )
    a.poll(spark)
    lake.delete_where(spark, "silver", "t", F.col("id") < 4, partition_col="p")
    # b starts late: its initial snapshot is the post-delete state
    out_b = b.poll(spark)
    assert out_b["status"] == "initial" and out_b["rows"] == 6
    out_a = a.poll(spark)
    assert out_a["status"] == "delta" and out_a["rows"] == 4


def test_initial_poll_on_emptied_source(spark, lake):
    """A source whose rows were all deleted still initializes the
    pipe: empty snapshot, offset recorded, later deltas flow."""
    lake.overwrite_partitions(_rows(spark, 0, 6), "silver", "t", "p")
    lake.delete_where(spark, "silver", "t", F.lit(True), partition_col="p")
    pipe = _pipe(lake)
    out = pipe.poll(spark)
    assert out["status"] == "initial" and out["rows"] == 0
    lake.append(_rows(spark, 10, 13), "silver", "t")
    out = pipe.poll(spark)
    assert out["status"] == "delta" and out["rows"] == 3


def test_vacuumed_window_refuses(spark, lake):
    lake.overwrite_partitions(_rows(spark, 0, 10), "silver", "t", "p")
    pipe = _pipe(lake)
    pipe.poll(spark)
    lake.delete_where(spark, "silver", "t", F.col("id") < 2, partition_col="p")
    # vacuum_grace_seconds=0: the maintenance override — this test
    # WANTS history gone now (no concurrent readers here)
    lake.compact(spark, "silver", "t", vacuum_grace_seconds=0)
    with pytest.raises(HistoryUnavailableError):
        pipe.poll(spark)
