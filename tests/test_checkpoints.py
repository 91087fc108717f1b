"""Commit-log checkpoints (Delta checkpoint analog): readers seed from
the newest checkpoint ≤ their target version and replay only the log
suffix.  The invariant under test: for EVERY version of a table with a
messy history (appends, partition overwrites, restore), the
checkpoint-seeded manifest equals the full from-scratch replay.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from urban_mobility_data_lakehouse_spark.sources.lakehouse import Lakehouse


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("p")
    )


def _build_history(spark, lake) -> int:
    """12 commits of mixed shape; interval=4 → checkpoints at v3, v7,
    v11, with a restore straddling a checkpoint boundary."""
    lake.create_schemas("silver")
    for i in range(5):
        lake.append(_mk(spark, i * 10, i * 10 + 10), "silver", "t")  # v0..v4
    lake.overwrite_partitions(
        _mk(spark, 100, 120), "silver", "t", partition_col="p"
    )  # v5
    lake.restore("silver", "t", version=2)  # v6
    for i in range(5, 10):
        lake.append(_mk(spark, i * 10, i * 10 + 10), "silver", "t")  # v7..v11
    return len(lake.snapshots("silver", "t"))


def test_checkpointed_manifest_equals_full_replay(spark, tmp_path):
    lake = Lakehouse(str(tmp_path / "lake"), checkpoint_interval=4)
    n = _build_history(spark, lake)
    path = lake._table_dir("silver", "t")
    cps = sorted(os.listdir(lake._checkpoints_dir(path)))
    assert cps == ["v00000003.json", "v00000007.json", "v00000011.json"]

    entries = lake.snapshots("silver", "t")
    for v in list(range(n)) + [None]:
        with_cp = lake._manifest("silver", "t", v)
        from_scratch = lake._replay(entries, path, v)
        assert with_cp == from_scratch, f"divergence at version {v}"


def test_checkpointed_reads_roundtrip(spark, tmp_path):
    lake = Lakehouse(str(tmp_path / "lake"), checkpoint_interval=4)
    _build_history(spark, lake)
    # latest read crosses the v11 checkpoint; restore semantics hold:
    # v5's partition overwrite was rolled back at v6, then 5 appends
    ids = sorted(
        r["id"] for r in lake.read(spark, "silver", "t").collect()
    )
    expect = sorted(list(range(0, 30)) + list(range(50, 100)))
    assert ids == expect
    # time travel to BEFORE the first checkpoint (full-replay path)
    old = sorted(
        r["id"]
        for r in lake.read_snapshot(spark, "silver", "t", 1).collect()
    )
    assert old == list(range(0, 20))
    # read_where still prunes across a checkpoint-seeded manifest
    hit = lake.read_where(spark, "silver", "t", [("id", ">=", 90)])
    assert sorted(r["id"] for r in hit.collect()) == list(range(90, 100))
    assert len(hit.inputFiles()) < len(
        lake.read(spark, "silver", "t").inputFiles()
    )


def test_disabled_interval_still_honors_existing_checkpoints(
    spark, tmp_path
):
    lake = Lakehouse(str(tmp_path / "lake"), checkpoint_interval=4)
    _build_history(spark, lake)
    ro = Lakehouse(str(tmp_path / "lake"), checkpoint_interval=0)
    assert sorted(
        r["id"] for r in ro.read(spark, "silver", "t").collect()
    ) == sorted(list(range(0, 30)) + list(range(50, 100)))
    # and a no-checkpoint table stays fully readable
    ro.append(_mk(spark, 900, 910), "silver", "fresh")
    assert ro.read(spark, "silver", "fresh").count() == 10
    assert not os.path.isdir(
        ro._checkpoints_dir(ro._table_dir("silver", "fresh"))
    )
