"""Catalog conveniences: TIMESTAMP AS OF time travel and SQL view
registration (the reference's CREATE VIEW + DuckDB-SQL surface)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.sources.lakehouse import Lakehouse


@pytest.fixture()
def lake(tmp_path):
    lk = Lakehouse(str(tmp_path / "lake"))
    lk.create_schemas("silver")
    return lk


def _seed(spark, lake, n, name="t"):
    df = spark.range(n).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("p")
    )
    lake.overwrite_partitions(df, "silver", name, partition_col="p")


def test_read_as_of_timestamp(spark, lake):
    _seed(spark, lake, 10)
    ts_v0 = lake.snapshots("silver", "t")[-1]["timestamp"]
    _seed(spark, lake, 25)
    # as of v0's wall clock (ties resolve to highest version ≤ instant,
    # which here may already be v1 if both commits share a second —
    # use a timestamp strictly before v1 only when the seconds differ)
    ts_v1 = lake.snapshots("silver", "t")[-1]["timestamp"]
    got = lake.read_as_of(spark, "silver", "t", ts_v1).count()
    assert got == 25
    if ts_v0 < ts_v1:
        assert lake.read_as_of(spark, "silver", "t", ts_v0).count() == 10
    with pytest.raises(ValueError, match="no commit at or before"):
        lake.read_as_of(spark, "silver", "t", "1999-01-01T00:00:00")


def test_deep_clone(spark, lake):
    _seed(spark, lake, 20)
    lake.add_constraint("silver", "t", "id_nonneg", "id >= 0")
    v0_rows = sorted(
        tuple(r) for r in lake.read(spark, "silver", "t").collect()
    )
    lake.clone(spark, "silver", "t", "silver", "t_dev", partition_col="p")
    # provenance on the commit line; constraints carried
    entry = lake.snapshots("silver", "t_dev")[-1]
    assert entry["cloned_from"] == "silver.t@v0"
    assert lake.constraints("silver", "t_dev") == {"id_nonneg": "id >= 0"}
    # independence: mutate + vacuum the source, clone unaffected
    _seed(spark, lake, 5)
    lake.compact(spark, "silver", "t")  # vacuums source history
    got = sorted(
        tuple(r) for r in lake.read(spark, "silver", "t_dev").collect()
    )
    assert got == v0_rows
    # clone of a historical version
    lake.clone(
        spark, "silver", "t_dev", "silver", "t_dev2",
        partition_col="p", version=0,
    )
    assert lake.read(spark, "silver", "t_dev2").count() == 20


def test_register_views_sql_surface(spark, lake):
    _seed(spark, lake, 12, name="trips")
    _seed(spark, lake, 4, name="zones")
    views = lake.register_views(spark, "silver")
    assert views == ["silver_trips", "silver_zones"]
    n = spark.sql(
        "SELECT count(*) AS n FROM silver_trips "
        "WHERE id NOT IN (SELECT id FROM silver_zones)"
    ).collect()[0]["n"]
    assert n == 8
    # prefix override
    assert lake.register_views(spark, "silver", names=["trips"],
                               prefix="lh") == ["lh_trips"]
    assert spark.sql("SELECT count(*) AS n FROM lh_trips").collect()[0]["n"] == 12


def test_fsck_clean_and_corrupted(spark, lake):
    import os
    import shutil

    _seed(spark, lake, 20)
    _seed(spark, lake, 30)  # second version
    rep = lake.fsck("silver", "t")
    assert rep["ok"] and rep["errors"] == []
    # the superseded v0 dir is historical, NOT an orphan
    assert rep["orphans"] == []

    # delete one live data file behind the log's back
    tdir = os.path.join(lake.root, "silver", "t", "_data")
    vdirs = sorted(os.listdir(tdir))
    live = os.path.join(tdir, vdirs[-1])
    victim = next(
        os.path.join(r, f)
        for r, _d, fs in os.walk(live)
        for f in fs
        if f.endswith(".parquet")
    )
    os.remove(victim)
    rep = lake.fsck("silver", "t")
    assert not rep["ok"]
    assert any("missing file" in e for e in rep["errors"])

    # remove a whole live version dir → missing-dir error
    shutil.rmtree(live)
    rep = lake.fsck("silver", "t")
    assert any("missing data dir" in e for e in rep["errors"])


def test_compact_target_file_bytes(spark, lake):
    """Byte-targeted OPTIMIZE: a tiny target yields multiple files per
    partition (deterministic xxhash bucketing), a huge target collapses
    to one, and the rows are identical either way."""
    import glob
    import os

    df = spark.range(0, 4000).select(
        F.col("id"),
        (F.col("id") % 2).cast("string").alias("p"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    lake.overwrite_partitions(df, "silver", "big", partition_col="p")
    want = sorted(tuple(r) for r in lake.read(spark, "silver", "big").collect())

    out = lake.compact(
        spark, "silver", "big", partition_col="p",
        target_file_bytes=20_000, vacuum=False,
    )
    live = lake._manifest("silver", "big")[0]
    d = next(iter(live.values()))[0]
    per_part = len(glob.glob(os.path.join(d, "p=0", "*.parquet")))
    assert per_part > 1, out
    assert sorted(
        tuple(r) for r in lake.read(spark, "silver", "big").collect()
    ) == want

    lake.compact(
        spark, "silver", "big", partition_col="p",
        target_file_bytes=1 << 30, vacuum=False,
    )
    live = lake._manifest("silver", "big")[0]
    d = next(iter(live.values()))[0]
    assert len(glob.glob(os.path.join(d, "p=0", "*.parquet"))) == 1
    assert sorted(
        tuple(r) for r in lake.read(spark, "silver", "big").collect()
    ) == want


def test_fsck_reports_orphans_after_failed_stage(spark, lake):
    import os

    _seed(spark, lake, 10)
    # simulate a crashed writer: staged dir that never got a log line
    stray = os.path.join(
        lake.root, "silver", "t", "_data", "v9-deadbeef-1"
    )
    os.makedirs(stray)
    rep = lake.fsck("silver", "t")
    assert rep["ok"]  # orphans are reclaimable, not errors
    assert rep["orphans"] == ["_data/v9-deadbeef-1"]


def test_purge_physically_erases(spark, lake):
    """After purge, the matching rows' bytes are gone from EVERY file
    under the table — including history — and reads/time-travel can't
    reach them."""
    import glob
    import os

    import pyarrow.parquet as pq

    df = spark.range(0, 200).select(
        F.col("id"),
        (F.col("id") % 2).cast("string").alias("p"),
        F.concat(F.lit("SECRET-"), F.col("id")).alias("payload"),
    )
    lake.overwrite_partitions(df, "silver", "t", partition_col="p")
    # a merge-on-read delete first, so purge must also materialize DVs
    lake.delete_where(
        spark, "silver", "t", F.col("id") == 7,
        partition_col="p", mode="merge_on_read",
    )
    out = lake.purge(
        spark, "silver", "t", F.col("id") < 50, partition_col="p"
    )
    assert out["ok"] and out["bytes_reclaimed"] > 0

    remaining = lake.read(spark, "silver", "t")
    assert remaining.filter(F.col("id") < 50).count() == 0
    assert remaining.count() == 150  # 200 - 50 (id 7 was already gone)

    # no parquet file anywhere under the table still holds a purged id
    tdir = os.path.join(lake.root, "silver", "t")
    purged = {f"SECRET-{i}" for i in range(50)}
    for fp in glob.glob(os.path.join(tdir, "**", "*.parquet"),
                        recursive=True):
        tbl = pq.read_table(fp)
        if "payload" not in tbl.column_names:
            continue  # deletion-vector files
        vals = set(tbl.column("payload").to_pylist())
        assert not (vals & purged), fp

    # time travel to the pre-purge state is honestly refused
    with pytest.raises(FileNotFoundError):
        lake.read_snapshot(spark, "silver", "t", 0).count()


def test_vacuum_retain_hours(spark, lake):
    """Time-based retention: versions inside the window survive (time
    travel exact), older superseded dirs are reclaimed."""
    _seed(spark, lake, 10)   # v0
    _seed(spark, lake, 20)   # v1
    _seed(spark, lake, 30)   # v2
    ts1 = lake.snapshots("silver", "t")[1]["timestamp"]

    # retention window that includes v1 and v2 but not v0: pretend
    # "now" is far in the future of v0... all commits share ~the same
    # second here, so drive the cutoff with the test seam instead
    future = "2099-01-01T00:00:00"
    out = lake.vacuum_retain(
        "silver", "t", hours=1, dry_run=True, _now=future
    )
    # nothing is within 1h of 2099 → only the latest version's dirs kept
    assert len(out["dirs"]) == 2  # v0 and v1 dirs reclaimable

    # an infinite-ish window reclaims nothing
    out = lake.vacuum_retain(
        "silver", "t", hours=10_000_000, dry_run=True, _now=future
    )
    assert out["dirs"] == []

    # real run with the tight window: history gone, latest intact
    lake.vacuum_retain("silver", "t", hours=1, _now=future)
    assert lake.read(spark, "silver", "t").count() == 30
    assert ts1  # silence lint; v1's timestamp existed pre-vacuum


def test_partition_values_read_prunes_directories(spark, lake):
    """`read(partition_values=...)` lists only the named value
    subdirs (planned files shrink), applies row-filter fallback to
    unpartitioned append dirs, and returns empty (not an error) for
    values the table doesn't hold."""
    df = spark.range(40).select(
        F.col("id"), (F.col("id") % 4).cast("string").alias("p")
    )
    lake.overwrite_partitions(df, "silver", "pv", partition_col="p")

    pruned = lake.read(spark, "silver", "pv", partition_values=["1", "3"])
    assert sorted(r["id"] for r in pruned.collect()) == sorted(
        range(1, 40, 2)
    )
    # directory-level: only p=1 / p=3 dirs are planned
    dirs = {
        part
        for f in pruned.inputFiles()
        for part in f.split("/")
        if part.startswith("p=")
    }
    assert dirs == {"p=1", "p=3"}

    # an unpartitioned append can't dir-prune; rows still filter right
    lake.append(
        spark.range(100, 104).select(
            F.col("id"), F.lit("3").alias("p")
        ),
        "silver", "pv",
    )
    again = lake.read(spark, "silver", "pv", partition_values=["3"])
    got = sorted(r["id"] for r in again.collect())
    assert got == [3, 7, 11, 15, 19, 23, 27, 31, 35, 39, 100, 101, 102, 103]

    # absent value: empty frame, table schema, no error
    none = lake.read(spark, "silver", "pv", partition_values=["9"])
    assert none.count() == 0
    assert set(none.columns) == {"id", "p"}


def test_history_describe_history_analog(spark, tmp_path):
    """history() = DESCRIBE HISTORY: newest-first commit rows,
    SQL-queryable, carrying op/partition/txn/provenance columns."""
    import pyspark.sql.functions as F

    from urban_mobility_data_lakehouse_spark.sources.lakehouse import (
        Lakehouse,
    )
    from urban_mobility_data_lakehouse_spark.sources.testdata import (
        load_table,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "user_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("silver")
    lake.overwrite_partitions(ev, "silver", "ev", partition_col="day")
    lake.delete_where(
        spark, "silver", "ev", F.col("user_id") == 1, partition_col="day"
    )
    lake.clone(spark, "silver", "ev", "silver", "ev2")
    hist = lake.history(spark, "silver", "ev").collect()
    assert [r["version"] for r in hist] == sorted(
        (r["version"] for r in hist), reverse=True
    )
    assert hist[-1]["operation"] == "overwrite_partitions"
    assert hist[-1]["n_partitions"] and hist[-1]["partition_col"] == "day"
    h2 = lake.history(spark, "silver", "ev2").collect()
    assert h2[0]["cloned_from"].startswith("silver.ev@v")
    # SQL-composable
    lake.history(spark, "silver", "ev").createOrReplaceTempView("h")
    n = spark.sql(
        "SELECT count(*) AS n FROM h WHERE operation LIKE '%partition%'"
    ).collect()[0]["n"]
    assert n >= 2
