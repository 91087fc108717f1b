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


def test_txn_delete_where_forward_derives_buckets(spark, tmp_path):
    """predicates on a hidden bucket spec's SOURCE column derive the
    affected partitions through the transform — no discovery scan —
    and the staged delete equals the condition path."""
    import pyspark.sql.functions as F

    from urban_mobility_data_lakehouse_spark.sources.lakehouse import (
        Lakehouse,
    )

    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("silver")
    for t in ("a", "b"):
        lake.set_partition_spec("silver", t, "bucket(8, id)")
        lake.overwrite_partitions(
            spark.range(200).select("id", (F.col("id") * 3).alias("v")),
            "silver", t,
        )
    with lake.transaction() as txn:
        assert txn.delete_where(
            spark, "silver", "a", predicates=[("id", "in", [7, 63])]
        )
    with lake.transaction() as txn:
        assert txn.delete_where(
            spark, "silver", "b", F.col("id").isin([7, 63])
        )
    rows = lambda t: sorted(  # noqa: E731
        tuple(r) for r in lake.read(spark, "silver", t).collect()
    )
    assert rows("a") == rows("b")
    assert len(rows("a")) == 198
    # ids absent from the table: no commit, no version churn
    v = len(lake.snapshots("silver", "a"))
    with lake.transaction() as txn:
        assert not txn.delete_where(
            spark, "silver", "a", predicates=[("id", "=", 99_999)]
        )
    assert len(lake.snapshots("silver", "a")) == v


def test_txn_delete_where_predicates_reaches_appended_rows(
    spark, tmp_path
):
    """Forward-derived bucket discovery must count buckets living only
    in ADDITIVE (append) dirs as live — an appended row's bucket may
    not be partition-mapped yet, and missing it would silently skip
    the delete."""
    import pyspark.sql.functions as F

    from urban_mobility_data_lakehouse_spark.sources.lakehouse import (
        Lakehouse,
    )

    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("silver")
    lake.set_partition_spec("silver", "t", "bucket(8, id)")
    lake.overwrite_partitions(
        spark.range(10).select("id", (F.col("id") * 3).alias("v")),
        "silver", "t",
    )
    # append ids far outside the seeded range — possibly new buckets
    lake.append(
        spark.range(5_000, 5_020).select(
            "id", (F.col("id") * 3).alias("v")
        ),
        "silver", "t",
    )
    with lake.transaction() as txn:
        assert txn.delete_where(
            spark, "silver", "t",
            predicates=[("id", "in", [5_003, 5_011])],
        )
    ids = sorted(
        r["id"] for r in lake.read(spark, "silver", "t").collect()
    )
    assert 5_003 not in ids and 5_011 not in ids
    assert len(ids) == 28


def test_txn_probe_discovery_handles_null_and_escaped_tokens(
    spark, tmp_path
):
    """The r11 probe branch (predicates on a NON-source column of a
    hidden-partitioned table) must canonicalize the partition tokens
    it reads off file paths exactly like the write path: the
    __HIVE_DEFAULT_PARTITION__ dir maps to the catalog's 'None' token
    and hive escaping is undone — otherwise a delete matching a row
    in the NULL partition silently skips it (the GDPR-erasure miss)."""
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("silver")
    # identity spec over a nullable string: NULL and an
    # escape-needing value both land in sentinel/escaped dirs
    lake.set_partition_spec("silver", "t", "identity(k)")
    df = spark.createDataFrame(
        [(1, None, 10), (2, "a:b", 20), (3, "plain", 30)],
        "id long, k string, v long",
    )
    lake.overwrite_partitions(df, "silver", "t")
    with lake.transaction() as txn:
        # id is NOT the spec source → probe-discovery branch
        assert txn.delete_where(
            spark, "silver", "t", predicates=[("id", "in", [1, 2])]
        )
    got = sorted(
        (r["id"], r["k"], r["v"])
        for r in lake.read(spark, "silver", "t").collect()
    )
    assert got == [(3, "plain", 30)]


def test_txn_mor_delete_conflicts_with_interleaved_compact(
    spark, tmp_path
):
    """r13 (ADVICE): a compact landing between a txn's staged MoR
    delete and its journal commit invalidates the staged deletion
    vector's (file_path, row_index) keys.  The commit must REFUSE —
    atomically, before anything becomes visible — instead of silently
    resurrecting the deleted rows."""
    from urban_mobility_data_lakehouse_spark.sources.lakehouse import (
        ConcurrentWriteError,
        Lakehouse,
    )

    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("silver")
    lake.overwrite_partitions(
        spark.range(100).select(
            "id", (F.col("id") % 4).cast("string").alias("p")
        ),
        "silver", "t", partition_col="p",
    )
    txn = lake.transaction()
    assert txn.delete_where(
        spark, "silver", "t", condition=F.col("id") < 10,
        mode="merge_on_read",
    )
    # interleaved full-table rewrite → staged DV positions are garbage
    lake.compact(spark, "silver", "t", partition_col="p")
    with pytest.raises(ConcurrentWriteError, match="re-stage"):
        txn._commit()
    # nothing visible: no rows vanished, no journal/table-log line
    assert lake.read(spark, "silver", "t").count() == 100
    assert all(
        e["operation"] != "delete_dv"
        for e in lake.snapshots("silver", "t")
    )


def test_txn_cow_conflicts_with_interleaved_same_partition_write(
    spark, tmp_path
):
    """A staged copy-on-write partition rewrite loses an interleaved
    same-partition write if it commits blindly — the journal commit
    now runs the same conflict matrix as direct-path commits."""
    from urban_mobility_data_lakehouse_spark.sources.lakehouse import (
        ConcurrentWriteError,
        Lakehouse,
    )

    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("silver")
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id long, p string, v double"
    )
    lake.overwrite_partitions(df, "silver", "t", partition_col="p")
    txn = lake.transaction()
    txn.overwrite_partitions(
        df.filter("p = 'a'").withColumn("v", F.col("v") * 10),
        "silver", "t", "p",
    )
    lake.overwrite_partitions(
        spark.createDataFrame([(9, "a", 99.0)], "id long, p string, v double"),
        "silver", "t", partition_col="p",
    )
    with pytest.raises(ConcurrentWriteError):
        txn._commit()
    # the interleaved write survives (no lost update)
    rows = {
        (r["id"], r["v"])
        for r in lake.read(spark, "silver", "t").collect()
    }
    assert rows == {(9, 99.0), (2, 2.0)}


def test_txn_disjoint_interleaves_still_commit(spark, tmp_path):
    """No false positives: an interleaved write on a DIFFERENT
    partition (and a concurrent append vs a staged append) merge
    cleanly, exactly like direct-path optimistic concurrency."""
    from urban_mobility_data_lakehouse_spark.sources.lakehouse import (
        Lakehouse,
    )

    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("silver")
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id long, p string, v double"
    )
    lake.overwrite_partitions(df, "silver", "t", partition_col="p")
    txn = lake.transaction()
    txn.overwrite_partitions(
        df.filter("p = 'a'").withColumn("v", F.lit(10.0)),
        "silver", "t", "p",
    )
    txn.append(
        spark.createDataFrame([("x", 1.0)], "k string, v double"),
        "silver", "audit",
    )
    # disjoint partition + an append on the other staged table
    lake.overwrite_partitions(
        spark.createDataFrame([(5, "b", 5.0)], "id long, p string, v double"),
        "silver", "t", partition_col="p",
    )
    lake.append(
        spark.createDataFrame([("y", 2.0)], "k string, v double"),
        "silver", "audit",
    )
    txn._commit()
    rows = {
        (r["id"], r["v"])
        for r in lake.read(spark, "silver", "t").collect()
    }
    assert rows == {(1, 10.0), (5, 5.0)}
    assert lake.read(spark, "silver", "audit").count() == 2
