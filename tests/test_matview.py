"""Incrementally maintained materialized views (sources/matview.py).

The invariant under test: after ANY sequence of base-table mutations
(partition upserts, appends, MERGE, DELETE in both copy-on-write and
merge-on-read modes, compactions), `refresh()` leaves the view equal to
a from-scratch recompute — while touching only the affected groups and
partitions, with the watermark recorded atomically in the view's log.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.sources.lakehouse import Lakehouse
from urban_mobility_data_lakehouse_spark.sources.matview import (
    MaterializedView,
)

AGGS = {
    "n": "count(*)",
    # decimal accumulation → order-independent, exact equality
    "total": "cast(sum(cast(v as decimal(25,6))) as double)",
    # max is NOT self-maintainable under deletes — proves the
    # affected-group recompute strategy, not delta arithmetic
    "vmax": "max(v)",
}


@pytest.fixture()
def lake(tmp_path):
    lk = Lakehouse(str(tmp_path / "lake"))
    lk.create_schemas("silver", "gold")
    return lk


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("day"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("kind"),
        (F.col("id") * 1.5).alias("v"),
    )


def _mv(lake, partitioned=True):
    return MaterializedView(
        lake,
        base=("silver", "t"),
        view=("gold", "daily"),
        group_by=["day", "kind"],
        aggs=AGGS,
        partition_col="day" if partitioned else None,
    )


_COLS = ["day", "kind", *AGGS]  # storage may reorder partition cols


def _expect(spark, lake):
    return sorted(
        tuple(r)
        for r in lake.read(spark, "silver", "t")
        .groupBy("day", "kind")
        .agg(*[F.expr(e).alias(c) for c, e in AGGS.items()])
        .select(*_COLS)
        .collect()
    )


def _got(spark, mv):
    return sorted(tuple(r) for r in mv.read(spark).select(*_COLS).collect())


def test_full_build_then_noop(spark, lake):
    lake.overwrite_partitions(_rows(spark, 0, 300), "silver", "t", "day")
    mv = _mv(lake)
    out = mv.refresh(spark)
    assert out["strategy"] == "full"
    assert _got(spark, mv) == _expect(spark, lake)
    again = mv.refresh(spark)
    assert again["strategy"] == "noop"
    # noop leaves the view's commit history untouched
    assert len(lake.snapshots("gold", "daily")) == 1


def test_incremental_day_upsert_rewrites_only_affected(spark, lake):
    lake.overwrite_partitions(_rows(spark, 0, 300), "silver", "t", "day")
    mv = _mv(lake)
    mv.refresh(spark)
    # day upsert: replace partition day=1 with different rows
    upsert = _rows(spark, 1000, 1060).filter(F.col("day") == "1")
    lake.overwrite_partitions(upsert, "silver", "t", "day")
    out = mv.refresh(spark)
    assert out["strategy"] == "incremental"
    assert out["affected_partitions"] == ["1"]
    assert _got(spark, mv) == _expect(spark, lake)
    # the view commit rewrote exactly the affected partition
    assert lake.snapshots("gold", "daily")[-1]["partitions"] == ["1"]


def test_incremental_after_merge_delete_append(spark, lake):
    lake.overwrite_partitions(_rows(spark, 0, 300), "silver", "t", "day")
    mv = _mv(lake)
    mv.refresh(spark)

    # MERGE: update 10 rows, insert 5 new ones (same partition layout)
    updates = _rows(spark, 100, 110).withColumn("v", F.col("v") + 100.0)
    inserts = _rows(spark, 2000, 2005)
    lake.merge_into(
        spark, "silver", "t", updates.unionByName(inserts),
        key="id", partition_col="day",
    )
    assert mv.refresh(spark)["strategy"] == "incremental"
    assert _got(spark, mv) == _expect(spark, lake)

    # copy-on-write DELETE
    lake.delete_where(
        spark, "silver", "t", F.col("id").between(50, 80),
        partition_col="day",
    )
    assert mv.refresh(spark)["strategy"] == "incremental"
    assert _got(spark, mv) == _expect(spark, lake)

    # merge-on-read DELETE (deletion vector)
    lake.delete_where(
        spark, "silver", "t", F.col("id").between(200, 220),
        partition_col="day", mode="merge_on_read",
    )
    assert mv.refresh(spark)["strategy"] == "incremental"
    assert _got(spark, mv) == _expect(spark, lake)

    # plain append (extra-dir commit, all partitions touched)
    lake.append(_rows(spark, 3000, 3030), "silver", "t")
    assert mv.refresh(spark)["strategy"] == "incremental"
    assert _got(spark, mv) == _expect(spark, lake)


def test_group_emptied_by_delete_disappears(spark, lake):
    lake.overwrite_partitions(_rows(spark, 0, 30), "silver", "t", "day")
    mv = _mv(lake)
    mv.refresh(spark)
    # wipe out every row of group (day=2, kind=a) — and of day=2 entirely
    lake.delete_where(
        spark, "silver", "t", F.col("day") == "2", partition_col="day"
    )
    mv.refresh(spark)
    got = _got(spark, mv)
    assert got == _expect(spark, lake)
    assert not any(r[0] == "2" for r in got)


def test_base_emptied_entirely(spark, lake):
    """Deleting every base row must refresh the view to empty, not
    crash on the unreadable base."""
    lake.overwrite_partitions(_rows(spark, 0, 30), "silver", "t", "day")
    mv = _mv(lake)
    mv.refresh(spark)
    lake.delete_where(
        spark, "silver", "t", F.lit(True), partition_col="day"
    )
    out = mv.refresh(spark)
    assert out["strategy"] == "incremental"
    # every group vanished: the view has no live rows left
    with pytest.raises(FileNotFoundError):
        mv.read(spark).count()
    assert mv.refresh(spark)["strategy"] == "noop"
    # refill after total emptiness: the empty view must not crash the
    # next incremental refresh
    lake.overwrite_partitions(_rows(spark, 50, 80), "silver", "t", "day")
    assert mv.refresh(spark)["strategy"] == "incremental"
    assert _got(spark, mv) == _expect(spark, lake)


def test_compaction_advances_watermark_without_data_commit(spark, lake):
    lake.overwrite_partitions(_rows(spark, 0, 300), "silver", "t", "day")
    mv = _mv(lake)
    mv.refresh(spark)
    # rewrites bytes, not rows; vacuum=False keeps the CDC window alive
    lake.compact(spark, "silver", "t", vacuum=False)
    out = mv.refresh(spark)
    assert out["strategy"] == "advance"
    assert lake.snapshots("gold", "daily")[-1]["operation"] == "mv_advance"
    # watermark moved: next refresh is a pure noop, no re-diff
    assert mv.refresh(spark)["strategy"] == "noop"
    assert _got(spark, mv) == _expect(spark, lake)


def test_vacuumed_cdc_window_forces_full_rebuild(spark, lake):
    """OPTIMIZE+VACUUM inside the refresh window reclaims the from-side
    files: read_changes must refuse (not misreport survivors as
    inserts) and the view must rebuild, still matching a recompute."""
    from urban_mobility_data_lakehouse_spark.sources.lakehouse import (
        HistoryUnavailableError,
    )

    lake.overwrite_partitions(_rows(spark, 0, 300), "silver", "t", "day")
    mv = _mv(lake)
    mv.refresh(spark)
    last = mv.last_applied()
    lake.delete_where(
        spark, "silver", "t", F.col("id") < 30, partition_col="day"
    )
    # zero grace: this test simulates maintenance having ALREADY
    # reclaimed the refresh window (no concurrent readers here)
    lake.compact(spark, "silver", "t", vacuum_grace_seconds=0)
    with pytest.raises(HistoryUnavailableError):
        lake.read_changes(spark, "silver", "t", from_version=last)
    out = mv.refresh(spark)
    assert out["strategy"] == "full"
    assert _got(spark, mv) == _expect(spark, lake)
    # rebuild carried the watermark: follow-up refresh is a noop
    assert mv.refresh(spark)["strategy"] == "noop"


def test_unpartitioned_view(spark, lake):
    lake.overwrite_partitions(_rows(spark, 0, 120), "silver", "t", "day")
    mv = _mv(lake, partitioned=False)
    mv.refresh(spark)
    lake.delete_where(
        spark, "silver", "t", F.col("id") % 5 == 0, partition_col="day"
    )
    out = mv.refresh(spark)
    assert out["strategy"] == "incremental"
    assert _got(spark, mv) == _expect(spark, lake)


def test_refresh_is_idempotent_after_replay(spark, lake):
    """Crash-model check: re-running a refresh against an unchanged
    base recomputes nothing and appends nothing."""
    lake.overwrite_partitions(_rows(spark, 0, 60), "silver", "t", "day")
    mv = _mv(lake)
    mv.refresh(spark)
    lake.append(_rows(spark, 500, 520), "silver", "t")
    mv.refresh(spark)
    versions = [e["version"] for e in lake.snapshots("gold", "daily")]
    mv.refresh(spark)  # nothing new
    assert [e["version"] for e in lake.snapshots("gold", "daily")] == versions


@pytest.mark.heavy  # randomized 12-step sweep (~11 s); every mutation
# kind keeps a directed incremental-vs-recompute test in this file
def test_random_mutation_sequence_always_matches_recompute(spark, lake):
    """Seeded fuzz: any interleaving of upserts, merges, CoW and MoR
    deletes, and appends must leave refresh() equal to a from-scratch
    recompute after every step."""
    import random

    rng = random.Random(1234)
    lake.overwrite_partitions(_rows(spark, 0, 200), "silver", "t", "day")
    mv = _mv(lake)
    mv.refresh(spark)
    next_id = 5000
    for step in range(6):
        op = rng.choice(["upsert", "merge", "delete", "delete_mor", "append"])
        if op == "upsert":
            day = str(rng.randrange(3))
            lake.overwrite_partitions(
                _rows(spark, next_id, next_id + 30).filter(
                    F.col("day") == day
                ).withColumn("day", F.lit(day)),
                "silver", "t", "day",
            )
            next_id += 30
        elif op == "merge":
            lake.merge_into(
                spark, "silver", "t",
                _rows(spark, next_id, next_id + 10),
                key="id", partition_col="day",
            )
            next_id += 10
        elif op == "append":
            lake.append(_rows(spark, next_id, next_id + 15), "silver", "t")
            next_id += 15
        else:
            lo = rng.randrange(0, next_id)
            cond = F.col("id").between(lo, lo + 40)
            lake.delete_where(
                spark, "silver", "t", cond, partition_col="day",
                mode="merge_on_read" if op == "delete_mor" else "copy_on_write",
            )
        mv.refresh(spark)
        assert _got(spark, mv) == _expect(spark, lake), f"step {step} ({op})"


def test_concurrent_refreshes_race_safely(spark, lake):
    """Two refreshers racing the same window: optimistic commits let
    one win; the loser retries, finds the watermark advanced, and
    no-ops.  Either way the view equals the recompute and the history
    stays linear with no duplicate application."""
    import threading

    lake.overwrite_partitions(_rows(spark, 0, 120), "silver", "t", "day")
    mv1, mv2 = _mv(lake), _mv(lake)
    mv1.refresh(spark)
    lake.delete_where(
        spark, "silver", "t", F.col("id") % 4 == 0, partition_col="day"
    )
    results: dict[str, dict | Exception] = {}

    def go(tag, mv):
        try:
            results[tag] = mv.refresh(spark)
        except Exception as e:  # surface, don't swallow
            results[tag] = e

    t1 = threading.Thread(target=go, args=("a", mv1))
    t2 = threading.Thread(target=go, args=("b", mv2))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert all(isinstance(r, dict) for r in results.values()), results
    strategies = sorted(r["strategy"] for r in results.values())
    # at least one applied it; a pure double-apply is impossible —
    # the second incremental recomputes the same groups idempotently
    assert "incremental" in strategies
    assert _got(spark, mv1) == _expect(spark, lake)
    # watermark is the current base version exactly once per value
    marks = [
        e["mv_base_version"]
        for e in lake.snapshots("gold", "daily")
        if "mv_base_version" in e
    ]
    assert marks == sorted(marks)


def test_extra_meta_cannot_shadow_commit_fields(spark, lake):
    df = _rows(spark, 0, 10)
    with pytest.raises(ValueError, match="collide"):
        lake.overwrite_partitions(
            df, "silver", "t", "day", extra_meta={"operation": "x"}
        )


def test_bad_definitions_rejected(lake):
    with pytest.raises(ValueError, match="must be one of"):
        MaterializedView(
            lake, base=("silver", "t"), view=("gold", "g"),
            group_by=["day"], aggs={"n": "count(*)"}, partition_col="kind",
        )
    with pytest.raises(ValueError, match="shadow"):
        MaterializedView(
            lake, base=("silver", "t"), view=("gold", "g"),
            group_by=["day"], aggs={"day": "count(*)"},
        )
