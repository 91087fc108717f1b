"""Row-level UPDATE (Delta ``UPDATE ... SET ... WHERE ...`` analog):
copy-on-write rewrites only affected partitions; merge-on-read commits
a deletion vector + updated row images on one atomic log line.

Reference parity: the reference's only row-mutation idiom is the
partition delete+insert upsert (mobility_ingestion_pipeline.py:648-672);
UPDATE completes the DML triad next to merge_into / delete_where.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.sources.lakehouse import (
    ConstraintViolationError,
    Lakehouse,
)


@pytest.fixture()
def lake(tmp_path):
    lk = Lakehouse(str(tmp_path / "lake"))
    lk.create_schemas("silver")
    return lk


def _seed(spark, lake, name="t"):
    df = spark.range(0, 400).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("p"),
        (F.col("id") * 2).alias("v"),
        F.lit("x").alias("tag"),
    )
    lake.overwrite_partitions(df, "silver", name, partition_col="p")
    return df


@pytest.mark.parametrize("mode", ["copy_on_write", "merge_on_read"])
def test_update_changes_only_matching_rows(spark, lake, mode):
    _seed(spark, lake)
    assert lake.update_where(
        spark, "silver", "t",
        F.col("id").between(10, 19),
        {"v": F.col("v") + 1000, "tag": F.lit("bumped")},
        partition_col="p",
        mode=mode,
    )
    rows = {r["id"]: r for r in lake.read(spark, "silver", "t").collect()}
    assert len(rows) == 400
    for i in range(400):
        if 10 <= i <= 19:
            assert rows[i]["v"] == i * 2 + 1000
            assert rows[i]["tag"] == "bumped"
        else:
            assert rows[i]["v"] == i * 2
            assert rows[i]["tag"] == "x"


def test_update_set_reads_the_original_row(spark, lake):
    """SET a = b, b = a swaps — every expression sees the pre-update
    row, never a sequentially-mutated one."""
    df = spark.createDataFrame(
        [(1, "a", 10, 20)], "id long, p string, a long, b long"
    )
    lake.overwrite_partitions(df, "silver", "s", partition_col="p")
    lake.update_where(
        spark, "silver", "s", F.lit(True),
        {"a": F.col("b"), "b": F.col("a")},
        partition_col="p",
    )
    r = lake.read(spark, "silver", "s").collect()[0]
    assert (r["a"], r["b"]) == (20, 10)


def test_update_three_valued_logic(spark, lake):
    """NULL-predicate rows pass through untouched (DELETE parity)."""
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", None), (3, "a", -1.0)],
        "id long, p string, v double",
    )
    lake.overwrite_partitions(df, "silver", "n", partition_col="p")
    lake.update_where(
        spark, "silver", "n", F.col("v") > 0,
        {"v": F.lit(0.0)}, partition_col="p",
    )
    got = {r["id"]: r["v"] for r in lake.read(spark, "silver", "n").collect()}
    assert got == {1: 0.0, 2: None, 3: -1.0}


def test_update_no_match_is_no_commit(spark, lake):
    _seed(spark, lake)
    before = len(lake.snapshots("silver", "t"))
    assert not lake.update_where(
        spark, "silver", "t", F.col("id") < 0,
        {"v": F.lit(0)}, partition_col="p",
    )
    assert len(lake.snapshots("silver", "t")) == before


def test_update_cow_rewrites_only_affected_partitions(spark, lake):
    import glob
    import os

    _seed(spark, lake)
    # ids 0,4,8,... live in partition p=0 only → the rewrite commit
    # must lay down p=0 and nothing else
    lake.update_where(
        spark, "silver", "t", F.col("id") % 4 == 0,
        {"tag": F.lit("u")}, partition_col="p",
    )
    [v1] = glob.glob(os.path.join(lake.root, "silver/t/_data/v1-*"))
    written = {
        d for d in os.listdir(v1) if d.startswith("p=")
    }
    assert written == {"p=0"}
    # and the superseded p=0 rows are gone from the read
    out = lake.read(spark, "silver", "t")
    assert out.count() == 400
    assert out.filter("p = '0' AND tag <> 'u'").count() == 0
    assert out.filter("p <> '0' AND tag <> 'x'").count() == 0


def test_update_mor_rewrites_no_partition_and_schema_is_stable(spark, lake):
    _seed(spark, lake)
    before = lake.read(spark, "silver", "t")
    files_before = sorted(before.inputFiles())
    cols_before = before.columns
    lake.update_where(
        spark, "silver", "t", F.col("id") == 7,
        {"v": F.lit(-7)}, mode="merge_on_read",
    )
    after = lake.read(spark, "silver", "t")
    # original data files all still live; one additive dir joined them
    assert set(files_before) <= set(after.inputFiles())
    assert after.columns == cols_before
    assert lake.snapshots("silver", "t")[-1]["operation"] == "update_mor"
    assert [r["v"] for r in after.filter("id = 7").collect()] == [-7]
    assert after.count() == 400


def test_update_mor_may_move_rows_across_partitions(spark, lake):
    _seed(spark, lake)
    lake.update_where(
        spark, "silver", "t", F.col("id") == 5,
        {"p": F.lit("9")}, mode="merge_on_read",
    )
    moved = lake.read(spark, "silver", "t").filter("id = 5").collect()
    assert [r["p"] for r in moved] == ["9"]
    assert lake.read(spark, "silver", "t").count() == 400


def test_update_cow_refuses_partition_column_set(spark, lake):
    _seed(spark, lake)
    with pytest.raises(ValueError, match="move rows across partitions"):
        lake.update_where(
            spark, "silver", "t", F.col("id") == 5,
            {"p": F.lit("9")}, partition_col="p",
        )


def test_update_unknown_column_raises(spark, lake):
    _seed(spark, lake)
    for mode in ("copy_on_write", "merge_on_read"):
        with pytest.raises(ValueError, match="unknown columns"):
            lake.update_where(
                spark, "silver", "t", F.lit(True),
                {"nope": F.lit(1)}, partition_col="p", mode=mode,
            )


def test_update_preserves_column_types(spark, lake):
    """Assignments cast to the existing column type — the schema is
    invariant under UPDATE (an int literal into a long column stays
    long; a string column fed an int becomes its string form)."""
    _seed(spark, lake)
    lake.update_where(
        spark, "silver", "t", F.col("id") == 0,
        {"v": F.lit(1).cast("int"), "tag": F.lit(123)},
        partition_col="p",
    )
    t = lake.read(spark, "silver", "t")
    assert dict(t.dtypes) == {
        "id": "bigint", "p": "string", "v": "bigint", "tag": "string"
    }
    r = t.filter("id = 0").collect()[0]
    assert (r["v"], r["tag"]) == (1, "123")


@pytest.mark.parametrize("mode", ["copy_on_write", "merge_on_read"])
def test_update_respects_constraints(spark, lake, mode):
    _seed(spark, lake)
    lake.add_constraint("silver", "t", "v_nonneg", "v >= 0")
    before = len(lake.snapshots("silver", "t"))
    with pytest.raises(ConstraintViolationError):
        lake.update_where(
            spark, "silver", "t", F.col("id") == 3,
            {"v": F.lit(-1)}, partition_col="p", mode=mode,
        )
    assert len(lake.snapshots("silver", "t")) == before
    assert lake.read(spark, "silver", "t").filter(
        "id = 3"
    ).collect()[0]["v"] == 6


def test_update_cdc_shows_only_truly_changed_rows(spark, lake):
    """A SET writing the same value back cancels out of the CDC diff —
    only rows whose image changed appear, as delete+insert pairs."""
    _seed(spark, lake)
    v0 = len(lake.snapshots("silver", "t")) - 1
    lake.update_where(
        spark, "silver", "t",
        F.col("id").isin(8, 12),  # both in p=0; 8 keeps its value
        {"v": F.when(F.col("id") == 12, F.lit(999)).otherwise(F.col("v"))},
        partition_col="p",
    )
    changes = lake.read_changes(spark, "silver", "t", v0, v0 + 1)
    got = sorted(
        (r["id"], r["_change_type"], r["v"]) for r in changes.collect()
    )
    assert got == [(12, "delete", 24), (12, "insert", 999)]


def test_update_time_travel_sees_pre_update_state(spark, lake):
    _seed(spark, lake)
    v0 = len(lake.snapshots("silver", "t")) - 1
    lake.update_where(
        spark, "silver", "t", F.col("id") == 1,
        {"v": F.lit(0)}, partition_col="p",
    )
    old = lake.read(spark, "silver", "t", version=v0)
    assert old.filter("id = 1").collect()[0]["v"] == 2


def test_update_on_hidden_spec_table(spark, lake):
    """Hidden partitioning: no partition_col argument; SET on the spec
    source column is refused under CoW (it would re-bucket the row)."""
    lake.set_partition_spec("silver", "h", "bucket(4, id)")
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") * 3).alias("v")
    )
    lake.append(df, "silver", "h")
    assert lake.update_where(
        spark, "silver", "h", F.col("id") < 10, {"v": F.lit(-1)}
    )
    got = lake.read(spark, "silver", "h")
    assert got.filter("v = -1").count() == 10
    assert got.count() == 100
    with pytest.raises(ValueError, match="merge_on_read"):
        lake.update_where(
            spark, "silver", "h", F.lit(True), {"id": F.col("id") + 1}
        )


def test_update_mor_then_compact_materializes(spark, lake):
    _seed(spark, lake)
    lake.update_where(
        spark, "silver", "t", F.col("id") == 2,
        {"v": F.lit(42)}, mode="merge_on_read",
    )
    lake.compact(spark, "silver", "t", partition_col="p")
    t = lake.read(spark, "silver", "t")
    assert t.filter("id = 2").collect()[0]["v"] == 42
    assert t.count() == 400
    assert lake.fsck("silver", "t")["errors"] == []


def test_update_where_predicates_prunes_and_matches_condition(
    spark, lake
):
    """update_where(predicates=…) derives its condition from the
    triples and routes the MoR positional scan through read_where —
    result equal to the classic condition path on twin tables."""
    _seed(spark, lake, "ua")
    _seed(spark, lake, "ub")
    lake.update_where(
        spark, "silver", "ua",
        predicates=[("id", "in", [3, 17])],
        set={"v": F.col("v") + 100},
        mode="merge_on_read",
    )
    lake.update_where(
        spark, "silver", "ub",
        F.col("id").isin([3, 17]),
        {"v": F.col("v") + 100},
        mode="merge_on_read",
    )
    rows = lambda t: sorted(  # noqa: E731
        tuple(r) for r in lake.read(spark, "silver", t).collect()
    )
    assert rows("ua") == rows("ub")
    got = {
        r["id"]: r["v"]
        for r in lake.read(spark, "silver", "ua")
        .filter(F.col("id").isin([3, 17, 4]))
        .collect()
    }
    assert got[3] == 3 * 2 + 100 and got[17] == 17 * 2 + 100
    assert got[4] == 8  # untouched


def test_update_where_requires_exactly_one_selector(spark, lake):
    _seed(spark, lake)
    with pytest.raises(ValueError, match="exactly one"):
        lake.update_where(spark, "silver", "t", set={"v": F.lit(0)})
    with pytest.raises(ValueError, match="exactly one"):
        lake.update_where(
            spark, "silver", "t",
            F.col("id") == 1, {"v": F.lit(0)},
            predicates=[("id", "=", 1)],
        )
