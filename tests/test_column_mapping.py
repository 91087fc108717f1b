"""Column-mapping schema evolution (ALTER TABLE RENAME/DROP COLUMN):
metadata-only commits, physical-name indirection, time travel, and the
write-side logical-name contract."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from urban_mobility_data_lakehouse_spark.sources.lakehouse import (
    ConcurrentWriteError,
    Lakehouse,
)


def _lake(tmp_path) -> Lakehouse:
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("silver")
    return lake


def _df(spark, rows, schema="k int, v double, d string"):
    return spark.createDataFrame(rows, schema)


def _seed(spark, lake, partitioned=True):
    df = _df(
        spark,
        [(1, 1.0, "a"), (2, 2.0, "a"), (3, 3.0, "b")],
    )
    if partitioned:
        lake.overwrite_partitions(df, "silver", "t", partition_col="d")
    else:
        lake.overwrite(df, "silver", "t")
    return df


def test_rename_is_metadata_only_and_read_shows_new_name(spark, tmp_path):
    lake = _lake(tmp_path)
    _seed(spark, lake)
    v_before = len(lake.snapshots("silver", "t"))
    files_before = lake._count_live_files("silver", "t")
    lake.rename_column(spark, "silver", "t", "v", "value")
    assert lake._count_live_files("silver", "t") == files_before  # no rewrite
    assert len(lake.snapshots("silver", "t")) == v_before + 1
    out = lake.read(spark, "silver", "t")
    assert "value" in out.columns and "v" not in out.columns
    assert sorted(r["value"] for r in out.collect()) == [1.0, 2.0, 3.0]


def test_time_travel_shows_the_old_name(spark, tmp_path):
    lake = _lake(tmp_path)
    _seed(spark, lake)
    lake.rename_column(spark, "silver", "t", "v", "value")
    old = lake.read(spark, "silver", "t", version=0)
    assert "v" in old.columns and "value" not in old.columns


def test_writes_after_rename_use_logical_names(spark, tmp_path):
    """An append/merge speaking the new name lands in the SAME physical
    column — old and new rows surface together under the new name."""
    lake = _lake(tmp_path)
    _seed(spark, lake)
    lake.rename_column(spark, "silver", "t", "v", "value")
    lake.append(
        spark.createDataFrame([(4, 4.0, "b")], "k int, value double, d string"),
        "silver", "t",
    )
    out = lake.read(spark, "silver", "t")
    assert sorted(r["value"] for r in out.collect()) == [1.0, 2.0, 3.0, 4.0]
    # merge through the logical name updates the right rows
    lake.merge_into(
        spark, "silver", "t",
        spark.createDataFrame([(1, 10.0, "a")], "k int, value double, d string"),
        key="k", partition_col="d",
    )
    got = {r["k"]: r["value"] for r in lake.read(spark, "silver", "t").collect()}
    assert got[1] == 10.0 and got[4] == 4.0


def test_write_with_retired_name_is_refused(spark, tmp_path):
    lake = _lake(tmp_path)
    _seed(spark, lake)
    lake.rename_column(spark, "silver", "t", "v", "value")
    with pytest.raises(ValueError, match="retired physical"):
        lake.append(
            spark.createDataFrame([(9, 9.0, "a")], "k int, v double, d string"),
            "silver", "t",
        )


def test_drop_column_hides_data_until_compact_rewrites(spark, tmp_path):
    lake = _lake(tmp_path)
    _seed(spark, lake)
    lake.drop_column(spark, "silver", "t", "v")
    out = lake.read(spark, "silver", "t")
    assert "v" not in out.columns
    assert out.count() == 3
    # time travel still shows it
    assert "v" in lake.read(spark, "silver", "t", version=0).columns
    # compaction physically rewrites without the dropped bytes
    lake.compact(spark, "silver", "t", partition_col="d")
    import pyarrow.parquet as pq
    import glob, os
    part_map, extra, _ = lake._manifest("silver", "t", None)
    live_dirs = {d for d, _ in part_map.values()} | set(extra)
    for d in live_dirs:
        for f in glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True):
            assert "v" not in pq.ParquetFile(f).schema_arrow.names
    assert lake.read(spark, "silver", "t").count() == 3


def test_rename_survives_compact_and_zorder_args_stay_logical(spark, tmp_path):
    lake = _lake(tmp_path)
    _seed(spark, lake)
    lake.rename_column(spark, "silver", "t", "v", "value")
    lake.compact(spark, "silver", "t", partition_col="d", sort_by=["value"])
    out = lake.read(spark, "silver", "t")
    assert "value" in out.columns
    assert sorted(r["value"] for r in out.collect()) == [1.0, 2.0, 3.0]


def test_read_where_prunes_and_filters_through_rename(spark, tmp_path):
    lake = _lake(tmp_path)
    lake.overwrite_partitions(
        _df(spark, [(i, float(i), "a" if i < 50 else "b") for i in range(100)]),
        "silver", "t", partition_col="d",
    )
    lake.rename_column(spark, "silver", "t", "v", "value")
    got = lake.read_where(spark, "silver", "t", [("value", ">=", 97.0)])
    assert sorted(r["k"] for r in got.collect()) == [97, 98, 99]


def test_restore_rolls_the_mapping_back(spark, tmp_path):
    lake = _lake(tmp_path)
    _seed(spark, lake)
    lake.rename_column(spark, "silver", "t", "v", "value")  # version 1
    lake.restore("silver", "t", 0)
    out = lake.read(spark, "silver", "t")
    assert "v" in out.columns and "value" not in out.columns


def test_rename_guards(spark, tmp_path):
    lake = _lake(tmp_path)
    _seed(spark, lake)
    with pytest.raises(ValueError, match="no column"):
        lake.rename_column(spark, "silver", "t", "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        lake.rename_column(spark, "silver", "t", "v", "k")
    with pytest.raises(ValueError, match="partition column"):
        lake.rename_column(spark, "silver", "t", "d", "day")
    lake.add_constraint("silver", "t", "v_pos", "v >= 0")
    with pytest.raises(ValueError, match="constraint"):
        lake.rename_column(spark, "silver", "t", "v", "value")
    lake.drop_constraint("silver", "t", "v_pos")
    lake.rename_column(spark, "silver", "t", "v", "value")
    # the retired physical name cannot be recycled by a later rename
    with pytest.raises(ValueError, match="retired"):
        lake.rename_column(spark, "silver", "t", "k", "v")
    with pytest.raises(ValueError, match="only column|partition"):
        lake.drop_column(spark, "silver", "t", "d")


def test_rename_chain_and_rename_back(spark, tmp_path):
    lake = _lake(tmp_path)
    _seed(spark, lake)
    lake.rename_column(spark, "silver", "t", "v", "value")
    lake.rename_column(spark, "silver", "t", "value", "amount")
    assert "amount" in lake.read(spark, "silver", "t").columns
    lake.rename_column(spark, "silver", "t", "amount", "v")  # back home
    mapping, dropped = lake.column_state("silver", "t")
    assert mapping == {} and dropped == set()
    assert sorted(r["v"] for r in lake.read(spark, "silver", "t").collect()) \
        == [1.0, 2.0, 3.0]


def test_cdc_across_rename_uses_new_names(spark, tmp_path):
    lake = _lake(tmp_path)
    _seed(spark, lake)                                     # v0
    lake.rename_column(spark, "silver", "t", "v", "value")  # v1
    lake.overwrite_partitions(
        spark.createDataFrame([(1, 9.0, "a"), (2, 2.0, "a")],
                              "k int, value double, d string"),
        "silver", "t", partition_col="d",
    )                                                       # v2
    ch = lake.read_changes(spark, "silver", "t", from_version=0)
    assert "value" in ch.columns and "v" not in ch.columns
    types = {(r["k"], r["_change_type"], r["value"]) for r in ch.collect()}
    assert (1, "insert", 9.0) in types and (1, "delete", 1.0) in types


def test_ddl_conflicts_with_concurrent_writer(spark, tmp_path):
    """A writer whose base predates the rename must retry (it staged
    physical names from a stale mapping)."""
    lake = _lake(tmp_path)
    _seed(spark, lake)
    base, data_dir = lake._next_data_dir("silver", "t")
    entry = lake._stage_overwrite_partitions(
        _df(spark, [(7, 7.0, "a")]), "silver", "t", "d", data_dir,
    )
    lake.rename_column(spark, "silver", "t", "v", "value")  # lands first
    with pytest.raises(ConcurrentWriteError):
        lake._commit("silver", "t", entry, base)


def test_mor_paths_respect_mapping(spark, tmp_path):
    lake = _lake(tmp_path)
    _seed(spark, lake)
    lake.rename_column(spark, "silver", "t", "v", "value")
    lake.merge_into(
        spark, "silver", "t",
        spark.createDataFrame([(2, 22.0, "a")], "k int, value double, d string"),
        key="k", partition_col="d", mode="merge_on_read",
    )
    got = {r["k"]: r["value"] for r in lake.read(spark, "silver", "t").collect()}
    assert got[2] == 22.0
    assert lake.delete_where(
        spark, "silver", "t", F.col("value") == 22.0,
        partition_col="d", mode="merge_on_read",
    )
    assert 2 not in {
        r["k"] for r in lake.read(spark, "silver", "t").collect()
    }


def test_add_column_default_fills_only_pre_add_rows(spark, tmp_path):
    """Rows written before the add read the default; rows written
    after store real values — including genuine NULLs."""
    lake = _lake(tmp_path)
    _seed(spark, lake)
    lake.add_column(spark, "silver", "t", "lang", "string", default="und")
    out = lake.read(spark, "silver", "t")
    assert all(r["lang"] == "und" for r in out.collect())
    # post-add write: real value and a genuine NULL
    lake.append(
        spark.createDataFrame(
            [(4, 4.0, "b", "en"), (5, 5.0, "b", None)],
            "k int, v double, d string, lang string",
        ),
        "silver", "t",
    )
    got = {r["k"]: r["lang"] for r in lake.read(spark, "silver", "t").collect()}
    assert got[1] == "und" and got[4] == "en" and got[5] is None


def test_add_column_time_travel_and_restore(spark, tmp_path):
    lake = _lake(tmp_path)
    _seed(spark, lake)                                          # v0
    lake.add_column(spark, "silver", "t", "score", "double", default=0.5)
    assert "score" not in lake.read(spark, "silver", "t", version=0).columns
    assert {r["score"] for r in lake.read(spark, "silver", "t").collect()} \
        == {0.5}
    lake.restore("silver", "t", 0)
    assert "score" not in lake.read(spark, "silver", "t").columns


def test_add_then_rename_then_write(spark, tmp_path):
    lake = _lake(tmp_path)
    _seed(spark, lake)
    lake.add_column(spark, "silver", "t", "score", "double", default=0.0)
    lake.rename_column(spark, "silver", "t", "score", "quality")
    assert {r["quality"] for r in lake.read(spark, "silver", "t").collect()} \
        == {0.0}
    lake.append(
        spark.createDataFrame(
            [(6, 6.0, "b", 0.9)], "k int, v double, d string, quality double"
        ),
        "silver", "t",
    )
    got = {r["k"]: r["quality"]
           for r in lake.read(spark, "silver", "t").collect()}
    assert got[6] == 0.9 and got[1] == 0.0


def test_add_column_guards(spark, tmp_path):
    lake = _lake(tmp_path)
    _seed(spark, lake)
    with pytest.raises(ValueError, match="already exists"):
        lake.add_column(spark, "silver", "t", "v", "double")
    lake.drop_column(spark, "silver", "t", "v")
    with pytest.raises(ValueError, match="retired"):
        lake.add_column(spark, "silver", "t", "v", "double")
    with pytest.raises(ValueError, match="JSON scalar"):
        lake.add_column(spark, "silver", "t", "m", "string", default=[1])


def test_read_where_and_cdc_see_added_default(spark, tmp_path):
    lake = _lake(tmp_path)
    _seed(spark, lake)                                          # v0
    lake.add_column(spark, "silver", "t", "lang", "string", default="und")
    got = lake.read_where(spark, "silver", "t", [("k", "<=", 2)])
    assert {r["lang"] for r in got.collect()} == {"und"}
    lake.overwrite_partitions(
        spark.createDataFrame(
            [(3, 33.0, "b", "es")], "k int, v double, d string, lang string"
        ),
        "silver", "t", partition_col="d",
    )
    ch = lake.read_changes(spark, "silver", "t", from_version=1)
    rows = {(r["k"], r["_change_type"], r["lang"]) for r in ch.collect()}
    assert (3, "insert", "es") in rows and (3, "delete", "und") in rows
