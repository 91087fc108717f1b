"""Type widening (`Lakehouse.widen_column_type`) — Delta's
type-widening feature: value-preserving ALTER COLUMN TYPE as one
metadata commit over immutable narrow files.  What must hold: mixed
file generations surface as ONE wide column, values never change,
time travel shows the narrow past, RESTORE rolls it back, compaction
materializes the wide type, DML keeps working across the widen, the
lossy conversions are refused, and the manifest tells external
engines to cast."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.sources.lakehouse import Lakehouse


@pytest.fixture()
def lake(tmp_path):
    lk = Lakehouse(str(tmp_path / "lake"))
    lk.create_schemas("s")
    return lk


def _df(spark, lo, n, dtype="int"):
    return spark.range(lo, lo + n).select(
        F.col("id").cast("long"),
        (F.col("id") % 3).cast("string").alias("p"),
        (F.col("id") * 2).cast(dtype).alias("v"),
    )


def test_widen_mixes_generations_and_preserves_values(spark, lake):
    lake.overwrite_partitions(_df(spark, 0, 30), "s", "t",
                              partition_col="p")
    assert dict(lake.read(spark, "s", "t").dtypes)["v"] == "int"
    lake.widen_column_type(spark, "s", "t", "v", "bigint")
    # old int32 files + a new int64 append surface as one bigint col
    lake.append(_df(spark, 1000, 5, dtype="bigint"), "s", "t")
    out = lake.read(spark, "s", "t")
    assert dict(out.dtypes)["v"] == "bigint"
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got == {i: i * 2 for i in list(range(30)) + list(range(1000, 1005))}


def test_narrow_writer_after_widen_is_upcast_on_read(spark, lake):
    lake.overwrite_partitions(_df(spark, 0, 9), "s", "t",
                              partition_col="p")
    lake.widen_column_type(spark, "s", "t", "v", "double")
    lake.append(_df(spark, 100, 3, dtype="int"), "s", "t")  # narrow OK
    out = lake.read(spark, "s", "t")
    assert dict(out.dtypes)["v"] == "double"
    assert {r["v"] for r in out.filter("id >= 100").collect()} == {
        200.0, 202.0, 204.0,
    }


def test_time_travel_and_restore(spark, lake):
    lake.overwrite_partitions(_df(spark, 0, 9), "s", "t",
                              partition_col="p")
    lake.widen_column_type(spark, "s", "t", "v", "bigint")
    assert dict(lake.read(spark, "s", "t").dtypes)["v"] == "bigint"
    # version 0 predates the widen → narrow type
    assert dict(
        lake.read(spark, "s", "t", version=0).dtypes
    )["v"] == "int"
    lake.restore("s", "t", version=0)
    assert dict(lake.read(spark, "s", "t").dtypes)["v"] == "int"


def test_compact_materializes_wide_type(spark, lake):
    lake.overwrite_partitions(_df(spark, 0, 9), "s", "t",
                              partition_col="p")
    lake.widen_column_type(spark, "s", "t", "v", "bigint")
    before = {r["id"]: r["v"] for r in lake.read(spark, "s", "t").collect()}
    lake.compact(spark, "s", "t", partition_col="p")
    out = lake.read(spark, "s", "t")
    assert dict(out.dtypes)["v"] == "bigint"
    assert {r["id"]: r["v"] for r in out.collect()} == before


def test_dml_across_widen(spark, lake):
    """update_where's cast-back targets the CURRENT (widened) type;
    MoR deletes and CDC keep working over mixed generations."""
    lake.overwrite_partitions(_df(spark, 0, 30), "s", "t",
                              partition_col="p")
    lake.widen_column_type(spark, "s", "t", "v", "bigint")
    assert lake.update_where(
        spark, "s", "t", F.col("id") == 4, {"v": F.col("v") + 1},
        partition_col="p", mode="merge_on_read",
    )
    lake.delete_where(
        spark, "s", "t", F.col("id") == 5,
        partition_col="p", mode="merge_on_read",
    )
    got = {r["id"]: r["v"] for r in lake.read(spark, "s", "t").collect()}
    assert got[4] == 9 and 5 not in got
    assert dict(lake.read(spark, "s", "t").dtypes)["v"] == "bigint"


def test_widen_after_rename_tracks_physical_name(spark, lake):
    lake.overwrite_partitions(_df(spark, 0, 9), "s", "t",
                              partition_col="p")
    lake.rename_column(spark, "s", "t", "v", "v2")
    lake.widen_column_type(spark, "s", "t", "v2", "bigint")
    out = lake.read(spark, "s", "t")
    assert dict(out.dtypes)["v2"] == "bigint"
    assert {r["id"]: r["v2"] for r in out.collect()} == {
        i: i * 2 for i in range(9)
    }


def test_refusals(spark, lake):
    lake.overwrite_partitions(_df(spark, 0, 9, dtype="bigint"),
                              "s", "t", partition_col="p")
    # bigint→double is LOSSY (53-bit mantissa) — refused
    with pytest.raises(ValueError, match="cannot widen"):
        lake.widen_column_type(spark, "s", "t", "v", "double")
    # narrowing and no-ops are refused
    with pytest.raises(ValueError, match="cannot widen"):
        lake.widen_column_type(spark, "s", "t", "v", "int")
    # unknown column
    with pytest.raises(ValueError, match="no column"):
        lake.widen_column_type(spark, "s", "t", "nope", "bigint")
    # partition columns are load-bearing
    with pytest.raises(ValueError, match="partition column"):
        lake.widen_column_type(spark, "s", "t", "p", "bigint")


def test_manifest_records_widening_and_replay_casts(spark, lake):
    lake.overwrite_partitions(_df(spark, 0, 9), "s", "t",
                              partition_col="p")
    lake.widen_column_type(spark, "s", "t", "v", "bigint")
    man = lake.export_manifest("s", "t", write=False)
    assert man["widened_columns"] == {"v": "bigint"}
    # all files still narrow: an external replay must cast to match
    con = duckdb.connect()
    rel = con.sql(
        "SELECT id, CAST(v AS BIGINT) AS v FROM read_parquet($f, "
        "hive_partitioning=true, union_by_name=true) ORDER BY id",
        params={"f": man["hive_files"]},
    ).fetchall()
    spark_rows = [
        (r["id"], r["v"])
        for r in lake.read(spark, "s", "t").orderBy("id").collect()
    ]
    assert rel == spark_rows
