"""Snapshot manifest export (Delta symlink-manifest / Iceberg
metadata-files analog): `export_manifest` hands an EXTERNAL engine the
exact file list + reconstruction metadata for a version, and the
contract test is literal — DuckDB replays the manifest with no access
to the commit log and must match `read()` row-for-row.
"""

from __future__ import annotations

import os

import duckdb
import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.sources.lakehouse import (
    Lakehouse,
    ManifestExportError,
)


@pytest.fixture()
def lake(tmp_path):
    lk = Lakehouse(str(tmp_path / "lake"))
    lk.create_schemas("silver")
    return lk


def _seed(spark, lake, name="t"):
    df = spark.range(0, 200).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("p"),
        (F.col("id") * 2).alias("v"),
    )
    lake.overwrite_partitions(df, "silver", name, partition_col="p")
    return df


def _duckdb_replay(manifest) -> list[tuple]:
    """Reconstruct the logical table from the manifest alone — the
    code an external engine would run.  Returns sorted (id, p, v)."""
    con = duckdb.connect()
    assert manifest["files"], "manifest listed no files"

    def project(rel):
        cols = []
        for c in rel.columns:
            if c in manifest["dropped_physical_columns"]:
                continue
            if c in manifest["hidden_partition_columns"]:
                continue
            logical = manifest["column_mapping"].get(c, c)
            cols.append(f'"{c}" AS "{logical}"')
        return con.sql(f"SELECT {', '.join(cols)} FROM rel").df()

    frames = []
    if manifest["hive_files"]:
        rel = con.sql(
            "SELECT * FROM read_parquet($files, hive_partitioning=true,"
            " union_by_name=true)",
            params={"files": manifest["hive_files"]},
        )
        frames.append(project(rel))
    if manifest["flat_files"]:
        rel = con.sql(
            "SELECT * FROM read_parquet($files, hive_partitioning=false,"
            " union_by_name=true)",
            params={"files": manifest["flat_files"]},
        )
        frames.append(project(rel))
    import pandas as pd

    df = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
    for a in manifest["added_null_columns"]:
        if a["column"] not in df.columns:
            df[a["column"]] = None
    df = df[sorted(df.columns)]
    return [tuple(r) for r in df.itertuples(index=False)]


def _spark_rows(df) -> list[tuple]:
    cols = sorted(df.columns)
    pdf = df.select(*cols).toPandas()
    return [tuple(r) for r in pdf.itertuples(index=False)]


def _assert_replay_matches(spark, lake, name="t", version=None):
    manifest = lake.export_manifest("silver", name, version=version)
    got = _duckdb_replay(manifest)
    want_df = lake.read(spark, "silver", name, version=version)
    # hive partition values come back typed by DuckDB's inference;
    # compare on string-normalized frames
    want = _spark_rows(
        want_df.select(
            *[F.col(c).cast("string") for c in sorted(want_df.columns)]
        )
    )
    got = sorted(tuple(str(x) for x in r) for r in got)
    want = sorted(tuple(str(x) for x in r) for r in want)
    assert got == want
    return manifest


def test_export_matches_read_roundtrip(spark, lake):
    _seed(spark, lake)
    m = _assert_replay_matches(spark, lake)
    assert m["version"] == 0
    assert m["hive_partition_columns"] == ["p"]
    # written sidecar exists and is the same object
    sidecar = os.path.join(
        lake.root, "silver", "t", "_manifests", "v00000000.json"
    )
    assert os.path.exists(sidecar)


def test_export_pins_old_version_after_new_commits(spark, lake):
    _seed(spark, lake)
    lake.append(
        spark.range(1000, 1010).select(
            F.col("id"),
            F.lit("9").alias("p"),
            (F.col("id") * 2).alias("v"),
        ),
        "silver", "t",
    )
    m0 = _assert_replay_matches(spark, lake, version=0)
    m1 = _assert_replay_matches(spark, lake, version=1)
    assert m0["version"] == 0 and m1["version"] == 1
    assert set(m0["files"]) < set(m1["files"])


def test_export_refuses_live_deletion_vectors_until_compact(spark, lake):
    _seed(spark, lake)
    lake.delete_where(
        spark, "silver", "t",
        F.col("id").between(10, 19),
        partition_col="p",
        mode="merge_on_read",
    )
    with pytest.raises(ManifestExportError, match="deletion-vector"):
        lake.export_manifest("silver", "t")
    # the pre-DV version is still exportable
    _assert_replay_matches(spark, lake, version=0)
    lake.compact(spark, "silver", "t", partition_col="p")
    _assert_replay_matches(spark, lake)


def test_export_refuses_additive_exclusions_until_compact(spark, lake):
    # append-built table, then a CoW delete supersedes rows INSIDE the
    # append dir -> exclusions appear -> unexportable until compact
    for lo in (0, 100):
        lake.append(
            spark.range(lo, lo + 100).select(
                F.col("id"),
                (F.col("id") % 4).cast("string").alias("p"),
                (F.col("id") * 2).alias("v"),
            ),
            "silver", "t",
        )
    lake.delete_where(
        spark, "silver", "t", F.col("id") < 50, partition_col="p"
    )
    with pytest.raises(ManifestExportError, match="exclusion"):
        lake.export_manifest("silver", "t")
    lake.compact(spark, "silver", "t", partition_col="p")
    _assert_replay_matches(spark, lake)


def test_export_carries_column_mapping(spark, lake):
    _seed(spark, lake)
    lake.rename_column(spark, "silver", "t", "v", "value2")
    m = _assert_replay_matches(spark, lake)
    assert "value2" in m["column_mapping"].values()


def test_export_after_drop_column(spark, lake):
    _seed(spark, lake)
    lake.drop_column(spark, "silver", "t", "v")
    m = _assert_replay_matches(spark, lake)
    assert m["dropped_physical_columns"] == ["v"]


def test_export_null_default_add_ok_nonnull_refused(spark, lake):
    _seed(spark, lake)
    lake.add_column(spark, "silver", "t", "note", "string")
    _assert_replay_matches(spark, lake)
    lake.add_column(
        spark, "silver", "t", "grade", "string", default="x"
    )
    with pytest.raises(ManifestExportError, match="default"):
        lake.export_manifest("silver", "t")


def test_export_vacuumed_version_refuses(spark, lake):
    df = _seed(spark, lake)
    lake.overwrite_partitions(
        df.withColumn("v", F.col("v") + 1), "silver", "t",
        partition_col="p",
    )
    lake.vacuum("silver", "t", keep_version=1, grace_seconds=0.0)
    with pytest.raises(FileNotFoundError):
        lake.export_manifest("silver", "t", version=0)
    _assert_replay_matches(spark, lake)  # latest still exact
