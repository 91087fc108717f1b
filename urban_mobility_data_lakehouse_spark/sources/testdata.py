"""Loaders for the driver-generated synthetic tables (TESTDATA.md).

Parity note: mirrors the reference's parquet scan + view registration
(S4, notebooks/1_sprint1_schema_prototyping.ipynb:1857 cell 19) —
`read_parquet(path)` + `CREATE VIEW` becomes `spark.read.parquet` +
`createOrReplaceTempView`.

`events.parquet` is written with TIMESTAMP(NANOS), which Spark 4 only
reads via `spark.sql.legacy.parquet.nanosAsLong=true` (surfacing the
column as raw nanos).  We rebuild a proper TimestampType column so every
downstream operator sees the same instants DuckDB does.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..session import apply_runtime_confs

TESTDATA_TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table; normalizes the events nanos timestamp."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos → micros via integer division; losing sub-microsecond
        # precision matches DuckDB, which also truncates nanos to micros
        # on read.  (Double division would round-trip through a 53-bit
        # mantissa and perturb ~13% of 2023-era nanos by 1 µs.)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TESTDATA_TABLES)}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None
) -> None:
    """Register each table as a temp view for spark.sql entry points."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
