"""Loaders for the driver-generated synthetic tables (TESTDATA.md).

Parity note: mirrors the reference's parquet scan + view registration
(S4, notebooks/1_sprint1_schema_prototyping.ipynb:1857 cell 19) —
`read_parquet(path)` + `CREATE VIEW` becomes `spark.read.parquet` +
`createOrReplaceTempView`.

The driver has regenerated `events.parquet` with different physical
timestamp types across rounds — TIMESTAMP(NANOS) (which Spark 4 only
reads via `spark.sql.legacy.parquet.nanosAsLong=true`, surfacing the
column as raw nanos) and plain `timestamp[us]` (which Spark 4 reads as
TIMESTAMP_NTZ).  `normalize_event_ts` absorbs every reading into one
session-TZ TimestampType column so downstream operators see the same
instants DuckDB does (session TZ is pinned UTC in session.py, so the
NTZ→timestamp cast is instant-exact).  Any future drift lands here —
one function, one fix.
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


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events timestamp to session-TZ TimestampType.

    Handles every physical reading the driver has shipped so far; works
    on batch and (pre-start) streaming DataFrames alike:

    - ``bigint`` (TIMESTAMP(NANOS) under ``nanosAsLong``): nanos →
      micros via integer division; truncation matches DuckDB, which
      also truncates nanos to micros on read.  (Double division would
      round-trip through a 53-bit mantissa and perturb ~13% of
      2023-era nanos by 1 µs.)
    - ``timestamp_ntz`` (``timestamp[us]`` in the parquet footer):
      cast to TimestampType — with the session TZ pinned to UTC the
      wall-clock reading becomes the identical instant DuckDB's naive
      timestamps represent.
    - ``timestamp``: already normal; no-op.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        df = df.withColumn(
            col, F.timestamp_micros(F.expr(f"{col} div 1000"))
        )
    elif dtype == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = None  # type: ignore[assignment]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table; normalizes the events timestamp.

    Memoized per (SparkSession, sf_dir, table): a DataFrame is an
    immutable logical plan, so handing the same object to every caller
    is safe — and each fresh `spark.read.parquet` costs a driver-side
    footer/schema read plus the runtime-conf sweep (~0.1-0.8 s,
    measured 30 calls ≈ 3.6 s across one bench run).  Keyed weakly by
    session so a stopped session's plans don't pin the JVM, and
    per-session so tests with their own SparkSessions never share
    plans across incompatible runtimes."""
    global _TABLE_CACHE
    import os
    import weakref

    if _TABLE_CACHE is None:
        _TABLE_CACHE = weakref.WeakKeyDictionary()
    try:
        per = _TABLE_CACHE.setdefault(spark, {})
    except TypeError:  # session not weakref-able (mock/stub)
        per = {}
    key = (os.path.abspath(sf_dir), name)
    df = per.get(key)
    if df is None:
        apply_runtime_confs(spark)
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            df = normalize_event_ts(df)
        per[key] = df
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


def fan_out(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the input is under-split for the
    session's core count.

    The local testdata parquet files are written as a SINGLE row group,
    so every scan is one input split and ALL map-side work before the
    first shuffle (explode/regex/hashing/partial agg) runs in one task
    — a local artifact, not a plan property.  On a production layout
    (many files, many row groups) the scan already has ≥ parallelism
    splits, the condition below is false, and this is a no-op — no
    extra exchange pollutes the 100 TB plan.

    Only apply upstream of ORDER-INDEPENDENT computation (row-local
    exprs, integer/DECIMAL aggregation): round-robin repartitioning
    reorders rows, which would perturb raw double summation.

    The split probe uses `inputFiles()` + file sizes (a driver-side
    file-index lookup, ~2 ms) rather than `df.rdd.getNumPartitions()`
    — the RDD conversion forces full analysis + physical planning of
    the plan through py4j (~60-300 ms per call, measured), which at 5
    bench call sites was real wall time.  Non-scan plans (no input
    files) skip the fan-out: the heuristic exists only for the
    single-row-group local-testdata scan shape.
    """
    import math
    import os

    spark = df.sparkSession
    target = partitions or spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files:
        return df
    raw = spark.conf.get(
        "spark.sql.files.maxPartitionBytes", "134217728b"
    ).lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
    mult, digits = 1, raw.rstrip("b")
    if digits and digits[-1] in units:
        mult, digits = units[digits[-1]], digits[:-1]
    try:
        max_split = int(digits) * mult
    except ValueError:
        max_split = 128 << 20
    splits = 0
    for f in files:
        p = f.removeprefix("file:")
        try:
            splits += max(1, math.ceil(os.path.getsize(p) / max_split))
        except OSError:
            splits += 1
    if splits >= min(target, 8):
        return df
    return df.repartition(target)
