"""dsum's r13 micro-unit accumulation must stay bit-identical to the
DECIMAL(25,6) form it replaced: per row, round(v·10⁶) half-up equals
the decimal cast's unscaled value (both round the double's shortest
decimal representation), and the per-group decimal-division finisher
reproduces the exact DECIMAL→DOUBLE cast.  Locked here per consumer
column so a future data change that breaks the ≤6-dp premise fails
loudly instead of drifting the oracle hash."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.operators.relational import (
    dsum,
    dsum_decimal,
    micro_units,
)

COLUMNS = [
    ("events", "value"),
    ("lineitem", "l_quantity"),
    ("lineitem", "l_extendedprice"),
    ("lineitem", "l_discount"),
    ("lineitem", "l_extendedprice * (1 - l_discount)"),
    ("customer", "c_acctbal"),
    ("orders", "o_totalprice"),
]


@pytest.mark.parametrize("table,expr", COLUMNS, ids=[f"{t}:{i}" for i, (t, _c) in enumerate(COLUMNS)])
def test_micro_units_match_decimal_cast_per_row(spark, sf_dir, table, expr):
    col = F.expr(expr)
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    dec = (col.cast("decimal(25,6)") * 1_000_000).cast("long")
    bad = (
        df.select(dec.alias("d"), micro_units(col).alias("m"))
        .filter("d IS DISTINCT FROM m")
        .count()
    )
    assert bad == 0


def test_dsum_matches_decimal_form_grouped(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = ev.groupBy("event_type").agg(dsum("value").alias("s")).collect()
    b = ev.groupBy("event_type").agg(dsum_decimal("value").alias("s")).collect()
    am = {r["event_type"]: r["s"] for r in a}
    bm = {r["event_type"]: r["s"] for r in b}
    assert am.keys() == bm.keys()
    import struct

    for k in am:
        assert struct.pack("<d", am[k]) == struct.pack("<d", bm[k]), k


def test_dsum_empty_and_all_null(spark):
    df = spark.range(3).select(
        F.lit(None).cast("double").alias("v"), (F.col("id") % 2).alias("g")
    )
    rows = df.groupBy("g").agg(dsum("v").alias("s")).collect()
    assert all(r["s"] is None for r in rows)
    empty = spark.range(0).select(F.col("id").cast("double").alias("v"))
    assert empty.agg(dsum("v").alias("s")).collect()[0]["s"] is None


def test_dsum_nan_inf_match_decimal_semantics(spark):
    import math

    import pyspark.sql.functions as F

    rows = [(0, 1.5), (0, float("nan")), (1, float("inf")),
            (1, 2.0), (2, float("nan"))]
    df = spark.createDataFrame(rows, "g int, v double")
    a = {r["g"]: r["s"] for r in df.groupBy("g").agg(dsum("v").alias("s")).collect()}
    b = {r["g"]: r["s"] for r in df.groupBy("g").agg(dsum_decimal("v").alias("s")).collect()}
    assert a == b  # NaN/Inf → NULL on both paths; all-NaN group → NULL
    assert a[0] == 1.5 and a[1] == 2.0 and a[2] is None
