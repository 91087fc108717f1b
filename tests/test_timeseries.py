"""Gap-fill semantics (functions/timeseries.py): LOCF and linear
interpolation on a densified grid — leading, interior, and trailing
gaps, exact interpolation fractions, multi-key isolation."""

from __future__ import annotations

import pyspark.sql.functions as F

from urban_mobility_data_lakehouse_spark.functions.timeseries import (
    densify,
    with_fill_columns,
)


def _series(spark, rows):
    return spark.createDataFrame(rows, "k string, t int, v double")


def _fill(spark, rows, n=8):
    spine = spark.range(n).select(F.col("id").cast("int").alias("t"))
    dense = densify(_series(spark, rows), spine, keys=["k"], time_col="t")
    out = with_fill_columns(
        dense, keys=["k"], order_col="t", index_col="t", value_col="v"
    )
    return {
        (r["k"], r["t"]): (r["v"], r["locf"], r["interp"])
        for r in out.collect()
    }


def test_interior_gap_interpolates_exact_fractions(spark):
    got = _fill(spark, [("a", 1, 10.0), ("a", 4, 40.0)])
    assert got[("a", 2)] == (None, 10.0, 20.0)   # 1/3 of the way
    assert got[("a", 3)] == (None, 10.0, 30.0)   # 2/3
    assert got[("a", 1)] == (10.0, 10.0, 10.0)   # observed rows unchanged
    assert got[("a", 4)] == (40.0, 40.0, 40.0)


def test_leading_gap_backfills_trailing_carries_forward(spark):
    got = _fill(spark, [("a", 2, 5.0), ("a", 5, 8.0)], n=8)
    # leading: locf has nothing yet; interp backfills from the first obs
    assert got[("a", 0)] == (None, None, 5.0)
    assert got[("a", 1)] == (None, None, 5.0)
    # trailing: both carry the last observation forward
    assert got[("a", 6)] == (None, 8.0, 8.0)
    assert got[("a", 7)] == (None, 8.0, 8.0)


def test_keys_fill_independently(spark):
    got = _fill(
        spark,
        [("a", 0, 1.0), ("a", 3, 4.0), ("b", 1, 100.0)],
        n=4,
    )
    assert got[("a", 1)] == (None, 1.0, 2.0)
    assert got[("a", 2)] == (None, 1.0, 3.0)
    # b's gaps never see a's values
    assert got[("b", 0)] == (None, None, 100.0)
    assert got[("b", 3)] == (None, 100.0, 100.0)


def test_all_null_series_stays_null(spark):
    got = _fill(spark, [("a", 1, None)], n=3)
    assert all(vals == (None, None, None) for vals in got.values())


def test_fill_plan_is_pure_window_no_python(spark):
    spine = spark.range(5).select(F.col("id").cast("int").alias("t"))
    dense = densify(
        _series(spark, [("a", 1, 1.0)]), spine, keys=["k"], time_col="t"
    )
    out = with_fill_columns(
        dense, keys=["k"], order_col="t", index_col="t", value_col="v"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    # both anchor windows (backward locf/prev, forward next) stack on
    # ONE sort+exchange: no re-shuffle between the two Window nodes
    first = plan.index("Window [")
    second = plan.index("Window [", first + 1)
    assert "Exchange" not in plan[first:second]
