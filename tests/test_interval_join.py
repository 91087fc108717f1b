"""Binned big-big point-in-interval join (operators/temporal.py
`interval_point_join`): exact equality with the naive theta join, and
an equi-join physical plan (no nested-loop / cartesian fallback)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.operators.temporal import (
    interval_point_join,
)
from urban_mobility_data_lakehouse_spark.sources.testdata import load_table
from urban_mobility_data_lakehouse_spark.streaming.sessions import sessionize


def _sessions(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    sessions = sessionize(events).select(
        "user_id", "session_no", "session_start", "session_end"
    )
    return events, sessions


def test_matches_naive_theta_join(spark, sf_dir):
    events, sessions = _sessions(spark, sf_dir)
    binned = interval_point_join(
        events.select("user_id", "event_id", "ts"),
        sessions,
        on=["user_id"],
        point_ts="ts",
        start_col="session_start",
        end_col="session_end",
        bin_minutes=60,
    )
    s = sessions.withColumnRenamed("user_id", "s_user_id")
    naive = (
        events.select("user_id", "event_id", "ts")
        .join(
            s,
            (F.col("user_id") == F.col("s_user_id"))
            & (F.col("ts") >= F.col("session_start"))
            & (F.col("ts") <= F.col("session_end")),
        )
        .select("user_id", "event_id", "ts", "session_no")
    )
    key = lambda r: (  # noqa: E731
        r["user_id"], r["event_id"], r["session_no"]
    )
    got = sorted(key(r) for r in binned.collect())
    want = sorted(key(r) for r in naive.collect())
    assert got == want
    # sessions partition their events: every event matches exactly once
    assert len(got) == events.count()


def test_bin_width_does_not_change_result(spark, sf_dir):
    events, sessions = _sessions(spark, sf_dir)
    args = dict(
        on=["user_id"], point_ts="ts",
        start_col="session_start", end_col="session_end",
    )
    pts = events.select("user_id", "event_id", "ts")
    a = interval_point_join(pts, sessions, bin_minutes=7, **args)
    b = interval_point_join(pts, sessions, bin_minutes=24 * 60, **args)
    key = lambda r: (r["user_id"], r["event_id"], r["session_no"])  # noqa: E731
    assert sorted(key(r) for r in a.collect()) == sorted(
        key(r) for r in b.collect()
    )


def test_plan_is_equi_join_not_nested_loop(spark, sf_dir):
    events, sessions = _sessions(spark, sf_dir)
    out = interval_point_join(
        events.select("user_id", "event_id", "ts"),
        sessions,
        on=["user_id"],
        point_ts="ts",
        start_col="session_start",
        end_col="session_end",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_ambiguous_columns_rejected(spark, sf_dir):
    events, sessions = _sessions(spark, sf_dir)
    with pytest.raises(ValueError, match="ambiguous"):
        interval_point_join(
            events.select("user_id", "ts", F.col("value").alias("session_no")),
            sessions,
            on=["user_id"],
            point_ts="ts",
            start_col="session_start",
            end_col="session_end",
        )
