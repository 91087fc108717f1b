"""Temporal/multi-dimensional operators beyond the reference's surface:
as-of join, broadcast range join, ROLLUP/CUBE grouping — each with a
DuckDB oracle (DuckDB has native ASOF JOIN and ROLLUP, so the oracles
are first-class SQL, not emulations).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.relational import dsum
from ..operators.temporal import asof_join, range_join_agg
from ..sources.testdata import load_table
from . import register


@register(
    "asof_join_clicks",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, event_id
        FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT user_id, ts, max(value) AS purchase_value
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
    )
    SELECT c.user_id,
           c.event_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           strftime(p.purchase_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           p.purchase_value
    FROM clicks c
    ASOF LEFT JOIN (
        SELECT user_id, ts AS purchase_ts, purchase_value FROM purchases
    ) p ON c.user_id = p.user_id AND c.ts >= p.purchase_ts
    ORDER BY c.user_id, c.ts, c.event_id
    """,
    tags=("asof", "temporal", "join"),
    bench=True,
)
def asof_join_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/temporal.asof_join): every click event
    gains the latest prior-or-equal purchase of the same user.  The
    Spark plan is union + one window fill — one shuffle, no candidate
    explosion; the oracle is DuckDB's native ASOF LEFT JOIN."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
        .select(
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "purchase_value",
        )
    )
    joined = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="purchase_ts",
        payload=["purchase_ts", "purchase_value"],
    )
    return joined.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias(
            "purchase_ts"
        ),
        "purchase_value",
    ).orderBy("user_id", "click_ts", "event_id")


@register(
    "range_join_tiers",
    oracle="""
    WITH tiers(tier, lo, hi) AS (
        VALUES ('low', 0.0, 50.0),
               ('mid', 50.0, 200.0),
               ('high', 200.0, 1e9)
    )
    SELECT tier,
           count(*) AS n_rows,
           round(CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE), 4)
               AS total_value
    FROM events e JOIN tiers t
      ON e.value >= t.lo AND e.value < t.hi
    GROUP BY tier
    ORDER BY tier
    """,
    tags=("range-join", "join"),
)
def range_join_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast range (band) join: events bucketed by value tier
    through a non-equi predicate against a broadcast 3-row dim."""
    events = load_table(spark, sf_dir, "events")
    from ..sources.localrel import values_df

    tiers = values_df(
        spark,
        [("low", 0.0, 50.0), ("mid", 50.0, 200.0), ("high", 200.0, 1e9)],
        "tier string, lo double, hi double",
    )
    return range_join_agg(events, tiers, "value")


@register(
    "grouping_sets_suite",
    oracle="""
    SELECT * FROM (
        SELECT 'rollup' AS part,
               coalesce(event_type, 'ALL') AS event_type,
               coalesce(strftime(CAST(ts AS DATE), '%Y-%m-%d'), 'ALL')
                   AS grp_key,
               GROUPING(event_type) + 2 * GROUPING(CAST(ts AS DATE))
                   AS grouping_id,
               count(*) AS n_events,
               CAST(NULL AS DOUBLE) AS total_value
        FROM events
        GROUP BY ROLLUP(event_type, CAST(ts AS DATE))
        UNION ALL
        SELECT 'cube',
               coalesce(event_type, 'ALL'),
               coalesce(CAST(isodow(ts) AS VARCHAR), 'ALL'),
               CAST(NULL AS BIGINT),
               count(*),
               round(CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE), 4)
        FROM events
        GROUP BY CUBE(event_type, isodow(ts))
    )
    ORDER BY part, event_type, grp_key, grouping_id
    """,
    tags=("rollup", "cube", "grouping-sets", "A1"),
)
def grouping_sets_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP + CUBE grouping-set coverage in one labeled union (the
    former rollup_daily and cube_type_day rows, folded to free driver
    slots) — absent from the reference (SURVEY §2.4 'Absent') but part
    of a complete aggregation surface; Spark and DuckDB agree on
    grouping-id semantics bit-for-bit.

    `rollup`: hierarchy (type, date) → (type) → () with GROUPING()
    flags; Spark nulls trailing columns first (same as DuckDB), so
    grouping_id is 0 (leaf), 2 (per-type), 3 (grand total).
    `cube`: all four grouping sets over (event_type, ISO weekday) in
    one pass; ISO dow (Mon=1..Sun=7) via weekday()+1 to match DuckDB's
    isodow (SURVEY §2.8 numbering pitfall)."""
    events = load_table(spark, sf_dir, "events")
    # grouping() must reference plain grouping columns — pre-project
    # (aliased expressions inside rollup() break its resolution)
    base = events.select(
        "event_type", F.to_date("ts").alias("event_date")
    )
    rollup_part = (
        base.rollup("event_type", "event_date")
        .agg(
            (
                F.grouping("event_type")
                + F.lit(2) * F.grouping("event_date")
            ).cast("long").alias("grouping_id"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.lit("rollup").alias("part"),
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(
                F.date_format("event_date", "yyyy-MM-dd"), F.lit("ALL")
            ).alias("grp_key"),
            "grouping_id",
            "n_events",
            F.lit(None).cast("double").alias("total_value"),
        )
    )
    cube_part = (
        events.cube(
            F.col("event_type").alias("event_type"),
            (F.weekday("ts") + 1).alias("iso_dow"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(dsum("value"), 4).alias("total_value"),
        )
        .select(
            F.lit("cube").alias("part"),
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(
                F.col("iso_dow").cast("string"), F.lit("ALL")
            ).alias("grp_key"),
            F.lit(None).cast("long").alias("grouping_id"),
            "n_events",
            "total_value",
        )
    )
    return rollup_part.unionByName(cube_part).orderBy(
        "part", "event_type", "grp_key", "grouping_id"
    )
