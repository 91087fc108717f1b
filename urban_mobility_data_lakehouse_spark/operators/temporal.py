"""Temporal join operators Spark lacks natively (SURVEY.md §2.3 notes
the reference has none either — these are the beyond-reference ops a
time-series/training-data pipeline needs).

`asof_join` — "most recent right row at or before each left row" — is
built as union → single window fill → filter, NOT as an inequality
join.  Why: a range/theta join in Spark plans as a broadcast nested
loop (right side must fit in memory) or an exploded sort-merge; the
union form costs exactly ONE shuffle on the join keys, streams through
a single sort per partition, and never materializes candidate pairs.
That is the plan you want when both sides are 100 TB-scale: shuffle
volume = |left| + |right|, state = one row of carried payload.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .relational import dsum


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: Sequence[str] | None = None,
) -> DataFrame:
    """Backward as-of LEFT join: every left row gains the payload of the
    latest right row with right_ts <= left_ts (per `on` key group),
    or NULLs when no prior right row exists.

    Ties at equal timestamps match (>= semantics, like DuckDB
    `ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts`).  Right rows
    should be unique per (on, right_ts); pre-aggregate if not.
    """
    on = list(on)
    payload = list(
        payload
        if payload is not None
        else [c for c in right.columns if c not in on and c != right_ts]
    )
    left_cols = left.columns

    # All payload columns ride in ONE struct so the fill picks them up
    # atomically from the same matched right row — filling each column
    # independently would mix values across right rows whenever a
    # payload value is legitimately NULL (DuckDB ASOF JOIN semantics:
    # the whole right row matches, NULLs included).
    r_types = dict(right.dtypes)
    payload_ddl = "struct<" + ",".join(
        f"`{p}`:{r_types[p]}" for p in payload
    ) + ">"
    l = left.select(
        *left_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(True).alias("_is_left"),
        F.lit(None).cast(payload_ddl).alias("_payload"),
    )
    l_types = dict(left.dtypes)
    r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(False).alias("_is_left"),
        F.struct(*payload).alias("_payload"),
        *[
            F.lit(None).cast(l_types[c]).alias(c)
            for c in left_cols
            if c not in on
        ],
    )

    # rights sort before lefts at equal _ts so ">=" ties are visible to
    # the fill; left rows carry a NULL payload struct so
    # last(ignorenulls) can only ever pick up right-row structs.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).select(
        *left_cols,
        "_is_left",
        F.last("_payload", ignorenulls=True).over(w).alias("_f"),
    )
    return (
        filled.filter(F.col("_is_left"))
        .select(
            *left_cols,
            *[F.col(f"_f.{p}").alias(p) for p in payload],
        )
    )


def range_join_agg(
    facts: DataFrame,
    tiers: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Band/range join: facts matched to the tier whose [lo, hi) range
    contains `value_col`, then aggregated per tier.

    The tier table is tiny and broadcast → BroadcastNestedLoopJoin with
    the range predicate evaluated in codegen; at 100 TB this is a pure
    map-side lookup (no shuffle until the final small agg).
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (
        F.col(value_col) < F.col(hi_col)
    )
    return (
        facts.join(F.broadcast(tiers), cond, "inner")
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(dsum(F.col(value_col)), 4).alias("total_value"),
        )
        .orderBy("tier")
    )


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_minutes: int = 60,
) -> DataFrame:
    """Point-in-interval join where BOTH sides are large — the case
    `range_join_agg`'s broadcast strategy cannot serve.

    Strategy: time is cut into fixed `bin_minutes` bins; every interval
    row is replicated to each bin it overlaps (sequence+explode), every
    point carries its single containing bin, and the match becomes an
    EQUI-join on (keys…, bin) with the exact inclusive
    `start <= t <= end` predicate applied afterwards.  Because a point
    lives in exactly ONE bin, each qualifying (point, interval) pair
    meets exactly once — no dedup pass.

    Scale properties: shuffle volume is |points| + Σ(interval length /
    bin width) — choose bins on the order of typical interval length so
    replication stays O(1) per interval; the plan is a plain shuffled
    equi-join (no BroadcastNestedLoopJoin, no cartesian fallback), so
    it partitions, spills, and AQE-balances like any other join.

    Column names must be disjoint apart from `on` (rename before
    calling); timestamps may be TIMESTAMP or TIMESTAMP_NTZ.
    """
    on = list(on)
    overlap = set(points.columns) & set(intervals.columns) - set(on)
    if overlap:
        raise ValueError(
            f"interval_point_join: ambiguous columns {sorted(overlap)} — "
            "rename so only the join keys are shared"
        )
    w_us = bin_minutes * 60 * 1_000_000
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    p = points.withColumn("_bin", F.floor(us(point_ts) / F.lit(w_us)))
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(us(start_col) / F.lit(w_us)),
                F.floor(us(end_col) / F.lit(w_us)),
            )
        ),
    )
    exact = (F.col(point_ts) >= F.col(start_col)) & (
        F.col(point_ts) <= F.col(end_col)
    )
    return p.join(i, on + ["_bin"], "inner").filter(exact).drop("_bin")
