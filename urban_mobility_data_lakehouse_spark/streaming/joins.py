"""Watermarked stream-stream joins (Structured Streaming).

The attribution-join shape: every click event joined to the same
user's purchases landing within `horizon` AFTER the click.  Both
sides are unbounded streams, so the join buffers state; correctness
and boundedness come from the two constraints Spark requires:

  * a watermark on BOTH event-time columns — late rows beyond it are
    dropped, and
  * an event-time inequality bounding how far apart matching rows can
    be — state for a row is evicted once the other side's watermark
    passes its horizon, so state size is O(rate × horizon), never
    O(history).

At 100 TB/day this is the only join shape that survives: an
unconstrained stream-stream equi-join would buffer both streams
forever.  Batch twin for the oracle check: the same inequality join
on the static frames (tests/test_streaming.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "click_ts",
    right_ts: str = "purchase_ts",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """left ⋈ right on `key` with right_ts ∈ [left_ts, left_ts+horizon].

    Works identically on streaming and batch frames: watermarks are
    no-ops in batch, so the batch call IS the differential oracle for
    the streaming one.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (
            rw[right_ts]
            <= lw[left_ts] + F.expr(f"INTERVAL {horizon}")
        )
    )
    # every carried column is QUALIFIED to its side (lw[c]/rw[c]):
    # bare names raise AMBIGUOUS_REFERENCE the moment both inputs
    # share any column beyond the key/ts pair.  Columns present on
    # BOTH sides are suffixed _left/_right — selecting both under one
    # name would defer the ambiguity to the first downstream
    # select-by-name instead of fixing it.
    lcols = [c for c in left.columns if c not in (key, left_ts)]
    rcols = [c for c in right.columns if c not in (key, right_ts)]
    # a name is shared when it would appear twice in the output: both
    # carry-lists, a carry colliding with the OTHER side's ts output,
    # or the two ts columns themselves sharing one name
    shared = (
        ({c for c in lcols if c in rcols})
        | ({left_ts} & set(rcols))
        | ({right_ts} & set(lcols))
        | ({left_ts} if left_ts == right_ts else set())
    )
    lname = lambda c: f"{c}_left" if c in shared else c  # noqa: E731
    rname = lambda c: f"{c}_right" if c in shared else c  # noqa: E731
    return lw.join(rw, cond, "inner").select(
        lw[key].alias(key),
        lw[left_ts].alias(lname(left_ts)),
        rw[right_ts].alias(rname(right_ts)),
        *[lw[c].alias(lname(c)) for c in lcols],
        *[rw[c].alias(rname(c)) for c in rcols],
    )


def enrich_with_dim(
    events: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    dim_key: str = "c_custkey",
    dim_cols: tuple[str, ...] = ("c_name", "c_nationkey"),
) -> DataFrame:
    """Stream-static enrichment: broadcast-join a (possibly streaming)
    events frame against a static dimension.

    The workhorse production streaming shape: the static side is
    broadcast to every task, so the stream never shuffles and no join
    state accumulates — each micro-batch is a map-side hash join.  At
    100 TB/day stream rates the only requirement is that the dim stays
    broadcast-sized.  Left join so unknown keys survive with NULL
    attributes (audit them downstream, never drop).

    Slowly-changing dims: a FILE-backed static frame pins its file
    listing at DataFrame creation, so dim updates are NOT picked up by
    later micro-batches of a running query — re-resolve the dim inside
    `foreachBatch` (or restart the query) when the dimension changes.

    Works identically on batch frames, which is the differential
    oracle (tests/test_streaming.py).
    """
    right = F.broadcast(
        dim.select(F.col(dim_key).alias(key), *dim_cols)
    )
    return events.join(right, key, "left")


def clicks_purchases(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split an events frame (streaming or batch) into the two sides
    of the attribution join."""
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    return clicks, purchases
