"""Gap-based sessionization — batch (gaps-and-islands) and stateful
streaming (`applyInPandasWithState`) forms of the same operator.

The reference has no streaming at all (SURVEY.md §2.9); this is the
beyond-reference custom stateful operator the 100 TB event pipeline
needs.  Semantics: consecutive events of one user belong to the same
session while the gap between them is ≤ `gap_minutes`.

Batch form: two window passes (lag → running sum of break flags) then a
grouped aggregate — pure Catalyst, one shuffle on user_id that both
windows and the final groupBy reuse (same partitioning, no extra
exchange).  Oracle-checkable in ANSI SQL.

Streaming form: `groupBy(user_id).applyInPandasWithState` with one
state row per user (open-session accumulator).  State is bounded by
|active users|, not event volume; Arrow moves batches, pandas closes
sessions per group.  Its single-batch output equals the batch operator
on the same data, which is exactly what the test asserts.
"""

from __future__ import annotations

from typing import Any, Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.relational import dsum

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_no", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("session_no", LongType()),
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch gaps-and-islands sessionization over (user_id, ts)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag(F.col("ts")).over(w)
    # cast-to-timestamp makes the gap test tolerant of TIMESTAMP_NTZ
    # inputs (unix_micros rejects NTZ); a no-op on TimestampType.
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    brk = F.when(
        prev.isNull() | (us(F.col("ts")) - us(prev) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        events.withColumn("brk", brk)
        .withColumn("session_no", F.sum("brk").over(run))
        .groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(dsum("value"), 4).alias("total_value"),
        )
        .orderBy("user_id", "session_no")
    )


SESSIONIZE_ORACLE = """
WITH flagged AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_us}
                THEN 1 ELSE 0 END AS brk
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
    SELECT *,
           SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_no
    FROM flagged
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE), 4)
           AS total_value
FROM numbered
GROUP BY user_id, session_no
ORDER BY user_id, session_no
"""


def _sessionize_group(
    key: tuple[Any, ...], pdfs: Iterator, state
) -> Iterator:
    """Per-user stateful session builder (runs inside Arrow workers).

    Carries the open session across micro-batches in GroupState; emits
    every session closed by this batch plus the still-open one (update
    semantics — later batches may extend and re-emit it).
    """
    import pandas as pd

    (user_id,) = key
    gap_us, out = 30 * 60 * 1_000_000, []
    if state.exists:
        sess_no, start_us, last_us, n_ev, total = state.get
    else:
        sess_no, start_us, last_us, n_ev, total = 0, None, None, 0, 0.0

    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, value in zip(pdf["ts"], pdf["value"]):
            t_us = int(pd.Timestamp(ts).value // 1000)
            if start_us is None:
                sess_no, start_us, last_us, n_ev, total = 1, t_us, t_us, 1, float(value)
            elif t_us - last_us > gap_us:
                out.append((sess_no, start_us, last_us, n_ev, total))
                sess_no, start_us, last_us, n_ev, total = (
                    sess_no + 1, t_us, t_us, 1, float(value),
                )
            else:
                last_us, n_ev, total = t_us, n_ev + 1, total + float(value)

    if start_us is not None:
        out.append((sess_no, start_us, last_us, n_ev, total))  # open session
        state.update((sess_no, start_us, last_us, n_ev, total))

    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(out),
            "session_no": [o[0] for o in out],
            "session_start": [pd.Timestamp(o[1], unit="us") for o in out],
            "session_end": [pd.Timestamp(o[2], unit="us") for o in out],
            "n_events": [o[3] for o in out],
            "total_value": [round(o[4], 4) for o in out],
        }
    )


def sessionize_stream(events_stream: DataFrame) -> DataFrame:
    """Stateful streaming sessionization (custom operator the built-in
    windowed aggs can't express: gap-defined, per-key dynamic windows)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events_stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
