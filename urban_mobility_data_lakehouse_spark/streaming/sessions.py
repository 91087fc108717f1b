"""Gap-based sessionization — batch (gaps-and-islands) and stateful
streaming (`applyInPandasWithState`) forms of the same operator.

The reference has no streaming at all (SURVEY.md §2.9); this is the
beyond-reference custom stateful operator the 100 TB event pipeline
needs.  Semantics: consecutive events of one user belong to the same
session while the gap between them is ≤ `gap_minutes`.

Batch form: two window passes (lag → running sum of break flags) then a
grouped aggregate — pure Catalyst, one shuffle on user_id that both
windows and the final groupBy reuse (same partitioning); the trailing
presentation `orderBy` is one extra range exchange at the edge, over
the |sessions|-bounded OUTPUT, not the event volume.  Oracle-checkable
in ANSI SQL.

Streaming form: `groupBy(user_id).applyInPandasWithState` with one
state row per user (open-session accumulator).  Pass `close_after` to
bound state by the ACTIVE user population: idle users' open sessions
are closed, emitted, and EVICTED on a processing-time timeout — the
default (None) keeps state for every user ever seen, which is only
acceptable for bounded key spaces.  Arrow moves batches, pandas closes
sessions per group.  Its single-batch output equals the batch operator
on the same data, which is exactly what the test asserts.

Cross-batch ordering: events are sorted within each micro-batch, and
the open session's `last`/`start` bounds are maintained as MAX/MIN so
a late event delivered in a later batch can never move the session
boundary backwards (a bare assignment regressed `last_us` and split
in-gap events into phantom sessions).  A late event older than the
open session's start — even one beyond the gap — is ABSORBED into the
open session (its start extended backwards via min()): t - last is
negative, so the gap branch never fires.  The batch twin, seeing the
full ordered history, would emit two sessions there; cross-batch
reordering beyond the gap therefore needs the watermarked upstream
dedup/sort the pipeline composes before this operator for the two
forms to stay differential oracles of each other.

Timeout eviction keeps a TOMBSTONE (session_no only, no bounds) per
evicted key so a returning user continues numbering monotonically
instead of colliding with its own closed session 1 in update-mode
sinks keyed by (user_id, session_no).
"""

from __future__ import annotations

from typing import Any, Callable, Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.types import (
    DoubleType,
    LongType,
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


def _session_fn(
    gap_minutes: int,
    close_after_ms: int | None,
    tombstone_ttl_ms: int | None = None,
) -> Callable:
    """Per-user stateful session builder factory (the returned function
    runs inside Arrow workers).

    Carries the open session across micro-batches in GroupState; emits
    every session closed by this batch plus the still-open one (update
    semantics — later batches may extend and re-emit it).  With a
    timeout configured, an idle user's open session is closed, emitted
    one final time, and the state row collapsed to a TOMBSTONE that
    preserves monotonic session numbering.  `tombstone_ttl_ms` is the
    second, much longer horizon that bounds tombstone state: a
    tombstone idle that long is REMOVED — a user absent for the whole
    TTL restarts numbering at 1 (the accepted trade), restoring the
    O(active) + O(recently-seen) state bound the close-after knob
    originally bought.  With no TTL, tombstones live forever —
    numbering never restarts, state grows O(keys-ever-seen).
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key: tuple[Any, ...], pdfs: Iterator, state) -> Iterator:
        import pandas as pd

        (user_id,) = key

        def frame(rows):
            return pd.DataFrame(
                {
                    "user_id": [user_id] * len(rows),
                    "session_no": [o[0] for o in rows],
                    "session_start": [
                        pd.Timestamp(o[1], unit="us") for o in rows
                    ],
                    "session_end": [
                        pd.Timestamp(o[2], unit="us") for o in rows
                    ],
                    "n_events": [o[3] for o in rows],
                    "total_value": [round(o[4], 4) for o in rows],
                }
            )

        if close_after_ms is not None and state.hasTimedOut:
            closed = state.get
            if closed[1] is None:
                # the timeout fired ON a tombstone: with a TTL armed
                # this is the long horizon elapsing — the user stayed
                # away for the whole TTL, so drop the tombstone
                # (numbering restarts at 1 if they ever return: the
                # documented trade) and state shrinks back to the
                # active population.  Without a TTL no timeout is ever
                # armed on a tombstone; if one fires anyway, keep it
                # (monotonic numbering is the no-TTL contract) and
                # never re-emit.
                if tombstone_ttl_ms is not None:
                    state.remove()
                return
            # idle user: final emit of the open session, then the state
            # row is collapsed to a TOMBSTONE carrying only session_no —
            # a returning user must CONTINUE numbering, not restart at 1
            # (a full remove() made the stream re-emit (user, 1) with
            # new bounds, silently overwriting the closed session 1 in
            # update-mode sinks keyed by (user_id, session_no)).  With a
            # TTL the tombstone arms the LONG horizon (dropped when it
            # fires, above); without, it arms nothing and lives forever
            # — O(seen-keys) state, the price of unconditional
            # monotonic numbering.
            state.update((closed[0], None, None, 0, 0.0))
            if tombstone_ttl_ms is not None:
                state.setTimeoutDuration(tombstone_ttl_ms)
            yield frame([closed])
            return

        out = []
        if state.exists:
            sess_no, start_us, last_us, n_ev, total = state.get
        else:
            sess_no, start_us, last_us, n_ev, total = 0, None, None, 0, 0.0

        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, value in zip(pdf["ts"], pdf["value"]):
                t_us = int(pd.Timestamp(ts).value // 1000)
                # dsum parity: NULL/NaN values contribute 0 to the
                # session total (one NaN must not poison the session)
                v = float(value) if value == value else 0.0
                if start_us is None:
                    # fresh key (sess_no=0) OR a timeout tombstone
                    # (sess_no=N): numbering continues from wherever
                    # the evicted open session left off
                    sess_no, start_us, last_us, n_ev, total = (
                        sess_no + 1, t_us, t_us, 1, v,
                    )
                elif t_us - last_us > gap_us:
                    out.append((sess_no, start_us, last_us, n_ev, total))
                    sess_no, start_us, last_us, n_ev, total = (
                        sess_no + 1, t_us, t_us, 1, v,
                    )
                else:
                    # MAX/MIN bounds: a cross-batch late event must
                    # never move the open session's edges backwards
                    last_us = max(last_us, t_us)
                    start_us = min(start_us, t_us)
                    n_ev, total = n_ev + 1, total + v

        if start_us is not None:
            out.append((sess_no, start_us, last_us, n_ev, total))  # open
            state.update((sess_no, start_us, last_us, n_ev, total))
            if close_after_ms is not None:
                state.setTimeoutDuration(close_after_ms)

        yield frame(out)

    return fn


def sessionize_stream(
    events_stream: DataFrame,
    gap_minutes: int = 30,
    close_after_minutes: int | None = None,
    tombstone_ttl_minutes: int | None | str = None,
) -> DataFrame:
    """Stateful streaming sessionization (custom operator the built-in
    windowed aggs can't express: gap-defined, per-key dynamic windows).

    `gap_minutes` matches the batch twin's knob (the two operators stay
    differential oracles of each other at ANY gap, not one magic
    value).  `close_after_minutes` arms a processing-time timeout that
    closes + evicts idle users' open sessions — the state-boundedness
    switch for unbounded key spaces.  Eviction leaves a tombstone so a
    returning user continues session numbering; `tombstone_ttl_minutes`
    (requires `close_after_minutes`) drops tombstones idle that long,
    restoring the O(active)+O(recently-seen) state bound.

    The TTL is OPT-IN (default ``None`` = tombstones live forever and
    numbering never restarts — the original public contract; existing
    deployments keep it without code changes).  Pass ``"auto"`` (100×
    close_after_minutes, a horizon two orders longer than the eviction
    window) or an explicit minute count to bound tombstone state.  The
    trade a TTL buys into, and what it asks of SINKS: a user absent
    for the whole TTL restarts numbering at session 1, and an
    update-mode sink keyed by bare (user_id, session_no) would then
    silently overwrite that user's ORIGINAL session-1 row.  A
    TTL-enabled deployment must therefore key its sink with an epoch
    marker — e.g. (user_id, session_start_date, session_no) or
    (user_id, first-event-ts-of-session, session_no) — so restarted
    numbering lands in new rows; `session_start` is emitted on every
    row precisely so sinks have that epoch at hand.  Leave the TTL off
    when the sink key cannot carry an epoch and O(keys-ever-seen)
    state is acceptable."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    close_ms = (
        None
        if close_after_minutes is None
        else close_after_minutes * 60 * 1000
    )
    if tombstone_ttl_minutes == "auto":
        tombstone_ttl_minutes = (
            None
            if close_after_minutes is None
            else 100 * close_after_minutes
        )
    elif isinstance(tombstone_ttl_minutes, str):
        # misuse error at the knob, not an opaque per-executor failure
        # deep inside the stateful operator ('60' * 60000 is a
        # 120000-char string handed to setTimeoutDuration)
        raise ValueError(
            "tombstone_ttl_minutes must be an int, None, or the "
            f"string 'auto' — got {tombstone_ttl_minutes!r}"
        )
    if tombstone_ttl_minutes is not None and close_ms is None:
        raise ValueError(
            "tombstone_ttl_minutes requires close_after_minutes "
            "(tombstones only exist once timeout eviction is on)"
        )
    ttl_ms = (
        None
        if tombstone_ttl_minutes is None
        else tombstone_ttl_minutes * 60 * 1000
    )
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes, close_ms, ttl_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if close_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
