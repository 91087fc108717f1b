"""Streaming-analog tests: exactly-once daily file ingest and the
watermarked hourly rollup."""

from __future__ import annotations

import pyspark.sql.functions as F

from urban_mobility_data_lakehouse_spark.pipeline.fixtures import (
    DATES,
    write_fixtures,
)
from urban_mobility_data_lakehouse_spark.sources.lakehouse import Lakehouse
from urban_mobility_data_lakehouse_spark.sources.testdata import (
    load_table,
    normalize_event_ts,
)
from urban_mobility_data_lakehouse_spark.streaming.daily import (
    daily_file_ingest,
    hourly_rollup_stream,
)


def _events_stream(spark, sf_dir, stream_dir, filenames=("events.parquet",)):
    """File stream over copies of events.parquet, with the ts column
    normalized exactly the way ``load_table`` does — one shared site to
    absorb the next driver-side timestamp-encoding drift."""
    import shutil

    stream_dir.mkdir()
    for name in filenames:
        shutil.copy(f"{sf_dir}/events.parquet", stream_dir / name)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    return normalize_event_ts(
        spark.readStream.schema(raw_schema).parquet(str(stream_dir))
    )


def test_daily_file_ingest_exactly_once(spark, tmp_path):
    fixtures = write_fixtures(str(tmp_path / "src"))
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("bronze")
    ckpt = str(tmp_path / "ckpt")

    q = daily_file_ingest(spark, fixtures["trips_dir"], lake, ckpt)
    q.awaitTermination(120)
    table = lake.read(spark, "bronze", "mobility_data_stream")
    n_days = table.select("fecha").distinct().count()
    # 21 real dates + the invalid-date dirty row partitions
    assert n_days >= len(DATES)
    n_rows = table.count()

    # re-trigger: checkpoint makes it a no-op (exactly-once)
    q2 = daily_file_ingest(spark, fixtures["trips_dir"], lake, ckpt)
    q2.awaitTermination(120)
    assert lake.read(spark, "bronze", "mobility_data_stream").count() == n_rows


def test_hourly_rollup_stream_matches_batch(spark, sf_dir, tmp_path):
    # availableNow file stream over the same parquet → results must
    # equal the batch aggregation
    events = load_table(spark, sf_dir, "events")
    # file streams need a directory source
    stream_in = _events_stream(spark, sf_dir, tmp_path / "events_stream")
    rolled = hourly_rollup_stream(stream_in)
    q = (
        rolled.writeStream.format("memory")
        .queryName("hourly_rollup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["total_value"], r["n_events"])
        for r in spark.sql("select * from hourly_rollup").collect()
    }
    expected = {
        (r["window_start"], r["event_type"]): (r["total_value"], r["n_events"])
        for r in (
            events.groupBy(
                F.date_trunc("hour", "ts").alias("window_start"),
                "event_type",
            )
            .agg(
                F.sum(F.col("value").cast("decimal(25,6)"))
                .cast("double")
                .alias("total_value"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .collect()
        )
    }
    # append mode only emits windows the watermark closed; every emitted
    # window must match batch, and most windows must have been emitted
    assert got
    for k, v in got.items():
        assert expected[k] == v
    assert len(got) >= len(expected) - 25  # tail windows may be open


def test_stateful_sessionization_matches_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState sessionization: a single availableNow
    batch must reproduce the batch gaps-and-islands operator exactly
    (same sessions, bounds, counts, value sums)."""
    from urban_mobility_data_lakehouse_spark.streaming.sessions import (
        sessionize,
        sessionize_stream,
    )

    events = load_table(spark, sf_dir, "events")
    stream_in = _events_stream(spark, sf_dir, tmp_path / "sess_stream")
    q = (
        sessionize_stream(stream_in)
        .writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_no"]): (
            r["session_start"], r["session_end"],
            r["n_events"], round(r["total_value"], 4),
        )
        for r in spark.sql("select * from sessions_stream").collect()
    }
    expected = {
        (r["user_id"], r["session_no"]): (
            r["session_start"], r["session_end"],
            r["n_events"], r["total_value"],
        )
        for r in sessionize(events).collect()
    }
    assert got == expected


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    """Watermarked stream-stream attribution join: clicks ⋈ purchases
    within 1 hour, both sides streaming, must equal the identical
    inequality join on the batch frames (watermarks are batch no-ops,
    so the same function is its own oracle)."""
    from urban_mobility_data_lakehouse_spark.streaming.joins import (
        clicks_purchases,
        interval_join,
    )

    events = load_table(spark, sf_dir, "events")
    stream_in = _events_stream(spark, sf_dir, tmp_path / "join_stream")
    q = (
        interval_join(*clicks_purchases(stream_in))
        .writeStream.format("memory")
        .queryName("attr_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "join_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    key = lambda r: (  # noqa: E731
        r["user_id"], r["click_id"], r["purchase_id"],
        r["click_ts"], r["purchase_ts"],
    )
    got = {key(r) for r in spark.sql("select * from attr_join").collect()}
    expected = {
        key(r)
        for r in interval_join(*clicks_purchases(events)).collect()
    }
    assert expected  # fixture must actually produce attributed pairs
    # append mode emits a pair once the watermark closes it; a single
    # availableNow pass closes everything except the stream-tail rows
    assert got <= expected
    assert len(got) >= len(expected) * 0.8, (len(got), len(expected))


def test_stream_dedup_exactly_once(spark, sf_dir, tmp_path):
    """Duplicated input files → dropDuplicatesWithinWatermark must emit
    each event_id exactly once (the at-least-once → exactly-once
    repair)."""
    from urban_mobility_data_lakehouse_spark.streaming.daily import (
        dedup_stream,
    )

    # same file twice = every event duplicated at the source
    stream_in = _events_stream(
        spark, sf_dir, tmp_path / "dup_stream",
        filenames=("a.parquet", "b.parquet"),
    )
    q = (
        dedup_stream(stream_in)
        .writeStream.format("memory")
        .queryName("dedup_stream_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select count(*) c, count(distinct event_id) d from dedup_stream_t"
    ).collect()[0]
    n = load_table(spark, sf_dir, "events").count()
    assert got["c"] == got["d"] == n


def test_stream_static_enrich_matches_batch(spark, sf_dir, tmp_path):
    """Stream-static broadcast enrichment: the events stream joined to
    the static customer dim must equal the identical batch join (the
    static side makes this exact — no watermark closure caveat)."""
    from urban_mobility_data_lakehouse_spark.streaming.joins import (
        enrich_with_dim,
    )

    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    stream_in = _events_stream(spark, sf_dir, tmp_path / "enrich_stream")
    q = (
        enrich_with_dim(stream_in, customer)
        .writeStream.format("memory")
        .queryName("enrich_stream_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "enrich_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    key = lambda r: (  # noqa: E731
        r["event_id"], r["user_id"], r["c_name"], r["c_nationkey"]
    )
    got = sorted(
        key(r)
        for r in spark.sql("select * from enrich_stream_t").collect()
    )
    expected = sorted(
        key(r) for r in enrich_with_dim(events, customer).collect()
    )
    assert got == expected
    # every fixture user_id resolves in the dim — enrichment is total
    assert all(k[2] is not None for k in got)


def test_builtin_session_window_agrees_with_custom_sessionize(spark, sf_dir):
    """Spark's built-in session_window (batch form) and the custom
    gaps-and-islands sessionize are alternative implementations of the
    same operator; they must carve identical sessions.  Semantics map:
    window.start = session_start, window.end = session_end + gap (the
    built-in extends the window by the gap)."""
    from urban_mobility_data_lakehouse_spark.streaming.sessions import (
        sessionize,
    )

    events = load_table(spark, sf_dir, "events")
    ours = sessionize(events, gap_minutes=30)
    builtin = (
        events.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            (F.col("w.end") - F.expr("INTERVAL 30 MINUTES")).alias(
                "session_end"
            ),
            "n_events",
        )
    )
    key = lambda r: (  # noqa: E731
        r["user_id"], r["session_start"], r["session_end"], r["n_events"]
    )
    got_ours = sorted(key(r) for r in ours.collect())
    got_builtin = sorted(key(r) for r in builtin.collect())
    assert got_ours == got_builtin


def test_stream_to_table_exactly_once_survives_checkpoint_loss(
    spark, sf_dir, tmp_path
):
    """The generic lakehouse stream sink dedups replayed micro-batches
    at the TABLE (batch id on the commit line), so even deleting the
    streaming checkpoint — which replays every batch — appends nothing
    twice."""
    import shutil

    from urban_mobility_data_lakehouse_spark.streaming.daily import (
        stream_to_table,
    )

    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("silver")
    stream = _events_stream(spark, sf_dir, tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")

    q = stream_to_table(
        stream, lake, "silver", "ev_stream", ckpt,
        transform=lambda b: b.select("event_id", "ts", "user_id", "value"),
    )
    q.awaitTermination(120)
    n = lake.read(spark, "silver", "ev_stream").count()
    assert n == spark.read.parquet(f"{sf_dir}/events.parquet").count()

    # same checkpoint, same source: no new batches, nothing appended
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    rerun = normalize_event_ts(
        spark.readStream.schema(raw_schema).parquet(str(tmp_path / "in"))
    )
    q2 = stream_to_table(
        rerun, lake, "silver", "ev_stream", ckpt,
        transform=lambda b: b.select("event_id", "ts", "user_id", "value"),
    )
    q2.awaitTermination(120)
    assert lake.read(spark, "silver", "ev_stream").count() == n

    # checkpoint LOST: batch 0 replays with the same id → the
    # table-level dedup must make the re-run a no-op
    shutil.rmtree(ckpt)
    q3 = stream_to_table(
        normalize_event_ts(
            spark.readStream.schema(raw_schema).parquet(str(tmp_path / "in"))
        ),
        lake, "silver", "ev_stream", ckpt,
        transform=lambda b: b.select("event_id", "ts", "user_id", "value"),
    )
    q3.awaitTermination(120)
    assert lake.read(spark, "silver", "ev_stream").count() == n
    # exactly one data commit carries batch id 0
    marks = [
        e["stream_batch_id"]
        for e in lake.snapshots("silver", "ev_stream")
        if "stream_batch_id" in e
    ]
    assert marks == [0]


def test_sessionize_agrees_with_builtin_session_window(spark, sf_dir):
    """Cross-validation against Spark's own `session_window`: the
    gaps-and-islands operator must produce the same session COUNT per
    user and the same (start, n_events, total_value) multiset.

    Boundary-semantics note: `session_window` closes a session when
    the next event is ≥ gap after the previous (window is [start,
    last+gap)); our operator breaks on STRICTLY greater than gap.  An
    event exactly gap after the previous therefore extends our
    session but starts a new built-in one — the fixture's microsecond
    timestamps make exact-gap collisions measure-zero, so the two
    definitions coincide here (and the assert would catch a fixture
    that starts violating that)."""
    from urban_mobility_data_lakehouse_spark.operators.relational import dsum
    from urban_mobility_data_lakehouse_spark.streaming.sessions import (
        sessionize,
    )

    events = load_table(spark, sf_dir, "events")
    ours = {
        (r["user_id"], r["session_start"], r["n_events"],
         round(r["total_value"], 4))
        for r in sessionize(events, gap_minutes=30).collect()
    }
    builtin = {
        (r["user_id"], r["start"], r["n_events"], round(r["tv"], 4))
        for r in events.groupBy(
            "user_id", F.session_window("ts", "30 minutes")
        )
        .agg(
            F.min("ts").alias("start"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(dsum("value"), 4).alias("tv"),
        )
        .collect()
    }
    assert ours == builtin


def test_daily_ingest_same_day_split_across_batches(spark, tmp_path):
    """A day whose files span micro-batches must keep EVERY file's rows
    (the bare partition overwrite replaced the earlier batch's same-day
    rows — silent data loss)."""
    import csv
    import os

    src = tmp_path / "split_src"
    os.makedirs(src)
    cols = [
        "fecha", "periodo", "origen", "destino", "distancia",
        "actividad_origen", "actividad_destino", "residencia", "renta",
        "edad", "sexo", "viajes", "viajes_km",
    ]
    for fname, rows in (
        ("a.csv", [("20240101", "01", "A"), ("20240101", "02", "B")]),
        ("b.csv", [("20240101", "03", "C"), ("20240102", "01", "D")]),
        ("c.csv", [("20240101", "04", "E")]),
    ):
        with open(src / fname, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(cols)
            for fecha, periodo, origen in rows:
                w.writerow(
                    [fecha, periodo, origen, "X", "0.5-2", "casa",
                     "casa", "r", "10", "25-45", "M", "1", "2"]
                )

    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("bronze")
    # one file per trigger → 2024-01-01 spans THREE micro-batches
    q = daily_file_ingest(
        spark, str(src), lake, str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    table = lake.read(spark, "bronze", "mobility_data_stream")
    day1 = table.filter(F.col("fecha") == "20240101")
    assert sorted(r["origen"] for r in day1.collect()) == [
        "A", "B", "C", "E"
    ]
    assert table.filter(F.col("fecha") == "20240102").count() == 1

    # replay from a fresh checkpoint over the same source: idempotent
    # (each batch id rewrites its own tagged slice, never duplicates)
    n = table.count()
    q2 = daily_file_ingest(
        spark, str(src), lake, str(tmp_path / "ckpt2"),
        max_files_per_trigger=1,
    )
    q2.awaitTermination(120)
    assert lake.read(spark, "bronze", "mobility_data_stream").count() == n


def test_sessionize_stream_cross_batch_late_event(spark, tmp_path):
    """A late event delivered in a LATER micro-batch (within the gap,
    ts older than the open session's end) must extend the one session,
    not regress its bounds and split phantom sessions; gap_minutes is
    honored; a NaN value doesn't poison the session total."""
    import datetime as dt

    from urban_mobility_data_lakehouse_spark.streaming.sessions import (
        sessionize_stream,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    slice1 = [
        (1, 1, base, 10.0),
        (2, 1, base + dt.timedelta(minutes=5), float("nan")),
    ]
    slice2 = [
        (3, 1, base + dt.timedelta(minutes=3), 7.0),   # LATE, in-gap
        (4, 1, base + dt.timedelta(minutes=9), 1.0),
    ]
    stream_dir = tmp_path / "late_stream"
    stream_dir.mkdir()
    schema = "event_id long, user_id long, ts timestamp, value double"
    for k, rows in enumerate((slice1, slice2)):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(stream_dir / f"s{k}")
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir) + "/s*")
    )
    q = (
        sessionize_stream(stream, gap_minutes=6)
        .writeStream.format("memory")
        .queryName("late_sessions")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "late_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["user_id"], r["session_no"]): r
        for r in spark.sql("select * from late_sessions").collect()
    }
    # ONE session: the late 12:03 event extends it (the old bare
    # assignment regressed last to 12:03 and split at 12:09)
    assert set(rows) == {(1, 1)}, rows
    r = rows[(1, 1)]
    assert r["session_start"] == base
    assert r["session_end"] == base + dt.timedelta(minutes=9)
    assert r["n_events"] == 4
    assert r["total_value"] == 18.0  # NaN contributed 0, not NaN


def test_append_unique_meta_is_atomic_idempotence(spark, tmp_path):
    """lake.append(unique_meta=...): the duplicate check runs INSIDE
    the commit lock — the second append of the same (source, batch) is
    skipped (returns False) and the table keeps one copy."""
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("silver")
    df = spark.range(10).selectExpr("id", "id * 2 as v")
    meta = {"stream_source": "s", "stream_batch_id": 7}
    assert lake.append(
        df, "silver", "t", extra_meta=meta,
        unique_meta=("stream_source", "stream_batch_id"),
    ) is True
    assert lake.append(
        df, "silver", "t", extra_meta=meta,
        unique_meta=("stream_source", "stream_batch_id"),
    ) is False
    assert lake.read(spark, "silver", "t").count() == 10
    # a different batch id still lands
    assert lake.append(
        df, "silver", "t",
        extra_meta={"stream_source": "s", "stream_batch_id": 8},
        unique_meta=("stream_source", "stream_batch_id"),
    ) is True
    assert lake.read(spark, "silver", "t").count() == 20


def test_interval_join_tolerates_shared_column_names(spark):
    """Carry-along columns sharing a name on both sides must not raise
    AMBIGUOUS_REFERENCE — every carried column is side-qualified."""
    import datetime as dt

    from urban_mobility_data_lakehouse_spark.streaming.joins import (
        interval_join,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, base, "l")],
        "user_id long, click_ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, base + dt.timedelta(minutes=5), "r")],
        "user_id long, purchase_ts timestamp, tag string",
    )
    joined = interval_join(left, right)
    # shared non-key columns are suffixed per side — selecting both
    # under one name would defer AMBIGUOUS_REFERENCE to the first
    # downstream select-by-name
    assert joined.columns == [
        "user_id", "click_ts", "purchase_ts", "tag_left", "tag_right",
    ]
    got = joined.collect()
    assert len(got) == 1
    assert got[0]["user_id"] == 1
    assert got[0]["tag_left"] == "l" and got[0]["tag_right"] == "r"
    # downstream select-by-name now works (was the deferred failure)
    assert joined.select("tag_left").collect()[0][0] == "l"
    # disjoint carry-alongs keep their bare names
    left2 = left.withColumnRenamed("tag", "ltag")
    assert interval_join(left2, right).columns == [
        "user_id", "click_ts", "purchase_ts", "ltag", "tag",
    ]


class _FakeGroupState:
    """Deterministic stand-in for GroupState — processing-time timeouts
    can't be fired on cue in a unit test, so the state-function contract
    is pinned directly."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_timeout_eviction_keeps_session_numbering(spark):
    """A returning user after timeout eviction must CONTINUE session
    numbering (tombstone state), not restart at session_no 1 — a
    restart re-emits (user, 1) and silently overwrites the previously
    closed session 1 in update-mode sinks keyed by (user_id, session_no)."""
    import datetime as dt

    import pandas as pd

    from urban_mobility_data_lakehouse_spark.streaming.sessions import (
        _session_fn,
    )

    fn = _session_fn(gap_minutes=6, close_after_ms=60_000)
    state = _FakeGroupState()
    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def batch(*ts_vals):
        return iter(
            [
                pd.DataFrame(
                    {
                        "event_id": range(len(ts_vals)),
                        "ts": [t for t, _ in ts_vals],
                        "value": [v for _, v in ts_vals],
                    }
                )
            ]
        )

    # batch 1: user's first session (open)
    out1 = pd.concat(list(fn((1,), batch((base, 1.0)), state)))
    assert list(out1["session_no"]) == [1]
    assert state.get[0] == 1 and state.timeout_set == 60_000

    # timeout fires: final emit of session 1, state collapses to a
    # tombstone carrying only the session counter
    state.hasTimedOut = True
    out2 = pd.concat(list(fn((1,), iter([]), state)))
    assert list(out2["session_no"]) == [1]
    assert state.exists, "tombstone must persist, not remove()"
    assert state.get == (1, None, None, 0, 0.0)

    # the user returns: numbering continues at 2, never collides with 1
    state.hasTimedOut = False
    later = base + dt.timedelta(hours=3)
    out3 = pd.concat(list(fn((1,), batch((later, 2.0)), state)))
    assert list(out3["session_no"]) == [2]
    assert state.get[0] == 2

    # a second timeout → tombstone at 2; third visit → session 3
    state.hasTimedOut = True
    out4 = pd.concat(list(fn((1,), iter([]), state)))
    assert list(out4["session_no"]) == [2]
    assert state.get == (2, None, None, 0, 0.0)
    state.hasTimedOut = False
    out5 = pd.concat(
        list(fn((1,), batch((later + dt.timedelta(hours=3), 1.0)), state))
    )
    assert list(out5["session_no"]) == [3]

    # pathological: a timeout firing ON a tombstone must not re-emit
    state.hasTimedOut = True
    assert list(fn((1,), iter([]), state)) in ([],) or all(
        len(f) == 0 for f in fn((1,), iter([]), state)
    )


def test_interval_join_same_ts_name_both_sides(spark):
    """Both sides using one ts column name (e.g. 'ts') must suffix the
    two ts outputs too, not emit 'ts' twice."""
    import datetime as dt

    from urban_mobility_data_lakehouse_spark.streaming.joins import (
        interval_join,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, base)], "user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, base + dt.timedelta(minutes=5))],
        "user_id long, ts timestamp",
    )
    j = interval_join(left, right, left_ts="ts", right_ts="ts")
    assert j.columns == ["user_id", "ts_left", "ts_right"]
    row = j.collect()[0]
    assert row["ts_left"] == base
    assert row["ts_right"] == base + dt.timedelta(minutes=5)


def test_tombstone_ttl_bounds_state(spark):
    """The long tombstone horizon: a tombstone survives the ordinary
    close-after timeout (numbering continues for a returning user) but
    is DROPPED when the TTL fires — state shrinks back to the active
    population, and a user absent the whole TTL restarts at session 1
    (the documented trade)."""
    import datetime as dt

    import pandas as pd

    from urban_mobility_data_lakehouse_spark.streaming.sessions import (
        _session_fn,
    )

    fn = _session_fn(
        gap_minutes=6, close_after_ms=60_000, tombstone_ttl_ms=3_600_000
    )
    state = _FakeGroupState()
    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def batch(*ts_vals):
        return iter(
            [
                pd.DataFrame(
                    {
                        "event_id": range(len(ts_vals)),
                        "ts": [t for t, _ in ts_vals],
                        "value": [v for _, v in ts_vals],
                    }
                )
            ]
        )

    # open session 1, then the close-after timeout evicts it
    pd.concat(list(fn((1,), batch((base, 1.0)), state)))
    state.hasTimedOut = True
    out = pd.concat(list(fn((1,), iter([]), state)))
    assert list(out["session_no"]) == [1]
    # tombstone survives, armed with the LONG horizon (not close_after)
    assert state.exists and state.get == (1, None, None, 0, 0.0)
    assert state.timeout_set == 3_600_000

    # the user returns within the TTL: numbering continues at 2
    state.hasTimedOut = False
    out = pd.concat(
        list(fn((1,), batch((base + dt.timedelta(hours=1), 1.0)), state))
    )
    assert list(out["session_no"]) == [2]

    # evict again → tombstone(2); then the TTL horizon fires on the
    # tombstone: dropped, nothing emitted
    state.hasTimedOut = True
    pd.concat(list(fn((1,), iter([]), state)))
    assert state.get == (2, None, None, 0, 0.0)
    frames = list(fn((1,), iter([]), state))  # TTL fires
    assert all(len(f) == 0 for f in frames)
    assert not state.exists, "tombstone must be dropped at the TTL"

    # a user absent the whole TTL restarts numbering at 1
    state.hasTimedOut = False
    out = pd.concat(
        list(fn((1,), batch((base + dt.timedelta(days=9), 1.0)), state))
    )
    assert list(out["session_no"]) == [1]


def test_tombstone_ttl_requires_close_after(spark):
    import pytest as _pytest

    from urban_mobility_data_lakehouse_spark.streaming.sessions import (
        sessionize_stream,
    )

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr(
            "value as user_id", "timestamp as ts",
            "value as event_id", "1.0 as value",
        )
    )
    with _pytest.raises(ValueError, match="requires close_after"):
        sessionize_stream(stream, tombstone_ttl_minutes=60)


def test_tombstone_ttl_opt_in(spark, monkeypatch):
    """The TTL is opt-in: the default (None) keeps unbounded tombstones
    — monotonic numbering, the original public contract — even with
    eviction on; 'auto' arms the 100× close_after TTL explicitly, and
    a stream without eviction arms nothing (no tombstones to bound)."""
    from urban_mobility_data_lakehouse_spark.streaming import sessions

    seen = []

    def spy(gap_minutes, close_after_ms, tombstone_ttl_ms=None):
        seen.append((close_after_ms, tombstone_ttl_ms))
        return lambda *a, **kw: iter(())

    monkeypatch.setattr(sessions, "_session_fn", spy)
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr(
            "value as user_id", "timestamp as ts",
            "value as event_id", "1.0 as value",
        )
    )
    sessions.sessionize_stream(stream, close_after_minutes=10)
    sessions.sessionize_stream(
        stream, close_after_minutes=10, tombstone_ttl_minutes="auto"
    )
    sessions.sessionize_stream(stream, tombstone_ttl_minutes="auto")
    sessions.sessionize_stream(stream)
    assert seen == [
        (600_000, None),                  # default: unbounded tombstones
        (600_000, 100 * 10 * 60 * 1000),  # explicit 'auto' opt-in
        (None, None),                     # auto without eviction = noop
        (None, None),                     # no eviction → no tombstones
    ]
