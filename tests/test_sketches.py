"""Mergeable HLL sketch rollups (operators/sketches.py).

What matters at 100 TB: (1) estimates are honest (inside the
configured error envelope vs exact), (2) the union lattice really is
incremental — per-day builds merged later must estimate exactly what a
one-shot build estimates, (3) sketches survive the parquet round-trip
as plain binary columns, (4) rollups never touch raw events.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.operators.sketches import (
    SketchRollup,
    daily_user_sketches,
    estimate_distinct,
)
from urban_mobility_data_lakehouse_spark.sources.lakehouse import Lakehouse
from urban_mobility_data_lakehouse_spark.sources.testdata import load_table


@pytest.fixture()
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _exact(events, by):
    cols = list(by) or [F.lit(1).alias("_g")]
    out = events.groupBy(*cols).agg(
        F.countDistinct("user_id").alias("exact")
    )
    return {
        tuple(r[c] for c in by) if by else (): r["exact"]
        for r in out.collect()
    }


def test_estimates_within_error_envelope(spark, events):
    sketches = daily_user_sketches(events)
    est = {
        (r["event_type"],): r["approx_distinct"]
        for r in estimate_distinct(sketches, by=("event_type",)).collect()
    }
    exact = _exact(events, ("event_type",))
    assert est.keys() == exact.keys()
    for k, e in exact.items():
        assert abs(est[k] - e) / e < 0.05, (k, est[k], e)


def test_global_rollup_is_a_coarser_union(spark, events):
    sketches = daily_user_sketches(events)
    [row] = estimate_distinct(sketches, by=()).collect()
    exact = events.select("user_id").distinct().count()
    assert abs(row["approx_distinct"] - exact) / exact < 0.05
    # n_events conserved through the rollup
    assert row["n_events"] == events.count()


@pytest.mark.heavy  # 16 s incremental-vs-one-shot sweep; sketch merge correctness stays default-lane via the oracle rows + unit merges
def test_incremental_daily_builds_equal_one_shot(spark, events, tmp_path):
    """Per-day partition upserts, merged at query time, must estimate
    EXACTLY what a single full build estimates — the property that
    makes the sketch table safe to maintain incrementally."""
    inc = SketchRollup(Lakehouse(str(tmp_path / "inc")), name="inc")
    days = [
        r["day"]
        for r in events.select(
            F.to_date("ts").cast("string").alias("day")
        ).distinct().collect()
    ]
    for day in sorted(days):
        inc.build_day(spark, events, day)

    full = SketchRollup(Lakehouse(str(tmp_path / "full")), name="full")
    full.build_all(spark, events)

    got = [
        tuple(r)
        for r in inc.estimate(spark, by=("event_type",)).collect()
    ]
    want = [
        tuple(r)
        for r in full.estimate(spark, by=("event_type",)).collect()
    ]
    assert got == want

    # idempotent re-run of one day changes nothing (partition upsert)
    inc.build_day(spark, events, sorted(days)[0])
    again = [
        tuple(r)
        for r in inc.estimate(spark, by=("event_type",)).collect()
    ]
    assert again == got


def test_fragment_appends_estimate_exactly(spark, events, tmp_path):
    """Append-only maintenance: sketching two halves separately and
    unioning at query time must equal the one-shot sketch estimate
    EXACTLY (HLL registers are a max-lattice)."""
    from urban_mobility_data_lakehouse_spark.operators.sketches import (
        daily_user_sketches,
    )

    lake = Lakehouse(str(tmp_path / "lake"))
    frag = SketchRollup(lake, name="frag")
    lake.append(
        daily_user_sketches(events.filter(F.col("event_id") % 2 == 0)),
        "gold", "frag",
    )
    lake.append(
        daily_user_sketches(events.filter(F.col("event_id") % 2 == 1)),
        "gold", "frag",
    )
    got = [tuple(r) for r in frag.estimate(spark).collect()]
    want = [
        tuple(r)
        for r in estimate_distinct(daily_user_sketches(events)).collect()
    ]
    assert got == want


def test_streaming_ingest_exactly_once(spark, sf_dir, events, tmp_path):
    """File-stream ingest appends sketch fragments; estimates equal the
    batch answer, and a checkpointed re-trigger appends nothing."""
    import shutil

    from urban_mobility_data_lakehouse_spark.sources.testdata import (
        normalize_event_ts,
    )

    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "a.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = normalize_event_ts(
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )

    roll = SketchRollup(Lakehouse(str(tmp_path / "lake")), name="s")
    ckpt = str(tmp_path / "ckpt")
    roll.ingest_stream(stream, ckpt).awaitTermination(120)

    got = [tuple(r) for r in roll.estimate(spark).collect()]
    want = [
        tuple(r)
        for r in estimate_distinct(daily_user_sketches(events)).collect()
    ]
    assert got == want

    n_commits = len(roll.lake.snapshots("gold", "s"))
    roll.ingest_stream(stream, ckpt).awaitTermination(120)  # replay: no-op
    assert len(roll.lake.snapshots("gold", "s")) == n_commits
    assert [tuple(r) for r in roll.estimate(spark).collect()] == got


def test_rollup_reads_only_the_sketch_table(spark, events, tmp_path):
    """The estimate plan scans the persisted sketch rows, not events:
    every scanned file must live under the sketch table's directory."""
    roll = SketchRollup(Lakehouse(str(tmp_path / "lake")), name="s")
    roll.build_all(spark, events)
    files = roll.estimate(spark).inputFiles()
    assert files
    assert all("/gold/s/" in f or "gold/s/" in f for f in files)


# -- Count-min sketch -------------------------------------------------------


def _tokens_df(spark, sf_dir):
    import pyspark.sql.functions as F

    from urban_mobility_data_lakehouse_spark.sources.testdata import (
        load_table,
    )

    return (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
    )


def test_cms_never_underestimates_and_bounds_overestimate(spark, sf_dir):
    import pyspark.sql.functions as F

    from urban_mobility_data_lakehouse_spark.operators import sketches as S

    toks = _tokens_df(spark, sf_dir)
    n_total = toks.count()
    exact = {
        r["token"]: r["c"]
        for r in toks.groupBy("token").agg(F.count("*").alias("c")).collect()
    }
    sk = S.cms_sketch(toks, "token")
    cands = toks.select("token").distinct()
    est = {
        r["token"]: r["est"]
        for r in S.cms_estimate(sk, cands, "token").collect()
    }
    assert set(est) == set(exact)
    eps_n = (2.718 / S.CMS_WIDTH) * n_total
    for t, c in exact.items():
        assert est[t] >= c, f"CMS underestimated {t}"
        assert est[t] <= c + eps_n, f"CMS overestimate for {t} beyond εN"


def test_cms_incremental_merge_equals_one_shot(spark, sf_dir):
    import pyspark.sql.functions as F

    from urban_mobility_data_lakehouse_spark.operators import sketches as S
    from urban_mobility_data_lakehouse_spark.sources.testdata import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    one_shot = S.cms_sketch(toks, "token")
    batches = [
        S.cms_sketch(toks.filter(F.col("doc_id") % 3 == i), "token")
        for i in range(3)
    ]
    merged = S.cms_merge(*batches)
    a = sorted(map(tuple, one_shot.collect()))
    b = sorted(map(tuple, merged.collect()))
    assert a == b  # exact integer lattice: incremental == one-shot


def test_cms_heavy_hitters_one_sided(spark, sf_dir):
    import pyspark.sql.functions as F

    from urban_mobility_data_lakehouse_spark.operators import sketches as S

    toks = _tokens_df(spark, sf_dir)
    exact = {
        r["token"]: r["c"]
        for r in toks.groupBy("token").agg(F.count("*").alias("c")).collect()
    }
    threshold = sorted(exact.values())[len(exact) // 2]  # median count
    sk = S.cms_sketch(toks, "token")
    hh = {
        r["token"]
        for r in S.heavy_hitters(
            sk, toks.select("token").distinct(), "token", threshold
        ).collect()
    }
    true_heavy = {t for t, c in exact.items() if c >= threshold}
    assert true_heavy <= hh  # no true heavy hitter escapes


def test_cms_sketch_is_bounded(spark, sf_dir):
    from urban_mobility_data_lakehouse_spark.operators import sketches as S

    toks = _tokens_df(spark, sf_dir)
    sk = S.cms_sketch(toks, "token")
    assert sk.count() <= S.CMS_DEPTH * S.CMS_WIDTH


def test_cms_table_streaming_ingest_exactly_once(spark, sf_dir, tmp_path):
    """Streamed CMS fragments sum to the one-shot sketch; a replayed
    trigger appends nothing."""
    import shutil

    import pyspark.sql.functions as F

    from urban_mobility_data_lakehouse_spark.operators import sketches as S
    from urban_mobility_data_lakehouse_spark.operators.sketches import (
        CMSTable,
    )
    from urban_mobility_data_lakehouse_spark.sources.lakehouse import (
        Lakehouse,
    )
    from urban_mobility_data_lakehouse_spark.sources.testdata import (
        load_table,
        normalize_event_ts,
    )

    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "a.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = normalize_event_ts(
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )

    tbl = CMSTable(Lakehouse(str(tmp_path / "lake")), key_col="event_type")
    ckpt = str(tmp_path / "ckpt")
    tbl.ingest_stream(stream, ckpt).awaitTermination(120)

    events = load_table(spark, sf_dir, "events")
    keys = events.select("event_type").distinct()
    got = [tuple(r) for r in tbl.estimate(spark, keys).collect()]
    want = [
        tuple(r)
        for r in S.cms_estimate(
            S.cms_sketch(events, "event_type"), keys, "event_type"
        ).collect()
    ]
    assert got == want

    n = len(tbl.lake.snapshots("gold", "cms_counts"))
    tbl.ingest_stream(stream, ckpt).awaitTermination(120)
    assert len(tbl.lake.snapshots("gold", "cms_counts")) == n
    assert [tuple(r) for r in tbl.estimate(spark, keys).collect()] == got


# -- Histogram sketch -------------------------------------------------------


def test_hist_quantile_within_bin_width_of_exact(spark, sf_dir):
    import pyspark.sql.functions as F

    from urban_mobility_data_lakehouse_spark.operators import sketches as S
    from urban_mobility_data_lakehouse_spark.sources.testdata import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    ntok = docs.select(F.size(F.split("text", " ")).alias("n"))
    vals = sorted(r["n"] for r in ntok.collect())
    W = 8
    hist = S.hist_sketch(ntok, "n", bin_width=W)
    for r in S.hist_quantile(hist, qs=(0.5, 0.9, 0.99), bin_width=W).collect():
        import math

        exact = vals[math.ceil(r["q"] * len(vals)) - 1]
        assert abs(r["est"] - exact) < W, (r["q"], r["est"], exact)


def test_hist_incremental_merge_equals_one_shot(spark, sf_dir):
    import pyspark.sql.functions as F

    from urban_mobility_data_lakehouse_spark.operators import sketches as S
    from urban_mobility_data_lakehouse_spark.sources.testdata import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    )
    one = S.hist_sketch(docs, "n", bin_width=4)
    parts = [
        S.hist_sketch(docs.filter(F.col("doc_id") % 3 == i), "n", bin_width=4)
        for i in range(3)
    ]
    assert sorted(map(tuple, one.collect())) == sorted(
        map(tuple, S.hist_merge(*parts).collect())
    )


def test_hist_grouped_quantiles(spark, sf_dir):
    import pyspark.sql.functions as F

    from urban_mobility_data_lakehouse_spark.operators import sketches as S
    from urban_mobility_data_lakehouse_spark.sources.testdata import (
        load_table,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_type", F.round("value", 0).cast("long").alias("cents")
    )
    hist = S.hist_sketch(events, "cents", ("event_type",), bin_width=50)
    out = S.hist_quantile(
        hist, qs=(0.5,), group_cols=("event_type",), bin_width=50
    ).collect()
    types = {r["event_type"] for r in out}
    assert types == {
        r["event_type"]
        for r in events.select("event_type").distinct().collect()
    }
    # per-group medians must be within a bin of exact
    import math

    for t in types:
        vals = sorted(
            r["cents"]
            for r in events.filter(F.col("event_type") == t).collect()
            if r["cents"] is not None
        )
        est = next(r["est"] for r in out if r["event_type"] == t)
        exact = vals[math.ceil(0.5 * len(vals)) - 1]
        assert abs(est - exact) < 50
