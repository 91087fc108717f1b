"""The shared-pipeline kmeans entry point (r13 optimization) must be
bit-identical to the two standalone entry points it fuses.

`typical_day_clusters` used to run the whole deterministic-Lloyd's
replay TWICE (once for the gold rows via `deterministic_kmeans`, once
for the per-day assignments via `deterministic_kmeans_assignments`);
`deterministic_kmeans_suite` computes both from one shared pass, and
the registry row additionally feeds it a pre-aggregated hourly frame
derived from the zone-keyed base.  These tests pin both equivalences
so the fusion can never drift from the oracle-checked originals."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_DIR
from urban_mobility_data_lakehouse_spark.ml.clustering import (
    deterministic_kmeans,
    deterministic_kmeans_assignments,
    deterministic_kmeans_suite,
    hourly_totals_exact,
)
from urban_mobility_data_lakehouse_spark.sources.testdata import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_suite_matches_standalone_entry_points(spark):
    events = load_table(spark, SF_DIR, "events")
    gold, assigns = deterministic_kmeans_suite(events, k=3, iters=5)
    assert _rows(gold) == _rows(deterministic_kmeans(events, k=3, iters=5))
    assert _rows(assigns) == _rows(
        deterministic_kmeans_assignments(events, k=3, iters=5)
    )


def test_suite_accepts_prebuilt_hourly_frame(spark):
    """The registry row's zone-keyed pre-aggregate must reproduce
    hourly_totals_exact bit-for-bit (exact integer micro-units), so the
    suite fed with it returns identical gold rows and assignments."""
    events = load_table(spark, SF_DIR, "events")
    hourly = (
        events.groupBy(
            F.to_date("ts").alias("event_date"),
            F.hour("ts").alias("hour"),
            (F.col("user_id") % 25).alias("zone_key"),
        )
        .agg(
            (F.sum(F.col("value").cast("decimal(25,6)")) * 1000000)
            .cast("long")
            .alias("vi")
        )
        .groupBy("event_date", "hour")
        .agg((F.sum("vi").cast("double") / 1e6).alias("total_trips"))
    )
    base = _rows(hourly_totals_exact(events))
    assert _rows(hourly) == base
    gold, assigns = deterministic_kmeans_suite(
        events, k=3, iters=5, hourly=hourly
    )
    assert _rows(gold) == _rows(deterministic_kmeans(events, k=3, iters=5))
    assert _rows(assigns) == _rows(
        deterministic_kmeans_assignments(events, k=3, iters=5)
    )
