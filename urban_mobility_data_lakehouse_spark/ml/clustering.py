"""Typical-day clustering dataflow (SURVEY.md §2.10 U1–U5).

Reference pipeline (mobility_ingestion_pipeline.py:640-814): SQL hourly
agg → pandas pivot → row-normalize → sklearn KMeans(k=3, seed=42) →
re-register → gold CTAS.  Spark-first rebuild: the pivot (U1) and row
normalization (U2) are DataFrame ops, clustering is MLlib KMeans (U3),
and the rejoin (U4) is a broadcast join of the tiny assignments table
back onto the hourly aggregate — the only driver-side data is the k×24
centroid matrix.

Cluster labels are permutation-unstable across implementations (SURVEY
§7 'What's hard'), so labels are deterministically re-mapped by cluster
size (desc) then earliest member date — making output stable for a given
assignment partition regardless of MLlib's internal label order.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

HOURS = list(range(24))


def hourly_totals(events: DataFrame) -> DataFrame:
    """U1 input: per (date, hour) totals from the raw event stream."""
    return events.groupBy(
        F.to_date("ts").alias("event_date"),
        F.hour("ts").alias("hour"),
    ).agg(F.sum("value").alias("total_trips"))


def day_profiles(hourly: DataFrame) -> DataFrame:
    """U1+U2: pivot to 24 hour-columns, fill gaps with 0, row-normalize.

    groupBy().pivot(values=HOURS) pre-declares the pivot domain so Spark
    skips the extra distinct-values job — at 100 TB that job would be a
    full extra scan.
    """
    wide = (
        hourly.groupBy("event_date")
        .pivot("hour", HOURS)
        .agg(F.first("total_trips"))
        .na.fill(0.0)
    )
    total = sum((F.col(str(h)) for h in HOURS[1:]), F.col("0"))
    row_sum = F.when(total == 0, F.lit(1.0)).otherwise(total)
    return wide.select(
        "event_date",
        *[(F.col(str(h)) / row_sum).alias(f"h{h}") for h in HOURS],
    )


def typical_day_clustering(
    events: DataFrame, k: int = 3, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """U3+U4: returns (assignments[event_date, cluster_id],
    gold_profile[cluster_id, hour, avg_trips, total_trips_sample]).

    Gold schema parity: gold.typical_day_by_cluster
    (mobility_ingestion_pipeline.py:708-727).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import VectorAssembler

    hourly = hourly_totals(events)
    profiles = day_profiles(hourly).cache()

    assembler = VectorAssembler(
        inputCols=[f"h{h}" for h in HOURS], outputCol="features"
    )
    model = KMeans(k=k, seed=seed, featuresCol="features").fit(
        assembler.transform(profiles)
    )
    raw = model.transform(assembler.transform(profiles)).select(
        "event_date", F.col("prediction").alias("raw_cluster")
    )

    # Deterministic relabel: biggest cluster → 0, ties by earliest date.
    sizes = raw.groupBy("raw_cluster").agg(
        F.count(F.lit(1)).alias("n_days"), F.min("event_date").alias("first_date")
    )
    order = Window.orderBy(
        F.col("n_days").desc(), F.col("first_date").asc()
    )
    relabel = sizes.select(
        "raw_cluster", (F.row_number().over(order) - 1).alias("cluster_id")
    )
    assignments = (
        raw.join(F.broadcast(relabel), "raw_cluster")
        .select("event_date", F.col("cluster_id").cast("long"))
    )

    gold = (
        hourly.join(F.broadcast(assignments), "event_date")
        .groupBy("cluster_id", F.col("hour").cast("long").alias("hour"))
        .agg(
            F.round(F.avg("total_trips"), 2).alias("avg_trips"),
            F.round(F.sum("total_trips"), 2).alias("total_trips_sample"),
        )
        .orderBy("cluster_id", "hour")
    )
    return assignments, gold


def cluster_calendar_contingency(
    assignments: DataFrame, holidays: DataFrame | None = None
) -> DataFrame:
    """U5 semantic validation: cluster × day-type contingency
    (1_sprint3_schema_reprototyping.ipynb:5691 cell 77)."""
    day_type = (
        F.when(F.weekday("event_date") >= 5, "weekend").otherwise("weekday")
    )
    df = assignments.withColumn("day_type", day_type)
    if holidays is not None:
        df = df.join(
            F.broadcast(holidays.select(F.col("holiday_date").alias("event_date"))
                        .withColumn("is_holiday", F.lit(True))),
            "event_date",
            "left",
        ).withColumn(
            "day_type",
            F.when(F.col("is_holiday"), "holiday").otherwise(F.col("day_type")),
        )
    return (
        df.groupBy("cluster_id", "day_type")
        .agg(F.count(F.lit(1)).alias("n_days"))
        .orderBy("cluster_id", "day_type")
    )
