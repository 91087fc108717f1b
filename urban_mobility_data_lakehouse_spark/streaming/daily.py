"""Structured Streaming analogs of the reference's incremental loop.

The reference is batch-only: its "incremental" behavior is the per-day
partition upsert driven by Airflow dynamic task mapping (SURVEY.md
§2.9).  The idiomatic Spark translation:

  * `daily_file_ingest` — readStream over the landing directory with
    Trigger.AvailableNow + foreachBatch → idempotent partition
    overwrite.  New daily files are picked up exactly once (checkpoint
    tracks them); re-running the trigger is a no-op.  This is the
    streaming version of process_single_day.
  * `hourly_rollup_stream` — watermarked windowed aggregation of the
    event stream: the always-on variant of the hourly-demand flagship,
    tolerating late events up to the watermark.

Scale: AvailableNow processes the backlog in bounded micro-batches
(maxFilesPerTrigger) without an always-on cluster; state for the
windowed agg is bounded by the watermark horizon.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..sources.csv import all_string_schema
from ..sources.lakehouse import Lakehouse

TRIPS_COLUMNS = [
    "fecha", "periodo", "origen", "destino", "distancia",
    "actividad_origen", "actividad_destino", "residencia", "renta",
    "edad", "sexo", "viajes", "viajes_km",
]


def daily_file_ingest(
    spark: SparkSession,
    landing_dir: str,
    lake: Lakehouse,
    checkpoint_dir: str,
    max_files_per_trigger: int = 8,
) -> StreamingQuery:
    """Exactly-once bronze ingest of daily CSV drops via AvailableNow +
    foreachBatch partition overwrite."""
    stream = (
        spark.readStream.schema(all_string_schema(TRIPS_COLUMNS))
        .option("header", "true")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .csv(landing_dir)
        .select(
            "*",
            F.current_timestamp().alias("ingestion_timestamp"),
            F.lit(landing_dir).alias("source_url"),
            F.input_file_name().alias("filename"),
        )
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.filter(F.col("fecha").isNotNull())
        if batch.isEmpty():
            return
        # a day's files can SPAN micro-batches (backlog > maxFiles, or
        # one day split across files) — a bare partition overwrite
        # would replace the earlier batch's same-day rows.  Tag rows
        # with the batch id and carry PRIOR batches' rows of the
        # touched days through the overwrite; on a crash-replay of
        # this batch id, its own earlier rows are excluded first, so
        # the rewrite converges instead of duplicating (idempotence
        # keyed the same way the dedup indexes key their partitions).
        tagged = batch.withColumn("_ingest_batch", F.lit(int(batch_id)))
        try:
            live = lake.read(
                batch_df.sparkSession, "bronze", "mobility_data_stream"
            )
            days = [
                r[0] for r in batch.select("fecha").distinct().collect()
            ]
            prior = live.filter(
                F.col("fecha").isin(days)
                & (F.col("_ingest_batch") != int(batch_id))
            )
            tagged = tagged.unionByName(prior)
        except FileNotFoundError:
            pass  # first batch bootstraps the table
        lake.overwrite_partitions(
            tagged, "bronze", "mobility_data_stream", partition_col="fecha"
        )

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def hourly_rollup_stream(
    events: DataFrame,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked 1-hour windowed rollup of a streaming event frame
    (pass `spark.readStream…` input; unit tests drive it with
    availableNow over the parquet events table)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("total_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "total_value",
            "n_events",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: at-least-once sources (replayed files,
    Kafka redeliveries) become exactly-once rows downstream.

    dropDuplicatesWithinWatermark keeps one row per key and bounds the
    dedup state by the watermark horizon — at 100 TB/day the state
    table holds only the horizon's keys, not history.  (The batch
    analog is dropDuplicates/exact_dup_groups in dedup/exact.py.)
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def stream_to_table(
    stream_df: DataFrame,
    lake: Lakehouse,
    schema: str,
    name: str,
    checkpoint_dir: str,
    stream_id: str | None = None,
    transform=None,
) -> StreamingQuery:
    """Exactly-once APPEND sink for any stream into a lakehouse table.

    Idempotence is enforced at the TABLE, not just the checkpoint:
    every append commit records (stream_source, stream_batch_id) on its
    log line, and a replayed micro-batch is skipped when its batch id
    is already committed — checked INSIDE the commit lock
    (`append(unique_meta=...)`), so a zombie writer and a restarted
    query racing the same batch id cannot both land (a bare
    outside-the-lock seen-check has exactly that TOCTOU window).  That
    is the transactional-sink half of exactly-once that a bare parquet
    `foreachBatch` append lacks: the streaming checkpoint alone cannot
    protect against the sink dying AFTER the write but BEFORE the
    checkpoint commit.

    Scope of the batch-id key (the standard foreachBatch txn-version
    contract, same as Delta's txnAppId/txnVersion): it protects
    replays of THE SAME batch partitioning — sink crash, checkpoint
    loss with an unchanged source, re-run pipeline.  If the checkpoint
    is lost AND the source has since changed, batch ids restart at 0
    over DIFFERENT contents; re-keying the run (a fresh `stream_id`)
    is then the caller's responsibility, or rows under re-used ids are
    skipped.

    `transform` (optional) maps each micro-batch frame before the
    append; it must be deterministic for replays to be true no-ops.
    """
    sid = stream_id or f"{schema}.{name}"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        seen = {
            e.get("stream_batch_id")
            for e in lake.snapshots(schema, name)
            if e.get("stream_source") == sid
        }
        if batch_id in seen:
            return  # cheap pre-check: skip staging data files entirely
        out = transform(batch_df) if transform else batch_df
        lake.append(
            out, schema, name,
            extra_meta={"stream_source": sid, "stream_batch_id": batch_id},
            unique_meta=("stream_source", "stream_batch_id"),
        )

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
