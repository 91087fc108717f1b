"""Incremental audio near-dup index: the fingerprint twin of
`multimodal/phash_index.ImageDupIndex` / `dedup/incremental.
NearDupIndex` — each NEW batch of clips is checked against every clip
ever ingested in time proportional to the BATCH, not the corpus.

Index table (Lakehouse, partitioned by ingest batch):
    media_id BIGINT, words ARRAY<BIGINT>   -- per-frame fingerprint
    ingest_batch STRING                    -- words (frame_bits order)

ingest(batch) = fingerprint the new clips only (row-local Arrow, real
rfft) → sub-fingerprint probe: exact (frame_no, word) equi-join of the
new clips' exploded words against index ∪ batch (the Haitsma–Kalker
lookup; the only shuffle) → verify candidates with the row-local
zip/xor/popcount bit-error rate → commit the batch's word arrays as a
partition overwrite keyed by batch id (idempotent retries).

Exactness contract (tested): ingesting batches in any split and
unioning the returned pair frames yields EXACTLY
`audio_near_dups(everything)` — each qualifying pair emitted once, by
the batch where its LATER clip arrived (probe side = new clips only).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.lakehouse import Lakehouse
from .audiofeats import frame_bits

BATCH_COL = "ingest_batch"


class AudioDupIndex:
    """Persistent audio-fingerprint index over a Lakehouse table."""

    def __init__(
        self,
        lake: Lakehouse,
        schema: str = "gold",
        name: str = "audio_index",
        max_ber: float = 0.15,
        n_bands: int = 8,
    ):
        self.lake = lake
        self.schema = schema
        self.name = name
        self.max_ber = max_ber
        self.n_bands = n_bands

    def _existing(self, spark: SparkSession) -> DataFrame | None:
        try:
            return self.lake.read(spark, self.schema, self.name)
        except FileNotFoundError:
            return None  # first batch bootstraps the table

    def ingest(
        self,
        spark: SparkSession,
        batch_media: DataFrame,
        batch_id: str,
    ) -> DataFrame:
        """Detect near-dups of `batch_media` (media_id, payload)
        against the corpus-so-far plus the batch itself, then commit
        the batch's fingerprint words.  Returns (media_a, media_b,
        n_frames, ber) — exactly the rows `audio_near_dups` would emit
        for these pairs."""
        new = (
            frame_bits(batch_media, n_bands=self.n_bands)
            .groupBy("media_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("frame_no", "bits"))
                ).alias("_sw")
            )
            .select(
                "media_id",
                F.transform(F.col("_sw"), lambda s: s["bits"]).alias(
                    "words"
                ),
            )
            .localCheckpoint(eager=False)
        )
        existing = self._existing(spark)
        if existing is None:
            corpus = new
        else:
            # a re-ingested clip REPLACES its indexed copy
            corpus = new.unionByName(
                existing.select("media_id", "words").join(
                    new.select("media_id"), "media_id", "left_anti"
                )
            )

        def exploded(df: DataFrame, id_alias: str) -> DataFrame:
            return df.select(
                F.col("media_id").alias(id_alias),
                F.posexplode("words").alias("frame_no", "bits"),
            )

        cand = (
            exploded(new, "probe_id")
            .join(exploded(corpus, "target_id"), ["frame_no", "bits"])
            .filter(F.col("probe_id") != F.col("target_id"))
            .select(
                F.least("probe_id", "target_id").alias("media_a"),
                F.greatest("probe_id", "target_id").alias("media_b"),
            )
            .distinct()
        )
        a = corpus.select(
            F.col("media_id").alias("media_a"),
            F.col("words").alias("wa"),
        )
        b = corpus.select(
            F.col("media_id").alias("media_b"),
            F.col("words").alias("wb"),
        )
        diff_bits = F.aggregate(
            F.zip_with(
                "wa", "wb",
                lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        pairs = (
            cand.join(a, "media_a")
            .join(b, "media_b")
            .filter(F.size("wa") == F.size("wb"))
            .select(
                "media_a",
                "media_b",
                F.size("wa").alias("n_frames"),
                F.round(
                    diff_bits / (F.size("wa") * F.lit(self.n_bands)), 4
                ).alias("ber"),
            )
            .filter(F.col("ber") <= self.max_ber)
            .orderBy("media_a", "media_b")
        )
        self.lake.overwrite_partitions(
            new.withColumn(BATCH_COL, F.lit(str(batch_id))),
            self.schema,
            self.name,
            partition_col=BATCH_COL,
        )
        return pairs

    def streaming_ingest(
        self,
        spark: SparkSession,
        stream_media: DataFrame,
        checkpoint_dir: str,
    ):
        """Deduplicate an audio STREAM against all history — the same
        `foreachBatch` exactly-once composition as the text and image
        indexes (stable batch ids + idempotent partition overwrite)."""

        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            self.ingest(spark, batch_df, batch_id=f"mb{batch_id}")

        return (
            stream_media.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
