"""Incremental image near-dup index: the pHash twin of
`dedup/incremental.NearDupIndex` — each NEW batch of images is checked
against every image ever ingested in time proportional to the BATCH,
not the corpus.

Index table (Lakehouse, partitioned by ingest batch):
    media_id BIGINT, h BIGINT (the 63-bit pHash), ingest_batch STRING

ingest(batch) = hash the new images only (row-local Arrow over the
real decoders) → band-probe the new hashes against index ∪ batch
(the only shuffle; AQE broadcasts the batch side) → verify candidates
with one row-local xor/popcount → commit the batch's hashes as a
partition overwrite keyed by batch id (re-running a batch replaces
its partition: idempotent retries for free).

Exactness contract (tested): ingesting batches B₁…Bₖ in any split and
unioning the returned pair frames yields EXACTLY
`phash_near_dups(B₁ ∪ … ∪ Bₖ)` — every qualifying pair emitted once,
by the batch where its LATER image arrived (probe side = new images
only, so settled old-old pairs can never re-emit).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.lakehouse import Lakehouse
from .phash import N_BANDS, hash_bands, image_phash

BATCH_COL = "ingest_batch"


class ImageDupIndex:
    """Persistent pHash index over a Lakehouse table."""

    def __init__(
        self,
        lake: Lakehouse,
        schema: str = "gold",
        name: str = "phash_index",
        max_hamming: int = 3,
        n_bands: int = N_BANDS,
    ):
        if max_hamming >= n_bands:
            raise ValueError(
                "banding guarantees recall only for max_hamming < "
                f"n_bands ({max_hamming} >= {n_bands})"
            )
        self.lake = lake
        self.schema = schema
        self.name = name
        self.max_hamming = max_hamming
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
        the batch's hashes.  Returns (media_a, media_b, hamming) with
        media_a < media_b — exactly the rows `phash_near_dups` would
        emit for these pairs."""
        new = (
            image_phash(batch_media)
            .select(
                "media_id",
                F.conv("phash", 16, 10).cast("long").alias("h"),
            )
            .localCheckpoint(eager=False)
        )
        existing = self._existing(spark)
        if existing is None:
            corpus = new
        else:
            # a re-ingested image REPLACES its indexed copy (a crash
            # retry must not pair a batch image with its stale twin)
            corpus = new.unionByName(
                existing.select("media_id", "h").join(
                    new.select("media_id"), "media_id", "left_anti"
                )
            )
        probe = hash_bands(
            new.withColumnRenamed("media_id", "probe_id"),
            "probe_id",
            self.n_bands,
        ).withColumnRenamed("h", "hp")
        target = hash_bands(
            corpus.withColumnRenamed("media_id", "target_id"),
            "target_id",
            self.n_bands,
        ).withColumnRenamed("h", "ht")
        pairs = (
            probe.join(target, ["band", "key"])
            .filter(F.col("probe_id") != F.col("target_id"))
            .select(
                F.least("probe_id", "target_id").alias("media_a"),
                F.greatest("probe_id", "target_id").alias("media_b"),
                F.bit_count(
                    F.col("hp").bitwiseXOR(F.col("ht"))
                ).alias("hamming"),
            )
            .filter(F.col("hamming") <= self.max_hamming)
            .distinct()
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
        """Deduplicate an image STREAM against all history — each
        micro-batch becomes one index batch (`foreachBatch`); the
        checkpoint keeps batch ids stable across restarts and the
        partition overwrite is idempotent per batch id, so replays
        converge (the `NearDupIndex.streaming_ingest` composition)."""

        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            self.ingest(spark, batch_df, batch_id=f"mb{batch_id}")

        return (
            stream_media.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
