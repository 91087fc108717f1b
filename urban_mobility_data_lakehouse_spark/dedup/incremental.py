"""Incremental near-duplicate detection: a lakehouse-backed MinHash
index that checks each NEW batch of documents against everything ever
ingested — without recomputing the corpus.

Production dedup at 100 TB is incremental by necessity: a training-
data pipeline receives a crawl slice per day and must answer "which of
these documents near-duplicate anything we already have (or each
other)?" in time proportional to the BATCH, not the corpus.  The
batch-mode `dedup.minhash.near_duplicates` recomputes signatures for
every document on every run; this module persists them once:

  index table (Lakehouse, partitioned by ingest batch):
      doc_id, hs ARRAY<LONG>   -- hashed-shingle set (exact verify)
      m0..m15 BIGINT           -- MinHash signature (LSH banding)

  ingest(batch) =
      1. shingle + sign the new docs only          (row-local)
      2. LSH-probe: band-key equi-join of the new docs' bands against
         index ∪ batch bands                       (the only shuffle)
      3. verify candidates with exact hashed-shingle Jaccard,
         row-local array_intersect — same geometry, same seeds, same
         rounding as the batch path                (codegen)
      4. commit the new signatures as a partition overwrite keyed by
         batch id — so RE-running a batch replaces its partition
         instead of duplicating it (idempotent retries for free)

Exactness contract (tested): ingesting batches B₁…Bₖ in any split and
unioning the returned pair frames yields EXACTLY
`near_duplicates(B₁ ∪ … ∪ Bₖ)` — every qualifying pair is emitted
exactly once, by the batch where its LATER document arrived.  That
holds because a cross-batch pair (new, old) can only be found once
`new` exists, and a within-batch pair is found by probing the batch
against itself.

Scale notes: the probe joins |batch|×BANDS band rows against the
index's — Spark/AQE broadcasts the batch side when it is small, so
the index is scanned but never shuffled.  For corpora where even the
scan dominates, bucket the index by band_key (`save_bucketed`) to
make the probe shuffle-free on the index side; the lakehouse-
partition-per-batch layout here instead optimizes the write path
(append-only history, idempotent re-ingest, time travel over index
growth).  Storing `hs` trades storage (~|shingles| longs per doc) for
exact verification — drop the column and the `jaccard` filter to run
signature-estimate-only at lower storage cost.

Reference scope note: the reference engine has no dedup surface at
all (this whole family is beyond-reference, per BASELINE.json); the
incremental shape mirrors how its daily partition upserts work
(mobility_ingestion_pipeline.py's day loop) applied to the dedup
problem.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.lakehouse import Lakehouse
from .minhash import (
    P31,
    SEEDS,
    band_keys,
    doc_shingle_arrays,
)

BATCH_COL = "ingest_batch"


class NearDupIndex:
    """Persistent MinHash+LSH index over a Lakehouse table."""

    def __init__(
        self,
        lake: Lakehouse,
        schema: str = "gold",
        name: str = "minhash_index",
        threshold: float = 0.5,
    ):
        self.lake = lake
        self.schema = schema
        self.name = name
        self.threshold = threshold

    # -- index state -------------------------------------------------------

    def _existing(self, spark: SparkSession) -> DataFrame | None:
        try:
            return self.lake.read(spark, self.schema, self.name)
        except FileNotFoundError:
            return None  # first batch bootstraps the table

    def signatures(self, spark: SparkSession) -> DataFrame:
        """The index as (doc_id, hs, m0.., ingest_batch) — versioned,
        time-travelable like any lakehouse table."""
        df = self._existing(spark)
        if df is None:
            raise FileNotFoundError(
                f"{self.schema}.{self.name}: no batches ingested yet"
            )
        return df

    # -- ingest ------------------------------------------------------------

    @staticmethod
    def _sign(batch_docs: DataFrame) -> DataFrame:
        """(doc_id, hs, m0..m{K-1}) for the batch — fully ROW-LOCAL:
        each minhash is `array_min` over the permuted hash array, which
        equals the batch path's grouped MIN over the exploded rows
        (same set, same congruence, integer min is order-free) without
        its explode → groupBy → join-back shuffles.  Signing a batch
        is therefore a single pass over the batch's rows."""
        hs = doc_shingle_arrays(batch_docs)

        def perm(a: int, b: int):
            return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(P31)

        sig_cols = [
            F.array_min(F.transform("hs", perm(a, b))).alias(f"m{k}")
            for k, (a, b) in enumerate(SEEDS)
        ]
        return hs.select("doc_id", "hs", *sig_cols)

    def ingest(
        self,
        spark: SparkSession,
        batch_docs: DataFrame,
        batch_id: str,
    ) -> DataFrame:
        """Detect near-dups of `batch_docs` against the corpus-so-far
        plus the batch itself, then commit the batch's signatures.

        Returns (doc_a, doc_b, jaccard) with doc_a < doc_b — exactly
        the rows `near_duplicates` would emit for these pairs.  The
        returned frame's scan set is frozen BEFORE the commit, so
        collecting it after ingest() returns does not double-read the
        batch.  Re-ingesting the same batch_id replaces the partition
        (idempotent) and re-emits the same pairs.
        """
        # localCheckpoint: GC-cleaned, unlike a CacheManager entry
        new = self._sign(batch_docs).localCheckpoint(eager=False)
        existing = self._existing(spark)
        sig_cols = [c for c in new.columns if c.startswith("m")]
        if existing is None:
            corpus = new.select("doc_id", "hs", *sig_cols)
        else:
            # a re-ingested doc REPLACES its indexed copy (otherwise a
            # crash-retry would pair every batch doc with its own stale
            # twin and double every verify row)
            corpus = new.select("doc_id", "hs", *sig_cols).unionByName(
                existing.select("doc_id", "hs", *sig_cols).join(
                    new.select("doc_id"), "doc_id", "left_anti"
                )
            )

        # LSH probe: batch bands × corpus bands (AQE broadcasts the
        # batch side when small → the index is scanned, never shuffled)
        probe = band_keys(new.select("doc_id", *sig_cols)).select(
            F.col("doc_id").alias("probe_id"), "band_id", "band_key"
        )
        target = band_keys(corpus.select("doc_id", *sig_cols)).select(
            F.col("doc_id").alias("target_id"), "band_id", "band_key"
        )
        cand = (
            probe.join(target, ["band_id", "band_key"])
            .filter(F.col("probe_id") != F.col("target_id"))
            .select(
                F.least("probe_id", "target_id").alias("doc_a"),
                F.greatest("probe_id", "target_id").alias("doc_b"),
            )
            .distinct()
        )

        # exact verify — identical expression chain to the batch path
        # (filter before rounding), so emitted rows are bit-equal
        a = corpus.select(
            F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a")
        )
        b = corpus.select(
            F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b")
        )
        joined = cand.join(a, "doc_a").join(b, "doc_b").select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("hs_a", "hs_b")).alias("n_common"),
            F.size("hs_a").alias("n_a"),
            F.size("hs_b").alias("n_b"),
        )
        jaccard = F.col("n_common") / (
            F.col("n_a") + F.col("n_b") - F.col("n_common")
        )
        pairs = (
            joined.filter(jaccard >= self.threshold)
            .select("doc_a", "doc_b", F.round(jaccard, 4).alias("jaccard"))
            .orderBy("doc_a", "doc_b")
        )

        self.lake.overwrite_partitions(
            new.withColumn(BATCH_COL, F.lit(str(batch_id))),
            self.schema,
            self.name,
            partition_col=BATCH_COL,
        )
        return pairs

    # -- persisted pair log + streaming ingest -----------------------------

    def ingest_and_log(
        self, spark: SparkSession, batch_docs: DataFrame, batch_id: str
    ) -> None:
        """`ingest`, then persist the emitted pairs to a companion
        `<name>_pairs` table — ALSO partitioned by batch id, so a
        replayed batch rewrites its own pair slice instead of appending
        duplicates.  Index commit and pair commit are two idempotent
        writes keyed by the same batch id: any crash-retry converges."""
        pairs = self.ingest(spark, batch_docs, batch_id)
        self.lake.overwrite_partitions(
            pairs.withColumn(BATCH_COL, F.lit(str(batch_id))),
            self.schema,
            f"{self.name}_pairs",
            partition_col=BATCH_COL,
        )

    def pairs(self, spark: SparkSession) -> DataFrame:
        """Every near-dup pair ever emitted (doc_a, doc_b, jaccard,
        ingest_batch) — by the exactness contract, equal to a full-
        corpus `near_duplicates` over everything ingested."""
        return self.lake.read(spark, self.schema, f"{self.name}_pairs")

    def streaming_ingest(
        self,
        spark: SparkSession,
        stream_docs: DataFrame,
        checkpoint_dir: str,
    ):
        """Deduplicate a document STREAM against all history: each
        micro-batch becomes one index batch (`foreachBatch`, the
        standard Structured-Streaming-to-lakehouse bridge).  Exactly-
        once composition: the checkpoint makes batch ids stable across
        restarts, and both writes are idempotent per batch id — a
        replayed micro-batch overwrites its own partitions.  Returns
        the started query (AvailableNow trigger: drain-and-stop, the
        daily-ingest shape; hand a different trigger to the returned
        builder pattern if continuous)."""

        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            self.ingest_and_log(spark, batch_df, batch_id=f"mb{batch_id}")

        return (
            stream_docs.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
