"""Incremental embedding near-dup index — the fourth modality of the
incremental-index family (text: `dedup/incremental.NearDupIndex`;
image: `multimodal/phash_index.ImageDupIndex`; audio:
`multimodal/audio_index.AudioDupIndex`): each NEW batch of vectors is
checked against every vector ever ingested in time proportional to the
BATCH, not the corpus.

Index table (Lakehouse, partitioned by ingest batch):
    vec_id BIGINT, e ARRAY<DOUBLE>, lsh_sig BIGINT, ingest_batch STRING

ingest(batch) = hyperplane-sign the new vectors only (the Arrow
`lsh_signatures` pass; the planes are seed-derived so stored and fresh
signatures always agree) → band-probe the new signatures against
index ∪ batch (equi-join on (band, key) — the only shuffle) → verify
candidates with the exact HOF cosine (identical fold order to the
batch path, so emitted rows are bit-equal to `banded_near_dups`) →
commit the batch as a partition overwrite keyed by batch id
(idempotent retries).  float64 embeddings round-trip parquet exactly,
so re-verifying against stored vectors loses nothing.

Exactness contract (tested): ingesting batches in any split and
unioning the returned pair frames yields EXACTLY
`banded_near_dups(everything)` — each qualifying pair emitted once,
by the batch where its LATER vector arrived (probe side = new vectors
only, so settled old-old pairs can never re-emit).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.lakehouse import Lakehouse
from .knn import _as_double, cosine, lsh_signatures

BATCH_COL = "ingest_batch"


class EmbeddingDupIndex:
    """Persistent banded-hyperplane index over a Lakehouse table."""

    def __init__(
        self,
        lake: Lakehouse,
        schema: str = "gold",
        name: str = "embedding_index",
        threshold: float = 0.45,
        n_planes: int = 16,
        n_bands: int = 4,
        seed: int = 42,
        dim: int = 64,
    ):
        self.lake = lake
        self.schema = schema
        self.name = name
        self.threshold = threshold
        self.n_planes = n_planes
        self.n_bands = n_bands
        self.seed = seed
        self.dim = dim

    def _existing(self, spark: SparkSession) -> DataFrame | None:
        try:
            return self.lake.read(spark, self.schema, self.name)
        except FileNotFoundError:
            return None  # first batch bootstraps the table

    def _bands(self, df: DataFrame, id_alias: str) -> DataFrame:
        r = self.n_planes // self.n_bands
        return df.select(
            F.col("vec_id").alias(id_alias),
            F.col("e"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.shiftrightunsigned(
                                F.col("lsh_sig"),
                                (self.n_bands - 1 - b) * r,
                            )
                            .bitwiseAND(F.lit((1 << r) - 1))
                            .alias("key"),
                        )
                        for b in range(self.n_bands)
                    ]
                )
            ).alias("bk"),
        ).select(
            id_alias, "e",
            F.col("bk.band").alias("band"),
            F.col("bk.key").alias("key"),
        )

    def ingest(
        self,
        spark: SparkSession,
        batch_embeddings: DataFrame,
        batch_id: str,
    ) -> DataFrame:
        """Detect near-dups of `batch_embeddings` (vec_id, embedding)
        against the corpus-so-far plus the batch itself, then commit
        the batch's vectors + signatures.  Returns (vec_a, vec_b,
        cosine_sim) — exactly the rows `banded_near_dups` would emit
        for these pairs."""
        sigs = lsh_signatures(
            batch_embeddings, self.n_planes, self.seed, self.dim
        )
        new = (
            batch_embeddings.select(
                "vec_id", _as_double(F.col("embedding")).alias("e")
            )
            .join(sigs, "vec_id")
            .localCheckpoint(eager=False)
        )
        existing = self._existing(spark)
        if existing is None:
            corpus = new
        else:
            # a re-ingested vector REPLACES its indexed copy
            corpus = new.unionByName(
                existing.select("vec_id", "e", "lsh_sig").join(
                    new.select("vec_id"), "vec_id", "left_anti"
                )
            )
        a = self._bands(new, "vec_a").withColumnRenamed("e", "ea")
        b = self._bands(corpus, "vec_b").withColumnRenamed("e", "eb")
        cands = (
            a.join(b, ["band", "key"])
            .filter(F.col("vec_a") != F.col("vec_b"))
            .select(
                F.least("vec_a", "vec_b").alias("vec_a"),
                F.greatest("vec_a", "vec_b").alias("vec_b"),
                # keep the embedding columns aligned with the SWAPPED
                # ids so the verify's fold order matches the batch
                # path (cosine(e_lower_id, e_higher_id))
                F.when(
                    F.col("vec_a") < F.col("vec_b"), F.col("ea")
                ).otherwise(F.col("eb")).alias("e_lo"),
                F.when(
                    F.col("vec_a") < F.col("vec_b"), F.col("eb")
                ).otherwise(F.col("ea")).alias("e_hi"),
            )
            .dropDuplicates(["vec_a", "vec_b"])
        )
        cos = cosine(F.col("e_lo"), F.col("e_hi"))
        pairs = (
            cands.filter(cos >= self.threshold)  # filter pre-rounding
            .select(
                "vec_a", "vec_b", F.round(cos, 4).alias("cosine_sim")
            )
            .orderBy("vec_a", "vec_b")
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
        stream_embeddings: DataFrame,
        checkpoint_dir: str,
    ):
        """Deduplicate an embedding STREAM against all history — the
        same `foreachBatch` exactly-once composition as the other
        three indexes."""

        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            self.ingest(spark, batch_df, batch_id=f"mb{batch_id}")

        return (
            stream_embeddings.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
