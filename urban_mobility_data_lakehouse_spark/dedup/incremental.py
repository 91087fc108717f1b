"""Incremental near-duplicate detection: a lakehouse-backed MinHash
index that checks each NEW batch of documents against everything ever
ingested — without recomputing the corpus.

Production dedup at 100 TB is incremental by necessity: a training-
data pipeline receives a crawl slice per day and must answer "which of
these documents near-duplicate anything we already have (or each
other)?" in time proportional to the BATCH, not the corpus.  The
batch-mode `dedup.minhash.near_duplicates` recomputes signatures for
every document on every run; this index persists them once:

  index table (Lakehouse, partitioned by ingest batch):
      doc_id, hs ARRAY<LONG>   -- hashed-shingle set (exact verify)
      m0..m15 BIGINT           -- MinHash signature (LSH banding)

This is the text adapter of the shared engine
(`dedup.banded_index.BandedDupIndex` — see its docstring for the
sign → band-probe → verify → idempotent-commit skeleton, the
exactness contract, and the scale notes; the image / audio / embedding
modalities are `multimodal.phash_index.ImageDupIndex`,
`multimodal.audio_index.AudioDupIndex`, and
`similarity.incremental.EmbeddingDupIndex`).  The hooks here:

  _sign    shingle + MinHash the new docs only, fully row-local
           (array_min over the permuted hash array ≡ the batch path's
           grouped MIN, without its explode → groupBy shuffles)
  _band    md5 band keys over signature rows (`minhash.band_keys`)
  _verify  exact hashed-shingle Jaccard via row-local array_intersect
           — same geometry, same seeds, same rounding as the batch
           path, so emitted rows are bit-equal to `near_duplicates`

Storing `hs` trades storage (~|shingles| longs per doc) for exact
verification — drop the column and the `jaccard` filter to run
signature-estimate-only at lower storage cost.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.lakehouse import Lakehouse
from .banded_index import BATCH_COL, BandedDupIndex
from .minhash import (
    band_keys,
    doc_shingle_arrays,
    signature_columns,
)

__all__ = ["BATCH_COL", "NearDupIndex"]


class NearDupIndex(BandedDupIndex):
    """Persistent MinHash+LSH index over a Lakehouse table."""

    id_col = "doc_id"
    pair_prefix = "doc"

    def __init__(
        self,
        lake: Lakehouse,
        schema: str = "gold",
        name: str = "minhash_index",
        threshold: float = 0.5,
    ):
        super().__init__(lake, schema=schema, name=name)
        self.threshold = threshold

    def signatures(self, spark: SparkSession) -> DataFrame:
        """The index as (doc_id, hs, m0.., ingest_batch) — versioned,
        time-travelable like any lakehouse table."""
        return self.state(spark)

    @staticmethod
    def _sign(batch_docs: DataFrame) -> DataFrame:
        """(doc_id, hs, m0..m{K-1}) for the batch — fully ROW-LOCAL:
        each minhash is `array_min` over the permuted hash array, which
        equals the batch path's grouped MIN over the exploded rows
        (same set, same congruence, integer min is order-free) without
        its explode → groupBy → join-back shuffles.  Signing a batch
        is therefore a single pass over the batch's rows."""
        hs = doc_shingle_arrays(batch_docs)
        return hs.select("doc_id", "hs", *signature_columns())

    def _band(self, signed: DataFrame, id_alias: str) -> DataFrame:
        sig_cols = [c for c in signed.columns if c.startswith("m")]
        return band_keys(signed.select("doc_id", *sig_cols)).select(
            F.col("doc_id").alias(id_alias),
            F.col("band_id").alias("band"),
            F.col("band_key").alias("key"),
        )

    def _verify(self, joined: DataFrame) -> DataFrame:
        # identical expression chain to the batch path (filter before
        # rounding), so emitted rows are bit-equal to `near_duplicates`
        sized = joined.select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("hs_a", "hs_b")).alias("n_common"),
            F.size("hs_a").alias("n_a"),
            F.size("hs_b").alias("n_b"),
        )
        jaccard = F.col("n_common") / (
            F.col("n_a") + F.col("n_b") - F.col("n_common")
        )
        return sized.filter(jaccard >= self.threshold).select(
            "doc_a", "doc_b", F.round(jaccard, 4).alias("jaccard")
        )
