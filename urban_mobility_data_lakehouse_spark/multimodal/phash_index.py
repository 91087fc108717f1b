"""Incremental image near-dup index: the pHash adapter of the shared
engine (`dedup.banded_index.BandedDupIndex` — see its docstring for
the sign → band-probe → verify → idempotent-commit skeleton and the
exactness contract) — each NEW batch of images is checked against
every image ever ingested in time proportional to the BATCH, not the
corpus.

Index table (Lakehouse, partitioned by ingest batch):
    media_id BIGINT, h BIGINT (the 63-bit pHash), ingest_batch STRING

The hooks here:

  _sign    pHash the new images only (row-local Arrow over the real
           stdlib decoders), stored as one 63-bit long
  _band    r-bit exact-match band keys over the hash
           (`phash.hash_bands`) — by pigeonhole any pair within
           Hamming < n_bands shares at least one band
  _verify  one row-local xor/popcount; keep pairs ≤ max_hamming

Exactness contract (tested): ingesting batches B₁…Bₖ in any split and
unioning the returned pair frames yields EXACTLY
`phash_near_dups(B₁ ∪ … ∪ Bₖ)` — every qualifying pair emitted once,
by the batch where its LATER image arrived.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..dedup.banded_index import BATCH_COL, BandedDupIndex
from ..sources.lakehouse import Lakehouse
from .phash import N_BANDS, hash_bands, image_phash

__all__ = ["BATCH_COL", "ImageDupIndex"]


class ImageDupIndex(BandedDupIndex):
    """Persistent pHash index over a Lakehouse table."""

    id_col = "media_id"
    pair_prefix = "media"

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
        super().__init__(lake, schema=schema, name=name)
        self.max_hamming = max_hamming
        self.n_bands = n_bands

    @staticmethod
    def _sign(batch_media: DataFrame) -> DataFrame:
        return image_phash(batch_media).select(
            "media_id",
            F.conv("phash", 16, 10).cast("long").alias("h"),
        )

    def _band(self, signed: DataFrame, id_alias: str) -> DataFrame:
        return hash_bands(
            signed.withColumnRenamed("media_id", id_alias),
            id_alias,
            self.n_bands,
        ).select(id_alias, "band", "key")

    def _verify(self, joined: DataFrame) -> DataFrame:
        return joined.select(
            "media_a",
            "media_b",
            F.bit_count(
                F.col("h_a").bitwiseXOR(F.col("h_b"))
            ).alias("hamming"),
        ).filter(F.col("hamming") <= self.max_hamming)
