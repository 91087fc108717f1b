"""Incremental embedding near-dup index — the vector adapter of the
shared engine (`dedup.banded_index.BandedDupIndex` — see its docstring
for the sign → band-probe → verify → idempotent-commit skeleton and
the exactness contract) — each NEW batch of vectors is checked against
every vector ever ingested in time proportional to the BATCH, not the
corpus.

Index table (Lakehouse, partitioned by ingest batch):
    vec_id BIGINT, e ARRAY<DOUBLE>, lsh_sig BIGINT, ingest_batch STRING

The hooks here:

  _sign    hyperplane-sign the new vectors only (the Arrow
           `lsh_signatures` pass; the planes are seed-derived so
           stored and fresh signatures always agree); float64
           embeddings round-trip parquet exactly, so re-verifying
           against stored vectors loses nothing
  _band    r-bit band keys sliced out of the packed signature
  _verify  exact HOF cosine with the identical fold order to the
           batch path — the engine joins state back by the SWAPPED
           (lower, higher) ids, so cosine(e_a, e_b) is exactly the
           batch path's cosine(e_lower_id, e_higher_id) and emitted
           rows are bit-equal to `banded_near_dups`
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..dedup.banded_index import BATCH_COL, BandedDupIndex
from ..sources.lakehouse import Lakehouse
from .knn import _as_double, cosine, lsh_signatures

__all__ = ["BATCH_COL", "EmbeddingDupIndex"]


class EmbeddingDupIndex(BandedDupIndex):
    """Persistent banded-hyperplane index over a Lakehouse table."""

    id_col = "vec_id"
    pair_prefix = "vec"

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
        super().__init__(lake, schema=schema, name=name)
        self.threshold = threshold
        self.n_planes = n_planes
        self.n_bands = n_bands
        self.seed = seed
        self.dim = dim

    def _sign(self, batch_embeddings: DataFrame) -> DataFrame:
        sigs = lsh_signatures(
            batch_embeddings, self.n_planes, self.seed, self.dim
        )
        return batch_embeddings.select(
            "vec_id", _as_double(F.col("embedding")).alias("e")
        ).join(sigs, "vec_id")

    def _band(self, signed: DataFrame, id_alias: str) -> DataFrame:
        r = self.n_planes // self.n_bands
        return signed.select(
            F.col("vec_id").alias(id_alias),
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
            id_alias,
            F.col("bk.band").alias("band"),
            F.col("bk.key").alias("key"),
        )

    def _verify(self, joined: DataFrame) -> DataFrame:
        # e_a is the LOWER id's vector, so the fold order matches the
        # batch path's cosine(e_lower_id, e_higher_id) bit-for-bit
        cos = cosine(F.col("e_a"), F.col("e_b"))
        return joined.filter(cos >= self.threshold).select(
            "vec_a", "vec_b", F.round(cos, 4).alias("cosine_sim")
        )
