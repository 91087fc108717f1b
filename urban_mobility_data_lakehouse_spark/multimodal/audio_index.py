"""Incremental audio near-dup index: the fingerprint adapter of the
shared engine (`dedup.banded_index.BandedDupIndex` — see its docstring
for the sign → band-probe → verify → idempotent-commit skeleton and
the exactness contract) — each NEW batch of clips is checked against
every clip ever ingested in time proportional to the BATCH, not the
corpus.

Index table (Lakehouse, partitioned by ingest batch):
    media_id BIGINT, words ARRAY<BIGINT>   -- per-frame fingerprint
    ingest_batch STRING                    -- words (frame_bits order)

The hooks here:

  _sign    fingerprint the new clips only (row-local Arrow, real
           rfft), one word per STFT frame in frame order
  _band    posexplode the words: band = frame_no, key = word — the
           Haitsma–Kalker exact sub-fingerprint lookup
  _verify  row-local zip/xor/popcount bit-error rate; keep pairs of
           equal frame count with BER ≤ max_ber
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..dedup.banded_index import BATCH_COL, BandedDupIndex
from ..sources.lakehouse import Lakehouse
from .audiofeats import frame_bits

__all__ = ["BATCH_COL", "AudioDupIndex"]


class AudioDupIndex(BandedDupIndex):
    """Persistent audio-fingerprint index over a Lakehouse table."""

    id_col = "media_id"
    pair_prefix = "media"

    def __init__(
        self,
        lake: Lakehouse,
        schema: str = "gold",
        name: str = "audio_index",
        max_ber: float = 0.15,
        n_bands: int = 8,
    ):
        super().__init__(lake, schema=schema, name=name)
        self.max_ber = max_ber
        self.n_bands = n_bands

    def _sign(self, batch_media: DataFrame) -> DataFrame:
        return (
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
        )

    def _band(self, signed: DataFrame, id_alias: str) -> DataFrame:
        return signed.select(
            F.col("media_id").alias(id_alias),
            F.posexplode("words").alias("band", "key"),
        )

    def _verify(self, joined: DataFrame) -> DataFrame:
        diff_bits = F.aggregate(
            F.zip_with(
                "words_a",
                "words_b",
                lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        return (
            joined.filter(F.size("words_a") == F.size("words_b"))
            .select(
                "media_a",
                "media_b",
                F.size("words_a").alias("n_frames"),
                F.round(
                    diff_bits
                    / (F.size("words_a") * F.lit(self.n_bands)),
                    4,
                ).alias("ber"),
            )
            .filter(F.col("ber") <= self.max_ber)
        )
