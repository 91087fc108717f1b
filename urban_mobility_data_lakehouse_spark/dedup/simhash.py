"""SimHash near-duplicate fingerprints (64-bit) — Spark-native bitwise
implementation (no SQL oracle: bit-vote semantics aren't reasonably
expressible in portable ANSI SQL, so the driver applies a rows-only check).

Per doc: each token hashes to 64 bits (xxhash64); each bit position votes
+1/-1; the sign vector is the fingerprint.  Near-dups = fingerprints
within a small Hamming distance, found via band-rotated exact-match
buckets (the standard 64-bit simhash blocking trick).

Scale: one explode + one group-by per doc; bucket join on 16-bit band
values is uniform.  Everything stays in JVM expressions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

BITS = 64
BANDS = 4  # 4 × 16-bit bands → catches Hamming distance ≤ 3 pairs


def simhash(documents: DataFrame) -> DataFrame:
    """(doc_id, simhash BIGINT) via bitwise vote aggregation."""
    toks = documents.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("token"),
    ).withColumn("h", F.xxhash64("token"))
    # vote per bit: sum(±1) over tokens, bit j extracted by shift+mask
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"v{j}")
            for j in range(BITS)
        ]
    )
    fp = F.lit(0).cast("long")
    for j in range(BITS):
        fp = fp.bitwiseOR(
            F.when(F.col(f"v{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j))
            .otherwise(F.lit(0).cast("long"))
        )
    return votes.select("doc_id", fp.alias("simhash"))


def _band(col, b: int):
    return F.shiftrightunsigned(col, b * 16).bitwiseAND(F.lit(0xFFFF))


def near_duplicate_candidates(documents: DataFrame) -> DataFrame:
    """Pairs agreeing on ≥1 of 4 16-bit bands, with Hamming distance."""
    fps = simhash(documents)
    bands = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_id"),
                    _band(F.col("simhash"), b).alias("band_val"),
                )
                for b in range(BANDS)
            ])
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_id", "band.band_val")
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sim_a"),
        "band_id",
        "band_val",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sim_b"),
        "band_id",
        "band_val",
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    )
