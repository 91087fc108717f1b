"""SimHash near-duplicate fingerprints (60-bit) — Spark-native bitwise
implementation, fully oracle-checkable.

Per doc: each distinct token hashes to 60 bits (the first 15 hex chars
of md5 — portable: Spark `conv(substr(md5(t),1,15),16,10)` equals
DuckDB `CAST(CONCAT('0x', substr(md5(t),1,15)) AS UBIGINT)` exactly,
and 60 bits always fits a signed BIGINT); each bit position votes
+1/-1; the sign vector is the fingerprint.  Near-dups = fingerprints
within a small Hamming distance, found via band exact-match buckets
(4 × 15-bit bands → catches Hamming distance ≤ 3 pairs).

Scale: one explode + one group-by per doc; bucket join on 15-bit band
values is uniform.  Everything stays in JVM expressions (codegen
whens + shifts — no UDF).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

BITS = 60
BANDS = 4  # 4 × 15-bit bands
BAND_BITS = BITS // BANDS
BAND_MASK = (1 << BAND_BITS) - 1


def token_hash(col) -> F.Column:
    """Portable 60-bit token hash (md5-derived, engine-agnostic)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash(documents: DataFrame) -> DataFrame:
    """(doc_id, simhash BIGINT) via bitwise vote aggregation."""
    toks = documents.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("token"),
    ).withColumn("h", token_hash(F.col("token")))
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
    return F.shiftrightunsigned(col, b * BAND_BITS).bitwiseAND(
        F.lit(BAND_MASK)
    )


def near_duplicate_candidates(documents: DataFrame) -> DataFrame:
    """Pairs agreeing on ≥1 of 4 15-bit bands, with Hamming distance."""
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


# DuckDB oracle for the full pipeline (hash → vote → fingerprint →
# band-blocked candidate pairs) — same md5-60bit hash, same semantics.
SIMHASH_ORACLE = f"""
WITH toks AS (
    SELECT doc_id,
           unnest(list_distinct(string_split(text, ' '))) AS token
    FROM documents
),
hashed AS (
    SELECT doc_id,
           CAST(CAST(CONCAT('0x', substr(md5(token), 1, 15)) AS UBIGINT)
                AS BIGINT) AS h
    FROM toks
),
votes AS (
    SELECT doc_id, j,
           SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS vote
    FROM hashed, generate_series(0, {BITS - 1}) t(j)
    GROUP BY doc_id, j
),
fps AS (
    SELECT doc_id,
           CAST(SUM(CASE WHEN vote > 0
                         THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)
                AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
),
bands AS (
    SELECT doc_id, simhash,
           (simhash >> (b * {BAND_BITS})) & {BAND_MASK} AS band_val, b
    FROM fps, generate_series(0, {BANDS - 1}) t(b)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM bands a JOIN bands b
  ON a.b = b.b AND a.band_val = b.band_val AND a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
"""
