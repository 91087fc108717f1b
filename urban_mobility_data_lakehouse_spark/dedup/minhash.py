"""MinHash + LSH near-duplicate detection over word-shingle sets.

Pipeline (each stage a separate oracle-checkable DataFrame):
  1. shingle: word 3-grams per doc (row-local, codegen transform())
  2. minhash: K independent permutations approximated by md5(seed||shingle);
     the per-doc signature is the lexicographic MIN hex digest per seed —
     engine-portable (no 64-bit int hashing needed) and uniform.
  3. LSH bands: signature split into B bands of R rows; band key =
     md5(concat of its R minhashes).  Docs sharing any band key become
     candidate pairs (P[candidate] = 1-(1-j^R)^B).
  4. verify: exact shingle-set Jaccard on candidates only.

Scale: the shingle explode is the only fan-out (≈n_tokens rows/doc); the
band self-join joins on high-entropy 128-bit keys → uniform shuffle, and
the verify join touches only candidate pairs, never the n² cross join.
Band-bucket skew (a degenerate shingle shared by everything) is bounded
because band keys hash the *whole* R-row signature slice.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# 16 hashes in 4 bands of 4 rows: P[candidate] = 1-(1-j^4)^4 — a much
# steeper S-curve than the previous 8/2 setting (recall at j=0.5 rises
# from ~0.12 to ~0.23, at j=0.7 from ~0.43 to ~0.68) at 2× md5 cost,
# which stays row-local and codegen'd.
N_HASHES = 16
BAND_ROWS = 4


def shingles(toks: Column, text: Column, n: int = 3) -> Column:
    """Distinct word n-grams from a *materialized* token-array column;
    docs shorter than n words yield the whole text as a single shingle.

    `toks` must be a bound column (not an inline split(...) expression):
    Catalyst does not do common-subexpression elimination inside
    higher-order-function lambdas, so an inline split would re-tokenize
    the document for every element_at call — observed 4× slowdown.
    """
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array(text))
    return F.array_distinct(grams)


def doc_shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    toked = documents.select(
        "doc_id", "text", F.split("text", " ").alias("toks")
    )
    return toked.select(
        "doc_id",
        F.explode(shingles(F.col("toks"), F.col("text"), n)).alias("shingle"),
    )


def signatures_from_shingles(
    exploded: DataFrame, n_hashes: int = N_HASHES
) -> DataFrame:
    """doc_id + m0..m{K-1} minhash columns from an exploded
    (doc_id, shingle) frame — one aggregation pass."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle")))).alias(f"m{s}")
        for s in range(n_hashes)
    ]
    return exploded.groupBy("doc_id").agg(*aggs)


def minhash_signatures(
    documents: DataFrame, n_hashes: int = N_HASHES
) -> DataFrame:
    return signatures_from_shingles(doc_shingles(documents), n_hashes)


def band_keys(sig: DataFrame, band_rows: int = BAND_ROWS) -> DataFrame:
    """Unpivot signatures into (doc_id, band_id, band_key)."""
    n = len([c for c in sig.columns if c.startswith("m")])
    bands = []
    for b in range(n // band_rows):
        cols = [F.col(f"m{b * band_rows + r}") for r in range(band_rows)]
        bands.append(
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(F.concat_ws("|", *cols)).alias("band_key"),
            )
        )
    return sig.select(
        "doc_id", F.explode(F.array(*bands)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_key")


def candidate_pairs(
    documents: DataFrame, exploded: DataFrame | None = None
) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing at least one LSH band.
    Pass a cached exploded-shingle frame to avoid re-shingling."""
    sig = (
        signatures_from_shingles(exploded)
        if exploded is not None
        else minhash_signatures(documents)
    )
    bands = band_keys(sig)
    a = bands.select(
        F.col("doc_id").alias("doc_a"), "band_id", "band_key"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), "band_id", "band_key"
    )
    return (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def near_duplicates(
    documents: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """LSH candidates verified by exact shingle-set Jaccard ≥ threshold."""
    sh = doc_shingles(documents).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))

    cand = candidate_pairs(documents, exploded=sh)
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sz_a = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a")
    )
    sz_b = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("n_b")
    )
    jaccard = F.col("n_common") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    return (
        common.join(sz_a, "doc_a")
        .join(sz_b, "doc_b")
        .filter(jaccard >= threshold)  # filter BEFORE rounding (oracle parity)
        .select(
            "doc_a",
            "doc_b",
            F.round(jaccard, 4).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )
