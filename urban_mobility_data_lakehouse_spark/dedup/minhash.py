"""MinHash + LSH near-duplicate detection over word-shingle sets.

Pipeline (each stage a separate oracle-checkable DataFrame):
  1. shingle: word 3-grams per doc (row-local, codegen transform())
  2. hash: ONE portable md5-60bit per shingle (same trick as
     simhash.token_hash), reduced mod the Mersenne prime 2^31-1.
  3. minhash: K independent permutations as linear congruences
     (a_k*h + b_k) mod P over the shingle hash — exact int64
     arithmetic on both Spark and DuckDB, so the whole pipeline stays
     oracle-checkable while paying 1 md5 per shingle instead of K
     (the K-salted-md5 design cost 16 md5/shingle = the dominant term
     of the round-1 bench).
  4. LSH bands: signature split into B bands of R rows; band key =
     md5(concat of its R minhashes).  Docs sharing any band key become
     candidate pairs (P[candidate] = 1-(1-j^R)^B).
  5. verify: exact Jaccard over the hashed-shingle SETS, computed
     row-locally — each candidate pair pulls the two docs'
     array<long> shingle-hash arrays and intersects them in codegen
     (array_intersect), so nothing pair×shingle shaped is ever
     shuffled, grouped, or sorted.

Semantics note: Jaccard is over 31-bit-hashed shingle sets, not raw
strings; a per-pair collision perturbs the estimate with probability
≈|union|²/2³² (~1e-4 for 500-shingle docs) — the standard trade
(Spark MLlib's MinHashLSH hashes features the same way).

Scale: the shingle explode is the only fan-out (≈n_tokens rows/doc);
the band self-join joins on high-entropy 128-bit keys → uniform
shuffle; verification touches only candidate pairs, never the n²
cross join, and is row-local.  Band-bucket skew (a degenerate shingle
shared by everything) is bounded because band keys hash the *whole*
R-row signature slice.
"""

from __future__ import annotations

import random as _random

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# 16 hashes in 4 bands of 4 rows: P[candidate] = 1-(1-j^4)^4 — a much
# steeper S-curve than the original 8/2 setting (recall at j=0.5 rises
# from ~0.12 to ~0.23, at j=0.7 from ~0.43 to ~0.68).
N_HASHES = 16
BAND_ROWS = 4

P31 = 2_147_483_647  # Mersenne prime 2^31 - 1

# Fixed permutation seeds, shared verbatim with the generated oracle
# SQL (queries/dedup.py) so the LSH geometry can never drift.
_rng = _random.Random(20260813)
SEEDS: list[tuple[int, int]] = [
    (_rng.randrange(1, P31), _rng.randrange(0, P31))
    for _ in range(N_HASHES)
]


def shingle_hash(col: Column) -> Column:
    """Portable 31-bit shingle hash: md5-60bit reduced mod 2^31-1.

    31 bits so the K permutations (a*h+b) % P — a,h < 2^31 → product
    < 2^62 — stay inside exact signed-int64 arithmetic on both
    engines (DuckDB BIGINT ops error on overflow rather than wrap, so
    a 60-bit h would poison the congruence)."""
    h60 = F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    return h60 % F.lit(P31)


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
    """(doc_id, shingle STRING) exploded — the raw-string view, used
    by quality tests that need exact string Jaccard ground truth."""
    toked = documents.select(
        "doc_id", "text", F.split("text", " ").alias("toks")
    )
    return toked.select(
        "doc_id",
        F.explode(shingles(F.col("toks"), F.col("text"), n)).alias("shingle"),
    )


def doc_shingle_arrays(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, hs ARRAY<LONG>) — each doc's distinct hashed-shingle
    set as ONE row-local array.  Verification joins on this frame:
    a candidate pair pulls two |shingles|-sized arrays and intersects
    them in codegen, so the pair×shingle fan-out never exists."""
    toked = documents.select(
        "doc_id", "text", F.split("text", " ").alias("toks")
    )
    return toked.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                shingles(F.col("toks"), F.col("text"), n), shingle_hash
            )
        ).alias("hs"),
    )


def doc_shingle_hashes(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, h LONG) exploded hashed shingles — the minhash agg
    input."""
    return doc_shingle_arrays(documents, n).select(
        "doc_id", F.explode("hs").alias("h")
    )


def signatures_from_hashes(
    exploded: DataFrame, seeds: list[tuple[int, int]] | None = None
) -> DataFrame:
    """doc_id + m0..m{K-1} BIGINT minhash columns from an exploded
    (doc_id, h) frame — one aggregation pass, K cheap congruences per
    row (vs K md5s in the round-1 design)."""
    seeds = SEEDS if seeds is None else seeds
    # SQL strings, not Column chains: one py4j round-trip per
    # aggregate instead of ~6 (the congruence text matches the DuckDB
    # oracle's _SIG_COLS verbatim)
    aggs = [
        F.expr(f"min(({a} * h + {b}) % {P31}) AS m{k}")
        for k, (a, b) in enumerate(seeds)
    ]
    return exploded.groupBy("doc_id").agg(*aggs)


def minhash_signatures(documents: DataFrame) -> DataFrame:
    return signatures_from_hashes(doc_shingle_hashes(documents))


def signature_columns(
    seeds: list[tuple[int, int]] | None = None, hs_col: str = "hs"
) -> list[Column]:
    """The K minhash columns computed ROW-LOCALLY from a doc's hashed-
    shingle array: min((a*h+b) % P) over the doc's own set is
    `array_min` over `transform` — no explode, no shuffle, no
    aggregation.  Bit-identical to `signatures_from_hashes` over the
    exploded frame (same exact int64 congruence over the same distinct
    set; integer min is order-free), which is what keeps the DuckDB
    oracle's grouped-MIN replay exact."""
    seeds = SEEDS if seeds is None else seeds
    return [
        F.expr(
            f"array_min(transform({hs_col}, "
            f"h -> ({a} * h + {b}) % {P31})) AS m{k}"
        )
        for k, (a, b) in enumerate(seeds)
    ]


def signatures_from_arrays(
    hashed: DataFrame, seeds: list[tuple[int, int]] | None = None
) -> DataFrame:
    """doc_id + m0..m{K-1} from a `doc_shingle_arrays` frame, one
    row-local projection (see `signature_columns`).  This is the batch
    twin of `incremental.NearDupIndex._sign`: the exploded→groupBy
    signature pass cost one Generate + two HashAggregates + an
    Exchange per consumer; this costs zero of each."""
    return hashed.select("doc_id", *signature_columns(seeds))


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
    documents: DataFrame | None = None,
    exploded: DataFrame | None = None,
    hashed: DataFrame | None = None,
    sig: DataFrame | None = None,
) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing at least one LSH band.
    Pass EXACTLY ONE of raw `documents`, a cached exploded (doc_id, h)
    frame, a `doc_shingle_arrays` frame as `hashed` (signatures come
    out row-local, no explode/shuffle), or a pre-materialized
    `signatures_from_arrays` frame as `sig` (the cheapest when the
    caller also consumes the signatures, e.g. the sig-digest part:
    both band-join sides then derive from ONE signature pass instead
    of recomputing the 16 array_min(transform) congruences per side)
    — the chosen frame alone defines the corpus, so accepting a second
    frame would silently invite a mismatched pair of inputs."""
    if sum(x is not None for x in (documents, exploded, hashed, sig)) != 1:
        raise ValueError(
            "pass exactly one of documents / exploded / hashed / sig"
        )
    if sig is not None:
        pass
    elif hashed is not None:
        sig = signatures_from_arrays(hashed)
    elif exploded is not None:
        sig = signatures_from_hashes(exploded)
    else:
        sig = minhash_signatures(documents)
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
    documents: DataFrame | None = None,
    threshold: float = 0.5,
    hashed: DataFrame | None = None,
    sig: DataFrame | None = None,
) -> DataFrame:
    """LSH candidates verified by exact hashed-shingle-set Jaccard
    ≥ threshold, computed row-locally via array_intersect.  Pass
    EITHER raw documents OR a pre-checkpointed `doc_shingle_arrays`
    frame as `hashed` (when the caller also consumes the shingle sets,
    e.g. the near_dup_pairs registry row's signature-digest part —
    shingling is the corpus pass, so sharing it halves the map work).
    Never both: the hashed frame alone defines the corpus, and a
    mismatched (documents, hashed) pair would silently produce pairs
    for a corpus the caller never named.  With `hashed`, optionally
    pass a pre-materialized `sig` over the SAME frame so the band join
    derives from one signature pass (see candidate_pairs)."""
    if (documents is None) == (hashed is None):
        raise ValueError("pass exactly one of documents / hashed")
    if sig is not None and hashed is None:
        raise ValueError("sig requires hashed (same corpus frame)")
    # localCheckpoint, not .cache(): consumed three times below, and
    # checkpoint blocks are ContextCleaner-freed once the result frame
    # is GC'd, while CacheManager entries leak for the session
    hs = (
        hashed
        if hashed is not None
        else doc_shingle_arrays(documents).localCheckpoint(eager=False)
    )
    cand = (
        candidate_pairs(sig=sig)
        if sig is not None
        else candidate_pairs(hashed=hs)
    )
    a = hs.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"))
    b = hs.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"))
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
    return (
        joined
        .filter(jaccard >= threshold)  # filter BEFORE rounding (oracle parity)
        .select(
            "doc_a",
            "doc_b",
            F.round(jaccard, 4).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )
