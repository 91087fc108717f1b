"""Dataset-curation primitives: deterministic splits and samples.

Training-data pipelines need train/val/test assignment and downsampling
that are REPRODUCIBLE — the same row must land in the same split on
every run, on any cluster size, after any repartition.  Spark's
`rand(seed)`/`sampleBy` are seeded per-partition, so a resize or a
shuffle reorders the stream and reassigns rows; the scalable answer is
content hashing: bucket = md5(salt || id) mod N, a pure row-local
expression (portable to the DuckDB oracle, same trick as
dedup/minhash).

Changing `salt` re-rolls every assignment (a fresh "seed"); holding it
fixed makes assignment a stable property of the row itself — which is
also what keeps splits LEAK-FREE under dedup: hash the *canonical*
document id, and near-duplicates collapsed to one canonical id can
never straddle train/test.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

N_BUCKETS = 10_000  # split resolution: 0.01%


def hash_bucket(
    id_col: Column, salt: str = "split", n_buckets: int = N_BUCKETS
) -> Column:
    """Deterministic bucket in [0, n_buckets): md5 of the salted id.
    60 bits of hash → bias from the modulo is ≤ n_buckets/2^60."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), id_col)), 1, 15),
        16,
        10,
    ).cast("long")
    return h % F.lit(n_buckets)


def split_label(
    id_col: Column,
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> Column:
    """Label column assigning each row to a named split by weight
    (default 80/10/10 train/val/test)."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    bucket = hash_bucket(id_col, salt)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = bucket < F.lit(int(round(acc * N_BUCKETS)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    return (F.lit(last) if expr is None else expr.otherwise(last)).alias(
        "split"
    )


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Deterministic ~`fraction` sample: keeps rows whose hash bucket
    falls below the threshold.  Unlike df.sample(), the kept set is a
    function of row content — stable across runs, partitionings, and
    cluster sizes, and composable (a 0.5 sample of a 0.5 sample with
    different salts is an unbiased 0.25)."""
    thresh = int(round(fraction * N_BUCKETS))
    return df.filter(hash_bucket(F.col(id_col), salt) < F.lit(thresh))


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    id_col: str,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling (the reproducible sampleBy):
    each stratum keeps its own fraction, rows chosen by content hash."""
    thresh = None
    for k, frac in fractions.items():
        t = F.when(
            F.col(strata_col) == k, F.lit(int(round(frac * N_BUCKETS)))
        )
        thresh = t if thresh is None else thresh.when(
            F.col(strata_col) == k, F.lit(int(round(frac * N_BUCKETS)))
        )
    thresh = thresh.otherwise(F.lit(0)) if thresh is not None else F.lit(0)
    return df.filter(hash_bucket(F.col(id_col), salt) < thresh)


def leakage_safe_split(
    documents: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Split assignment that cannot leak near-duplicates across splits.

    A per-document hash split puts two near-identical documents in
    different splits with probability ~2·p·(1−p) — training on one and
    evaluating on the other is contamination, the classic silent eval
    inflation in LLM data pipelines.  The fix: hash the CLUSTER
    representative, not the document — every member of a near-dup
    cluster (the transitive closure from `dedup.components.
    duplicate_clusters`) shares its representative's bucket, so whole
    clusters move between splits as units.  Singletons (absent from
    `clusters`) fall back to their own id — identical to the plain
    split for them.

    Cost: one broadcast-sized (or shuffled, if the duplicate population
    is huge) left join on the cluster map, bounded by the duplicate
    population, then the same pure-Column hash as `split_label`.
    """
    rep = F.coalesce(F.col("cluster_id"), F.col(id_col)).cast("string")
    return (
        documents.join(
            clusters.withColumnRenamed("doc_id", id_col), [id_col], "left"
        )
        .withColumn("split", split_label(rep, weights=weights, salt=salt))
        .drop("cluster_id")
    )
