"""Sequence packing: assign documents to fixed-token-budget training
bins — the last hop before text becomes pretraining shards.

An LLM pretraining pipeline concatenates documents into fixed-length
context windows; the packing step decides which docs share a window.
Optimal bin packing is NP-hard and sequential, so at 100 TB nobody
runs it — production packers use deterministic streaming greedy
(first-fit in a fixed order), which distributes in two steps:

  1. order docs by a content-hash key (deterministic "random" order —
     stable across runs, cluster sizes, and repartitions: the same
     portability argument as `curation.hash_bucket`; never `rand()`
     or partition index) and route each doc to a shard by hash;
  2. run exact greedy WITHIN each shard.  The greedy boundary is a
     true sequential recurrence (bin slack resets at every boundary —
     not a prefix sum, so not expressible as a window function; a
     grid-aligned prefix-sum approximation only bounds bins at
     2×budget−1).  Per-shard state is exactly what
     `applyInPandas` is for (same design as the stateful
     sessionizer): one Arrow batch per shard, a vector pass in
     pandas, no driver involvement.

Shards pack independently and in parallel; a global bin id is the
(shard, bin) pair.  Docs LONGER than the budget get a bin of their
own (the downstream chunker truncates or splits them — a
tokenizer-side decision, not packing's).  Assignment depends only on
(doc_id, n_tokens, budget, n_shards), so a re-run or resumed run
rebuilds byte-identical shards.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .analysis import tokens

PACK_SCHEMA = "doc_id long, n_tokens int, shard int, bin long"


def pack_sequences(
    documents: DataFrame,
    budget: int = 2048,
    n_shards: int = 8,
    token_col: str | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, shard, bin) — deterministic greedy packing.

    Guarantees (asserted in tests/test_curation.py):
      * per-bin token total ≤ budget, except a single over-budget doc,
        which always sits alone in its bin;
      * stable under repartition / cluster resize.

    `token_col` lets callers pass a precomputed token count; default
    counts whitespace tokens (`analysis.tokens`).
    """
    if token_col is None:
        docs = documents.select(
            "doc_id",
            F.size(tokens(F.col("text"))).cast("int").alias("n_tokens"),
        )
    else:
        docs = documents.select(
            "doc_id", F.col(token_col).cast("int").alias("n_tokens")
        )
    # engine-portable hash (same md5-60bit pattern as dedup/curation):
    # shard routing and intra-shard order derive from ONE md5
    key = F.md5(F.concat(F.lit("pack:"), F.col("doc_id").cast("string")))
    key60 = F.conv(F.substring(key, 1, 15), 16, 10).cast("long")
    docs = docs.select(
        "doc_id",
        "n_tokens",
        F.pmod(key60, F.lit(n_shards)).cast("int").alias("shard"),
        key.alias("ord"),
    )

    def _pack_shard(pdf):
        pdf = pdf.sort_values(["ord", "doc_id"]).reset_index(drop=True)
        bins = []
        b, used = 0, 0
        for t in pdf["n_tokens"]:
            c = min(int(t), budget)
            if used + c > budget and used > 0:
                b, used = b + 1, 0
            bins.append(b)
            used += c
        pdf["bin"] = bins
        return pdf[["doc_id", "n_tokens", "shard", "bin"]]

    return docs.groupBy("shard").applyInPandas(_pack_shard, PACK_SCHEMA)


def bin_stats(packed: DataFrame, budget: int = 2048) -> DataFrame:
    """Packing-efficiency audit: per-shard bin count, mean fill ratio,
    and wasted-token fraction — the metric that tells you whether the
    budget/doc-length mix needs a smaller shard count or a chunker."""
    per_bin = packed.groupBy("shard", "bin").agg(
        F.sum(F.least("n_tokens", F.lit(budget))).alias("fill"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return (
        per_bin.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.round(F.avg(F.col("fill") / budget), 4).alias("avg_fill"),
            F.round(
                1 - F.sum("fill") / (F.count(F.lit(1)) * budget), 4
            ).alias("waste_frac"),
        )
        .orderBy("shard")
    )
