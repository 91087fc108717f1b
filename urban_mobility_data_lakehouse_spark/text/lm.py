"""Unigram language-model perplexity scoring — the KenLM-filter shape.

The second standard quality signal next to classifier scores (CCNet
orders documents by LM perplexity; Gopher/FineWeb use it as a filter
band): train a small LM on an in-domain corpus, score every candidate
document by per-token cross-entropy.  Here the LM is a unigram model
with add-one smoothing — deliberately simple so both sides (train and
score) stay exact, deterministic DataFrame programs:

- **train** (`unigram_model`): one token-count aggregate over the
  reference corpus, truncated to the top `vocab_size` tokens
  (deterministic tie-break), plus an OOV mass from the long tail.
  Output is a tiny (vocab_size rows) model table.
- **score** (`cross_entropy`): explode doc tokens (row-local fan-out),
  broadcast-hash-join the model on the token (no shuffle of the
  corpus — the model is the build side), then ONE groupBy(doc_id)
  aggregate with map-side partials.  At 100 TB the shuffle carries
  (doc_id, partial sum) pairs, already collapsed per partition.

Cross-entropy here is mean negative log2 probability per token;
perplexity = 2^xent.  Low = fluent/in-domain, high = noise — filters
take a band (too LOW is boilerplate/repetition, too HIGH is garbage).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def unigram_model(
    reference: DataFrame, vocab_size: int = 2048, text_col: str = "text"
) -> tuple[DataFrame, float]:
    """(model_df, oov_log2p): top-`vocab_size` token log-probs with
    add-one smoothing; everything else scores the flat OOV mass.

    Deterministic: count desc, token asc tie-break (the vocab pass is
    the same TakeOrderedAndProject as tokenizer training).
    """
    counts = (
        reference.select(F.explode(F.split(text_col, " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = counts.agg(
        F.sum("cnt").alias("n_tokens"), F.count(F.lit(1)).alias("n_types")
    ).collect()[0]
    n, types = int(totals["n_tokens"]), int(totals["n_types"])
    denom = n + types + 1  # add-one over types + one shared OOV bucket
    top = (
        counts.orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(vocab_size)
        .select(
            "token",
            (F.log2((F.col("cnt") + 1) / F.lit(float(denom)))).alias(
                "log2p"
            ),
        )
    )
    oov_log2p = math.log2(1.0 / denom)
    return top, oov_log2p


def cross_entropy(
    docs: DataFrame,
    model: DataFrame,
    oov_log2p: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """docs + (xent, perplexity): per-token mean −log2 p under the
    model.  The model is broadcast; the corpus never shuffles before
    the per-doc aggregate."""
    toks = docs.select(
        id_col, F.explode(F.split(text_col, " ")).alias("token")
    )
    scored = (
        toks.join(F.broadcast(model), "token", "left")
        .groupBy(id_col)
        .agg(
            F.avg(
                -F.coalesce(F.col("log2p"), F.lit(float(oov_log2p)))
            ).alias("xent"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .withColumn("perplexity", F.pow(F.lit(2.0), F.col("xent")))
    )
    return docs.join(scored, id_col)


def perplexity_band_filter(
    docs: DataFrame,
    model: DataFrame,
    oov_log2p: float,
    lo_quantile: float = 0.05,
    hi_quantile: float = 0.95,
) -> DataFrame:
    """Keep documents inside the [lo, hi] perplexity band (both tails
    are bad: too-low = degenerate repetition, too-high = noise).
    Quantile cutoffs come from ONE approx_percentile pass."""
    scored = cross_entropy(docs, model, oov_log2p)
    lo, hi = scored.agg(
        F.expr(
            f"approx_percentile(xent, array({lo_quantile}, {hi_quantile}))"
        )
    ).collect()[0][0]
    return scored.filter(F.col("xent").between(float(lo), float(hi)))
