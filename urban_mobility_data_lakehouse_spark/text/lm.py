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

import functools as _functools
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


# -- Interpolated bigram LM -------------------------------------------------
#
# One Markov order up from the unigram scorer: KenLM-style pipelines
# (CCNet) score with n-gram models because fluency lives in local
# word ORDER, which a unigram model is blind to — "the cat sat" and
# "sat the cat" get identical unigram scores.  Jelinek-Mercer
# interpolation (λ·p_bigram_ML + (1−λ)·p_unigram) keeps every
# probability positive without discount bookkeeping, and the model
# stays two small relations:
#
#   unigram table: top-V tokens, add-one log2 probs (as above)
#   bigram table:  observed (prev, cur) pairs with the INTERPOLATED
#                  log2 p(cur|prev) precomputed at train time
#
# Scoring joins both broadcast tables; an unobserved pair falls back
# to log2(1−λ) + unigram log2p(cur) — computed from the unigram side
# of the join, no third table.  The corpus side never shuffles before
# the per-doc aggregate (same contract as `cross_entropy`).

BIGRAM_LAMBDA = 0.7


def bigram_model(
    reference: DataFrame,
    vocab_size: int = 2048,
    lam: float = BIGRAM_LAMBDA,
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, float]:
    """(bigram_df, unigram_df, oov_log2p).

    bigram_df: (prev, cur, log2p) for observed pairs, with
    log2p = log2(λ·c(prev,cur)/c(prev) + (1−λ)·p_uni(cur)) — the full
    interpolated probability, so scoring needs no arithmetic beyond
    the fallback branch.
    """
    uni, oov_log2p = unigram_model(reference, vocab_size, text_col)
    toks = reference.select(F.split(text_col, " ").alias("t"))
    pairs = toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))),
                F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
            )
        ).alias("p")
    ).select(F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))
    big = pairs.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c2"))
    ctx = big.groupBy("prev").agg(F.sum("c2").alias("c1"))
    p_uni = uni.select(
        F.col("token").alias("cur"),
        F.pow(F.lit(2.0), F.col("log2p")).alias("pu"),
    )
    bigram = (
        big.join(ctx, "prev")
        .join(p_uni, "cur", "left")
        .select(
            "prev",
            "cur",
            F.log2(
                F.lit(lam) * F.col("c2") / F.col("c1")
                + F.lit(1.0 - lam)
                * F.coalesce(F.col("pu"), F.lit(2.0 ** oov_log2p))
            ).alias("log2p"),
        )
    )
    return bigram, uni, oov_log2p


def _bigram_events(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, prev, cur) scoring events: one row per token position,
    prev NULL for the first token — the positional explode both the
    float scorer and the exact micro-log scorer share (row-local
    transform/sequence, no shuffle).

    NULL text emits ZERO events, matching the oracle's
    unnest-of-NULL: unguarded, size(NULL) is -1 and sequence(1, -1)
    DESCENDS, emitting three bogus [1, 0, -1] OOV events per NULL doc
    (the encode_documents NULL guard, applied here too)."""
    t = F.split(text_col, " ")
    idx = F.when(F.size(t) >= 1, F.sequence(F.lit(1), F.size(t))).otherwise(
        F.array().cast("array<int>")
    )
    return docs.select(
        id_col,
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.when(i > 1, F.element_at(t, i - 1)).alias("prev"),
                    F.element_at(t, i).alias("cur"),
                ),
            )
        ).alias("e"),
    ).select(
        id_col,
        F.col("e.prev").alias("prev"),
        F.col("e.cur").alias("cur"),
    )


def bigram_cross_entropy(
    docs: DataFrame,
    bigram: DataFrame,
    unigram: DataFrame,
    oov_log2p: float,
    lam: float = BIGRAM_LAMBDA,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """docs + (xent, perplexity) under the interpolated bigram model.

    Token 1 of each document scores with the unigram model (no
    context); token i>1 scores p(cur|prev) — the stored interpolated
    value when (prev, cur) was observed, else
    (1−λ)·p_uni(cur) (or the OOV floor).  Both model relations are
    broadcast; the corpus never shuffles before the per-doc mean.
    """
    events = _bigram_events(docs, id_col, text_col)
    uni = unigram.select(
        F.col("token").alias("cur"), F.col("log2p").alias("log2p_uni")
    )
    fallback_uni = F.coalesce(
        F.col("log2p_uni"), F.lit(float(oov_log2p))
    )
    scored = (
        events.join(F.broadcast(bigram), ["prev", "cur"], "left")
        .join(F.broadcast(uni), "cur", "left")
        .select(
            id_col,
            F.when(
                F.col("prev").isNull(), fallback_uni  # first token
            )
            .when(F.col("log2p").isNotNull(), F.col("log2p"))
            .otherwise(
                F.lit(math.log2(1.0 - lam)) + fallback_uni
            )
            .alias("lp"),
        )
        .groupBy(id_col)
        .agg(
            F.avg(-F.col("lp")).alias("xent"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .withColumn("perplexity", F.pow(F.lit(2.0), F.col("xent")))
    )
    return docs.join(scored, id_col)


# -- Exact micro-log scoring (the driver-hash path) -------------------------
#
# The float scorers above are the production shape, but a driver row
# needs bit-exact cross-engine values, and neither Spark nor DuckDB
# guarantees the last ulp of log2() or the order of a float SUM.  The
# hashable variant removes BOTH hazards the way bm25 removes its log:
#
#   * every model probability is computed ONCE, driver-side, by the
#     pure-Python trainer below, and shipped to both engines as an
#     integer count of micro-log2-units (round(log2p · 1e9) — ~1e-9
#     bits of quantization, far below any filtering decision);
#   * scoring accumulates those BIGINTs — integer addition is exact
#     and order-independent, so partial aggregation, AQE, and DuckDB's
#     parallel hash agg all produce THE SAME per-document sum.
#
# xent is recoverable as sum / (n_tokens · 1e9); the driver row hashes
# the exact integer sums themselves plus a band label derived from
# integer cross-multiplication (sum < threshold · n_tokens), so no
# float ever enters the hashed output.

MICRO = 10**9


def train_lm_micrologs(
    sf_dir: str,
    vocab_size: int = 16,
    pairs_size: int = 256,
    lam: float = BIGRAM_LAMBDA,
) -> dict:
    """Spark-free LM trainer for oracle construction: reads
    `documents.parquet` with pyarrow and reproduces `unigram_model` +
    `bigram_model` semantics (add-one unigram over top-V types with a
    shared OOV bucket; Jelinek-Mercer interpolated bigram for the
    top-P observed pairs, everything else falling back to
    (1−λ)·p_uni(cur) at score time), emitting integer micro-log2
    literals instead of floats.

    The tiny defaults (V=16 of the fixture corpus's 31 types, P=256 of
    its ~900 observed pairs) are deliberate: they keep every scoring
    path — in-vocab, OOV, observed-pair, unobserved-fallback — live on
    the test corpora, which a production-sized vocabulary would
    short-circuit (nothing would ever be OOV).

    Memoized per argument tuple PLUS the file's (mtime_ns, size) — the
    builder and the oracle generator must inject IDENTICAL literals,
    and a regenerated parquet must bust the cache (the
    `train_centroids_from_parquet` contract).

    Returns {"uni": [(token, u, fb)], "bi": [(prev, cur, u)],
    "oov_u": int, "oov_fb_u": int} where u = round(log2p·1e9), fb =
    the unobserved-bigram fallback round((log2(1−λ)+log2p_uni)·1e9).
    """
    import os

    st = os.stat(f"{sf_dir}/documents.parquet")
    got = _train_lm_cached(
        sf_dir, vocab_size, pairs_size, lam, st.st_mtime_ns, st.st_size
    )
    return {
        "uni": [tuple(r) for r in got["uni"]],
        "bi": [tuple(r) for r in got["bi"]],
        "oov_u": got["oov_u"],
        "oov_fb_u": got["oov_fb_u"],
    }


@_functools.lru_cache(maxsize=8)
def _train_lm_cached(
    sf_dir: str,
    vocab_size: int,
    pairs_size: int,
    lam: float,
    mtime_ns: int,
    size: int,
) -> dict:
    from collections import Counter

    import pyarrow.parquet as pq

    texts = (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
        .column("text")
        .to_pylist()
    )
    uni_c: Counter = Counter()
    bi_c: Counter = Counter()
    ctx_c: Counter = Counter()
    for t in texts:
        toks = (t or "").split(" ")
        uni_c.update(toks)
        for a, b in zip(toks, toks[1:]):
            bi_c[(a, b)] += 1
            ctx_c[a] += 1
    n = sum(uni_c.values())
    denom = n + len(uni_c) + 1  # add-one over types + shared OOV bucket
    lg = math.log2
    top = dict(
        sorted(uni_c.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    )
    oov_lp = lg(1.0 / denom)
    uni = []
    for tok, c in sorted(top.items()):
        lp = lg((c + 1) / denom)
        uni.append(
            (tok, round(lp * MICRO), round((lg(1.0 - lam) + lp) * MICRO))
        )
    # interpolated log2 p(cur|prev) for the top-P observed pairs; pu
    # uses the TOP-V membership exactly as bigram_model's left join
    # against the truncated unigram table does
    bi = []
    for (a, b), c2 in sorted(
        bi_c.items(), key=lambda kv: (-kv[1], kv[0])
    )[:pairs_size]:
        pu = (uni_c[b] + 1) / denom if b in top else 1.0 / denom
        lp = lg(lam * c2 / ctx_c[a] + (1.0 - lam) * pu)
        bi.append((a, b, round(lp * MICRO)))
    return {
        "uni": uni,
        "bi": bi,
        "oov_u": round(oov_lp * MICRO),
        "oov_fb_u": round((lg(1.0 - lam) + oov_lp) * MICRO),
    }


def micro_lm_scores(
    docs: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, uni_u, bi_u): EXACT negated micro-log2 sums
    per document under the injected integer model — the hashable twin
    of `cross_entropy` + `bigram_cross_entropy`.

    Same scale shape as the float path: the model relations are tiny
    and broadcast; the corpus explodes row-locally into (prev, cur)
    events and never shuffles before the per-doc aggregate (map-side
    BIGINT partials).  xent_uni = uni_u / (n_tokens·1e9), same for bi.
    """
    spark = docs.sparkSession
    from ..sources.localrel import values_df

    uni_df = values_df(spark, model["uni"], "cur string, u long, fb long")
    bi_df = values_df(
        spark, model["bi"], "prev string, cur string, ub long"
    )
    events = _bigram_events(docs, id_col, text_col)
    oov_u = F.lit(int(model["oov_u"]))
    oov_fb_u = F.lit(int(model["oov_fb_u"]))
    lp_uni = F.coalesce(F.col("u"), oov_u)
    lp_bi = (
        F.when(F.col("prev").isNull(), lp_uni)  # first token: no context
        .when(F.col("ub").isNotNull(), F.col("ub"))
        .otherwise(F.coalesce(F.col("fb"), oov_fb_u))
    )
    return (
        events.join(F.broadcast(bi_df), ["prev", "cur"], "left")
        .join(F.broadcast(uni_df), "cur", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (-F.sum(lp_uni)).alias("uni_u"),
            (-F.sum(lp_bi)).alias("bi_u"),
        )
    )
