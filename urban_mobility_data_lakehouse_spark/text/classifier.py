"""Model-based document quality scoring: train tiny, score at scale.

The public recipe (CCNet, RefinedWeb, FineWeb, fastText quality
filters): a SMALL linear classifier is trained offline on a few
thousand labeled documents, then every document in the 100 TB corpus
gets a score from one streaming pass.  The engine-relevant half is the
scoring pass, and its contract here is strict:

- hashed bag-of-words features (hashing trick, D buckets) — no
  vocabulary table to join, the feature extractor is a pure function
  of the token bytes (portable md5-31bit, shared with the dedup
  stack);
- the trained weight vector rides into the plan as an ARRAY LITERAL
  (a few KB), so scoring is `aggregate(transform(tokens, …))` — fully
  row-local, shuffle-free, whole-stage-codegen, no Python in the hot
  path;
- training happens driver-side in numpy on a bounded sample
  (`limit(n)` collect — same bounded-collect discipline as the IVF
  trainer), deterministic: fixed sample order, fixed init, fixed
  full-batch gradient steps.

`train_quality_model` needs labels; `self_train_quality_model`
bootstraps them from the repo's own heuristic quality score (top vs
bottom quartile), which is exactly how production pipelines seed a
classifier from rules before human labels exist.
"""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..dedup.minhash import P31
from .analysis import quality_features

#: Feature dimension — 2^10 buckets keeps the literal weight array
#: small in the plan while leaving hash collisions rare for the
#: ~10^2-token documents this corpus holds.
DEFAULT_D = 1024


def token_buckets(text: Column, d: int = DEFAULT_D) -> Column:
    """array<int> of hashed-token feature buckets (one per token,
    duplicates kept — term frequency IS the feature value)."""
    return F.transform(
        F.split(text, " "),
        lambda t: (
            F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
            % F.lit(P31)
        ) % F.lit(d),
    )


def _bucket_counts(pdf_texts: list[str], d: int) -> np.ndarray:
    """numpy twin of `token_buckets` + counting — used by the trainer
    so driver-side features match the Spark scorer bit-for-bit."""
    import hashlib

    x = np.zeros((len(pdf_texts), d))
    for i, text in enumerate(pdf_texts):
        for t in text.split(" "):
            h60 = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            x[i, (h60 % P31) % d] += 1.0
    return x


def train_logistic(
    x: np.ndarray, y: np.ndarray, steps: int = 200, lr: float = 0.1
) -> tuple[list[float], float]:
    """Deterministic full-batch logistic regression (zero init, fixed
    step count — no randomness anywhere, so retraining on the same
    sample reproduces the identical weight vector)."""
    n, d = x.shape
    w = np.zeros(d)
    b = 0.0
    for _ in range(steps):
        z = x @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (x.T @ g) / n
        b -= lr * float(g.mean())
    return [float(v) for v in w], float(b)


def self_train_quality_model(
    docs: DataFrame,
    d: int = DEFAULT_D,
    sample_n: int = 512,
) -> tuple[list[float], float]:
    """Bootstrap a quality model from the heuristic score: take a
    bounded deterministic sample, label its top third good / bottom
    third bad, train driver-side.  Returns (weights, bias)."""
    sample = (
        docs.select("doc_id", "text")
        .join(
            quality_features(docs).select("doc_id", "quality_score"),
            "doc_id",
        )
        .orderBy("doc_id")
        .limit(sample_n)
        .collect()
    )
    ranked = sorted(sample, key=lambda r: (r["quality_score"], r["doc_id"]))
    third = len(ranked) // 3
    if third < 1:
        # ranked[-0:] would be the WHOLE sample: a <3-doc corpus has
        # no separable good/bad thirds and would train a degenerate
        # one-class model that waves everything through
        raise ValueError(
            f"self-training needs >= 3 sampled docs to form good/bad "
            f"thirds; got {len(ranked)}"
        )
    bad, good = ranked[:third], ranked[-third:]
    texts = [r["text"] for r in bad + good]
    y = np.array([0.0] * len(bad) + [1.0] * len(good))
    return train_logistic(_bucket_counts(texts, d), y)


def score_documents(
    docs: DataFrame,
    weights: list[float],
    bias: float,
    d: int | None = None,
) -> DataFrame:
    """docs + (quality_logit, model_score) from one row-local pass.

    The weight vector is inlined as an array literal; the logit is a
    left fold over the token buckets (term-frequency dot product), so
    the whole scorer compiles into the scan's codegen stage.
    """
    d = d or len(weights)
    w_arr = F.array(*[F.lit(w) for w in weights])
    logit = F.aggregate(
        token_buckets(F.col("text"), d),
        F.lit(float(bias)),
        lambda acc, bkt: acc
        + F.element_at(w_arr, (bkt + 1).cast("int")),
    )
    return docs.withColumn("quality_logit", logit).withColumn(
        "model_score",
        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("quality_logit"))),
    )


def numpy_scores(
    texts: list[str], weights: list[float], bias: float
) -> list[float]:
    """Reference scorer for parity tests."""
    x = _bucket_counts(texts, len(weights))
    z = x @ np.array(weights) + bias
    return [float(1.0 / (1.0 + math.exp(-v))) for v in z]


# -- Oracle-twin trainer (driver-hash path) ----------------------------------


def self_train_quality_model_from_parquet(
    sf_dir: str,
    d: int = DEFAULT_D,
    sample_n: int = 512,
) -> tuple[list[float], float]:
    """Spark-free twin of `self_train_quality_model` for oracle
    construction: reads `documents.parquet` with pyarrow, replays the
    deterministic sampling (lowest doc_ids), the heuristic
    quality-score labeling (same formula as `quality_features`, with
    Spark's HALF_UP round-to-4 reproduced via Decimal-over-repr — the
    BigDecimal(Double.toString) semantics), and the same
    `_bucket_counts` + `train_logistic` — so the query builder and
    the DuckDB oracle generator inject IDENTICAL weights (the
    `train_centroids_from_parquet` contract, memoized per argument
    tuple + file (mtime_ns, size))."""
    import os

    st = os.stat(f"{sf_dir}/documents.parquet")
    w, b = _train_clf_cached(
        sf_dir, d, sample_n, st.st_mtime_ns, st.st_size
    )
    return list(w), b


def _py_quality_score(text: str) -> float:
    """Pure-Python twin of `analysis.quality_features`' composite
    quality_score (including the round-to-4)."""
    from decimal import ROUND_HALF_UP, Decimal

    from .analysis import STOPWORDS

    toks = text.split(" ")
    n, nc = len(toks), len(text)
    punct = sum(c in ".,!?;:" for c in text)
    stop = sum(t in STOPWORDS["en"] for t in toks)
    sr = stop / n if n else None
    pr = punct / nc if nc else None
    score = min(1.0, n / 200.0) * 0.5
    if sr is not None and 0.05 <= sr <= 0.6:
        score += 0.3
    if pr is not None and pr < 0.1:
        score += 0.2
    return float(
        Decimal(repr(score)).quantize(
            Decimal("0.0001"), rounding=ROUND_HALF_UP
        )
    )


import functools as _functools  # noqa: E402


@_functools.lru_cache(maxsize=8)
def _train_clf_cached(
    sf_dir: str, d: int, sample_n: int, mtime_ns: int, size: int
) -> tuple[tuple[float, ...], float]:
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    rows = sorted(
        zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    )[:sample_n]
    sample = [
        (doc_id, text, _py_quality_score(text or ""))
        for doc_id, text in rows
    ]
    ranked = sorted(sample, key=lambda r: (r[2], r[0]))
    third = len(ranked) // 3
    if third < 1:
        raise ValueError(
            f"self-training needs >= 3 sampled docs; got {len(ranked)}"
        )
    bad, good = ranked[:third], ranked[-third:]
    texts = [r[1] for r in bad + good]
    y = np.array([0.0] * len(bad) + [1.0] * len(good))
    w, b = train_logistic(_bucket_counts(texts, d), y)
    return tuple(w), b
