"""Deterministic domain-mixing sampler: hit per-source token budgets.

Pretraining corpora are MIXED, not concatenated: each source/domain
gets a target share of the token budget (the public recipes — GPT-3's
weighted sampling, The Pile, DoReMi's static weights — all reduce to
per-group sampling rates, possibly > 1 for upsampled high-quality
sources).  The engine-relevant contract at 100 TB:

- computing the rates needs ONE small aggregate (per-group token
  totals — |groups| rows, collected driver-side, bounded);
- applying them must be a row-local pass: no shuffle, no join, no
  rand().  Sampling uses the deterministic content-hash thresholds of
  `text/curation.py` (md5 of a salted doc_id), so the decision for a
  document never changes under repartitioning, retries, or growth of
  OTHER groups — the property rand(seed) does not have (row order
  dependence) and sampleBy does not guarantee across reruns.
- upsampling (rate > 1) emits floor(rate) full copies plus one
  hash-gated fractional copy, via a row-local `explode(sequence(...))`
  — each copy tagged with `copy_no` so downstream shuffles/dedup can
  tell them apart, expected token count = rate × group tokens.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_M = 10_000  # threshold resolution: rates quantize to 0.01%

def _frac_hash(doc_id: Column, salt: str = "mix") -> Column:
    """Deterministic uniform int in [0, _M) from the doc id (the
    curation-split hash idiom, different salt → independent of the
    train/val/test assignment)."""
    h60 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), doc_id.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return h60 % _M


def group_token_totals(
    docs: DataFrame, by: str = "source"
) -> dict[str, int]:
    """Per-group whitespace-token totals — the one (tiny) aggregate."""
    rows = (
        docs.groupBy(by)
        # NULL text counts ZERO tokens (size(split(NULL)) is -1, which
        # would SUBTRACT from the group total and diverge from the
        # oracle's unnest-of-NULL)
        .agg(
            F.sum(
                F.greatest(F.size(F.split("text", " ")), F.lit(0))
            ).alias("toks")
        )
        .collect()
    )
    return {r[by]: int(r["toks"]) for r in rows}


def mixing_rates(
    totals: dict[str, int],
    weights: dict[str, float],
    budget_tokens: int,
) -> dict[str, float]:
    """target_g = weight_g/Σweights × budget; rate_g = target_g/actual_g.

    Rates may exceed 1 (upsampling); groups absent from `weights` get
    rate 0 (dropped from the mixture).
    """
    wsum = sum(weights.values())
    return {
        g: (weights.get(g, 0.0) / wsum) * budget_tokens / t if t else 0.0
        for g, t in totals.items()
    }


def sample_mixture(
    docs: DataFrame,
    rates: dict[str, float],
    by: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply per-group rates in one row-local pass.

    Output = input columns + `copy_no` (0-based).  A doc in group g
    appears floor(rate_g) times always, +1 more iff its hash falls
    under the fractional part — so group token expectation is exactly
    rate_g × tokens_g, and the realized count is a deterministic
    function of the corpus content alone.
    """
    rate_col: Column = F.lit(0.0)
    for g, r in rates.items():
        rate_col = F.when(F.col(by) == g, F.lit(float(r))).otherwise(rate_col)
    whole = F.floor(rate_col).cast("int")
    frac_keep = (
        _frac_hash(F.col(id_col))
        < (rate_col - F.floor(rate_col)) * _M
    ).cast("int")
    n_copies = whole + frac_keep
    return (
        docs.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn(
            "copy_no", F.explode(F.sequence(F.lit(0), F.col("__n") - 1))
        )
        .drop("__n")
    )


def mix_to_budget(
    docs: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    by: str = "source",
) -> DataFrame:
    """Convenience: totals → rates → sampled mixture."""
    rates = mixing_rates(group_token_totals(docs, by), weights, budget_tokens)
    return sample_mixture(docs, rates, by=by)


# -- Oracle-twin rate computation (driver-hash path) -------------------------

import functools as _functools


def mixing_rates_from_parquet(
    sf_dir: str,
    weights: tuple[tuple[str, float], ...],
    budget_frac: float = 1.0,
) -> dict[str, float]:
    """Spark-free twin of `group_token_totals` + `mixing_rates` for
    oracle construction: pyarrow token totals per source (the same
    whitespace-split count), budget = `budget_frac` × the corpus
    token total, rates via the same `mixing_rates` arithmetic — so
    the query builder and the DuckDB oracle generator inject
    IDENTICAL rate literals (memoized per argument tuple + file
    (mtime_ns, size)).  `weights` is a sorted tuple of items so the
    memo key is hashable."""
    import os

    st = os.stat(f"{sf_dir}/documents.parquet")
    got = _mix_rates_cached(
        sf_dir, weights, budget_frac, st.st_mtime_ns, st.st_size
    )
    return dict(got)


@_functools.lru_cache(maxsize=8)
def _mix_rates_cached(
    sf_dir: str,
    weights: tuple[tuple[str, float], ...],
    budget_frac: float,
    mtime_ns: int,
    size: int,
) -> tuple[tuple[str, float], ...]:
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )
    totals: dict[str, int] = {}
    for src, text in zip(
        tbl.column("source").to_pylist(), tbl.column("text").to_pylist()
    ):
        totals[src] = totals.get(src, 0) + len((text or "").split(" "))
    budget = int(budget_frac * sum(totals.values()))
    rates = mixing_rates(totals, dict(weights), budget)
    return tuple(sorted(rates.items()))
