"""Domain-mixing sampler (text/mixing.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.text.mixing import (
    group_token_totals,
    mix_to_budget,
    mixing_rates,
    sample_mixture,
)
from urban_mobility_data_lakehouse_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )


def _tokens_by_group(df):
    return {
        r["source"]: int(r["t"])
        for r in df.groupBy("source")
        .agg(F.sum(F.size(F.split("text", " "))).alias("t"))
        .collect()
    }


def test_rates_hit_token_targets(docs):
    totals = group_token_totals(docs)
    assert len(totals) >= 2, "fixture needs several sources"
    weights = {g: 1.0 for g in totals}  # equal-share mixture
    budget = sum(totals.values()) // 2
    mixed = mix_to_budget(docs, weights, budget)
    got = _tokens_by_group(mixed)
    target_per_group = budget / len(totals)
    # expectation is exact; realization on the fixture's ~25-doc
    # groups carries binomial noise — pin the global total tight and
    # each group loosely
    total = sum(got.values())
    assert abs(total - budget) / budget < 0.10, total
    for g, t in got.items():
        assert abs(t - target_per_group) / target_per_group < 0.60, (g, t)


def test_sampling_is_deterministic_and_repartition_stable(docs):
    totals = group_token_totals(docs)
    weights = {g: 1.0 for g in totals}
    budget = sum(totals.values()) // 3
    a = sorted(
        (r["doc_id"], r["copy_no"])
        for r in mix_to_budget(docs, weights, budget).collect()
    )
    b = sorted(
        (r["doc_id"], r["copy_no"])
        for r in mix_to_budget(docs.repartition(13), weights, budget).collect()
    )
    assert a == b


def test_upsampling_emits_exact_copy_counts(spark):
    rows = [(i, "good", "w " * 10) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = sample_mixture(docs, {"good": 2.5})
    counts = {
        r["doc_id"]: r["c"]
        for r in out.groupBy("doc_id").agg(F.count("*").alias("c")).collect()
    }
    assert set(counts.values()) <= {2, 3}
    assert len(counts) == 200  # nobody dropped at rate >= 1
    mean = sum(counts.values()) / len(counts)
    assert abs(mean - 2.5) < 0.15
    # copy_no is a clean 0..n-1 tag per doc
    tags = sorted(
        r["copy_no"] for r in out.filter(F.col("doc_id") == 0).collect()
    )
    assert tags == list(range(len(tags)))


def test_unweighted_groups_are_dropped(spark):
    docs = spark.createDataFrame(
        [(1, "keep", "a b c"), (2, "drop", "d e f")],
        "doc_id long, source string, text string",
    )
    rates = mixing_rates(group_token_totals(docs), {"keep": 1.0}, 3)
    out = sample_mixture(docs, rates)
    assert [r["source"] for r in out.collect()] == ["keep"]


def test_mixture_pass_is_row_local(docs):
    totals = group_token_totals(docs)
    plan = (
        sample_mixture(docs, {g: 0.5 for g in totals})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_parquet_rates_twin_matches_spark_totals(spark, sf_dir):
    """The oracle/builder rates twin must derive the SAME rates as the
    Spark per-group aggregate + mixing_rates arithmetic."""
    from urban_mobility_data_lakehouse_spark.sources.testdata import (
        load_table,
    )
    from urban_mobility_data_lakehouse_spark.text.mixing import (
        group_token_totals,
        mixing_rates,
        mixing_rates_from_parquet,
    )

    weights = tuple(sorted(
        {f"src{i}": (3.0 if i < 5 else 1.0) for i in range(15)}.items()
    ))
    docs = load_table(spark, sf_dir, "documents")
    totals = group_token_totals(docs)
    via_spark = mixing_rates(totals, dict(weights), sum(totals.values()))
    via_arrow = mixing_rates_from_parquet(sf_dir, weights)
    assert via_arrow == via_spark
