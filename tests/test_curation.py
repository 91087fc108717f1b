"""Deterministic curation primitives: content-hash splits and samples
must be stable under repartitioning (the property rand(seed)/sampleBy
lack) and land near their target proportions."""

from __future__ import annotations

import pyspark.sql.functions as F

from urban_mobility_data_lakehouse_spark.sources.testdata import load_table
from urban_mobility_data_lakehouse_spark.text.curation import (
    hash_sample,
    split_label,
    stratified_hash_sample,
)


def test_split_proportions_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    labeled = docs.select(
        "doc_id", split_label(F.col("doc_id").cast("string"))
    )
    counts = {r["split"]: r["count"] for r in
              labeled.groupBy("split").count().collect()}
    n = sum(counts.values())
    assert n == docs.count()
    assert abs(counts["train"] / n - 0.8) < 0.06
    assert abs(counts.get("val", 0) / n - 0.1) < 0.05
    assert abs(counts.get("test", 0) / n - 0.1) < 0.05

    # stable under repartitioning — the whole point
    shuffled = (
        docs.repartition(13)
        .select("doc_id", split_label(F.col("doc_id").cast("string")))
    )
    assert sorted(map(tuple, labeled.collect())) == sorted(
        map(tuple, shuffled.collect())
    )


def test_hash_sample_fraction_and_composability(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    half = hash_sample(docs, "doc_id", 0.5, salt="a")
    assert abs(half.count() / n - 0.5) < 0.08
    # independent salts compose to the product fraction
    quarter = hash_sample(half, "doc_id", 0.5, salt="b")
    assert abs(quarter.count() / n - 0.25) < 0.08
    # same salt is idempotent, not compounding
    assert hash_sample(half, "doc_id", 0.5, salt="a").count() == half.count()


def test_stratified_sample_per_stratum(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    fractions = {"en": 0.5, "es": 0.1}
    sampled = stratified_hash_sample(docs, "lang", fractions, "doc_id")
    got = {r["lang"]: r["count"] for r in
           sampled.groupBy("lang").count().collect()}
    base = {r["lang"]: r["count"] for r in
            docs.groupBy("lang").count().collect()}
    assert set(got) <= set(fractions)  # unlisted strata fully dropped
    for k, frac in fractions.items():
        if base.get(k, 0) >= 50:
            assert abs(got.get(k, 0) / base[k] - frac) < 0.12, k
