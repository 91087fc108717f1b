"""Model-based quality scoring (text/classifier.py).

Locks: Spark scorer == numpy reference scorer on the same weights;
self-training is deterministic; the trained model actually separates
the heuristic extremes it bootstrapped from; scoring is pure Catalyst
(no Python in the hot path).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.text.classifier import (
    numpy_scores,
    score_documents,
    self_train_quality_model,
)
from urban_mobility_data_lakehouse_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


@pytest.fixture(scope="module")
def model(docs):
    return self_train_quality_model(docs, sample_n=256)


def test_spark_scorer_matches_numpy_reference(spark, docs, model):
    w, b = model
    rows = (
        score_documents(docs, w, b)
        .select("doc_id", "text", "model_score")
        .orderBy("doc_id")
        .limit(50)
        .collect()
    )
    want = numpy_scores([r["text"] for r in rows], w, b)
    for r, expect in zip(rows, want):
        assert abs(r["model_score"] - expect) < 1e-9, r["doc_id"]


def test_self_training_is_deterministic(docs):
    w1, b1 = self_train_quality_model(docs, sample_n=256)
    w2, b2 = self_train_quality_model(docs, sample_n=256)
    assert w1 == w2 and b1 == b2


def test_model_separates_heuristic_extremes(spark, docs, model):
    """On the training extremes themselves the model must order good
    above bad on average — the minimum bar for a bootstrap filter."""
    from urban_mobility_data_lakehouse_spark.text.analysis import (
        quality_features,
    )

    w, b = model
    scored = (
        score_documents(docs, w, b)
        .join(quality_features(docs).select("doc_id", "quality_score"), "doc_id")
        .select("doc_id", "model_score", "quality_score")
        .orderBy("doc_id")
        .limit(256)
        .collect()
    )
    ranked = sorted(scored, key=lambda r: (r["quality_score"], r["doc_id"]))
    third = len(ranked) // 3
    bad = sum(r["model_score"] for r in ranked[:third]) / third
    good = sum(r["model_score"] for r in ranked[-third:]) / third
    assert good > bad + 0.2, (good, bad)


def test_scoring_is_pure_catalyst(spark, docs, model):
    w, b = model
    plan = (
        score_documents(docs, w, b)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_parquet_twin_trainer_matches_spark_pipeline(spark, sf_dir):
    """The oracle/builder twin must train the SAME weights as the
    Spark sampling + labeling pipeline — including the HALF_UP
    round-to-4 the heuristic label ordering depends on."""
    from urban_mobility_data_lakehouse_spark.sources.testdata import (
        load_table,
    )
    from urban_mobility_data_lakehouse_spark.text.classifier import (
        self_train_quality_model,
        self_train_quality_model_from_parquet,
    )

    docs = load_table(spark, sf_dir, "documents")
    w1, b1 = self_train_quality_model(docs)
    w2, b2 = self_train_quality_model_from_parquet(sf_dir)
    assert (w1, b1) == (w2, b2)
    again = self_train_quality_model_from_parquet(sf_dir)
    assert again == (w2, b2) and again[0] is not w2  # memo + copy-safe
