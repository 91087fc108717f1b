"""Corpus-level boilerplate stripping (text/boilerplate.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.text.boilerplate import (
    hot_lines,
    strip_boilerplate,
)


@pytest.fixture()
def corpus(spark):
    banner = "ACCEPT COOKIES TO CONTINUE"
    footer = "copyright example corp"
    rows = [
        (0, f"{banner}\nunique zero content\n{footer}"),
        (1, f"{banner}\nfirst doc body\nmore body\n{footer}"),
        (2, f"{banner}\nsecond body line\n{footer}"),
        (3, "no boilerplate here\njust content"),
        (4, f"self repeated\nself repeated\n{banner}"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_census_counts_distinct_docs(spark, corpus):
    hot = {r["n_docs"] for r in hot_lines(corpus, min_docs=3).collect()}
    # banner in 4 docs, footer in 3; "self repeated" only 1 DOC
    assert sorted(hot) == [3, 4]


def test_strip_removes_hot_keeps_unique(spark, corpus):
    out = {
        r["doc_id"]: (r["text"], r["n_boilerplate_lines"])
        for r in strip_boilerplate(corpus, min_docs=3).collect()
    }
    assert out[0] == ("unique zero content", 2)
    assert out[1] == ("first doc body\nmore body", 2)
    assert out[3] == ("no boilerplate here\njust content", 0)
    # within-doc repetition isn't corpus boilerplate
    assert out[4] == ("self repeated\nself repeated", 1)


def test_no_hot_lines_is_identity(spark, corpus):
    out = strip_boilerplate(corpus, min_docs=99)
    assert out.filter(F.col("n_boilerplate_lines") != 0).count() == 0
    orig = {r["doc_id"]: r["text"] for r in corpus.collect()}
    for r in out.collect():
        assert r["text"] == orig[r["doc_id"]]


def test_corpus_side_strip_is_shuffle_free(spark, corpus):
    plan = (
        strip_boilerplate(corpus, min_docs=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the only exchanges belong to the hot-census side (pre-broadcast);
    # the corpus scan joins and rebuilds without shuffling
    corpus_side = plan.split("BroadcastNestedLoopJoin")[-1]
    assert "Exchange" not in corpus_side.split("Scan")[0]
    assert "BatchEvalPython" not in plan


def test_on_fixture_documents(spark, sf_dir):
    from urban_mobility_data_lakehouse_spark.sources.testdata import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = strip_boilerplate(docs, min_docs=5)
    assert out.count() == docs.count()
    # census and strip agree: total removed lines == sum over hot
    # lines of (docs containing them)
    removed = out.agg(F.sum("n_boilerplate_lines")).collect()[0][0] or 0
    hot = hot_lines(docs, min_docs=5)
    expect = hot.agg(F.sum("n_docs")).collect()[0][0] or 0
    # a doc repeating a hot line internally removes >1 copies, so
    # removed >= expect; equality when no internal repetition
    assert removed >= expect
