"""Benchmark decontamination (text/contamination.py).

Semantics locked here: a planted eval 8-gram flags exactly the
documents containing it; short eval docs decontaminate exact copies;
the broadcast-array and join-shaped plans agree row-for-row; the
corpus side of the broadcast-array plan has no shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.text.contamination import (
    mark_contaminated,
    mark_contaminated_via_join,
)
from urban_mobility_data_lakehouse_spark.sources.testdata import load_table


@pytest.fixture()
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_gram_flags_exactly_its_carriers(spark):
    gram = "one two three four five six seven eight"
    corpus = _mk(
        spark,
        [
            (0, f"prefix words {gram} suffix words"),
            (1, "totally unrelated text with enough words to have grams"),
            (2, f"{gram} leading position"),
            (3, "one two three four five six seven"),  # 7-gram prefix only
        ],
    )
    eval_set = _mk(spark, [(100, f"context {gram} more context")])
    got = {
        r["doc_id"]: (r["contam_hits"], r["contaminated"])
        for r in mark_contaminated(corpus, eval_set).collect()
    }
    assert got[0][1] and got[2][1]
    assert not got[1][1] and not got[3][1]


def test_short_eval_doc_matches_exact_copy(spark):
    corpus = _mk(spark, [(0, "tiny eval text"), (1, "tiny eval other")])
    eval_set = _mk(spark, [(100, "tiny eval text")])
    got = {
        r["doc_id"]: r["contaminated"]
        for r in mark_contaminated(corpus, eval_set).collect()
    }
    assert got[0] and not got[1]


def test_array_and_join_plans_agree(spark, docs):
    eval_set = docs.filter(F.col("doc_id") % 97 == 0)
    a = {
        (r["doc_id"], r["contam_hits"], r["contaminated"])
        for r in mark_contaminated(docs, eval_set).collect()
    }
    # join variant counts doc-side occurrences of distinct eval grams;
    # over DISTINCT doc grams they agree exactly because gram_hashes
    # is array_distinct'd per doc
    b = {
        (r["doc_id"], r["contam_hits"], r["contaminated"])
        for r in mark_contaminated_via_join(docs, eval_set).collect()
    }
    assert a == b
    # the eval members themselves are flagged (self-contamination)
    flagged = {d for d, _, c in a if c}
    assert {r["doc_id"] for r in eval_set.collect()} <= flagged


def test_corpus_side_has_no_shuffle(spark, docs):
    eval_set = docs.filter(F.col("doc_id") % 97 == 0)
    plan = (
        mark_contaminated(docs, eval_set)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # exactly the dictionary-fold aggregation exchanges (eval side);
    # the corpus side must pipeline scan→broadcast-join→project with
    # no Exchange between its scan and the join
    corpus_scan = plan.split("BroadcastNestedLoopJoin")[-1]
    assert "Exchange" not in corpus_scan.split("FileScan")[0]


def test_forced_plans_run_zero_jobs_at_build_time(spark, docs):
    """plan='array' / plan='join' must compose fully lazily — zero
    Spark jobs until an action (the adaptive default pays ONE eval-side
    sizing job, disclosed in the docstring)."""
    eval_set = docs.filter(F.col("doc_id") % 97 == 0)
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def n_jobs():
        return len(tracker.getJobIdsForGroup(None) or [])

    sc.setJobGroup(None, None)
    before = n_jobs()
    lazy_a = mark_contaminated(docs, eval_set, plan="array")
    lazy_j = mark_contaminated(docs, eval_set, plan="join")
    assert n_jobs() == before, "forced plans must not run build-time jobs"

    # and the three plans agree value-for-value
    auto = {
        tuple(r)
        for r in mark_contaminated(docs, eval_set)
        .select("doc_id", "contam_hits", "contaminated")
        .collect()
    }
    for lazy in (lazy_a, lazy_j):
        got = {
            tuple(r)
            for r in lazy.select(
                "doc_id", "contam_hits", "contaminated"
            ).collect()
        }
        assert got == auto


def test_plan_rejects_unknown_value(spark, docs):
    import pytest

    eval_set = docs.limit(1)
    with pytest.raises(ValueError):
        mark_contaminated(docs, eval_set, plan="magic")
