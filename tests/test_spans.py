"""ExactSubstr-style repeated-span dedup (`text/spans.py`): planted
verbatim repeats are found with exact boundaries, merged maximally,
and removed; unique text survives untouched."""

from __future__ import annotations

import pyspark.sql.functions as F

from urban_mobility_data_lakehouse_spark.text import spans as SP


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


LICENSE = "this software is provided as is without warranty of any kind"
UNIQUE_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
UNIQUE_B = "one two three four five six seven eight nine ten"


def test_planted_repeat_found_with_exact_boundaries(spark):
    docs = _docs(
        spark,
        [
            (1, f"{UNIQUE_A} {LICENSE}"),
            (2, f"{LICENSE} {UNIQUE_B}"),
            (3, UNIQUE_B + " extra unique tail words here now"),
        ],
    )
    got = {
        (r["doc_id"], r["start_pos"], r["end_pos"])
        for r in SP.repeated_spans(docs, l_tokens=8).collect()
    }
    lic_len = len(LICENSE.split())
    ub_len = len(UNIQUE_B.split())
    # doc1: license occupies positions 11..21; doc2: 1..11, and
    # UNIQUE_B (shared with doc3) occupies 12..21 — chained with the
    # license into ONE maximal span; doc3: UNIQUE_B at 1..10
    ua_len = len(UNIQUE_A.split())
    assert (1, ua_len + 1, ua_len + lic_len) in got
    assert (2, 1, lic_len + ub_len) in got
    assert (3, 1, ub_len) in got


def test_no_false_positives_on_unique_corpus(spark):
    docs = _docs(
        spark,
        [
            (i, " ".join(f"w{i}_{j}" for j in range(30)))
            for i in range(20)
        ],
    )
    assert SP.repeated_spans(docs, l_tokens=8).count() == 0


def test_remove_spans_cuts_exactly_the_repeats(spark):
    docs = _docs(
        spark,
        [
            (1, f"{UNIQUE_A} {LICENSE}"),
            (2, f"{LICENSE} {UNIQUE_B}"),
            (3, "totally unique document with its own words only"),
        ],
    )
    sp = SP.repeated_spans(docs, l_tokens=8)
    out = {
        r["doc_id"]: r["text"]
        for r in SP.remove_spans(docs, sp).collect()
    }
    assert out[1] == UNIQUE_A
    assert out[2] == UNIQUE_B  # only the license was repeated here
    assert out[3] == "totally unique document with its own words only"


def test_short_repeats_below_l_are_ignored(spark):
    shared = "just a few words"  # 4 tokens < L=8
    docs = _docs(
        spark,
        [
            (1, f"{shared} {UNIQUE_A}"),
            (2, f"{shared} {UNIQUE_B}"),
        ],
    )
    assert SP.repeated_spans(docs, l_tokens=8).count() == 0


def test_plan_stays_jvm_side(spark):
    docs = _docs(spark, [(1, UNIQUE_A), (2, UNIQUE_B)])
    sp = SP.repeated_spans(docs, l_tokens=8)
    plan = sp._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    plan2 = (
        SP.remove_spans(docs, sp)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan2


def test_short_docs_yield_no_grams_instead_of_crashing(spark):
    """A doc shorter than L tokens has no L-grams: repeated_spans must
    emit nothing for it (Spark's sequence(1, 0) is a DESCENDING
    [1, 0] — the unguarded form indexed past the token array)."""
    rows = [
        (1, "only four tokens here"),
        (2, "only four tokens here"),
        (3, "a much longer document that repeats a much longer "
            "document that repeats"),
    ]
    from urban_mobility_data_lakehouse_spark.text.spans import (
        repeated_spans,
    )

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = repeated_spans(docs, l_tokens=12).collect()
    assert all(r["doc_id"] not in (1, 2) for r in got)
    # and the guarded form still finds real repeats at smaller L
    got4 = repeated_spans(docs, l_tokens=4).collect()
    assert {r["doc_id"] for r in got4} >= {1, 2}
