"""BM25 retrieval semantics (`text/bm25.py`).

Oracle parity at every scale factor is driver-checked (`bm25_search`);
these tests pin the behavioral contract: planted-relevance ranking,
the IDF math against hand computation, the precomputed-stats reuse
path, and the shuffle-free pure-codegen plan shape.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from urban_mobility_data_lakehouse_spark.text import bm25


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_planted_relevant_doc_ranks_first(spark):
    rows = [(i, "filler words only here nothing relevant at all") for i in range(20)]
    rows.append((100, "vector vector vector stream customer words here"))
    rows.append((101, "one vector mention in a long doc " + "pad " * 40))
    out = bm25.bm25_topk(
        _docs(spark, rows), terms=("vector", "stream"), k=5
    ).collect()
    assert out[0]["doc_id"] == 100
    # doc 101 matches but scores below the term-dense doc
    ids = [r["doc_id"] for r in out]
    assert 101 in ids and ids.index(101) > 0
    # non-matching filler docs are filtered out entirely
    assert all(i in (100, 101) for i in ids)


def test_idf_matches_hand_computation():
    stats = {"n_docs": 100, "sum_dl": 5000, "df": {"q": 10}}
    idf = bm25.idf_weights(stats, ("q",))["q"]
    assert idf == math.log(1.0 + (100 - 10 + 0.5) / 10.5)


def test_precomputed_stats_path_matches_recompute(spark):
    rows = [
        (i, f"customer stream {'vector ' * (i % 4)}tail words") for i in range(30)
    ]
    docs = _docs(spark, rows)
    stats = bm25.corpus_stats(docs, bm25.QUERY_TERMS)
    a = bm25.bm25_topk(docs).collect()
    b = bm25.bm25_topk(docs, stats=stats).collect()
    assert a == b


def test_scoring_scan_is_shuffle_free_pure_codegen(spark):
    docs = _docs(spark, [(1, "customer vector"), (2, "spark stream")])
    stats = bm25.corpus_stats(docs, bm25.QUERY_TERMS)
    plan = (
        bm25.bm25_topk(docs, stats=stats)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan  # no UDF in the hot path
    # top-k is the bounded heap, not a global sort+exchange
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_longer_doc_scores_below_equal_tf_shorter_doc(spark):
    # identical term counts, different lengths: BM25 length norm must
    # favor the shorter doc
    rows = [
        (1, "vector short doc"),
        (2, "vector " + "pad " * 60),
        (3, "unrelated filler text"),
    ]
    out = bm25.bm25_topk(_docs(spark, rows), terms=("vector",), k=5).collect()
    assert [r["doc_id"] for r in out][:2] == [1, 2]


# -- Reciprocal rank fusion -------------------------------------------------


def _ranking(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id bigint, rank bigint")


def test_rrf_agreement_beats_single_list(spark):
    from urban_mobility_data_lakehouse_spark.text.bm25 import rrf_fuse

    a = _ranking(spark, [(10, 1), (11, 2), (12, 3)])
    b = _ranking(spark, [(10, 2), (13, 1), (11, 3)])
    out = rrf_fuse([a, b], topn=10).collect()
    order = [r["doc_id"] for r in out]
    # doc 10 is high in BOTH lists → must outrank the single-list
    # leaders 13 (1st in b only) and 11 (2nd+3rd)
    assert order[0] == 10
    # every doc from either list appears
    assert set(order) == {10, 11, 12, 13}


def test_rrf_exact_scores(spark):
    from urban_mobility_data_lakehouse_spark.text.bm25 import rrf_fuse

    a = _ranking(spark, [(1, 1)])
    b = _ranking(spark, [(1, 2), (2, 1)])
    got = {r["doc_id"]: r["rrf_score"] for r in rrf_fuse([a, b]).collect()}
    assert got[1] == 1 / 61 + 1 / 62
    assert got[2] == 1 / 61


def test_rrf_hybrid_bm25_plus_knn(spark, sf_dir):
    """End-to-end hybrid: fuse the BM25 keyword list with the exact
    cosine kNN list for query vector 0 over the shared id space."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from urban_mobility_data_lakehouse_spark.similarity.knn import (
        knn_bruteforce,
    )
    from urban_mobility_data_lakehouse_spark.sources.testdata import (
        load_table,
    )
    from urban_mobility_data_lakehouse_spark.text import bm25

    docs = load_table(spark, sf_dir, "documents")
    keyword = bm25.bm25_topk(docs).select(
        F.col("doc_id"),
        F.dense_rank()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .cast("long")
        .alias("rank"),
    )
    emb = load_table(spark, sf_dir, "embeddings")
    vector = (
        knn_bruteforce(emb, n_queries=1, k=20)
        .select(F.col("neighbor_id").alias("doc_id"), "rank")
    )
    fused = bm25.rrf_fuse([keyword, vector], topn=10).collect()
    assert len(fused) == 10
    assert fused == sorted(fused, key=lambda r: r["rank"])
    # deterministic across runs
    again = bm25.rrf_fuse([keyword, vector], topn=10).collect()
    assert fused == again


def test_terms_with_quotes_score_instead_of_crashing(spark):
    """The space tokenizer keeps apostrophes, so "don't" is a legal
    corpus token — term literals must be SQL-escaped, not interpolated
    raw (ParseException before the fix)."""
    docs = spark.createDataFrame(
        [
            (1, "i don't like rainy days"),
            (2, "sunny days are fine"),
        ],
        "doc_id long, text string",
    )
    got = bm25.bm25_topk(docs, ("don't",), k=5).collect()
    assert [r["doc_id"] for r in got] == [1]


def test_terms_with_backslashes_score_instead_of_crashing(spark):
    """Spark's default parser processes backslash escapes inside
    '...'-quoted literals (DuckDB does not) — a term containing or
    ENDING IN a backslash must be escaped for the Spark templates
    (`_q_spark`), or the trailing '\\' eats the closing quote
    (ParseException) and interior ones silently decode."""
    docs = spark.createDataFrame(
        [
            (1, r"path c:\tmp\x here"),
            (2, r"trailing slash\ token"),
            (3, "no match at all"),
        ],
        "doc_id long, text string",
    )
    got = bm25.bm25_topk(docs, (r"c:\tmp\x", "slash\\"), k=5).collect()
    assert sorted(r["doc_id"] for r in got) == [1, 2]


def test_q_spark_escapes_backslashes_then_quotes():
    assert bm25._q_spark(r"a\b") == r"a\\b"
    assert bm25._q_spark("don't") == "don''t"
    assert bm25._q_spark("a\\'") == "a\\\\''"
    # DuckDB-side escaper must NOT double backslashes
    assert bm25._q(r"a\b") == r"a\b"
