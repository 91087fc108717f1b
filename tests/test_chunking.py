"""Sliding-window chunking (text/chunking.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.text.chunking import (
    chunk_documents,
    stitch_chunks,
)
from urban_mobility_data_lakehouse_spark.sources.testdata import load_table


def _doc(spark, n_tokens):
    text = " ".join(f"t{i}" for i in range(n_tokens))
    return spark.createDataFrame([(0, text)], "doc_id long, text string")


def test_exact_windows_and_overlap(spark):
    out = sorted(
        (r["chunk_no"], r["chunk_text"].split(" "))
        for r in chunk_documents(
            _doc(spark, 25), max_tokens=10, overlap=3
        ).collect()
    )
    # stride 7: chunks start at 0, 7, 14, 21 → ceil((25-3)/7)=4 chunks
    assert [c for c, _ in out] == [0, 1, 2, 3]
    assert [len(t) for _, t in out] == [10, 10, 10, 4]
    # interior neighbors share exactly `overlap` tokens
    for (_, a), (_, b) in zip(out, out[1:]):
        assert a[-3:] == b[:3]
    # full coverage, in order
    seen = out[0][1] + [t for _, ts in out[1:] for t in ts[3:]]
    assert seen == [f"t{i}" for i in range(25)]


def test_short_doc_is_one_chunk(spark):
    rows = chunk_documents(_doc(spark, 5), max_tokens=10, overlap=3).collect()
    assert len(rows) == 1
    assert rows[0]["n_chunk_tokens"] == 5


def test_round_trip_on_fixture_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    chunks = chunk_documents(docs, max_tokens=40, overlap=8)
    back = stitch_chunks(chunks, overlap=8)
    joined = docs.alias("a").join(back.alias("b"), "doc_id")
    diffs = joined.filter(F.col("a.text") != F.col("b.text")).count()
    assert diffs == 0
    assert back.count() == docs.count()


def test_chunking_is_shuffle_free(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plan = (
        chunk_documents(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_invalid_overlap_rejected(spark):
    with pytest.raises(ValueError):
        chunk_documents(_doc(spark, 5), max_tokens=8, overlap=8)
