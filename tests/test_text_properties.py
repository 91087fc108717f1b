"""Property tests for the round-4 text operators.

Driver-side hypothesis generation, one Spark job per case batch —
the same pattern as test_cleaning_properties.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from urban_mobility_data_lakehouse_spark.text.chunking import (
    chunk_documents,
    stitch_chunks,
)
from urban_mobility_data_lakehouse_spark.text.contamination import (
    mark_contaminated,
)

_settings = settings(max_examples=12, deadline=None)


@given(
    n_tokens=st.integers(1, 300),
    max_tokens=st.integers(2, 64),
    data=st.data(),
)
@_settings
def test_chunking_round_trips_any_geometry(spark, n_tokens, max_tokens, data):
    overlap = data.draw(st.integers(0, max_tokens - 1))
    text = " ".join(f"w{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    chunks = chunk_documents(df, max_tokens=max_tokens, overlap=overlap)
    rows = sorted(
        (r["chunk_no"], r["chunk_text"], r["n_chunk_tokens"])
        for r in chunks.collect()
    )
    # all chunks but the last are full-size; none exceeds max_tokens
    sizes = [n for _, _, n in rows]
    assert all(s == max_tokens for s in sizes[:-1])
    assert 1 <= sizes[-1] <= max_tokens
    # exact inverse
    [back] = stitch_chunks(chunks, overlap=overlap).collect()
    assert back["text"] == text


@given(extra=st.integers(0, 3))
@_settings
def test_contamination_is_monotone_in_eval_set(spark, extra):
    """Growing the eval set can only grow per-doc hit counts."""
    corpus = spark.createDataFrame(
        [
            (i, " ".join(f"tok{i}_{j}" for j in range(12)) + " shared tail "
             + " ".join(f"x{j}" for j in range(8)))
            for i in range(6)
        ],
        "doc_id long, text string",
    )
    small = corpus.filter(F.col("doc_id") == 0)
    big = corpus.filter(F.col("doc_id") <= extra)
    h_small = {
        r["doc_id"]: r["contam_hits"]
        for r in mark_contaminated(corpus, small).collect()
    }
    h_big = {
        r["doc_id"]: r["contam_hits"]
        for r in mark_contaminated(corpus, big).collect()
    }
    assert all(h_big[d] >= h_small[d] for d in h_small)
