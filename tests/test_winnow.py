"""Winnowing fingerprint guarantees (Schleimer et al., SIGMOD 2003):
the properties an oracle diff can't express — window coverage and
shared-substring detection."""

from __future__ import annotations

from urban_mobility_data_lakehouse_spark.text.winnow import (
    K,
    W,
    winnow_fingerprints,
)


def _fps(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out: dict[int, list[tuple[int, int]]] = {}
    for r in winnow_fingerprints(df).collect():
        out.setdefault(r["doc_id"], []).append((r["pos"], r["fp"]))
    return out


def test_window_coverage_guarantee(spark, sf_dir):
    """Every window of W consecutive grams must contain a selected
    fingerprint → consecutive selected positions can never be more
    than W apart, and every document is fingerprinted."""
    from urban_mobility_data_lakehouse_spark.sources.testdata import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    rows = winnow_fingerprints(docs).collect()
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["pos"])
    assert len(by_doc) == docs.count()
    for doc_id, poss in by_doc.items():
        poss.sort()
        gaps = [b - a for a, b in zip(poss, poss[1:])]
        assert all(g <= W for g in gaps), (doc_id, max(gaps))


def test_shared_substring_shares_fingerprint(spark):
    """Two documents sharing a run of >= W+K-1 tokens must share at
    least one fingerprint hash — the detection guarantee."""
    shared = " ".join(f"common{i}" for i in range(W + K - 1))
    fps = _fps(spark, [
        (1, f"alpha beta gamma {shared} delta epsilon zeta"),
        (2, f"one two {shared} three four five six"),
    ])
    assert {fp for _, fp in fps[1]} & {fp for _, fp in fps[2]}, (
        "shared substring produced no shared fingerprint"
    )


def test_disjoint_docs_share_nothing(spark):
    fps = _fps(spark, [
        (1, " ".join(f"left{i}" for i in range(30))),
        (2, " ".join(f"right{i}" for i in range(30))),
    ])
    assert not ({f for _, f in fps[1]} & {f for _, f in fps[2]})


def test_short_doc_degenerate(spark):
    """Docs shorter than K words fingerprint the whole text at pos 0."""
    fps = _fps(spark, [(1, "tiny doc"), (2, "tiny doc"), (3, "other")])
    assert fps[1] == [(0, fps[1][0][1])]
    assert fps[1][0][1] == fps[2][0][1]  # identical text, same fp
    assert fps[1][0][1] != fps[3][0][1]
