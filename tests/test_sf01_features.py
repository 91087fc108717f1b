"""Slow-lane (sf0.1) exercises for the storage-shaped index features:
data skipping, Z-order, the incremental dedup index, and the
persistent IVF index — structures whose pruning/collision behavior
only gets interesting with real file counts and corpus sizes.

Enable with ``SPARK_GRAFT_SLOW=1``; the default lane covers the same
code paths at sf0.001 in `test_skipping.py`, `test_incremental_dedup.py`
and `test_persistent_ivf.py`.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.dedup.incremental import (
    NearDupIndex,
)
from urban_mobility_data_lakehouse_spark.dedup.minhash import (
    near_duplicates,
)
from urban_mobility_data_lakehouse_spark.similarity.ivf import knn_ivf
from urban_mobility_data_lakehouse_spark.similarity.persistent_ivf import (
    PersistentIVF,
)
from urban_mobility_data_lakehouse_spark.sources.lakehouse import Lakehouse
from urban_mobility_data_lakehouse_spark.sources.testdata import load_table

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SLOW"),
    reason="sf0.1 feature lane; set SPARK_GRAFT_SLOW=1",
)

SF01_DIR = "/root/testdata/sf0.1"


def test_sf01_zorder_skipping_on_events(spark, tmp_path):
    """100k-row events table, Z-ordered on (user_id, value): a 2-D box
    read_where prunes most of the 32 files and matches the full scan."""
    events = load_table(spark, SF01_DIR, "events").select(
        "event_id", "user_id", "value"
    )
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("silver")
    lake.append(events.repartition(8), "silver", "ev")
    lake.compact(
        spark, "silver", "ev", target_files_per_partition=32,
        zorder_by=["user_id", "value"],
    )
    total = len(lake.read(spark, "silver", "ev").inputFiles())
    assert total == 32

    box = [
        ("user_id", "<", 200), ("user_id", ">=", 100),
        ("value", "<", 50.0), ("value", ">=", 10.0),
    ]
    pruned = lake.read_where(spark, "silver", "ev", box)
    assert len(pruned.inputFiles()) <= total // 2
    expect = sorted(
        r["event_id"]
        for r in events.filter(
            (F.col("user_id") >= 100) & (F.col("user_id") < 200)
            & (F.col("value") >= 10.0) & (F.col("value") < 50.0)
        ).collect()
    )
    assert sorted(r["event_id"] for r in pruned.collect()) == expect


def test_sf01_incremental_dedup_contract(spark, tmp_path):
    """5k-doc corpus in 4 batches: per-batch emissions union to the
    full recompute — at a scale where band buckets actually collide."""
    docs = load_table(spark, SF01_DIR, "documents").select(
        "doc_id", "text"
    )
    full = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in near_duplicates(docs, threshold=0.5).collect()
    )
    assert len(full) > 20

    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("gold")
    idx = NearDupIndex(lake, threshold=0.5)
    got: list[tuple] = []
    for k in range(4):
        batch = docs.filter(F.col("doc_id") % 4 == k)
        got.extend(
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in idx.ingest(spark, batch, f"b{k}").collect()
        )
    assert sorted(got) == full


def test_sf01_persistent_ivf_parity(spark, tmp_path):
    """3k-vector index: persisted, cell-partitioned probes match the
    in-memory knn_ivf bit-for-bit."""
    embeddings = load_table(spark, SF01_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("gold")
    idx = PersistentIVF(lake)
    idx.build(spark, embeddings)
    got = [
        tuple(r)
        for r in idx.query(
            spark, embeddings.filter(F.col("vec_id") < 10), k=3
        ).collect()
    ]
    expect = [tuple(r) for r in knn_ivf(embeddings, n_queries=10, k=3).collect()]
    assert got == expect


def test_connected_components_scale_stress(spark):
    """100k-edge random graph through the CC loop: converges within the
    round budget, rounds stay flat (the stats-reset guard holds at
    volume), and the result matches a driver-side union-find."""
    import random
    import time

    from urban_mobility_data_lakehouse_spark.dedup.components import (
        connected_components,
    )

    rng = random.Random(99)
    n_nodes, n_edges = 50_000, 100_000
    edges = [
        (rng.randrange(n_nodes), rng.randrange(n_nodes))
        for _ in range(n_edges)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long").repartition(8)
    t0 = time.perf_counter()
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    wall = time.perf_counter() - t0

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want
    # generous envelope: catches an accidental return of the
    # exponential-planning regression, not machine noise
    assert wall < 300, f"CC on 100k edges took {wall:.0f}s"


def test_sf01_curation_operators(spark):
    """Round-4 text operators at sf0.1 (5k docs): chunking
    round-trips the whole corpus, decontamination's broadcast-array
    plan holds at 1.4k eval grams scale, and the sketch estimate
    stays inside its error envelope on 100k events."""
    from urban_mobility_data_lakehouse_spark.operators.sketches import (
        daily_user_sketches,
        estimate_distinct,
    )
    from urban_mobility_data_lakehouse_spark.text.chunking import (
        chunk_documents,
        stitch_chunks,
    )
    from urban_mobility_data_lakehouse_spark.text.contamination import (
        mark_contaminated,
    )

    docs = load_table(spark, SF01_DIR, "documents").select("doc_id", "text")

    # chunk → stitch is lossless over all 5k docs
    back = stitch_chunks(
        chunk_documents(docs, max_tokens=64, overlap=16), overlap=16
    )
    diffs = (
        docs.alias("a")
        .join(back.alias("b"), "doc_id")
        .filter(F.col("a.text") != F.col("b.text"))
        .count()
    )
    assert diffs == 0

    # contamination: every eval member self-flags, output is total
    marked = mark_contaminated(docs, docs.filter(F.col("doc_id") % 97 == 0))
    n_eval = docs.filter(F.col("doc_id") % 97 == 0).count()
    flagged_eval = marked.filter(
        (F.col("doc_id") % 97 == 0) & F.col("contaminated")
    ).count()
    assert flagged_eval == n_eval
    assert marked.count() == docs.count()

    # sketches at 100k events / ~1.5k distinct users
    events = load_table(spark, SF01_DIR, "events")
    est = {
        r["event_type"]: r["approx_distinct"]
        for r in estimate_distinct(daily_user_sketches(events)).collect()
    }
    exact = {
        r["event_type"]: r["x"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("x"))
        .collect()
    }
    for k, e in exact.items():
        assert abs(est[k] - e) / e < 0.05, (k, est[k], e)


def test_sf01_repeated_spans_scale(spark):
    """5k-doc corpus: the repeat set stays bounded, spans merge
    maximally, and removal leaves no ≥L-token cross-doc repeat
    behind (self-verifying fixpoint: re-running finds nothing new
    among the surviving docs... modulo repeats formed by splicing,
    so we check the far stronger planted-span property instead)."""
    from urban_mobility_data_lakehouse_spark.text.spans import (
        remove_spans,
        repeated_spans,
    )

    docs = load_table(spark, SF01_DIR, "documents")
    lic = " ".join(f"lic{i}" for i in range(12))
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(lic + " "), F.col("text")),
        ).otherwise(F.col("text")),
    )
    spans = repeated_spans(planted, l_tokens=8)
    planted_docs = spans.filter(
        (F.col("start_pos") == 1) & (F.col("end_pos") >= 12)
    )
    n_planted = planted.filter(F.col("doc_id") % 7 == 0).count()
    assert planted_docs.count() >= n_planted  # every plant found
    cleaned = remove_spans(planted, spans)
    assert (
        cleaned.filter(F.col("text").contains(lic)).count() == 0
    )


def test_sf01_bloom_index_prunes_real_file_counts(spark, tmp_path):
    """16-file key-clustered table with fully overlapping uid *ranges*
    (hash layout defeats min/max skipping): a point lookup must plan a
    small fraction of the files.  100k events / 1.5k users — each uid
    lives in exactly one file under hash partitioning, so the Bloom
    index should schedule ~1 file (plus rare false positives)."""
    events = load_table(spark, SF01_DIR, "events").select(
        "event_id", F.col("user_id").cast("string").alias("uid"), "value"
    )
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("silver")
    lake.add_bloom_index("silver", "ev", "uid")
    lake.append(events.repartition(16, F.col("uid")), "silver", "ev")
    full = lake.read(spark, "silver", "ev")
    assert len(full.inputFiles()) == 16
    probe = full.select("uid").first()["uid"]
    pruned = lake.read_where(spark, "silver", "ev", [("uid", "=", probe)])
    # hash-clustered: the uid is in 1 file; allow a false positive
    assert len(pruned.inputFiles()) <= 2
    got = sorted(r["event_id"] for r in pruned.collect())
    want = sorted(
        r["event_id"]
        for r in full.filter(F.col("uid") == probe).collect()
    )
    assert got == want


def test_sf01_ivfpq_recall_with_rerank(spark, tmp_path):
    """2k-vector IVFADC: compressed index + probe pruning + re-rank
    still recovers most exact neighbors."""
    import numpy as np

    from urban_mobility_data_lakehouse_spark.similarity.persistent_ivf import (
        PersistentIVFPQ,
    )

    emb = load_table(spark, SF01_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("gold")
    idx = PersistentIVFPQ(lake, n_probe=8)
    idx.build(spark, emb)
    queries = emb.filter(F.col("vec_id") < 10)
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in idx.query(
            spark, queries, k=3, rerank_source=emb
        ).collect()
    }
    rows = emb.orderBy("vec_id").collect()
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    hits = 0
    for qi in range(10):
        d = ((x - x[qi]) ** 2).sum(axis=1)
        d[qi] = np.inf
        exact = {int(ids[i]) for i in np.lexsort((ids, d))[:3]}
        approx = {got[(qi, r)] for r in (1, 2, 3) if (qi, r) in got}
        hits += len(exact & approx)
    assert hits / 30 >= 0.7, f"sf0.1 IVFADC recall {hits}/30"


def test_sf01_hidden_day_partitioning_prunes_events(spark, tmp_path):
    """100k events / 30 UTC days under days(ts): a 3-day raw-column
    window plans ~1/10 of the day directories, full row parity."""
    import datetime as dtm

    events = load_table(spark, SF01_DIR, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("silver")
    lake.set_partition_spec("silver", "ev", "days(ts)")
    lake.overwrite_partitions(events, "silver", "ev")
    full = lake.read(spark, "silver", "ev")
    n_full = len(full.inputFiles())
    lo = dtm.datetime(2024, 1, 10)
    hi = dtm.datetime(2024, 1, 13)
    pruned = lake.read_where(
        spark, "silver", "ev", [("ts", ">=", lo), ("ts", "<", hi)]
    )
    assert 0 < len(pruned.inputFiles()) <= max(4, n_full // 7)
    got = sorted(r["event_id"] for r in pruned.collect())
    want = sorted(
        r["event_id"]
        for r in full.filter(
            (F.col("ts") >= lo) & (F.col("ts") < hi)
        ).collect()
    )
    assert got == want


def test_sf01_bm25_index_parity_and_bucket_pruning(spark, tmp_path):
    """5k-doc corpus: the persistent index answers a 4-term query
    bit-identically to the batch scan from <=4 of 64 term buckets."""
    from urban_mobility_data_lakehouse_spark.text.bm25 import bm25_topk
    from urban_mobility_data_lakehouse_spark.text.bm25_index import (
        PersistentBM25,
    )

    docs = load_table(spark, SF01_DIR, "documents").select(
        "doc_id", "text"
    )
    lake = Lakehouse(str(tmp_path / "lake"))
    idx = PersistentBM25(lake)
    idx.build(spark, docs)
    terms = ("customer", "spark", "stream", "vector")
    got = [tuple(r) for r in idx.query(spark, terms, k=20).collect()]
    want = [tuple(r) for r in bm25_topk(docs, terms, k=20).collect()]
    assert got == want
    pruned = lake.read_where(
        spark, "gold", idx.postings, [("term", "in", list(terms))]
    )
    assert 0 < len(pruned.inputFiles()) <= 4


def test_sf01_curation_pipeline_with_url_semdedup_spans(spark, tmp_path):
    """End-to-end `curate_corpus` at sf0.1 with the URL, ExactSubstr
    (spans), and SemDeDup stages all enabled — the full RefinedWeb-
    shaped funnel on the real 5k-doc corpus, with stage row counts
    recorded and the funnel invariants asserted (every filter stage
    monotonically narrows; nothing silently vanishes between stages)."""
    from urban_mobility_data_lakehouse_spark.text.pipeline import (
        curate_corpus,
    )
    from urban_mobility_data_lakehouse_spark.text.urls import doc_urls

    docs = doc_urls(load_table(spark, SF01_DIR, "documents"))
    eval_docs = (
        load_table(spark, SF01_DIR, "documents")
        .filter(F.col("doc_id") % 97 == 0)
        .select(F.col("doc_id").alias("eval_id"), "text")
    )
    emb = load_table(spark, SF01_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    train, stats = curate_corpus(
        spark,
        docs,
        eval_docs=eval_docs,
        url_col="url",
        blocked_domains=("example.co.uk",),
        max_per_domain=2000,
        exact_substr_min_tokens=12,
        embeddings=emb,
        semdedup_threshold=0.92,
        min_quality=0.2,
    )
    n0 = docs.count()
    expected_order = [
        "url_filtered",
        "exact_substr_deduped",
        "exact_dedup",
        "near_dedup",
        "semantic_deduped",
        "decontaminated",
        "quality_filtered",
    ]
    assert [k for k in stats if k in expected_order] == expected_order
    # funnel: every whole-document filter stage narrows monotonically
    # (exact_substr edits text, it does not add docs)
    funnel = [n0] + [stats[k] for k in expected_order]
    for a, b in zip(funnel, funnel[1:]):
        assert b <= a, (funnel, stats)
    # the URL stage must actually bite: the blocklist drops the co.uk
    # family (doc_id % 5 == 0 per the doc_urls fixture) and the
    # per-domain quota caps the one surviving mega-domain at 2000
    assert stats["url_filtered"] == 2000, stats
    # ExactSubstr must bite (the corpus's planted overlap structure is
    # exactly the cross-document verbatim runs it cuts) ...
    assert stats["exact_substr_deduped"] < stats["url_filtered"], stats
    # ... and exact dedup still bites AFTER span cutting (full copies
    # stay bit-identical when the same spans are cut from both).
    # near-dedup dropping nothing here is the Lee et al. ORDERING
    # working as designed: span removal already took the shared text
    # that made those docs near-duplicates.
    assert stats["exact_dedup"] < stats["exact_substr_deduped"], stats
    assert stats["decontaminated"] < stats["semantic_deduped"], stats
    n_train = train.count()
    assert 0 < n_train <= stats["quality_filtered"]
    # train split survives with text intact
    assert train.filter(F.length("text") > 0).count() == n_train
    print(f"# sf0.1 curation funnel: {funnel} -> train {n_train}")


def test_sf01_boilerplate_strip_actually_removes(spark):
    """The driver-hash 'strip' part is an identity transform on the
    small fixtures (no cross-doc repeated lines below sf0.1), so the
    removal path needs this lane: at sf0.1 the min_docs=2 hot set is
    non-empty and stripping removes lines while preserving order."""
    from urban_mobility_data_lakehouse_spark.text.boilerplate import (
        hot_lines,
        strip_boilerplate,
    )

    docs = load_table(spark, SF01_DIR, "documents").select(
        "doc_id", "text"
    )
    assert hot_lines(docs, min_docs=2).count() > 0
    out = strip_boilerplate(docs, min_docs=2)
    removed = out.agg(F.sum("n_boilerplate_lines")).collect()[0][0]
    assert removed and removed > 0
    # stripped docs lost exactly their hot lines, nothing reordered:
    # surviving line sequence is a subsequence of the original
    changed = (
        out.filter(F.col("n_boilerplate_lines") > 0)
        .select("doc_id", "text")
        .collect()
    )
    orig = {
        r["doc_id"]: r["text"]
        for r in docs.join(
            out.filter(F.col("n_boilerplate_lines") > 0).select("doc_id"),
            "doc_id",
        ).collect()
    }
    assert changed
    for r in changed:
        kept = r["text"].split("\n") if r["text"] else []
        src = iter(orig[r["doc_id"]].split("\n"))
        assert all(any(x == line for x in src) for line in kept)
