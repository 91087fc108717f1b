"""Incremental MinHash dedup index: batch-by-batch ingest must emit
exactly the pairs a full-corpus recompute finds — no misses, no
duplicates, bit-equal jaccards — while touching only the new batch's
documents per ingest.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from urban_mobility_data_lakehouse_spark.dedup.incremental import (
    NearDupIndex,
)
from urban_mobility_data_lakehouse_spark.dedup.minhash import (
    minhash_signatures,
    near_duplicates,
)
from urban_mobility_data_lakehouse_spark.sources.lakehouse import Lakehouse
from urban_mobility_data_lakehouse_spark.sources.testdata import load_table

THRESHOLD = 0.5


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def _pairs(df):
    return sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"]) for r in df.collect()
    )


def test_incremental_union_equals_full_recompute(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    full = _pairs(near_duplicates(docs, threshold=THRESHOLD))
    assert full, "testdata must contain near-dup pairs for this test"

    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("gold")
    idx = NearDupIndex(lake, threshold=THRESHOLD)

    got: list[tuple] = []
    for k in range(3):
        batch = docs.filter(F.col("doc_id") % 3 == k)
        got.extend(_pairs(idx.ingest(spark, batch, batch_id=f"b{k}")))

    assert sorted(got) == full
    # each pair emitted exactly once across all batches
    keys = [(a, b) for a, b, _ in got]
    assert len(keys) == len(set(keys))


def test_index_stores_batch_partitions_and_signatures(
    spark, sf_dir, tmp_path
):
    docs = _docs(spark, sf_dir)
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("gold")
    idx = NearDupIndex(lake)
    idx.ingest(spark, docs.filter(F.col("doc_id") < 100), "day1")
    idx.ingest(spark, docs.filter(
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 200)
    ), "day2")

    stored = idx.signatures(spark)
    assert stored.count() == 200
    assert set(
        r["ingest_batch"]
        for r in stored.select("ingest_batch").distinct().collect()
    ) == {"day1", "day2"}

    # stored signatures are bit-equal to the batch-mode aggregation path
    expect = {
        r["doc_id"]: tuple(r[f"m{k}"] for k in range(16))
        for r in minhash_signatures(
            docs.filter(F.col("doc_id") < 200)
        ).collect()
    }
    got = {
        r["doc_id"]: tuple(r[f"m{k}"] for k in range(16))
        for r in stored.collect()
    }
    assert got == expect


def test_reingest_same_batch_is_idempotent(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("gold")
    idx = NearDupIndex(lake, threshold=THRESHOLD)
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)

    idx.ingest(spark, b1, "b1")
    first = _pairs(idx.ingest(spark, b2, "b2"))
    n = idx.signatures(spark).count()

    retry = _pairs(idx.ingest(spark, b2, "b2"))  # crash-retry replay
    assert retry == first
    assert idx.signatures(spark).count() == n  # partition replaced, not appended


def test_first_batch_bootstraps_and_finds_within_batch_pairs(
    spark, sf_dir, tmp_path
):
    docs = _docs(spark, sf_dir)
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("gold")
    idx = NearDupIndex(lake, threshold=THRESHOLD)
    pairs = _pairs(idx.ingest(spark, docs, "all"))
    assert pairs == _pairs(near_duplicates(docs, threshold=THRESHOLD))


def test_streaming_ingest_dedups_stream_against_history(
    spark, sf_dir, tmp_path
):
    """foreachBatch micro-batches drain into the index exactly-once:
    the persisted pair log equals the full-corpus recompute, and a
    restart from the same checkpoint processes nothing new."""
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 250)
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    for k in range(3):  # one file per micro-batch (maxFilesPerTrigger)
        docs.filter(F.col("doc_id") % 3 == k).coalesce(1).write.parquet(
            str(stream_dir / f"slice{k}")
        )

    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("gold")
    idx = NearDupIndex(lake, threshold=THRESHOLD)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir) + "/slice*")
    )
    q = idx.streaming_ingest(spark, stream, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    logged = idx.pairs(spark)
    got = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"]) for r in logged.collect()
    )
    assert got, "doc slice must contain near-dup pairs"
    assert got == _pairs(near_duplicates(docs, threshold=THRESHOLD))
    assert logged.select("ingest_batch").distinct().count() >= 2

    n_index = idx.signatures(spark).count()
    # restart with the same checkpoint: nothing re-processed
    q2 = idx.streaming_ingest(
        spark,
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir) + "/slice*"),
        str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(180)
    assert idx.signatures(spark).count() == n_index
    assert idx.pairs(spark).count() == len(got)


def test_random_batch_splits_equal_full_recompute(spark, sf_dir):
    """Property tape over the BandedDupIndex engine: ANY partition of
    the corpus into ordered batches must union to exactly the
    full-corpus recompute (the engine's exactness contract, probed
    beyond the three fixed splits above)."""
    import tempfile

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 150)
    full = _pairs(near_duplicates(docs, threshold=THRESHOLD))
    assert full, "slice must contain near-dup pairs"

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        cuts=st.lists(
            st.integers(min_value=1, max_value=149),
            min_size=0, max_size=3, unique=True,
        )
    )
    def tape(cuts):
        bounds = [0] + sorted(cuts) + [150]
        with tempfile.TemporaryDirectory() as root:
            lake = Lakehouse(root)
            lake.create_schemas("gold")
            idx = NearDupIndex(lake, threshold=THRESHOLD)
            got: list[tuple] = []
            for k, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
                batch = docs.filter(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
                )
                emitted = _pairs(idx.ingest(spark, batch, f"b{k}"))
                assert not set(
                    (a, b) for a, b, _ in emitted
                ) & set((a, b) for a, b, _ in got), "pair emitted twice"
                got.extend(emitted)
            assert sorted(got) == full

    tape()
