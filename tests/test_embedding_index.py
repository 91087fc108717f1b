"""Incremental embedding near-dup index (similarity/incremental.py):
per-batch ingest must reproduce the full-corpus `banded_near_dups`
exactly (values included — same planes, same fold order), with
idempotent retries."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.similarity.incremental import (
    EmbeddingDupIndex,
)
from urban_mobility_data_lakehouse_spark.similarity.knn import (
    banded_near_dups,
)
from urban_mobility_data_lakehouse_spark.sources.lakehouse import Lakehouse
from urban_mobility_data_lakehouse_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"


def _pairs(df):
    return {
        (r["vec_a"], r["vec_b"]): r["cosine_sim"] for r in df.collect()
    }


@pytest.mark.parametrize(
    "bounds",
    [
        [(0, 200), (200, 10_000)],
        [(0, 50), (50, 300), (300, 10_000)],
        [(0, 10_000)],
    ],
)
def test_batched_union_equals_full_recompute(spark, tmp_path, bounds):
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    full = _pairs(banded_near_dups(emb, threshold=0.45))
    assert full, "corpus must contain banded near-dup pairs"
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("gold")
    idx = EmbeddingDupIndex(lake, threshold=0.45)
    got: dict = {}
    for k, (lo, hi) in enumerate(bounds):
        batch = emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        )
        emitted = _pairs(idx.ingest(spark, batch, batch_id=f"b{k}"))
        assert not set(emitted) & set(got), "pair emitted twice"
        got.update(emitted)
    assert got == full  # ids AND rounded cosines — bit-equal verify


def test_reingest_is_idempotent(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("gold")
    idx = EmbeddingDupIndex(lake, threshold=0.45)
    b1 = emb.filter(F.col("vec_id") < 200)
    b2 = emb.filter(F.col("vec_id") >= 200)
    idx.ingest(spark, b1, "b1")
    first = _pairs(idx.ingest(spark, b2, "b2"))
    retry = _pairs(idx.ingest(spark, b2, "b2"))
    assert retry == first
    assert (
        lake.read(spark, "gold", "embedding_index").count()
        == emb.count()
    )


def test_streaming_ingest_persists_pairs(spark, tmp_path):
    """foreachBatch micro-batches drain into the index exactly-once:
    the persisted `<name>_pairs` log equals the full-corpus recompute
    (the detected pairs must NOT be silently dropped), and a restart
    from the same checkpoint processes nothing new."""
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    full = _pairs(banded_near_dups(emb, threshold=0.45))
    assert full, "corpus must contain banded near-dup pairs"

    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    for k in range(3):
        emb.filter(F.col("vec_id") % 3 == k).coalesce(1).write.parquet(
            str(stream_dir / f"slice{k}")
        )

    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("gold")
    idx = EmbeddingDupIndex(lake, threshold=0.45)

    def _stream():
        return (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(stream_dir) + "/slice*")
        )

    q = idx.streaming_ingest(spark, _stream(), str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    logged = idx.pairs(spark)
    assert _pairs(logged) == full  # ids AND rounded cosines
    assert logged.select("ingest_batch").distinct().count() >= 2
    n_index = idx.state(spark).count()
    assert n_index == emb.count()

    # restart with the same checkpoint: nothing re-processed
    q2 = idx.streaming_ingest(spark, _stream(), str(tmp_path / "ckpt"))
    q2.awaitTermination(180)
    assert idx.state(spark).count() == n_index
    assert _pairs(idx.pairs(spark)) == full
