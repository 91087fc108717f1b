"""Incremental pHash index (multimodal/phash_index.py): per-batch
ingest must reproduce the full-corpus `phash_near_dups` exactly, with
idempotent retries — the same exactness contract as the MinHash
NearDupIndex, pointed at the image modality."""

from __future__ import annotations

import numpy as np
import pytest

from urban_mobility_data_lakehouse_spark.multimodal.binaryops import (
    encode_ppm,
)
from urban_mobility_data_lakehouse_spark.multimodal.phash import (
    phash_near_dups,
)
from urban_mobility_data_lakehouse_spark.multimodal.phash_index import (
    ImageDupIndex,
)
from urban_mobility_data_lakehouse_spark.sources.lakehouse import Lakehouse


def _corpus(spark):
    """12 images: 8 distinct noise fields + a smooth scene, plus a
    brightness twin of the scene (cross-batch pair) and exact copies
    of two noise images (one within-batch, one cross-batch pair)."""
    rng = np.random.RandomState(7)
    imgs = {
        i: rng.randint(0, 256, size=(48, 48, 3), dtype=np.uint8)
        for i in range(8)
    }
    y, x = np.mgrid[0:48, 0:48]
    scene = np.clip(
        100 + 60 * np.sin(2 * np.pi * x / 48) + 40 * np.cos(
            2 * np.pi * y / 24
        ),
        0, 200,
    ).astype(np.uint8)
    imgs[8] = np.stack([scene, scene, scene], axis=2)
    imgs[100] = np.clip(
        imgs[8].astype(np.int32) + 12, 0, 255
    ).astype(np.uint8)  # brightness twin of 8
    imgs[101] = imgs[1].copy()  # exact copy of 1
    imgs[102] = imgs[2].copy()  # exact copy of 2
    rows = [
        (i, bytearray(encode_ppm(img))) for i, img in imgs.items()
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def _pairs(df):
    return {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in df.collect()
    }


@pytest.mark.parametrize(
    "split",
    [
        # (batch predicates by media_id ranges)
        [(0, 9), (9, 200)],           # twins arrive after originals
        [(0, 2), (2, 102), (102, 200)],  # copy of 2 arrives alone
        [(0, 200)],                   # everything in one batch
    ],
)
def test_batched_union_equals_full_recompute(spark, tmp_path, split):
    media = _corpus(spark)
    full = _pairs(phash_near_dups(media, max_hamming=3))
    assert full, "fixture must contain near-dup pairs"
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("gold")
    idx = ImageDupIndex(lake, max_hamming=3)
    got: dict = {}
    for k, (lo, hi) in enumerate(split):
        batch = media.filter(
            (media.media_id >= lo) & (media.media_id < hi)
        )
        emitted = _pairs(idx.ingest(spark, batch, batch_id=f"b{k}"))
        assert not set(emitted) & set(got), "pair emitted twice"
        got.update(emitted)
    assert got == full


def test_reingest_is_idempotent(spark, tmp_path):
    media = _corpus(spark)
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("gold")
    idx = ImageDupIndex(lake, max_hamming=3)
    b1 = media.filter(media.media_id < 9)
    b2 = media.filter(media.media_id >= 9)
    idx.ingest(spark, b1, "b1")
    first = _pairs(idx.ingest(spark, b2, "b2"))
    retry = _pairs(idx.ingest(spark, b2, "b2"))  # crash-retry replay
    assert retry == first
    # index holds every image exactly once
    n = lake.read(spark, "gold", "phash_index").count()
    assert n == media.count()


def test_guard(tmp_path):
    with pytest.raises(ValueError):
        ImageDupIndex(
            Lakehouse(str(tmp_path / "l")), max_hamming=4, n_bands=4
        )


def test_streaming_ingest_persists_pairs(spark, tmp_path):
    """foreachBatch micro-batches drain into the index exactly-once:
    the persisted `<name>_pairs` log equals the full-corpus recompute
    (the detected pairs must NOT be silently dropped), and a restart
    from the same checkpoint processes nothing new."""
    media = _corpus(spark)
    full = _pairs(phash_near_dups(media, max_hamming=3))
    assert full, "fixture must contain near-dup pairs"

    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    # slice0 holds the 8+100 and 1+101 pairs, slice1 adds 2+102 —
    # BOTH micro-batches must log pairs
    for k, (lo, hi) in enumerate([(0, 102), (102, 200)]):
        media.filter(
            (media.media_id >= lo) & (media.media_id < hi)
        ).coalesce(1).write.parquet(str(stream_dir / f"slice{k}"))

    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("gold")
    idx = ImageDupIndex(lake, max_hamming=3)

    def _stream():
        return (
            spark.readStream.schema(media.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(stream_dir) + "/slice*")
        )

    q = idx.streaming_ingest(spark, _stream(), str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    logged = idx.pairs(spark)
    got = _pairs(logged)
    assert got == full
    assert logged.select("ingest_batch").distinct().count() == 2
    n_index = idx.state(spark).count()
    assert n_index == media.count()

    # restart with the same checkpoint: nothing re-processed
    q2 = idx.streaming_ingest(spark, _stream(), str(tmp_path / "ckpt"))
    q2.awaitTermination(180)
    assert idx.state(spark).count() == n_index
    assert _pairs(idx.pairs(spark)) == full


def test_random_batch_splits_equal_full_recompute(spark, tmp_path):
    """Property tape over the image adapter of BandedDupIndex: ANY
    ordered partition of the corpus into batches unions to exactly the
    full-corpus recompute (same contract the text tape locks on the
    engine; this pins the adapter hooks under arbitrary splits)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    media = _corpus(spark).localCheckpoint(eager=False)
    ids = sorted(r["media_id"] for r in media.select("media_id").collect())
    full = _pairs(phash_near_dups(media, max_hamming=3))
    assert full

    counter = [0]

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        cuts=st.lists(
            st.sampled_from(ids[1:]), min_size=0, max_size=3, unique=True
        )
    )
    def tape(cuts):
        bounds = [min(ids)] + sorted(cuts) + [max(ids) + 1]
        counter[0] += 1
        lake = Lakehouse(str(tmp_path / f"lake{counter[0]}"))
        lake.create_schemas("gold")
        idx = ImageDupIndex(lake, max_hamming=3)
        got: dict = {}
        for k, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
            batch = media.filter(
                (media.media_id >= lo) & (media.media_id < hi)
            )
            emitted = _pairs(idx.ingest(spark, batch, f"b{k}"))
            assert not set(emitted) & set(got), "pair emitted twice"
            got.update(emitted)
        assert got == full

    tape()
