"""Audio near-dup (`audio_near_dups`): the Haitsma–Kalker robust-hash
match — a slightly perturbed copy of a clip must be found through an
exact sub-fingerprint (per-frame word) collision and pass the
bit-error-rate verify; unrelated clips must not."""

from __future__ import annotations

import numpy as np

from urban_mobility_data_lakehouse_spark.multimodal.audiofeats import (
    audio_fingerprint,
    audio_near_dups,
    encode_wav,
    frame_bits,
)

RATE = 8000
N = 2048
HOP = 128


def _content(seed, amp=8000):
    """Broadband 'real audio' stand-in: deterministic noise content
    under a strong frame-to-frame loudness envelope — every band's
    energy swings decisively between frames, which is what makes
    energy-DELTA bits robust (pure stationary tones are the worst
    case: their deltas are noise-dominated, measured BER ≈ 0.45 under
    the same perturbation that costs this fixture 0.008)."""
    t = np.arange(N)
    base = np.random.RandomState(seed).randn(N)
    env = 1.0 + 0.8 * np.sin(2 * np.pi * t / (2 * HOP))
    return np.round(amp * base * env).clip(-30000, 30000).astype(
        np.int16
    )


def _corpus(spark):
    """Clips 0-3: distinct broadband contents.  10: clip 0 + small
    deterministic noise (a re-encode stand-in: most energy-delta words
    survive).  11: exact copy of clip 1."""
    rng = np.random.RandomState(3)
    clips = {i: _content(40 + i) for i in range(4)}
    noise = rng.randint(-150, 151, size=N).astype(np.int16)
    clips[10] = (clips[0].astype(np.int32) + noise).astype(np.int16)
    clips[11] = clips[1].copy()
    return spark.createDataFrame(
        [
            (i, bytearray(encode_wav(RATE, c)))
            for i, c in clips.items()
        ],
        "media_id long, payload binary",
    )


def test_frame_bits_match_fingerprint_words(spark):
    """frame_bits is the exploded form of audio_fingerprint's packed
    sig: re-packing the words must reproduce the hex string."""
    media = _corpus(spark).filter("media_id = 0")
    sig = audio_fingerprint(media).collect()[0]["sig"]
    words = sorted(
        (r["frame_no"], r["bits"])
        for r in frame_bits(media).collect()
    )
    repacked = "".join(format(w, "02x") for _t, w in words)
    assert repacked == sig


def test_perturbed_copy_found_exact_copy_found_strangers_not(spark):
    media = _corpus(spark)
    got = {
        (r["media_a"], r["media_b"]): r["ber"]
        for r in audio_near_dups(media, max_ber=0.15).collect()
    }
    assert (0, 10) in got, "noisy re-encode of clip 0 must match"
    assert (1, 11) in got and got[(1, 11)] == 0.0  # exact copy
    # no unrelated tone pair sneaks through the verify
    for a, b in got:
        assert (a, b) in {(0, 10), (1, 11)}, got


def test_incremental_index_matches_full_recompute(spark, tmp_path):
    """AudioDupIndex: per-batch pair unions must equal the full-corpus
    audio_near_dups across batch splits, no pair emitted twice, and a
    crash-retry replay of a batch is idempotent."""
    from urban_mobility_data_lakehouse_spark.multimodal.audio_index import (
        AudioDupIndex,
    )
    from urban_mobility_data_lakehouse_spark.sources.lakehouse import (
        Lakehouse,
    )

    media = _corpus(spark)
    full = {
        (r["media_a"], r["media_b"]): r["ber"]
        for r in audio_near_dups(media, max_ber=0.15).collect()
    }
    assert full
    for split in ([(0, 5), (5, 100)], [(0, 1), (1, 11), (11, 100)]):
        lake = Lakehouse(
            str(tmp_path / f"lake{split[0][1]}_{len(split)}")
        )
        lake.create_schemas("gold")
        idx = AudioDupIndex(lake, max_ber=0.15)
        got: dict = {}
        for k, (lo, hi) in enumerate(split):
            batch = media.filter(
                (media.media_id >= lo) & (media.media_id < hi)
            )
            emitted = {
                (r["media_a"], r["media_b"]): r["ber"]
                for r in idx.ingest(spark, batch, f"b{k}").collect()
            }
            assert not set(emitted) & set(got), "pair emitted twice"
            got.update(emitted)
        assert got == full, split
    # retry idempotence on the last lake/batch
    again = {
        (r["media_a"], r["media_b"]): r["ber"]
        for r in idx.ingest(
            spark,
            media.filter(media.media_id >= 11),
            f"b{len(split) - 1}",
        ).collect()
    }
    assert again == emitted


def test_candidates_are_equi_join_not_all_pairs(spark):
    media = _corpus(spark)
    out = audio_near_dups(media, max_ber=0.15)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_streaming_ingest_persists_pairs(spark, tmp_path):
    """AudioDupIndex.streaming_ingest: foreachBatch micro-batches
    drain into the index exactly-once — the persisted `<name>_pairs`
    log equals the full-corpus recompute (detected pairs must NOT be
    silently dropped), and a restart from the same checkpoint
    processes nothing new."""
    from urban_mobility_data_lakehouse_spark.multimodal.audio_index import (
        AudioDupIndex,
    )
    from urban_mobility_data_lakehouse_spark.sources.lakehouse import (
        Lakehouse,
    )

    media = _corpus(spark)
    full = {
        (r["media_a"], r["media_b"]): r["ber"]
        for r in audio_near_dups(media, max_ber=0.15).collect()
    }
    assert full

    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    # slice0 holds the (0,10) pair, slice1 adds (1,11) — BOTH
    # micro-batches must log pairs
    for k, (lo, hi) in enumerate([(0, 11), (11, 100)]):
        media.filter(
            (media.media_id >= lo) & (media.media_id < hi)
        ).coalesce(1).write.parquet(str(stream_dir / f"slice{k}"))

    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("gold")
    idx = AudioDupIndex(lake, max_ber=0.15)

    def _stream():
        return (
            spark.readStream.schema(media.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(stream_dir) + "/slice*")
        )

    q = idx.streaming_ingest(spark, _stream(), str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    logged = idx.pairs(spark)
    got = {
        (r["media_a"], r["media_b"]): r["ber"]
        for r in logged.collect()
    }
    assert got == full
    assert logged.select("ingest_batch").distinct().count() == 2
    n_index = idx.state(spark).count()
    assert n_index == media.count()

    # restart with the same checkpoint: nothing re-processed
    q2 = idx.streaming_ingest(spark, _stream(), str(tmp_path / "ckpt"))
    q2.awaitTermination(180)
    assert idx.state(spark).count() == n_index
    assert logged.count() == len(got)
