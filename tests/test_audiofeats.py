"""Audio feature extraction: real numpy STFT features over decoded
PCM WAV payloads, asserted against signal theory (a pure tone's RMS,
zero-crossing rate, spectral centroid, and dominant band are all known
in closed form), plus the energy-delta fingerprint as an audio
exact-dedup key.
"""

from __future__ import annotations

import numpy as np
import pytest

from urban_mobility_data_lakehouse_spark.multimodal.audiofeats import (
    audio_fingerprint,
    encode_wav,
    frame_features,
    pcm_to_float,
)
from urban_mobility_data_lakehouse_spark.multimodal.binaryops import (
    decode_wav,
)

RATE = 8000
FRAME, HOP, BANDS = 256, 128, 8


def _sine(freq: float, seconds: float = 1.0, amp: int = 16384):
    t = np.arange(int(RATE * seconds)) / RATE
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.int16)


def _media(spark, clips):
    return spark.createDataFrame(
        [(i, bytearray(encode_wav(RATE, s))) for i, s in enumerate(clips)],
        "media_id long, payload binary",
    )


def test_encode_decode_roundtrip():
    s = _sine(440.0, 0.1)
    rate, decoded = decode_wav(encode_wav(RATE, s))
    assert rate == RATE
    assert decoded.shape == (len(s), 1)
    assert np.array_equal(decoded[:, 0], s)


def test_pure_tone_features_match_signal_theory(spark):
    feats = frame_features(
        _media(spark, [_sine(1000.0)]), FRAME, HOP, BANDS
    ).toPandas()
    # frame fan-out: (8000 - 256) // 128 + 1 windows
    assert len(feats) == (RATE - FRAME) // HOP + 1
    # RMS of a 0.5-amplitude sine = 0.5/sqrt(2)
    assert feats["rms"].mean() == pytest.approx(0.5 / np.sqrt(2), rel=0.01)
    # zero crossings: 2 per cycle -> 2*f/rate sign changes per sample
    assert feats["zcr"].mean() == pytest.approx(2 * 1000 / RATE, rel=0.05)
    # spectral centroid sits on the tone (windowing leakage ~ few Hz)
    assert feats["centroid_hz"].mean() == pytest.approx(1000.0, abs=25)
    # the dominant band is the one holding bin f/rate*frame_len,
    # under the same np.array_split banding the operator uses
    bin_of_tone = round(1000 / RATE * FRAME)
    splits = np.array_split(np.arange(FRAME // 2 + 1), BANDS)
    expected_band = next(
        i for i, s in enumerate(splits) if bin_of_tone in s
    )
    band_cols = [f"band_{b}" for b in range(BANDS)]
    assert (
        feats[band_cols].mean().idxmax() == f"band_{expected_band}"
    )


def test_silence_features(spark):
    feats = frame_features(
        _media(spark, [np.zeros(RATE, dtype=np.int16)]), FRAME, HOP, BANDS
    ).toPandas()
    assert (feats["rms"] == 0).all()
    assert (feats["zcr"] == 0).all()
    assert (feats["centroid_hz"] == 0).all()


def test_short_clip_yields_no_frames(spark):
    feats = frame_features(
        _media(spark, [_sine(500.0, seconds=FRAME / RATE / 2)]),
        FRAME, HOP, BANDS,
    ).toPandas()
    assert len(feats) == 0


def test_stereo_mixes_down(spark):
    mono = _sine(750.0)
    stereo = np.column_stack([mono, mono])
    m = spark.createDataFrame(
        [
            (0, bytearray(encode_wav(RATE, mono))),
            (1, bytearray(encode_wav(RATE, stereo))),
        ],
        "media_id long, payload binary",
    )
    feats = frame_features(m, FRAME, HOP, BANDS).toPandas()
    a = feats[feats.media_id == 0].sort_values("frame_no")
    b = feats[feats.media_id == 1].sort_values("frame_no")
    assert np.allclose(a["rms"].values, b["rms"].values)
    assert np.allclose(a["centroid_hz"].values, b["centroid_hz"].values)


def test_pcm_to_float_ranges():
    assert pcm_to_float(np.array([0, 128, 255], dtype=np.uint8)).tolist() == [
        -1.0, 0.0, pytest.approx(127 / 128),
    ]
    assert pcm_to_float(
        np.array([-32768, 0, 16384], dtype=np.int16)
    ).tolist() == [-1.0, 0.0, 0.5]


def test_fingerprint_is_deterministic_dedup_key(spark):
    clips = [_sine(1000.0), _sine(1000.0), _sine(1500.0), _sine(2000.0)]
    fp = audio_fingerprint(
        _media(spark, clips), FRAME, HOP, BANDS
    ).toPandas()
    by_id = dict(zip(fp.media_id, fp.fingerprint))
    # identical audio -> identical fingerprint; distinct tones differ
    assert by_id[0] == by_id[1]
    assert len({by_id[0], by_id[2], by_id[3]}) == 3
    # the exact-dedup shape: group by fingerprint, keep min id
    groups = (
        audio_fingerprint(_media(spark, clips), FRAME, HOP, BANDS)
        .groupBy("fingerprint")
        .count()
        .toPandas()
    )
    assert sorted(groups["count"]) == [1, 1, 2]
    # sig packs 1 anchor frame + (n_frames - 1) transitions,
    # 2 hex chars per frame @ 8 bands
    assert fp["n_frames"].iloc[0] == (RATE - FRAME) // HOP + 1
    assert len(fp["sig"].iloc[0]) == 2 * (
        1 + min(64, fp["n_frames"].iloc[0] - 1)
    )


def test_frame_features_plan_has_no_exchange(spark):
    df = frame_features(_media(spark, [_sine(1000.0)]), FRAME, HOP, BANDS)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
