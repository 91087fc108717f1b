"""Deterministic image augmentation: hash-derived parameters make the
same row augment identically under any repartition or re-run; flips,
crops, and brightness are asserted pixel-exactly against numpy.
"""

from __future__ import annotations

import numpy as np
import pytest

from urban_mobility_data_lakehouse_spark.multimodal.augment import (
    _nearest_resize,
    _uniforms,
    augment_images,
)
from urban_mobility_data_lakehouse_spark.multimodal.binaryops import (
    decode_ppm,
    encode_ppm,
)


def _img(mid: int, h=12, w=16):
    rng = np.random.RandomState(mid)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def _media(spark, n=4):
    return spark.createDataFrame(
        [(i, bytearray(encode_ppm(_img(i)))) for i in range(n)],
        "media_id long, payload binary",
    )


def test_augment_is_deterministic_and_repartition_stable(spark):
    m = _media(spark)
    a = augment_images(m, 0.5, 0.8, 0.3, seed=7).toPandas()
    b = augment_images(m.repartition(8), 0.5, 0.8, 0.3, seed=7).toPandas()
    a = a.sort_values("media_id").reset_index(drop=True)
    b = b.sort_values("media_id").reset_index(drop=True)
    assert (a["flipped"] == b["flipped"]).all()
    assert (a["bright_factor"] == b["bright_factor"]).all()
    for pa, pb in zip(a["payload"], b["payload"]):
        assert bytes(pa) == bytes(pb)


def test_flip_is_pixel_exact(spark):
    out = augment_images(_media(spark, 2), flip_p=1.0, seed=1).toPandas()
    for _, row in out.iterrows():
        assert row["flipped"]
        got = decode_ppm(bytes(row["payload"]))
        assert np.array_equal(got, _img(int(row["media_id"]))[:, ::-1])


def test_no_op_augment_roundtrips(spark):
    out = augment_images(
        _media(spark, 2), flip_p=0.0, crop_frac=1.0, brightness=0.0
    ).toPandas()
    for _, row in out.iterrows():
        assert not row["flipped"]
        assert row["bright_factor"] == 1.0
        assert np.array_equal(
            decode_ppm(bytes(row["payload"])), _img(int(row["media_id"]))
        )


def test_crop_matches_numpy_model(spark):
    out = augment_images(
        _media(spark, 3), flip_p=0.0, crop_frac=0.5, seed=9
    ).toPandas()
    for _, row in out.iterrows():
        mid = int(row["media_id"])
        src = _img(mid)
        h0, w0 = src.shape[:2]
        ch, cw = h0 // 2, w0 // 2
        _, u_y, u_x, _ = _uniforms(9, mid, 4)
        y0, x0 = int(u_y * (h0 - ch + 1)), int(u_x * (w0 - cw + 1))
        assert (row["crop_y"], row["crop_x"]) == (y0, x0)
        model = _nearest_resize(src[y0 : y0 + ch, x0 : x0 + cw], h0, w0)
        assert np.array_equal(decode_ppm(bytes(row["payload"])), model)
        # geometry preserved (random-resized-crop contract)
        assert decode_ppm(bytes(row["payload"])).shape == src.shape


def test_brightness_scales_and_clips(spark):
    img = np.full((4, 4, 3), 200, dtype=np.uint8)
    m = spark.createDataFrame(
        [(0, bytearray(encode_ppm(img)))], "media_id long, payload binary"
    )
    out = augment_images(m, flip_p=0.0, brightness=0.4, seed=3).toPandas()
    f = out["bright_factor"].iloc[0]
    assert 0.6 <= f <= 1.4 and f != 1.0
    got = decode_ppm(bytes(out["payload"].iloc[0]))
    assert np.array_equal(
        got, np.clip(np.full((4, 4, 3), 200.0) * f, 0, 255).astype(np.uint8)
    )


def test_new_seed_is_a_new_draw(spark):
    m = _media(spark, 8)
    a = augment_images(m, 0.5, 0.8, 0.3, seed=1).toPandas()
    b = augment_images(m, 0.5, 0.8, 0.3, seed=2).toPandas()
    merged = a.merge(b, on="media_id", suffixes=("_a", "_b"))
    assert (
        (merged["flipped_a"] != merged["flipped_b"])
        | (merged["bright_factor_a"] != merged["bright_factor_b"])
        | (merged["crop_x_a"] != merged["crop_x_b"])
        | (merged["crop_y_a"] != merged["crop_y_b"])
    ).any()
