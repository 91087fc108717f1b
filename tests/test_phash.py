"""Perceptual image hash (multimodal/phash.py): DCT low-frequency
hashing must survive the edits exact byte-dedup misses (brightness,
re-rendering) and separate genuinely different images; the banded
near-dup map must find planted twins without an all-pairs product."""

from __future__ import annotations

import numpy as np
import pytest

from urban_mobility_data_lakehouse_spark.multimodal.binaryops import (
    encode_ppm,
)
from urban_mobility_data_lakehouse_spark.multimodal.phash import (
    _phash_one,
    image_phash,
    phash_near_dups,
)


def _gradient(h=64, w=64, fx=1.0, fy=2.0):
    """Smooth deterministic test image (h, w, 3) uint8, values ≤ 200
    so brightness shifts below stay clip-free."""
    y, x = np.mgrid[0:h, 0:w]
    base = (
        90
        + 60 * np.sin(2 * np.pi * fx * x / w)
        + 50 * np.cos(2 * np.pi * fy * y / h)
    )
    img = np.stack([base, base * 0.8, base * 0.6], axis=2)
    return np.clip(img, 0, 200).astype(np.uint8)


def _noise(seed, h=64, w=64):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8) // 1


def _hamming(a: str, b: str) -> int:
    return bin(int(a, 16) ^ int(b, 16)).count("1")


def test_identical_bytes_identical_hash():
    img = _gradient()
    assert _phash_one(img) == _phash_one(img.copy())


def test_uniform_brightness_shift_is_hash_invariant():
    """+c on every pixel moves ONLY the dropped DC coefficient, so the
    63 retained bits are bit-identical — the invariance that makes
    pHash a near-dup key where md5 fails."""
    img = _gradient()
    brighter = np.clip(img.astype(np.int32) + 20, 0, 255).astype(
        np.uint8
    )
    assert _phash_one(img) == _phash_one(brighter)
    assert not np.array_equal(img, brighter)  # md5 WOULD differ


def test_rescale_keeps_hash_close():
    """The same scene at 64x64 and 128x128 resamples to (nearly) the
    same 32x32 luma plane → small Hamming distance."""
    lo = _gradient(64, 64)
    hi = _gradient(128, 128)
    assert _hamming(_phash_one(lo), _phash_one(hi)) <= 3


def test_different_images_are_far():
    ha = _phash_one(_noise(1))
    hb = _phash_one(_noise(2))
    hc = _phash_one(_gradient())
    assert _hamming(ha, hb) > 10
    assert _hamming(ha, hc) > 10


def test_banded_near_dups_finds_planted_twins(spark):
    """Corpus of distinct noise images + a brightness twin of image 0
    and an exact copy of image 1: the banded map must return exactly
    those two pairs at radius 3, via an equi-join (no cartesian)."""
    imgs = {i: _noise(100 + i) for i in range(8)}
    imgs[0] = _gradient()
    rows = [
        (i, bytearray(encode_ppm(img))) for i, img in imgs.items()
    ]
    twin = np.clip(imgs[0].astype(np.int32) + 15, 0, 255).astype(
        np.uint8
    )
    rows.append((100, bytearray(encode_ppm(twin))))
    rows.append((101, bytearray(encode_ppm(imgs[1]))))
    media = spark.createDataFrame(
        rows, "media_id long, payload binary"
    )
    out = phash_near_dups(media, max_hamming=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    pairs = {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in out.collect()
    }
    assert set(pairs) == {(0, 100), (1, 101)}
    assert pairs[(0, 100)] == 0  # brightness-only: DC absorbed it
    assert pairs[(1, 101)] == 0  # exact copy


def test_phash_dataframe_surface(spark):
    media = spark.createDataFrame(
        [(7, bytearray(encode_ppm(_gradient())))],
        "media_id long, payload binary",
    )
    r = image_phash(media).collect()[0]
    assert (r["width"], r["height"]) == (64, 64)
    assert len(r["phash"]) == 16
    assert int(r["phash"], 16) < 1 << 63  # MSB always 0: signed-safe


def test_radius_guard():
    with pytest.raises(ValueError):
        phash_near_dups(None, max_hamming=4, n_bands=4)


def test_phash_numpy_folds_match_pure_python_left_folds():
    """The DCT accumulation order is part of the hash's DEFINITION
    (phash.py docstring): _phash_one's np.cumsum stages must equal a
    strict pure-Python left fold bit-for-bit — this is the contract
    that lets the multimodal_suite DuckDB oracle replay the hash with
    list_reduce.  If numpy ever reassociates cumsum, this catches it."""
    import numpy as np

    from urban_mobility_data_lakehouse_spark.multimodal.phash import (
        BLOCK,
        RESAMPLE,
        _dct_matrix,
        _phash_one,
    )

    rng = np.random.RandomState(11)
    mk = _dct_matrix(RESAMPLE)[:BLOCK]

    def py_phash(pixels):
        h, w = pixels.shape[:2]
        px = pixels.astype(np.int64)
        luma = (
            299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
        ) // 1000
        rows = (np.arange(RESAMPLE) * h) // RESAMPLE
        cols = (np.arange(RESAMPLE) * w) // RESAMPLE
        small = luma[rows][:, cols].astype(np.float64)
        t = [
            [
                _fold(float(mk[k, i]) * float(small[i, j]) for i in range(RESAMPLE))
                for j in range(RESAMPLE)
            ]
            for k in range(BLOCK)
        ]
        coeffs = [
            _fold(t[k][j] * float(mk[l, j]) for j in range(RESAMPLE))
            for k in range(BLOCK)
            for l in range(BLOCK)
        ]
        block = coeffs[1:]
        med = sorted(block)[31]  # 32nd order statistic of 63
        val = 0
        for c in block:
            val = (val << 1) | (1 if c > med else 0)
        return format(val, "016x")

    def _fold(terms):
        acc = None
        for x in terms:
            acc = x if acc is None else acc + x
        return acc

    for shape in [(8, 8, 3), (48, 48, 3), (17, 31, 3)]:
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        assert _phash_one(img) == py_phash(img), shape
