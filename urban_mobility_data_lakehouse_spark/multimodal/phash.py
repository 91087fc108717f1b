"""Perceptual image hashing (pHash) + banded Hamming near-dup — the
IMAGE modality's member of the near-dup family (text: MinHash/SimHash/
winnowing; embeddings: banded cosine/SemDeDup; audio: energy-delta
fingerprints).  Exact byte dedup misses re-encodes, resizes, and
brightness tweaks; a DCT low-frequency hash survives them (the classic
pHash construction: Zauner 2010, "Implementation and Benchmarking of
Perceptual Image Hash Functions").

Construction, all deterministic pure numpy over the REAL decoders in
`binaryops` (PPM/BMP/PNG/GIF):

  1. decode → luma (integer-weighted 299R+587G+114B / 1000 — the BT.601
     weights in exact integer arithmetic, no float channel mixing),
  2. nearest-neighbor resample to 32×32 (the same index-map rule as
     `binaryops.resize_image`),
  3. 2-D orthonormal DCT-II (explicit cosine matrix, float64),
  4. keep the top-left 8×8 low-frequency block, drop the DC term,
  5. bit b = coefficient strictly greater than the MEDIAN of the 63
     retained coefficients (numpy median of an odd count = the 32nd
     order statistic — no averaging, no tie ambiguity) → 63 bits,
     packed MSB-first into a 16-hex-digit string (top bit always 0).

Scale shape mirrors `dedup/simhash.py`: hashing is row-local
`mapInPandas` (one bounded row out per image, no shuffle); candidate
generation BANDS the 64-bit hash into r-bit exact-match keys — by
pigeonhole, any pair within Hamming distance < n_bands shares at least
one band, so band-join + row-local popcount verify has guaranteed
recall for radius ≤ n_bands − 1 and never materializes all pairs.
"""

from __future__ import annotations

from typing import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .binaryops import _decode_pixels

HASH_BITS = 64
N_BANDS = 4  # 16-bit bands → guaranteed recall for Hamming ≤ 3
RESAMPLE = 32
BLOCK = 8


import functools


@functools.lru_cache(maxsize=4)
def _dct_matrix(n: int):
    """Orthonormal DCT-II basis matrix (n×n float64): row k, column i =
    s_k · cos(π(2i+1)k / 2n), s_0 = sqrt(1/n), s_k = sqrt(2/n).
    Memoized — `_phash_one` consults it per IMAGE, and the matrix is a
    pure function of n.  Callers must not mutate (the two consumers
    only read; the oracle generator copies values into literals)."""
    import numpy as np

    i = np.arange(n, dtype=np.float64)
    k = i[:, None]
    m = np.cos(np.pi * (2.0 * i[None, :] + 1.0) * k / (2.0 * n))
    m[0] *= np.sqrt(1.0 / n)
    m[1:] *= np.sqrt(2.0 / n)
    return m


def _phash_one(pixels) -> str:
    """uint8 (h, w, 3) → 16-hex-digit pHash (63 data bits, MSB 0).

    The DCT accumulation order is part of the hash's DEFINITION, not
    an implementation detail: both float64 folds below are strictly
    LEFT-TO-RIGHT (np.cumsum over elementwise products — cumsum must
    produce every prefix, so it cannot reassociate), never BLAS
    `m @ small` (dgemm blocks/reorders additions, so its low bits vary
    by library).  That makes the hash bit-replayable by any engine
    with IEEE float64 + a sequential fold — the DuckDB oracle of the
    `multimodal_suite` driver row replays it with `list_reduce`, and
    `tests/test_phash.py` locks this path against a pure-Python
    left-fold twin."""
    import numpy as np

    h, w = pixels.shape[:2]
    # integer BT.601 luma — exact, engine-portable arithmetic
    px = pixels.astype(np.int64)
    luma = (
        299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
    ) // 1000
    # nearest-neighbor index map, same rule as binaryops.resize_image
    rows = (np.arange(RESAMPLE) * h) // RESAMPLE
    cols = (np.arange(RESAMPLE) * w) // RESAMPLE
    small = luma[rows][:, cols].astype(np.float64)
    mk = _dct_matrix(RESAMPLE)[:BLOCK]  # only 8 basis rows are kept
    # stage 1: t[k, j] = fold_i mk[k, i] * small[i, j]  (left fold)
    t = np.cumsum(mk[:, :, None] * small[None, :, :], axis=1)[:, -1, :]
    # stage 2: c[k, l] = fold_j t[k, j] * mk[l, j]      (left fold)
    coeffs = np.cumsum(t[:, None, :] * mk[None, :, :], axis=2)[:, :, -1]
    block = coeffs.reshape(-1)[1:]  # drop DC → 63
    med = float(np.median(block))  # odd count → exact order statistic
    bits = (block > med).astype(np.uint64)
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return format(val, "016x")


def image_phash(media: DataFrame) -> DataFrame:
    """(media_id, phash, width, height) — one row per decodable image,
    row-local Arrow batches, no shuffle.  Undecodable payloads raise
    (the corrupt lane is the JSONL/bronze pattern; media tables are
    already past ingest)."""

    def _hash(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = _decode_pixels(bytes(payload))
                out.append(
                    (
                        int(mid),
                        _phash_one(px),
                        int(px.shape[1]),
                        int(px.shape[0]),
                    )
                )
            yield pd.DataFrame(
                out, columns=["media_id", "phash", "width", "height"]
            )

    return media.mapInPandas(
        _hash,
        schema="media_id long, phash string, width int, height int",
    )


def hash_bands(hashed: DataFrame, id_col: str, n_bands: int) -> DataFrame:
    """(id, h, band, key): a 64-bit hash column split into r-bit
    exact-match keys — by pigeonhole any pair within Hamming < n_bands
    shares at least one band.  Shared by the batch near-dup map below
    and the incremental index (`phash_index.ImageDupIndex`)."""
    r = HASH_BITS // n_bands
    return hashed.select(
        F.col(id_col),
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(
                            F.col("h"), (n_bands - 1 - b) * r
                        ).bitwiseAND(F.lit((1 << r) - 1)).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "h", "bk.band", "bk.key")


def phash_near_dups(
    media: DataFrame | None = None,
    max_hamming: int = 3,
    n_bands: int = N_BANDS,
    hashed: DataFrame | None = None,
) -> DataFrame:
    """(media_a, media_b, hamming) for every image pair whose pHashes
    differ in ≤ `max_hamming` bits — the image near-dup map.

    Banded LSH on the hash bits: any pair with Hamming < n_bands
    shares an identical band (pigeonhole), so the equi-join on
    (band, key) has guaranteed recall for the default radius; verify
    is one row-local xor+popcount.  Output is bounded by the true
    near-dup population; the all-pairs product never exists (the
    simhash plan shape, plan-locked there).

    Pass EITHER raw media OR a pre-checkpointed `image_phash` frame as
    `hashed` when the caller also consumes the hashes (hashing decodes
    every image — the corpus pass worth sharing); never both — the
    hashed frame alone defines the corpus (the `near_duplicates`
    input convention)."""
    if max_hamming >= n_bands:
        raise ValueError(
            f"banding guarantees recall only for max_hamming < n_bands "
            f"({max_hamming} >= {n_bands}): raise n_bands"
        )
    if (media is None) == (hashed is None):
        raise ValueError("pass exactly one of media / hashed")
    if hashed is None:
        hashed = image_phash(media)
    hashed = hashed.select(
        "media_id", F.conv("phash", 16, 10).cast("long").alias("h")
    )
    bands = hash_bands(hashed, "media_id", n_bands)
    a = bands.select(
        F.col("media_id").alias("media_a"),
        F.col("h").alias("ha"),
        "band",
        "key",
    )
    b = bands.select(
        F.col("media_id").alias("media_b"),
        F.col("h").alias("hb"),
        "band",
        "key",
    )
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("media_a") < F.col("media_b"))
        .select(
            "media_a",
            "media_b",
            F.bit_count(
                F.col("ha").bitwiseXOR(F.col("hb"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        .orderBy("media_a", "media_b")
    )
