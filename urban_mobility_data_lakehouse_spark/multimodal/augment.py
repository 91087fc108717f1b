"""Deterministic image augmentation — the train-time transform stage
of a multimodal data pipeline (random flip / crop-and-resize /
brightness jitter), run at corpus scale as a row-local `mapInPandas`
over decodable payloads (PPM/BMP/PNG/GIF via `binaryops`).

Determinism is the engine-wide sampling convention (`text/curation`,
`text/mixing`): augmentation parameters derive from
md5(seed, media_id), never `rand()` — the same row gets the same
augmentation under any repartition, retry, or re-run, so augmented
shards are reproducible and versioned lakehouse writes of them are
idempotent.  A new `seed` is a new epoch's augmentation draw.

No shuffle anywhere: decode → transform → re-encode (binary P6) is one
Arrow-batched projection, parallel by file at any corpus size.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame

from .binaryops import _decode_pixels, encode_ppm

__all__ = ["augment_images"]


def _uniforms(seed: int, media_id: int, n: int) -> list[float]:
    """n reproducible U[0,1) draws from md5(seed:media_id:i) — the
    hash-threshold convention, bit-stable across engines."""
    return [
        int.from_bytes(
            hashlib.md5(f"{seed}:{media_id}:{i}".encode()).digest()[:8],
            "big",
        )
        / 2**64
        for i in range(n)
    ]


def _nearest_resize(px, height: int, width: int):
    import numpy as np

    h0, w0 = px.shape[:2]
    yi = (np.arange(height) + 0.5) * h0 / height
    xi = (np.arange(width) + 0.5) * w0 / width
    return px[
        np.minimum(yi.astype(int), h0 - 1)[:, None],
        np.minimum(xi.astype(int), w0 - 1)[None, :],
    ]


def augment_images(
    media: DataFrame,
    flip_p: float = 0.5,
    crop_frac: float = 1.0,
    brightness: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """(media_id, payload) → augmented P6 payloads plus the drawn
    parameters as audit columns (flipped, crop_x/crop_y, bright_factor)
    so any augmented row is exactly reproducible from (seed, media_id).

      - horizontal flip with probability `flip_p`,
      - random crop to `crop_frac` of each side, resized back to the
        original geometry (nearest-neighbor — the random-resized-crop
        shape),
      - brightness scale by a factor in [1-brightness, 1+brightness],
        clipped to uint8.
    """

    def _augment(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                px = _decode_pixels(bytes(b))
                h0, w0 = px.shape[:2]
                u_flip, u_y, u_x, u_b = _uniforms(seed, int(mid), 4)
                flipped = u_flip < flip_p
                if flipped:
                    px = px[:, ::-1]
                crop_y = crop_x = 0
                if crop_frac < 1.0:
                    ch = max(1, int(h0 * crop_frac))
                    cw = max(1, int(w0 * crop_frac))
                    crop_y = int(u_y * (h0 - ch + 1))
                    crop_x = int(u_x * (w0 - cw + 1))
                    px = _nearest_resize(
                        px[crop_y : crop_y + ch, crop_x : crop_x + cw],
                        h0, w0,
                    )
                factor = 1.0
                if brightness > 0.0:
                    factor = 1.0 + (2.0 * u_b - 1.0) * brightness
                    px = np.clip(
                        px.astype("float64") * factor, 0, 255
                    ).astype("uint8")
                out.append(
                    (
                        int(mid),
                        bytearray(encode_ppm(np.ascontiguousarray(px))),
                        bool(flipped),
                        crop_x,
                        crop_y,
                        round(factor, 8),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "payload", "flipped",
                    "crop_x", "crop_y", "bright_factor",
                ],
            )

    return media.mapInPandas(
        _augment,
        schema=(
            "media_id long, payload binary, flipped boolean, "
            "crop_x int, crop_y int, bright_factor double"
        ),
    )
