"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched mapInPandas.

The container has no image/audio codecs, so the *decode* steps are
stubbed (NotImplementedError, or a deterministic fake under
`fake=True`) — but everything Spark-side is real and tested: the
schema contract, the mapInPandas batch shape, byte-level feature
extraction, and the partitioning story.

Scale: payloads stay distributed end-to-end (no collect); mapInPandas
streams Arrow record batches, so peak executor memory is one batch of
binaries, not one partition.  Feature extraction (byte histograms,
entropy) is pure numpy over the Arrow buffers.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, entropy double, "
    "byte_hist array<long>"
)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Wrap the text corpus as opaque binary media rows (the test stand-in
    for real image/audio payloads): payload = UTF-8 bytes, metadata typed."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text/plain").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def extract_byte_features(media: DataFrame, hist_bins: int = 16) -> DataFrame:
    """Real feature extraction over binary payloads: length, Shannon
    entropy, coarse byte histogram — Arrow-batched, deterministic."""

    def _features(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(b >> 4, minlength=hist_bins).astype("int64")
                p = hist[hist > 0] / max(len(b), 1)
                entropy = float(-(p * np.log2(p)).sum()) if len(b) else 0.0
                out.append(
                    (int(mid), kind, int(len(b)), round(entropy, 6),
                     hist.tolist())
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "kind", "n_bytes", "entropy", "byte_hist"
                ],
            )

    return media.mapInPandas(_features, schema=FEATURE_SCHEMA)


def decode_image(media: DataFrame, fake: bool = False) -> DataFrame:
    """Image decode step — STUB: no codec libraries in this container.

    With fake=True returns a deterministic pseudo-decode (pixel dims
    derived from payload length) so downstream plumbing is testable;
    otherwise raises NotImplementedError.  The mapInPandas signature,
    schema, and batching are exactly what a PIL/libvips-backed
    implementation would use.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/libvips — not available here; "
            "call with fake=True for the deterministic test double"
        )

    def _decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            n = pdf["payload"].map(lambda b: len(bytes(b)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": (n % 640 + 1).astype("int32"),
                    "height": (n % 480 + 1).astype("int32"),
                    "n_channels": 3,
                }
            )

    return media.mapInPandas(
        _decode,
        schema="media_id long, width int, height int, n_channels int",
    )


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing — STUB decode, real fan-out: emits
    one row per sampled frame index using the typed metadata, which is
    the actual distributed-shape concern (row explosion control)."""
    return (
        media.filter(F.col("meta.n_frames").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.col("meta.n_frames") - 1,
                    F.lit(every_n),
                )
            ).alias("frame_index"),
        )
    )


def resize_image(
    media: DataFrame, width: int, height: int, fake: bool = False
) -> DataFrame:
    """Image resize step — STUB decode (no codecs here), real plumbing:
    binary-in → binary-out mapInPandas with the target dims stamped
    into the typed metadata.  A PIL-backed implementation swaps only
    the body of `_resize`; batching, schema, and the no-collect
    contract are already exactly right.
    """
    if not fake:
        raise NotImplementedError(
            "image resize requires PIL/libvips — not available here; "
            "call with fake=True for the deterministic test double"
        )

    def _resize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            # deterministic fake: payload truncated/padded to w*h*3 so
            # downstream size accounting is exercised for real
            target = width * height * 3
            payload = pdf["payload"].map(
                lambda b: (bytes(b) * (target // max(len(bytes(b)), 1) + 1))[
                    :target
                ]
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payload,
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(
        _resize,
        schema=(
            "media_id long, kind string, payload binary, "
            "width int, height int"
        ),
    )
