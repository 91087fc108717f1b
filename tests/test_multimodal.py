"""Multimodal plumbing tests: schema contract, Arrow batch shape,
deterministic byte features, stub gating."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.multimodal.binaryops import (
    decode_image,
    documents_as_media,
    extract_byte_features,
    frame_sample,
)
from urban_mobility_data_lakehouse_spark.sources.testdata import load_table


def test_byte_features(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    feats = extract_byte_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == docs.count()
    # n_bytes must equal the text length (ascii corpus)
    sample = docs.select("doc_id", F.length("text").alias("n")).collect()
    for r in sample[:20]:
        assert rows[r["doc_id"]]["n_bytes"] == r["n"]
    # histogram sums to n_bytes; entropy bounded by log2(16)
    for r in list(rows.values())[:20]:
        assert sum(r["byte_hist"]) == r["n_bytes"]
        assert 0.0 <= r["entropy"] <= math.log2(16) + 1e-9


def test_decode_stub_gating(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    with pytest.raises(NotImplementedError):
        decode_image(media, fake=False)
    decoded = decode_image(media.limit(5), fake=True).collect()
    assert len(decoded) == 5
    assert all(r["n_channels"] == 3 for r in decoded)


def test_frame_sample_fanout(spark):
    media = spark.createDataFrame(
        [(1, "video/mp4", bytearray(b"x"), (None, None, None, 95))],
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    frames = frame_sample(media, every_n=10).collect()
    assert [r["frame_index"] for r in frames] == list(range(0, 95, 10))


def test_resize_stub_plumbing(spark, sf_dir):
    from urban_mobility_data_lakehouse_spark.multimodal.binaryops import (
        documents_as_media,
        resize_image,
    )
    from urban_mobility_data_lakehouse_spark.sources.testdata import (
        load_table,
    )

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    out = resize_image(media.limit(20), 8, 6, fake=True)
    rows = out.collect()
    assert len(rows) == 20
    assert all(len(r["payload"]) == 8 * 6 * 3 for r in rows)
    assert all((r["width"], r["height"]) == (8, 6) for r in rows)

    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="resize"):
        resize_image(media, 8, 6).collect()
