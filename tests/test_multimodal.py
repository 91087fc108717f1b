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
    """Compressed/unknown payloads still raise (text bytes are neither
    PPM nor BMP); fake=True keeps the plumbing testable."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    with pytest.raises(Exception, match="codecs needing external"):
        decode_image(media.limit(2), fake=False).collect()
    decoded = decode_image(media.limit(5), fake=True).collect()
    assert len(decoded) == 5
    assert all(r["n_channels"] == 3 for r in decoded)


def _gradient_image(w, h):
    import numpy as np

    x = np.arange(w, dtype=np.uint8)[None, :, None]
    y = np.arange(h, dtype=np.uint8)[:, None, None]
    return np.concatenate(
        [
            np.broadcast_to(x % 256, (h, w, 1)),
            np.broadcast_to(y % 256, (h, w, 1)),
            np.broadcast_to((x + y) % 256, (h, w, 1)),
        ],
        axis=2,
    ).astype(np.uint8)


def _bmp_bytes(arr):
    """Minimal uncompressed 24-bit BMP writer (bottom-up, BGR,
    4-byte row padding) — test-side twin of decode_bmp."""
    import numpy as np

    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    pixel_data = rows.tobytes()
    offset = 14 + 40
    header = (
        b"BM"
        + (offset + len(pixel_data)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + offset.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(pixel_data).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + pixel_data


def _wav_bytes(rate, samples):
    """Minimal PCM16 WAV writer — test-side twin of decode_wav."""
    data = samples.astype("<i2").tobytes()
    n_ch = samples.shape[1]
    byte_rate = rate * n_ch * 2
    fmt = (
        (1).to_bytes(2, "little")
        + n_ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (n_ch * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _png_bytes(px, color_type=2, filters=(0,)):
    """Minimal PNG writer — test-side twin of decode_png.  Applies the
    spec's FORWARD filter per scanline (cycling through `filters`), so
    decoding must exactly invert Sub/Up/Average/Paeth to recover the
    pixels."""
    import zlib

    import numpy as np

    h, w, c = px.shape
    flat = px.reshape(h, w * c).astype(np.int16)
    raw = bytearray()
    for y in range(h):
        row = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * c, np.int16)
        f = filters[y % len(filters)]
        out = np.zeros(w * c, np.int16)
        for x in range(w * c):
            a = int(row[x - c]) if x >= c else 0
            b = int(prev[x])
            cc = int(prev[x - c]) if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            out[x] = (int(row[x]) - pred) & 0xFF
        raw.append(f)
        raw += out.astype(np.uint8).tobytes()

    def chunk(ctype, body):
        return (
            len(body).to_bytes(4, "big") + ctype + body
            + zlib.crc32(ctype + body).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )
    idat = zlib.compress(bytes(raw))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        # split IDAT to exercise chunk concatenation
        + chunk(b"IDAT", idat[: len(idat) // 2])
        + chunk(b"IDAT", idat[len(idat) // 2:])
        + chunk(b"IEND", b"")
    )


def test_png_decode_pixel_exact_all_filters():
    """decode_png must exactly invert every spec filter type
    (None/Sub/Up/Average/Paeth) on an adversarial pixel pattern —
    pixel-for-pixel equality, not just dims."""
    import numpy as np

    from urban_mobility_data_lakehouse_spark.multimodal.binaryops import (
        decode_png,
    )

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(13, 9, 3), dtype=np.uint8)
    # every filter type used at least twice across 13 rows
    got = decode_png(_png_bytes(px, filters=(0, 1, 2, 3, 4)))
    assert got.shape == (13, 9, 3)
    assert (got == px).all()
    # single-filter streams too (each inverse in isolation)
    for f in range(5):
        assert (decode_png(_png_bytes(px, filters=(f,))) == px).all()


def test_png_decode_color_types():
    """RGBA drops alpha; grayscale replicates to 3 channels."""
    import numpy as np

    from urban_mobility_data_lakehouse_spark.multimodal.binaryops import (
        decode_png,
    )

    rng = np.random.RandomState(11)
    rgba = rng.randint(0, 256, size=(6, 5, 4), dtype=np.uint8)
    got = decode_png(_png_bytes(rgba, color_type=6, filters=(4, 2)))
    assert (got == rgba[..., :3]).all()

    gray = rng.randint(0, 256, size=(6, 5, 1), dtype=np.uint8)
    got = decode_png(_png_bytes(gray, color_type=0, filters=(1, 3)))
    assert (got == np.repeat(gray, 3, axis=2)).all()


def test_png_decodes_through_dataframe_path(spark):
    """The PNG decoder works inside the distributed mapInPandas decode
    operator, alongside other formats, with real channel means."""
    import numpy as np

    px = _gradient_image(8, 6)
    media = _media_df(
        spark, [("image/png", _png_bytes(px, filters=(0, 1, 2, 3, 4)))]
    )
    (r,) = decode_image(media).collect()
    means = px.reshape(-1, 3).mean(axis=0)
    assert (r["width"], r["height"], r["n_channels"]) == (8, 6, 3)
    assert r["mean_r"] == round(float(means[0]), 4)
    assert r["mean_g"] == round(float(means[1]), 4)
    assert r["mean_b"] == round(float(means[2]), 4)


def test_png_decode_rejects_unsupported():
    import numpy as np
    import pytest as _pytest

    from urban_mobility_data_lakehouse_spark.multimodal.binaryops import (
        decode_png,
    )

    px = np.zeros((2, 2, 3), np.uint8)
    good = _png_bytes(px)
    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF" + good)
    # corrupt the IHDR bit depth to 16
    bad = bytearray(good)
    bad[24] = 16
    with _pytest.raises(ValueError, match="8-bit"):
        decode_png(bytes(bad))


def _media_df(spark, rows):
    return spark.createDataFrame(
        [
            (i, kind, bytearray(payload), (None, None, None, None))
            for i, (kind, payload) in enumerate(rows)
        ],
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )


def test_real_image_decode(spark):
    """PPM and BMP payloads decode to actual pixels (dims + channel
    means match the numpy reference) with no codec libraries."""
    import numpy as np

    from urban_mobility_data_lakehouse_spark.multimodal.binaryops import (
        encode_ppm,
    )

    img = _gradient_image(13, 7)  # odd dims exercise BMP row padding
    media = _media_df(
        spark,
        [("image/x-ppm", encode_ppm(img)), ("image/bmp", _bmp_bytes(img))],
    )
    rows = {r["media_id"]: r for r in decode_image(media).collect()}
    means = img.reshape(-1, 3).mean(axis=0)
    for r in rows.values():
        assert (r["width"], r["height"], r["n_channels"]) == (13, 7, 3)
        np.testing.assert_allclose(
            [r["mean_r"], r["mean_g"], r["mean_b"]], means, atol=1e-4
        )


def test_real_audio_decode(spark):
    """PCM WAV payloads parse to the exact sample matrix (rate, shape,
    RMS match the numpy reference)."""
    import numpy as np

    from urban_mobility_data_lakehouse_spark.multimodal.binaryops import (
        decode_audio,
    )

    t = np.arange(800)
    samples = np.stack(
        [
            (1000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16),
            (500 * np.cos(2 * np.pi * 220 * t / 8000)).astype(np.int16),
        ],
        axis=1,
    )
    media = _media_df(spark, [("audio/wav", _wav_bytes(8000, samples))])
    (row,) = decode_audio(media).collect()
    assert (row["sample_rate"], row["n_channels"], row["n_samples"]) == (
        8000, 2, 800,
    )
    expected_rms = float(np.sqrt((samples.astype("float64") ** 2).mean()))
    assert abs(row["rms"] - round(expected_rms, 4)) < 1e-9


def test_real_resize_roundtrip(spark):
    """Nearest-neighbor resize is a real pixel op: output re-decodes as
    PPM with the target dims and matches the numpy index-map."""
    import numpy as np

    from urban_mobility_data_lakehouse_spark.multimodal.binaryops import (
        decode_ppm,
        encode_ppm,
        resize_image,
    )

    img = _gradient_image(16, 12)
    media = _media_df(spark, [("image/x-ppm", encode_ppm(img))])
    (row,) = resize_image(media, 8, 6).collect()
    out = decode_ppm(bytes(row["payload"]))
    assert out.shape == (6, 8, 3)
    yi = np.minimum(((np.arange(6) + 0.5) * 12 / 6).astype(int), 11)
    xi = np.minimum(((np.arange(8) + 0.5) * 16 / 8).astype(int), 15)
    np.testing.assert_array_equal(out, img[yi[:, None], xi[None, :]])


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

    with _pytest.raises(Exception, match="codecs needing external"):
        resize_image(media.limit(2), 8, 6).collect()


def test_video_frame_sampling_pixel_exact(spark):
    """Concatenated-P6 video: sampled frames decode pixel-exact, the
    stream walk counts frames, and a lying catalog n_frames raises."""
    import numpy as np

    from urban_mobility_data_lakehouse_spark.multimodal.binaryops import (
        MEDIA_SCHEMA,
        decode_ppm,
        encode_ppm_stream,
        sample_video_frames,
        split_ppm_stream,
    )

    rng = np.random.RandomState(7)
    frames = [
        (rng.rand(4, 5, 3) * 255).astype("uint8") for _ in range(7)
    ]
    stream = encode_ppm_stream(frames)
    assert len(split_ppm_stream(stream)) == 7

    rows = [(1, "video/x-ppm", bytearray(stream), (5, 4, None, 7))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["frame_index"]: r
        for r in sample_video_frames(media, every_n=3).collect()
    }
    assert sorted(got) == [0, 3, 6]
    for idx, r in got.items():
        assert (r["width"], r["height"], r["n_frames"]) == (5, 4, 7)
        assert (decode_ppm(bytes(r["frame"])) == frames[idx]).all()
        assert abs(
            r["mean_luma"] - round(float(frames[idx].mean()), 4)
        ) < 1e-9

    # catalog/container disagreement must fail loudly
    import pytest as _pytest

    bad = spark.createDataFrame(
        [(2, "video/x-ppm", bytearray(stream), (5, 4, None, 99))],
        MEDIA_SCHEMA,
    )
    with _pytest.raises(Exception, match="99 frames"):
        sample_video_frames(bad, every_n=3).collect()


def _gif_lzw_encode(indices, min_code_size):
    """Test-side GIF LZW encoder (standard algorithm with table growth
    and 12-bit cap+reclear), LSB-first bit packing."""
    clear = 1 << min_code_size
    end = clear + 1
    codes = [clear]
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    width_plan = []  # width at the time each code was APPENDED
    widths = [min_code_size + 1]

    def cur_width():
        return widths[0]

    buf = tuple()
    out_codes = [clear]
    width_plan.append(cur_width())
    for sym in indices:
        cand = buf + (sym,)
        if cand in table:
            buf = cand
            continue
        out_codes.append(table[buf])
        width_plan.append(cur_width())
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << cur_width()) and cur_width() < 12:
            widths[0] += 1
        buf = (sym,)
    if buf:
        out_codes.append(table[buf])
        width_plan.append(cur_width())
    out_codes.append(end)
    width_plan.append(cur_width())
    acc = nbits = 0
    data = bytearray()
    for code, w in zip(out_codes, width_plan):
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    return bytes(data)


def _gif_bytes(px_idx, palette, min_code_size=None, interlace=False):
    """Minimal single-image GIF89a writer around `_gif_lzw_encode`."""
    import numpy as np

    h, w = px_idx.shape
    n = len(palette)
    size_bits = max(1, (n - 1).bit_length())
    if min_code_size is None:
        min_code_size = max(2, size_bits)
    gct = np.zeros((2 ** size_bits, 3), dtype=np.uint8)
    gct[:n] = palette
    rows = px_idx
    if interlace:
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        rows = px_idx[order]
    data = _gif_lzw_encode([int(v) for v in rows.ravel()], min_code_size)
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (size_bits - 1), 0, 0])
    out += gct.tobytes()
    out += b"\x2c" + b"\x00" * 4
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0x00])
    out += bytes([min_code_size])
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_decode_hand_packed_minimal():
    """Hand-verifiable fixture, independent of the test encoder: a
    2x2 4-color image as CLEAR-before-every-pixel codes (table never
    grows, all codes 3 bits, LSB-first):
    [4,0,4,1,4,2,4,3,5] -> bytes 0x04 0x43 0x71 0x05."""
    import numpy as np

    from urban_mobility_data_lakehouse_spark.multimodal.binaryops import (
        decode_gif,
    )

    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8
    )
    gif = bytearray(b"GIF87a")
    gif += (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
    gif += bytes([0x81, 0, 0])  # GCT present, 4 entries
    gif += palette.tobytes()
    gif += b"\x2c" + b"\x00" * 4
    gif += (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
    gif += b"\x00\x02"  # no LCT/interlace; min code size 2
    packed = bytes([0x04, 0x43, 0x71, 0x05])
    gif += bytes([len(packed)]) + packed + b"\x00\x3b"
    got = decode_gif(bytes(gif))
    assert (got == palette.reshape(2, 2, 3)).all()


def test_gif_decode_roundtrip_with_growth_and_interlace():
    """Encoder round-trip on a pattern big enough to grow the code
    width, plus the 4-pass interlace row order, plus an extension
    block to walk over."""
    import numpy as np

    from urban_mobility_data_lakehouse_spark.multimodal.binaryops import (
        decode_gif,
    )

    rng = np.random.RandomState(3)
    palette = rng.randint(0, 256, size=(8, 3), dtype=np.uint8)
    idx = rng.randint(0, 8, size=(16, 11)).astype(np.uint8)
    want = palette[idx]
    assert (decode_gif(_gif_bytes(idx, palette)) == want).all()
    assert (
        decode_gif(_gif_bytes(idx, palette, interlace=True)) == want
    ).all()
    # graphic-control extension before the image descriptor
    plain = _gif_bytes(idx, palette)
    with_ext = (
        plain[: 13 + 8 * 3]
        + b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        + plain[13 + 8 * 3 :]
    )
    assert (decode_gif(with_ext) == want).all()


def test_gif_decode_via_decode_image_op(spark):
    """decode_image dispatches GIF payloads for real (fake=False)."""
    import numpy as np

    rng = np.random.RandomState(5)
    palette = rng.randint(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.randint(0, 4, size=(6, 7)).astype(np.uint8)
    payload = _gif_bytes(idx, palette)
    media = spark.createDataFrame(
        [(1, "image/gif", bytearray(payload))],
        "media_id bigint, mime string, payload binary",
    )
    row = decode_image(media, fake=False).collect()[0]
    assert (row["height"], row["width"]) == (6, 7)
    want = palette[idx]
    # the op rounds channel means to 3 decimals
    assert abs(row["mean_r"] - want[..., 0].mean()) < 5e-4


def test_twin_offsets_footer_derivation(tmp_path):
    """The planted-twin offsets must scale with the corpus: next power
    of 10 above the footer's max doc_id (floored at 100_000 to keep
    current-SF outputs stable), doubled for the brightness twins."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from urban_mobility_data_lakehouse_spark.queries.multimodal_suite import (
        _twin_offsets,
    )

    def footer_for(max_id: int) -> str:
        d = tmp_path / f"sf_{max_id}"
        d.mkdir()
        pq.write_table(
            pa.table({"doc_id": [0, max_id], "text": ["a", "b"]}),
            d / "documents.parquet",
        )
        return str(d)

    assert _twin_offsets(footer_for(499)) == (100_000, 200_000)
    assert _twin_offsets(footer_for(99_999)) == (100_000, 200_000)
    # sf10+ shape: doc_id at/above the old fixed literals no longer
    # collides — offsets scale in lockstep on builder AND oracle
    assert _twin_offsets(footer_for(100_000)) == (1_000_000, 2_000_000)
    assert _twin_offsets(footer_for(3_456_789)) == (10_000_000, 20_000_000)


def test_multimodal_suite_sf_proof_at_large_doc_ids(spark, tmp_path):
    """End-to-end sf10+ shape: with real doc_ids ABOVE the old fixed
    offsets (100_000/200_000) the row still hash-greens — builder and
    oracle derive the scaled offsets from the same footer instead of
    colliding twins with strangers."""
    import shutil

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from urban_mobility_data_lakehouse_spark.queries import (
        REGISTRY,
        _load_all,
    )

    from .oracle_utils import assert_frames_match

    _load_all()
    src = "/root/testdata/sf0.001"
    d = tmp_path / "sf_big_ids"
    d.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings".split()
    ):
        shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")
    docs = pq.read_table(f"{src}/documents.parquet")
    docs = docs.set_column(
        docs.column_names.index("doc_id"),
        "doc_id",
        pc.add(docs.column("doc_id"), 200_000),
    )
    pq.write_table(docs, d / "documents.parquet")

    from urban_mobility_data_lakehouse_spark.queries.multimodal_suite import (
        _twin_offsets,
    )

    assert _twin_offsets(str(d)) == (1_000_000, 2_000_000)
    spec = REGISTRY["multimodal_suite"]
    assert_frames_match(
        spec.builder(spark, str(d)),
        spec.oracle_for(str(d)),
        str(d),
        "multimodal_suite@big_ids",
    )
