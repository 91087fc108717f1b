"""Driver row for the audio lane (`multimodal/audiofeats.py`).

The fixture is a deterministic pure-tone corpus derived from the
sf_dir's documents table: one 16-bit PCM WAV clip per document, tone
class = doc_id % 13 (13 distinct frequencies), so clips within a class
are byte-identical and classes are spectrally distinct.  It is written
as a parquet file with a BINARY payload column by shared pyarrow code
(no Spark), so the Spark builder and the DuckDB oracle generator
materialize the identical bytes.

What the oracle can honestly replay is the INTEGER face of the lane —
DuckDB parses the WAV BLOB positionally from its hex dump (the
`multimodal_suite` bytes-part trick): header = 44 fixed bytes, sample i = the
little-endian int16 at byte 44+2i.  That pins, bit-exactly:

  - `clip` part — decode audit (n_samples, exact int64 sum/min/max of
    the raw samples): a one-byte header-offset or endianness bug in
    `decode_wav` flips the hash;
  - `frame` part — the framing geometry + zero-crossing feature:
    zc(t) = integer sign-change count inside Hann window t (recovered
    from `frame_features`' zcr as round(zcr·(frame_len−1)) — exact,
    no float in the hash);
  - `fp` part — `audio_fingerprint` dedup group structure: Spark
    groups clips by spectral fingerprint, DuckDB by md5 of the payload
    bytes; the two partitions coincide because same-class clips are
    byte-identical (⇒ same fingerprint) and the 13 tone classes have
    distinct fingerprints (pinned by tests/test_audio_suite.py, so a
    regression that collapses two classes fails BOTH gates).

The float spectral features (rms, centroid, band energies — numpy
rfft, pairwise-summation order) are beyond SQL replay and stay under
pytest (`tests/test_audiofeats.py`), as VERDICT r6 records.
"""

from __future__ import annotations

import hashlib
import math
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..multimodal.audiofeats import (
    audio_fingerprint,
    clip_stats,
    frame_features,
)
from . import register

_FIXTURE_ROOT = "/tmp/umdl_fixtures"
RATE = 8000
N_SAMPLES = 1024
AMP = 12000
FRAME_LEN = 256
HOP = 128
N_CLASSES = 13
# 200..1220 Hz in 85 Hz steps — all far below Nyquist (4 kHz), far
# enough apart that the 8-band spectral shapes (and so the anchor
# fingerprint bits) differ per class
FREQS = [200 + 85 * c for c in range(N_CLASSES)]


def _tone_payload(freq: int) -> bytes:
    """16-bit PCM WAV of a pure tone — pure-python math so the fixture
    generator needs no Spark; numpy only via encode_wav's tobytes."""
    from ..multimodal.audiofeats import encode_wav

    samples = [
        int(round(AMP * math.sin(2.0 * math.pi * freq * t / RATE)))
        for t in range(N_SAMPLES)
    ]
    return encode_wav(RATE, samples)


def ensure_audio_corpus(sf_dir: str) -> str:
    """Idempotently materialize media.parquet (media_id, payload) for
    `sf_dir` and return its path.  One clip per document; payload =
    the doc's tone-class WAV (13 distinct payloads, repeated)."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out_dir = os.path.join(_FIXTURE_ROOT, f"audio_{tag}")
    out = os.path.join(out_dir, "media.parquet")
    if os.path.exists(out):
        return out
    import pyarrow as pa
    import pyarrow.parquet as pq

    doc_ids = sorted(
        pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        )
        .column("doc_id")
        .to_pylist()
    )
    payloads = [_tone_payload(f) for f in FREQS]
    tbl = pa.table(
        {
            "media_id": pa.array(doc_ids, pa.int64()),
            "payload": pa.array(
                [payloads[d % N_CLASSES] for d in doc_ids], pa.binary()
            ),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    tmp = out + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, out)
    return out


# sample i (0-based) of clip m = little-endian int16 at bytes
# 44+2i / 45+2i (fixed 44-byte header), decoded from the hex dump at
# 1-based positions 2*j+1 (high nibble of byte j) — multimodal_suite's
# positional-hex idiom
_BYTE = (
    "((strpos('0123456789ABCDEF', substr(m.hx, 2 * ({j}) + 1, 1)) - 1)"
    " * 16"
    " + strpos('0123456789ABCDEF', substr(m.hx, 2 * ({j}) + 2, 1)) - 1)"
)
_RAW16 = (
    f"({_BYTE.format(j='44 + 2 * t.i')}"
    f" + 256 * {_BYTE.format(j='45 + 2 * t.i')})"
)
_INT16 = f"(CASE WHEN {_RAW16} >= 32768 THEN {_RAW16} - 65536 ELSE {_RAW16} END)"


# spec-part feature indices (the `s` column): bands 0..N_BANDS-1,
# then rms / centroid as out-of-band codes
N_BANDS = 8
_SPEC_RMS, _SPEC_CENTROID = 100, 101


def _spec_census() -> list[tuple[int, int, int, int]]:
    """(cls, frame_no, feat, q) literals for the 'spec' part: a numpy
    TWIN re-derives each pure-tone class's spectral features straight
    from the payload bytes (struct-level int16 decode — independent of
    `binaryops.decode_wav`'s chunk walk — then the documented Hann /
    rfft / log1p-band pipeline) and quantizes to integer micro-units
    with the exact decimal-string HALF_UP rule Spark's round() applies,
    so both engines hash identical BIGINTs.  Frozen at
    oracle-generation time — the knn_ivf centroid-literal pattern.  The
    duplication of the `_frame_matrix` math here is the point: a
    production-path change to window, band edges, or log handling now
    flips a driver hash instead of drifting silently."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    def q6(x: float) -> int:
        # Spark round(double) == BigDecimal.valueOf (shortest decimal
        # repr, like Python's repr) + setScale(0, HALF_UP)
        return int(
            Decimal(repr(float(x) * 1e6)).quantize(
                Decimal(1), rounding=ROUND_HALF_UP
            )
        )

    window = np.hanning(FRAME_LEN)
    freqs = np.fft.rfftfreq(FRAME_LEN, d=1.0 / RATE)
    n_frames = (N_SAMPLES - FRAME_LEN) // HOP + 1
    out: list[tuple[int, int, int, int]] = []
    for cls, freq in enumerate(FREQS):
        payload = _tone_payload(freq)
        x = (
            np.frombuffer(payload[44:], dtype="<i2").astype("float64")
            / 32768.0
        )
        for t in range(n_frames):
            fr = x[t * HOP : t * HOP + FRAME_LEN]
            feats: dict[int, float] = {
                _SPEC_RMS: float(np.sqrt((fr**2).mean())),
            }
            mag = np.abs(np.fft.rfft(fr * window))
            tot = float(mag.sum())
            feats[_SPEC_CENTROID] = (
                float((mag * freqs).sum() / tot) if tot > 0 else 0.0
            )
            for b, band in enumerate(np.array_split(mag**2, N_BANDS)):
                feats[b] = float(np.log1p(band.sum()))
            for feat, val in feats.items():
                out.append(
                    (cls, t, feat, q6(float(np.round(val, 8))))
                )
    return out


def _audio_oracle(sf_dir: str) -> str:
    path = ensure_audio_corpus(sf_dir)
    n_frames = (N_SAMPLES - FRAME_LEN) // HOP + 1
    spec_values = ", ".join(
        f"({c}, {t}, {f}, {q})" for c, t, f, q in _spec_census()
    )
    return f"""
    WITH m AS (
        SELECT media_id, hex(payload) AS hx,
               (octet_length(payload) - 44) / 2 AS n
        FROM read_parquet('{path}')
    ),
    s AS (
        SELECT m.media_id, t.i, {_INT16} AS v
        FROM m, generate_series(0, {N_SAMPLES - 1}) AS t(i)
    ),
    signed AS (
        SELECT media_id, i, v,
               CASE WHEN v < 0 THEN -1 ELSE 1 END AS sg
        FROM s
    ),
    clip AS (
        SELECT media_id, CAST(NULL AS BIGINT) AS frame_no,
               count(*) AS n, CAST(sum(v) AS BIGINT) AS s,
               CAST(min(v) AS BIGINT) AS lo,
               CAST(max(v) AS BIGINT) AS hi
        FROM s GROUP BY media_id
    ),
    adj AS (
        SELECT a.media_id, a.i,
               CASE WHEN a.sg != b.sg THEN 1 ELSE 0 END AS chg
        FROM signed a JOIN signed b
          ON b.media_id = a.media_id AND b.i = a.i + 1
    ),
    frame AS (
        SELECT a.media_id, CAST(f.t AS BIGINT) AS frame_no,
               CAST(sum(a.chg) AS BIGINT) AS n,
               CAST(NULL AS BIGINT) AS s,
               CAST(NULL AS BIGINT) AS lo, CAST(NULL AS BIGINT) AS hi
        FROM generate_series(0, {n_frames - 1}) AS f(t)
        JOIN adj a
          ON a.i >= f.t * {HOP} AND a.i < f.t * {HOP} + {FRAME_LEN} - 1
        GROUP BY a.media_id, f.t
    ),
    fp AS (
        SELECT min(media_id) AS media_id, CAST(NULL AS BIGINT) AS frame_no,
               count(*) AS n,
               CAST({n_frames} AS BIGINT) AS s,
               CAST(NULL AS BIGINT) AS lo, CAST(NULL AS BIGINT) AS hi
        FROM (SELECT media_id, hex(payload) AS grp
              FROM read_parquet('{path}'))
        GROUP BY grp
    ),
    spec AS (
        SELECT c.media_id, CAST(v.frame_no AS BIGINT) AS frame_no,
               CAST(v.q AS BIGINT) AS n, CAST(v.feat AS BIGINT) AS s,
               CAST(NULL AS BIGINT) AS lo, CAST(NULL AS BIGINT) AS hi
        FROM (SELECT media_id % {N_CLASSES} AS cls,
                     min(media_id) AS media_id
              FROM read_parquet('{path}') GROUP BY 1) c
        JOIN (VALUES {spec_values}) AS v(cls, frame_no, feat, q)
          ON v.cls = c.cls
    )
    SELECT * FROM (
        SELECT 'clip' AS part, * FROM clip
        UNION ALL
        SELECT 'frame', * FROM frame
        UNION ALL
        SELECT 'fp', * FROM fp
        UNION ALL
        SELECT 'spec', * FROM spec
    )
    ORDER BY part, media_id, frame_no, s
    """


@register(
    "audio_features",
    oracle=_audio_oracle,  # callable: fixture path derives from sf_dir
    tags=("multimodal", "audio", "mapInPandas", "fingerprint"),
)
def audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio lane audit, one labeled union (scalar columns only):

    `clip`: decode audit via `clip_stats` — n = n_samples, s/lo/hi =
    exact int64 sum/min/max of the raw int16 samples.
    `frame`: framing + zero-crossing via `frame_features` — n = the
    integer sign-change count of frame `frame_no`, recovered exactly
    from zcr (zc = round(zcr · (FRAME_LEN−1))).
    `fp`: `audio_fingerprint` dedup groups — one row per fingerprint:
    media_id = the canonical (min) clip, n = clips in the group, s =
    their frame count.
    `spec` (r13): the FLOAT spectral features, integer-quantized —
    per canonical clip (min media_id of each tone class) and frame,
    n = round(feature × 1e6) for s = band 0..7 / rms (100) /
    centroid_hz (101), hashed against the numpy twin's frozen
    literals (`_spec_census`) — rfft/window/band drift is now
    driver-visible, not pytest-only."""
    media = spark.read.parquet(ensure_audio_corpus(sf_dir))
    null_l = F.lit(None).cast("long")
    clip = clip_stats(media).select(
        F.lit("clip").alias("part"),
        "media_id",
        null_l.alias("frame_no"),
        F.col("n_samples").alias("n"),
        F.col("sum_samples").alias("s"),
        F.col("min_sample").alias("lo"),
        F.col("max_sample").alias("hi"),
    )
    frame = frame_features(
        media, frame_len=FRAME_LEN, hop=HOP
    ).select(
        F.lit("frame").alias("part"),
        "media_id",
        F.col("frame_no").cast("long").alias("frame_no"),
        F.round(F.col("zcr") * (FRAME_LEN - 1)).cast("long").alias("n"),
        null_l.alias("s"),
        null_l.alias("lo"),
        null_l.alias("hi"),
    )
    fp = (
        audio_fingerprint(media, frame_len=FRAME_LEN, hop=HOP)
        .groupBy("fingerprint")
        .agg(
            F.min("media_id").alias("media_id"),
            F.count(F.lit(1)).alias("n"),
            F.max("n_frames").cast("long").alias("s"),
        )
        .select(
            F.lit("fp").alias("part"),
            "media_id",
            null_l.alias("frame_no"),
            "n",
            "s",
            null_l.alias("lo"),
            null_l.alias("hi"),
        )
    )
    canon = (
        media.groupBy((F.col("media_id") % N_CLASSES).alias("cls"))
        .agg(F.min("media_id").alias("media_id"))
        .select("media_id")
    )
    pairs: list[str] = []
    for b in range(N_BANDS):
        pairs += [
            f"CAST({b} AS BIGINT)",
            f"CAST(round(band_{b} * 1000000) AS BIGINT)",
        ]
    pairs += [
        f"CAST({_SPEC_RMS} AS BIGINT)",
        "CAST(round(rms * 1000000) AS BIGINT)",
        f"CAST({_SPEC_CENTROID} AS BIGINT)",
        "CAST(round(centroid_hz * 1000000) AS BIGINT)",
    ]
    spec = (
        frame_features(
            media.join(canon, "media_id"),
            frame_len=FRAME_LEN,
            hop=HOP,
        )
        .selectExpr(
            "media_id",
            "CAST(frame_no AS BIGINT) AS frame_no",
            f"stack({N_BANDS + 2}, {', '.join(pairs)}) AS (s, n)",
        )
        .select(
            F.lit("spec").alias("part"),
            "media_id",
            "frame_no",
            "n",
            "s",
            null_l.alias("lo"),
            null_l.alias("hi"),
        )
    )
    return (
        clip.unionByName(frame)
        .unionByName(fp)
        .unionByName(spec)
        .orderBy("part", "media_id", "frame_no", "s")
    )
