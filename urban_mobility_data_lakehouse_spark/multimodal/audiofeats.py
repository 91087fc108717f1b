"""Audio feature extraction over decoded PCM WAV payloads — the
compute stage a multimodal training-data pipeline runs after decode
(reference surface: the reference stops at matplotlib PNG charts,
``mobility_ingestion_pipeline.py:776-799``; this is the beyond-reference
audio lane next to `binaryops.decode_audio`).

Everything here is row-local `mapInPandas` over Arrow batches: one
audio blob in → a bounded number of frame rows out (duration·rate/hop),
no shuffle anywhere, so 100 TB of audio shards parallelizes by file
exactly like the image decode lane.  The FFT is numpy's rfft — real
spectral features, not a stub; only compressed codecs (MP3 etc.) stay
out of scope with the stdlib-only constraint.

Features per frame (Hann-windowed, length `frame_len`, stride `hop`):
  - rms        — root-mean-square amplitude in normalized [-1, 1] units
  - zcr        — zero-crossing rate (sign changes / (frame_len-1));
                 ≈ 2·f/rate for a pure tone
  - centroid_hz — spectral centroid Σ f·|X| / Σ|X|
  - band_0..band_{B-1} — log-magnitude energy in B equal-width rfft
                 bands (scalar columns, driver-canonicalizer-safe)

`audio_fingerprint` packs the Haitsma–Kalker-style energy-delta bits
(band energy rising vs the previous frame) into a hex signature and
md5s it — the exact-dedup group key for audio, feeding the same
hash-groupBy dedup the text lane uses (`dedup/exact.py`).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .binaryops import decode_wav

__all__ = [
    "encode_wav",
    "pcm_to_float",
    "clip_stats",
    "frame_features",
    "audio_fingerprint",
    "frame_bits",
    "audio_near_dups",
]


def encode_wav(rate: int, samples) -> bytes:
    """Minimal 16-bit integer PCM RIFF/WAVE encoder (the test-fixture
    twin of `binaryops.decode_wav`, like `encode_ppm` for images).
    `samples`: int16 array (n, channels) or (n,)."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    n_ch = arr.shape[1]
    data = arr.tobytes()
    byte_rate = rate * n_ch * 2
    fmt = (
        (1).to_bytes(2, "little")          # PCM
        + n_ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (n_ch * 2).to_bytes(2, "little")  # block align
        + (16).to_bytes(2, "little")        # bits per sample
    )
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def pcm_to_float(samples):
    """Integer PCM → float64 mono in [-1, 1): 8-bit unsigned centers
    on 128; 16/32-bit divide by the signed max+1.  Multi-channel mixes
    down by the channel mean (the standard mono fold)."""
    import numpy as np

    if samples.dtype == np.uint8:
        x = (samples.astype("float64") - 128.0) / 128.0
    elif samples.dtype == np.int16:
        x = samples.astype("float64") / 32768.0
    else:
        x = samples.astype("float64") / 2147483648.0
    return x.mean(axis=1) if x.ndim == 2 else x


def clip_stats(media: DataFrame) -> DataFrame:
    """Integer decode audit per clip: (media_id, rate, n_samples, and
    the sum/min/max of the raw integer samples, mixed down by per-frame
    channel SUM so everything stays exact int64).  This is the
    oracle-checkable face of the decode path — a one-byte header-offset
    or endianness bug in `decode_wav` moves these integers, and a
    DuckDB twin can recompute them positionally from the BLOB's hex
    dump (no FFT needed).  Row-local mapInPandas, |clips|-sized output.
    """

    def _stats(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, samples = decode_wav(bytes(payload))
                mono = samples.astype("int64").sum(axis=1)
                out.append(
                    (
                        int(mid),
                        int(rate),
                        int(mono.shape[0]),
                        int(mono.sum()),
                        int(mono.min()) if len(mono) else 0,
                        int(mono.max()) if len(mono) else 0,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "rate", "n_samples",
                    "sum_samples", "min_sample", "max_sample",
                ],
            )

    return media.mapInPandas(
        _stats,
        schema=(
            "media_id long, rate long, n_samples long, "
            "sum_samples long, min_sample long, max_sample long"
        ),
    )


def _frames(x, frame_len: int, hop: int):
    """(n_frames, frame_len) view over mono float samples; zero frames
    for clips shorter than one window."""
    import numpy as np

    n = (len(x) - frame_len) // hop + 1 if len(x) >= frame_len else 0
    if n <= 0:
        return np.empty((0, frame_len))
    idx = np.arange(frame_len)[None, :] + hop * np.arange(n)[:, None]
    return x[idx]


def _frame_matrix(rate: int, x, frame_len: int, hop: int, n_bands: int):
    """Per-frame feature rows: (rms, zcr, centroid_hz, band energies).
    Pure numpy over one clip — the unit `mapInPandas` parallelizes."""
    import numpy as np

    fr = _frames(x, frame_len, hop)
    if fr.shape[0] == 0:
        return np.empty((0, 3 + n_bands))
    rms = np.sqrt((fr**2).mean(axis=1))
    signs = np.sign(fr)
    signs[signs == 0] = 1.0
    zcr = (np.diff(signs, axis=1) != 0).mean(axis=1)
    window = np.hanning(frame_len)
    mag = np.abs(np.fft.rfft(fr * window, axis=1))
    freqs = np.fft.rfftfreq(frame_len, d=1.0 / rate)
    tot = mag.sum(axis=1)
    centroid = np.where(tot > 0, (mag * freqs).sum(axis=1) / np.where(tot > 0, tot, 1.0), 0.0)
    # B equal-width bands over the rfft bins (DC bin included in band 0)
    bands = np.array_split(mag**2, n_bands, axis=1)
    energy = np.column_stack([np.log1p(b.sum(axis=1)) for b in bands])
    return np.column_stack([rms, zcr, centroid, energy])


def frame_features(
    media: DataFrame,
    frame_len: int = 256,
    hop: int = 128,
    n_bands: int = 8,
) -> DataFrame:
    """Explode (media_id, payload) WAV rows into per-frame spectral
    feature rows — the audio analog of `sample_video_frames`: fan-out
    is row-local, bounded by clip length / hop, and every feature is a
    scalar DOUBLE column (no arrays — the driver-canonicalizer rule).
    """

    def _feats(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        cols = ["media_id", "frame_no", "rms", "zcr", "centroid_hz"] + [
            f"band_{b}" for b in range(n_bands)
        ]
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, samples = decode_wav(bytes(payload))
                m = _frame_matrix(
                    rate, pcm_to_float(samples), frame_len, hop, n_bands
                )
                for t in range(m.shape[0]):
                    out.append((int(mid), t, *np.round(m[t], 8)))
            yield pd.DataFrame(out, columns=cols)

    schema = (
        "media_id long, frame_no int, rms double, zcr double, "
        "centroid_hz double, "
        + ", ".join(f"band_{b} double" for b in range(n_bands))
    )
    return media.mapInPandas(_feats, schema=schema)


def audio_fingerprint(
    media: DataFrame,
    frame_len: int = 256,
    hop: int = 128,
    n_bands: int = 8,
    max_frames: int = 64,
) -> DataFrame:
    """Deterministic per-clip fingerprint, two bit families packed per
    frame into `n_bands` bits and hex-joined:

      - an ANCHOR frame encoding frame 0's spectral SHAPE —
        bit(b) = E(0,b) > E(0,b+1) — so stationary signals (pure
        tones, steady hum) with different spectra still differ;
      - then bit(t, b) = 1 iff band b's energy ROSE from frame t-1 to
        t (Haitsma & Kalker 2002's robust-hash delta shape), over the
        first `max_frames` transitions.

    md5 of the packed string is the exact-dedup group key — audio
    dedup becomes the same hash-groupBy the text lane runs; `sig`
    keeps the raw bits for Hamming-style near-match experiments.

    Output stays |clips|-sized; compute is row-local (no shuffle)."""

    def _fp(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        width = (n_bands + 3) // 4

        def _pack(row) -> str:
            return format(
                int("".join("1" if v else "0" for v in row), 2),
                f"0{width}x",
            )

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, samples = decode_wav(bytes(payload))
                m = _frame_matrix(
                    rate, pcm_to_float(samples), frame_len, hop, n_bands
                )
                energy = m[:, 3:]
                if energy.shape[0] == 0:
                    sig = ""
                else:
                    anchor = np.append(
                        energy[0, :-1] > energy[0, 1:], False
                    )
                    deltas = (energy[1:] > energy[:-1])[:max_frames]
                    sig = _pack(anchor) + "".join(
                        _pack(row) for row in deltas
                    )
                out.append(
                    (
                        int(mid),
                        sig,
                        hashlib.md5(sig.encode()).hexdigest(),
                        int(m.shape[0]),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "sig", "fingerprint", "n_frames"],
            )

    return media.mapInPandas(
        _fp,
        schema=(
            "media_id long, sig string, fingerprint string, "
            "n_frames int"
        ),
    )


def frame_bits(
    media: DataFrame,
    frame_len: int = 256,
    hop: int = 128,
    n_bands: int = 8,
    max_frames: int = 64,
) -> DataFrame:
    """(media_id, frame_no, bits) — the per-frame energy-delta bit
    words of `audio_fingerprint`, one BIGINT per frame transition
    (frame_no 0 = the anchor word encoding frame 0's spectral shape).
    The exploded form is what sub-fingerprint SEARCH needs: Haitsma &
    Kalker match clips by looking up exact word hits, then verifying
    the bit-error rate over the aligned sequences — `audio_near_dups`
    below is exactly that, Spark-shaped."""

    def _bits(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, samples = decode_wav(bytes(payload))
                m = _frame_matrix(
                    rate, pcm_to_float(samples), frame_len, hop, n_bands
                )
                energy = m[:, 3:]
                if energy.shape[0] == 0:
                    continue
                anchor = np.append(
                    energy[0, :-1] > energy[0, 1:], False
                )
                words = [anchor] + list(
                    (energy[1:] > energy[:-1])[:max_frames]
                )
                for t, row in enumerate(words):
                    val = 0
                    for b in row:
                        val = (val << 1) | int(b)
                    out.append((int(mid), t, val))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_no", "bits"]
            )

    return media.mapInPandas(
        _bits, schema="media_id long, frame_no int, bits long"
    )


def audio_near_dups(
    media: DataFrame,
    max_ber: float = 0.15,
    frame_len: int = 256,
    hop: int = 128,
    n_bands: int = 8,
    max_frames: int = 64,
) -> DataFrame:
    """(media_a, media_b, n_frames, ber) for clip pairs whose
    fingerprints agree within a bit-error rate — the robust-hash
    near-match of Haitsma & Kalker 2002, Spark-shaped:

      1. candidates = pairs sharing at least one EXACT per-frame bit
         word at the same frame_no (their sub-fingerprint lookup as a
         (frame_no, bits) equi-join — a perturbed copy keeps most
         words intact, so some word collides; unrelated clips collide
         on a word only by chance and are killed by the verify);
      2. verify = both clips' word sequences zipped row-locally, BER =
         Σ popcount(xor) / (n_words · n_bands), kept when ≤ max_ber.

    No all-pairs product anywhere; the verify joins two |clips|-bounded
    array rows per CANDIDATE pair only.  Same-length clips only (the
    fixed-grid fingerprint; time-offset search would slide the window
    server-side, out of scope here)."""
    bits = frame_bits(
        media, frame_len=frame_len, hop=hop,
        n_bands=n_bands, max_frames=max_frames,
    ).localCheckpoint(eager=False)
    cand = (
        bits.select(
            F.col("media_id").alias("media_a"), "frame_no", "bits"
        )
        .join(
            bits.select(
                F.col("media_id").alias("media_b"), "frame_no", "bits"
            ),
            ["frame_no", "bits"],
        )
        .filter(F.col("media_a") < F.col("media_b"))
        .select("media_a", "media_b")
        .distinct()
    )
    seqs = bits.groupBy("media_id").agg(
        F.array_sort(
            F.collect_list(F.struct("frame_no", "bits"))
        ).alias("_sw")
    ).select(
        "media_id",
        F.transform(F.col("_sw"), lambda s: s["bits"]).alias("words"),
    )
    a = seqs.select(
        F.col("media_id").alias("media_a"), F.col("words").alias("wa")
    )
    b = seqs.select(
        F.col("media_id").alias("media_b"), F.col("words").alias("wb")
    )
    diff_bits = F.aggregate(
        F.zip_with(
            "wa", "wb",
            lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        cand.join(a, "media_a")
        .join(b, "media_b")
        .filter(F.size("wa") == F.size("wb"))  # fixed-grid contract
        .select(
            "media_a",
            "media_b",
            F.size("wa").alias("n_frames"),
            F.round(
                diff_bits / (F.size("wa") * F.lit(n_bands)), 4
            ).alias("ber"),
        )
        .filter(F.col("ber") <= max_ber)
        .orderBy("media_a", "media_b")
    )
