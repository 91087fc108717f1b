"""Multimodal driver row: byte-level feature extraction PLUS a real
image encode→decode roundtrip over binary payloads, oracle-checked
against DuckDB BLOB/hex arithmetic.

Two capabilities behind one hash:

1. `extract_byte_features` (multimodal/binaryops.py) — Arrow-batched
   mapInPandas over opaque binary payloads (the `documents` text bytes
   standing in for media blobs; TESTDATA has no native media table).
   The oracle recomputes the 16-bucket high-nibble byte histogram in
   pure SQL from `hex(encode(text))` — hex char at odd position k is
   the high nibble of byte (k+1)/2.

2. The REAL PPM codec path — `documents_as_ppm` encodes each doc's
   UTF-8 bytes (cycled to 8×8×3) as a binary P6 PPM, and
   `image_channel_sums` runs the real header-parse + frombuffer decode
   (`decode_ppm`) and emits exact integer per-channel pixel sums.  The
   oracle rebuilds the same pixel bytes positionally from the hex
   string, so a one-byte header-offset bug in either codec half flips
   the hash.

Driver-canonicalizer contract: every output column is a scalar —
the histogram is 16 BIGINT columns (`hist_00`…`hist_15`), never an
ArrayType (the driver's pandas sort crashes on array cells;
`tests/test_oracle_parity.py::test_registry_rows_scalar_only` locks
this repo-wide).  Entropy (a float whose summation order lives inside
numpy) stays out of the driver row and is covered by pytest.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..multimodal.binaryops import (
    documents_as_media,
    documents_as_ppm,
    extract_byte_features,
    image_channel_sums,
)
from ..sources.testdata import load_table
from . import register

_HEX_DIGITS = "0123456789ABCDEF"

_HIST_SQL = ",\n           ".join(
    "CAST(len(list_filter(generate_series(1, n_bytes), "
    f"i -> substr(hx, 2 * i - 1, 1) = '{d}')) AS BIGINT) AS hist_{k:02d}"
    for k, d in enumerate(_HEX_DIGITS)
)

_HIST_COLS = ", ".join(f"hist_{k:02d}" for k in range(16))

# pixel i (0-based, row-major RGB) = text byte (i mod n_bytes); its
# value decoded from the hex dump: high nibble at 1-based hex position
# 2*j+1 for byte j, low nibble at 2*j+2
_PX_VAL = (
    "(strpos('0123456789ABCDEF',"
    " substr(m.hx, 2 * (t.i % greatest(m.n_bytes, 1)) + 1, 1)) - 1) * 16"
    " + (strpos('0123456789ABCDEF',"
    " substr(m.hx, 2 * (t.i % greatest(m.n_bytes, 1)) + 2, 1)) - 1)"
)


@register(
    "media_byte_profile",
    oracle=f"""
    WITH m AS (
        SELECT doc_id AS media_id,
               hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    ),
    hist AS (
        SELECT media_id, CAST(n_bytes AS BIGINT) AS n_bytes,
           {_HIST_SQL}
        FROM m
    ),
    px AS (
        SELECT m.media_id, t.i, {_PX_VAL} AS v
        FROM m, generate_series(0, 191) AS t(i)
    ),
    sums AS (
        SELECT media_id,
               CAST(8 AS BIGINT) AS width,
               CAST(8 AS BIGINT) AS height,
               CAST(SUM(v) FILTER (WHERE i % 3 = 0) AS BIGINT) AS r_sum,
               CAST(SUM(v) FILTER (WHERE i % 3 = 1) AS BIGINT) AS g_sum,
               CAST(SUM(v) FILTER (WHERE i % 3 = 2) AS BIGINT) AS b_sum
        FROM px GROUP BY media_id
    )
    SELECT h.media_id, h.n_bytes, {_HIST_COLS},
           s.width, s.height, s.r_sum, s.g_sum, s.b_sum
    FROM hist h JOIN sums s USING (media_id)
    ORDER BY media_id
    """,
    tags=("multimodal", "binary", "mapInPandas", "codec"),
)
def media_byte_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-nibble byte histogram + payload size per media row (Arrow
    feature extractor) joined with exact per-channel pixel sums from a
    real PPM encode→decode roundtrip of the same bytes."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_byte_features(documents_as_media(docs)).select(
        "media_id",
        "n_bytes",
        *[
            F.col("byte_hist")[k].alias(f"hist_{k:02d}")
            for k in range(16)
        ],
    )
    sums = image_channel_sums(documents_as_ppm(docs))
    return feats.join(sums, "media_id").orderBy("media_id")
