"""Multimodal driver row: byte-level feature extraction over binary
payloads, oracle-checked against DuckDB BLOB arithmetic.

The payloads are `documents_as_media` rows (UTF-8 text bytes behind an
opaque `binary` column — TESTDATA has no native media table), but the
operator under test is the real one a 100 TB media pipeline runs:
`extract_byte_features`' Arrow-batched mapInPandas over binary columns
(multimodal/binaryops.py).  The oracle recomputes the byte histogram
in pure SQL from `hex(encode(text))` — character k of the hex string
at odd positions is the high nibble of byte (k+1)/2 — so the driver
hash checks actual byte-level values, not just row counts.

Entropy (a float whose summation order lives inside numpy) is kept out
of the driver row and covered by pytest instead; the histogram and
byte counts are exact integers, which is what survives a value hash.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..multimodal.binaryops import documents_as_media, extract_byte_features
from ..sources.testdata import load_table
from . import register

_HEX_DIGITS = "0123456789ABCDEF"

_HIST_SQL = ", ".join(
    "CAST(len(list_filter(generate_series(1, n_bytes), "
    f"i -> substr(hx, 2 * i - 1, 1) = '{d}')) AS BIGINT)"
    for d in _HEX_DIGITS
)


@register(
    "media_byte_profile",
    oracle=f"""
    WITH m AS (
        SELECT doc_id AS media_id,
               'text/plain' AS kind,
               hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    )
    SELECT media_id, kind, CAST(n_bytes AS BIGINT) AS n_bytes,
           [{_HIST_SQL}] AS byte_hist
    FROM m
    ORDER BY media_id
    """,
    tags=("multimodal", "binary", "mapInPandas"),
)
def media_byte_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-nibble byte histogram + payload size per media row, via the
    distributed Arrow-batched binary feature extractor."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return (
        extract_byte_features(media)
        .select("media_id", "kind", "n_bytes", "byte_hist")
        .orderBy("media_id")
    )
