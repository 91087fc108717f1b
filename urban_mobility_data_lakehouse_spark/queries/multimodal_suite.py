"""Multimodal driver row (`multimodal_suite`): byte-level feature
extraction, a real image encode→decode roundtrip, AND the pHash
near-dup map — every part oracle-checked against DuckDB BLOB/hex/
float64 arithmetic.

Three parts behind one hash (the `part` column):

1. part='bytes' — `extract_byte_features` (multimodal/binaryops.py),
   Arrow-batched mapInPandas over opaque binary payloads (the
   `documents` text bytes standing in for media blobs; TESTDATA has no
   native media table), joined with `image_channel_sums` over the REAL
   PPM codec path (`documents_as_ppm` encode → header-parse +
   frombuffer decode).  The oracle recomputes the 16-bucket
   high-nibble byte histogram and the per-channel pixel sums from
   `hex(encode(text))` positionally — a one-byte header-offset bug in
   either codec half flips the hash.

2. part='hash' — the 63-bit pHash of every image in a PLANTED corpus
   (all docs + exact-copy twins + brightness twins via
   `documents_as_ppm(pixel_shift=8)`).  The oracle replays the ENTIRE
   pHash construction in SQL: cycled-byte pixels → integer BT.601
   luma → nearest-neighbor 32×32 upsample → orthonormal DCT-II as two
   LEFT-FOLD float64 stages (`list_reduce`, matching `_phash_one`'s
   np.cumsum order bit-for-bit — the fold order is part of the hash's
   definition, see phash.py) → strict-median bits → MSB-first packing.
   The 8×32 DCT basis constants are injected as float64 literals
   (printf %.17e round-trips exactly), so no engine's `cos` is
   trusted.

3. part='pair' — `phash_near_dups` over the planted corpus (banded
   Hamming join, radius 3).  The oracle brute-forces all pairs with
   `bit_count(xor(...))` — banding's pigeonhole recall guarantee says
   the banded result must equal the brute-force one, so this hash
   also proves the LSH banding loses nothing.  The exact twins land
   at Hamming 0, the brightness twins at small nonzero Hamming.

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
from ..multimodal.phash import (
    BLOCK,
    RESAMPLE,
    _dct_matrix,
    image_phash,
    phash_near_dups,
)
from ..sources.testdata import load_table
from . import register

# planted-twin knobs, shared by the Spark query and the SQL oracle
EXACT_MOD = 23      # doc_id % 23 == 0 → exact-copy twin
BRIGHT_MOD = 29     # doc_id % 29 == 0 → +8-brightness twin
PIXEL_SHIFT = 8
PIXEL_STRIDE = 7  # sparse: uniform brightness is pHash-invariant
MAX_HAMMING = 3

# floor for the derived twin offsets: keeps sf0.001/0.01/0.1 outputs
# bit-identical to the fixed 100_000/200_000 scheme of earlier rounds
_OFFSET_FLOOR = 100_000


def _twin_offsets(sf_dir: str) -> tuple[int, int]:
    """(EXACT_OFFSET, BRIGHT_OFFSET) derived from the parquet FOOTER's
    max doc_id (no Spark job): the next power of 10 strictly above it
    (floored at 100_000), doubled for the brightness twins.  Both the
    Spark builder and the generated oracle call this, so the row is
    sf-proof by construction — at sf10+ (doc_id ≥ 100 000) the offsets
    scale up in lockstep on both sides instead of colliding a twin
    with a stranger (the failure the old fixed-literal guard could
    only turn into a loud error)."""
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata
    max_id = max(
        meta.row_group(g).column(0).statistics.max
        for g in range(meta.num_row_groups)
    )
    base = _OFFSET_FLOOR
    while base <= max_id:
        base *= 10
    return base, 2 * base

_HEX_DIGITS = "0123456789ABCDEF"

_HIST_SQL = ",\n           ".join(
    "CAST(len(list_filter(generate_series(1, n_bytes), "
    f"i -> substr(hx, 2 * i - 1, 1) = '{d}')) AS BIGINT) AS hist_{k:02d}"
    for k, d in enumerate(_HEX_DIGITS)
)

_HIST_COLS = ", ".join(f"hist_{k:02d}" for k in range(16))
_NULL_HISTS = ", ".join(
    f"CAST(NULL AS BIGINT) AS hist_{k:02d}" for k in range(16)
)

# pixel i (0-based, row-major RGB) = text byte (i mod n_bytes); its
# value decoded from the hex dump: high nibble at 1-based hex position
# 2*j+1 for byte j, low nibble at 2*j+2
_PX_VAL = (
    "(strpos('0123456789ABCDEF',"
    " substr(m.hx, 2 * (t.i % greatest(m.n_bytes, 1)) + 1, 1)) - 1) * 16"
    " + (strpos('0123456789ABCDEF',"
    " substr(m.hx, 2 * (t.i % greatest(m.n_bytes, 1)) + 2, 1)) - 1)"
)


def _px_chan(c: int) -> str:
    """Pixel value of channel c at 8×8 position (I, J) for a corpus
    row (hx, n_bytes, shift) — cycled byte, then the clipped
    brightness shift `least(v + shift, 255)`."""
    pos = f"(3 * (8 * I + J) + {c})"
    byte_idx = f"({pos} % greatest(n_bytes, 1))"
    v = (
        f"((strpos('0123456789ABCDEF', substr(hx, 2 * {byte_idx} + 1, 1)) - 1) * 16"
        f" + (strpos('0123456789ABCDEF', substr(hx, 2 * {byte_idx} + 2, 1)) - 1))"
    )
    # the strided clipped brightness shift documents_as_ppm applies
    return (
        f"least({v} + CASE WHEN {pos} % {PIXEL_STRIDE} = 0 "
        f"THEN shift ELSE 0 END, 255)"
    )


def _phash_oracle_ctes(exact_offset: int, bright_offset: int) -> str:
    """The CTE chain replaying `_phash_one` over the planted corpus:
    corpus → luma (8×8 integer lists) → t1 (stage-1 left folds) →
    ph (stage-2 folds, strict-median bits, packed BIGINT + hex).
    Twin offsets are injected by the caller (footer-derived, the
    knn_ivf inject-the-constants pattern)."""
    mk = _dct_matrix(RESAMPLE)[:BLOCK]
    m_lit = "[" + ",".join(
        "[" + ",".join(f"{v:.17e}" for v in row) + "]" for row in mk
    ) + "]"
    return f"""
    mm AS (SELECT {m_lit} AS mk),
    corpus AS (
        SELECT doc_id AS media_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n_bytes, 0 AS shift
        FROM documents
        UNION ALL
        SELECT doc_id + {exact_offset}, hex(encode(text)),
               octet_length(encode(text)), 0
        FROM documents WHERE doc_id % {EXACT_MOD} = 0
        UNION ALL
        SELECT doc_id + {bright_offset}, hex(encode(text)),
               octet_length(encode(text)), {PIXEL_SHIFT}
        FROM documents WHERE doc_id % {BRIGHT_MOD} = 0
    ),
    lum AS (
        SELECT media_id,
          list_transform(generate_series(0, 7), I ->
            list_transform(generate_series(0, 7), J ->
              CAST((299 * {_px_chan(0)} + 587 * {_px_chan(1)}
                    + 114 * {_px_chan(2)}) // 1000 AS DOUBLE))) AS luma
        FROM corpus
    ),
    t1 AS (
        SELECT media_id, mk,
          list_transform(generate_series(1, {BLOCK}), k ->
            list_transform(generate_series(1, {RESAMPLE}), j ->
              list_reduce(
                list_transform(generate_series(1, {RESAMPLE}), i ->
                  mk[k][i] * luma[(i - 1) // 4 + 1][(j - 1) // 4 + 1]),
                (a, b) -> a + b))) AS t
        FROM lum, mm
    ),
    cf AS (
        SELECT media_id,
          flatten(list_transform(generate_series(1, {BLOCK}), k ->
            list_transform(generate_series(1, {BLOCK}), l ->
              list_reduce(
                list_transform(generate_series(1, {RESAMPLE}), j ->
                  t[k][j] * mk[l][j]),
                (a, b) -> a + b))))[2:] AS block
        FROM t1
    ),
    med AS (
        SELECT media_id, block, list_sort(block)[32] AS med FROM cf
    ),
    ph AS (
        SELECT media_id,
          list_reduce(list_transform(generate_series(1, 63), b ->
            CASE WHEN block[b] > med THEN 1::BIGINT ELSE 0::BIGINT END),
            (a, x) -> a * 2 + x) AS hval
        FROM med
    )"""


def _oracle(sf_dir: str) -> str:
    """Generated (sf-dependent) oracle: the twin offsets are derived
    from the SAME parquet footer the builder reads, then inlined as
    integer literals."""
    exact_offset, bright_offset = _twin_offsets(sf_dir)
    return f"""
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
    ),{_phash_oracle_ctes(exact_offset, bright_offset)}
    SELECT 'bytes' AS part, h.media_id, h.n_bytes, {_HIST_COLS},
           s.width, s.height, s.r_sum, s.g_sum, s.b_sum,
           CAST(NULL AS VARCHAR) AS phash,
           CAST(NULL AS BIGINT) AS media_a,
           CAST(NULL AS BIGINT) AS media_b,
           CAST(NULL AS BIGINT) AS hamming
    FROM hist h JOIN sums s USING (media_id)
    UNION ALL
    SELECT 'hash', media_id, NULL, {_NULL_HISTS},
           NULL, NULL, NULL, NULL, NULL,
           printf('%016x', hval), NULL, NULL, NULL
    FROM ph
    UNION ALL
    SELECT 'pair', NULL, NULL, {_NULL_HISTS},
           NULL, NULL, NULL, NULL, NULL, NULL,
           a.media_id, b.media_id,
           CAST(bit_count(xor(a.hval, b.hval)) AS BIGINT)
    FROM ph a JOIN ph b
      ON a.media_id < b.media_id
     AND bit_count(xor(a.hval, b.hval)) <= {MAX_HAMMING}
    ORDER BY part, media_id, media_a, media_b
    """


@register(
    "multimodal_suite",
    oracle=_oracle,
    tags=("multimodal", "binary", "mapInPandas", "codec", "neardup"),
)
def multimodal_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part='bytes': high-nibble byte histogram + payload size (Arrow
    feature extractor) joined with exact per-channel pixel sums from a
    real PPM encode→decode roundtrip.  part='hash': pHash of every
    image in the planted-twin corpus.  part='pair': the banded
    Hamming-≤3 near-dup map over that corpus (`phash_near_dups`) —
    oracle-checked against a brute-force SQL twin."""
    docs = load_table(spark, sf_dir, "documents")
    exact_offset, bright_offset = _twin_offsets(sf_dir)
    feats = extract_byte_features(documents_as_media(docs)).select(
        "media_id",
        "n_bytes",
        *[
            F.col("byte_hist")[k].alias(f"hist_{k:02d}")
            for k in range(16)
        ],
    )
    sums = image_channel_sums(documents_as_ppm(docs))
    bytes_part = (
        feats.join(sums, "media_id")
        .select(
            F.lit("bytes").alias("part"),
            F.col("media_id").cast("long"),
            F.col("n_bytes").cast("long"),
            *[F.col(f"hist_{k:02d}").cast("long") for k in range(16)],
            F.col("width").cast("long"),
            F.col("height").cast("long"),
            F.col("r_sum").cast("long"),
            F.col("g_sum").cast("long"),
            F.col("b_sum").cast("long"),
        )
    )

    corpus = (
        documents_as_ppm(docs)
        .unionByName(
            documents_as_ppm(
                docs.filter(F.col("doc_id") % EXACT_MOD == 0)
            ).withColumn(
                "media_id", F.col("media_id") + F.lit(exact_offset)
            )
        )
        .unionByName(
            documents_as_ppm(
                docs.filter(F.col("doc_id") % BRIGHT_MOD == 0),
                pixel_shift=PIXEL_SHIFT,
                pixel_stride=PIXEL_STRIDE,
            ).withColumn(
                "media_id", F.col("media_id") + F.lit(bright_offset)
            )
        )
    )
    # ONE decode+hash pass serves both the hash part and the pair part
    # (hashing decodes every image — the corpus pass worth sharing);
    # localCheckpoint blocks are ContextCleaner-freed, unlike a
    # CacheManager entry
    hashed = image_phash(corpus).localCheckpoint(eager=False)
    hash_part = hashed.select(
        F.lit("hash").alias("part"),
        F.col("media_id").cast("long"),
        F.col("phash"),
    )
    pair_part = phash_near_dups(
        hashed=hashed, max_hamming=MAX_HAMMING
    ).select(
        F.lit("pair").alias("part"),
        F.col("media_a").cast("long"),
        F.col("media_b").cast("long"),
        F.col("hamming").cast("long"),
    )

    def pad(df: DataFrame) -> DataFrame:
        cols = []
        for f in bytes_part.schema.fields:
            if f.name in df.columns:
                cols.append(F.col(f.name))
            else:
                cols.append(
                    F.lit(None).cast(f.dataType).alias(f.name)
                )
        for name, typ in (
            ("phash", "string"),
            ("media_a", "long"),
            ("media_b", "long"),
            ("hamming", "long"),
        ):
            cols.append(
                F.col(name)
                if name in df.columns
                else F.lit(None).cast(typ).alias(name)
            )
        return df.select(*cols)

    return (
        pad(bytes_part)
        .unionByName(pad(hash_part))
        .unionByName(pad(pair_part))
        .orderBy("part", "media_id", "media_a", "media_b")
    )
