"""Sliding-window document chunking — the embedding-pipeline splitter.

Long documents don't fit embedding-model context windows; every
retrieval / semantic-dedup pipeline first splits them into
`max_tokens` chunks with `overlap` tokens of shared context between
neighbors (the LangChain/LlamaIndex "recursive splitter" contract,
reduced to its deterministic token-window core).

Scale shape: pure row-local Column algebra — the chunk count and each
chunk's token slice are computed from the doc's own token array
(`sequence` → `explode` → `slice`), so the pass pipelines into the
scan with no shuffle, no UDF, and fans out rows by ~n_tokens/stride
exactly like the shingle explode the dedup stack already runs.

Invariants (locked by tests): every token lands in ≥1 chunk; interior
neighbors share exactly `overlap` tokens; chunks except possibly the
last are exactly `max_tokens` long; stitching chunks back with the
overlap dropped reproduces the original token stream bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, chunk_no, chunk_text, n_chunk_tokens) — one row per chunk.

    Chunk i covers tokens [i·stride, i·stride + max_tokens) with
    stride = max_tokens − overlap; the last chunk starts at the final
    stride boundary below n_tokens (so a doc ≤ max_tokens is exactly
    one chunk, and no degenerate all-overlap tail chunk is emitted).
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # ceil((n - overlap) / stride), min 1 — number of stride windows
    # needed so the last window reaches the end
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int")
    )
    out = (
        docs.withColumn("__toks", toks)
        .withColumn(
            "chunk_no",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)),
        )
        .withColumn(
            "__chunk",
            F.slice(
                F.col("__toks"),
                F.col("chunk_no") * stride + 1,
                F.lit(max_tokens),
            ),
        )
        .select(
            id_col,
            F.col("chunk_no").cast("long").alias("chunk_no"),
            F.concat_ws(" ", F.col("__chunk")).alias("chunk_text"),
            F.size("__chunk").cast("long").alias("n_chunk_tokens"),
        )
    )
    return out


def stitch_chunks(
    chunks: DataFrame,
    overlap: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Inverse of `chunk_documents`: drop each non-first chunk's
    leading `overlap` tokens and re-join in chunk order — returns
    (id, text).  One groupBy(id) shuffle; the reassembly itself is a
    row-local fold over the collected chunk structs."""
    per_doc = (
        chunks.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("chunk_no", "chunk_text"))
            ).alias("cs")
        )
    )
    rebuilt = F.concat_ws(
        " ",
        F.flatten(
            F.transform(
                F.col("cs"),
                lambda c, i: F.when(
                    i == 0, F.split(c["chunk_text"], " ")
                ).otherwise(
                    # drop the leading overlap; length = whatever
                    # remains (an oversized literal length overflows
                    # slice's int32 arithmetic and yields [])
                    F.slice(
                        F.split(c["chunk_text"], " "),
                        overlap + 1,
                        F.greatest(
                            F.lit(0),
                            F.size(F.split(c["chunk_text"], " "))
                            - F.lit(overlap),
                        ),
                    )
                ),
            )
        ),
    )
    return per_doc.select(id_col, rebuilt.alias("text"))
