"""Corpus-level boilerplate removal: strip lines repeated across docs.

The CCNet / RefinedWeb pass nobody skips: navigation chrome, cookie
banners, and footer text repeat across thousands of pages; per-doc
dedup can't see them.  The fix is corpus-frequency line filtering —
drop every line that appears in ≥ `min_docs` distinct documents.

Scale shape (two passes, one tiny broadcast):
  1. census: explode distinct lines per doc → count distinct docs per
     line hash (one shuffle, partial-aggregated map-side) → keep the
     hot ones.  Hot lines are boilerplate precisely because they are
     FEW and frequent — the hot set is broadcast-sized by
     construction (a line in ≥N docs can't number more than
     corpus_lines/N).
  2. strip: fold the hot-hash set into one sorted array, broadcast,
     and rebuild each document row-locally — `filter` over the line
     array with `array_contains` — so the 100 TB side never shuffles.

The line hash is the portable md5-31bit scheme, so the census is
DuckDB-replayable; stripping preserves original line order and
newline structure (`concat_ws` over the surviving lines).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..dedup.minhash import shingle_hash


def _lines(text: Column) -> Column:
    return F.split(text, "\n")


def hot_lines(
    docs: DataFrame, min_docs: int = 3, text_col: str = "text"
) -> DataFrame:
    """(line_hash, n_docs) for lines in ≥ `min_docs` distinct docs.

    Distinct per doc BEFORE counting (a doc repeating its own line
    doesn't make it boilerplate) — `array_distinct` row-local, then
    one count aggregate; nothing doc×line survives the pass.
    """
    return (
        docs.select(
            F.explode(
                F.array_distinct(
                    F.transform(_lines(F.col(text_col)), shingle_hash)
                )
            ).alias("line_hash")
        )
        .groupBy("line_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate(
    docs: DataFrame, min_docs: int = 3, text_col: str = "text"
) -> DataFrame:
    """docs with `text` rebuilt minus corpus-hot lines, plus
    `n_boilerplate_lines` (how many were removed).

    The hot set rides in as ONE broadcast array row; the strip itself
    is a row-local array filter — the corpus side of the plan has no
    shuffle (locked by test).
    """
    hot_row = F.broadcast(
        hot_lines(docs, min_docs, text_col).agg(
            F.array_sort(F.collect_list("line_hash")).alias("hot")
        )
    )
    lines = _lines(F.col(text_col))
    kept = F.filter(
        lines,
        lambda l: ~F.array_contains(F.col("hot"), shingle_hash(l)),
    )
    return (
        docs.join(hot_row)
        .withColumn(
            "n_boilerplate_lines",
            (F.size(lines) - F.size(kept)).cast("long"),
        )
        .withColumn(text_col, F.concat_ws("\n", kept))
        .drop("hot")
    )
