"""Repeated-substring span detection and removal (ExactSubstr dedup).

Lee et al., "Deduplicating Training Data Makes Language Models Better"
(ACL 2022) showed that removing long VERBATIM substrings repeated
across a corpus beats whole-document dedup: boilerplate, licenses,
quoted passages and templated spans survive document-level MinHash
because the surrounding text differs.  The reference implementation
builds a corpus-wide suffix array — a fundamentally single-machine
construction.  This module re-derives the operator Spark-first:

  1. *Gram pass*: every overlapping L-token gram gets a Karp-Rabin
     polynomial hash (`winnow.word_hash` + Horner over the word-hash
     array — row-local Column algebra, the same portable arithmetic
     the winnowing fingerprints use).
  2. *Repeat set*: gram hashes appearing in ≥2 documents (or ≥2
     distinct positions corpus-wide) — one map-side-combined count.
     Like the boilerplate census, the repeat set is bounded by
     corpus_grams / 2 but in practice tiny relative to the corpus.
  3. *Span merge*: matched gram START POSITIONS within a doc merge
     into maximal spans with a gaps-and-islands window (positions p
     and p' chain when p' − p ≤ L, i.e. their grams overlap or touch)
     — one per-doc window, the sessionize shape.
  4. *Removal*: `remove_spans` rebuilds each document row-locally by
     slicing the token array around its spans (an array fold over the
     span list — no shuffle beyond the spans join).

A truly suffix-array-exact match list would also catch repeats
SHORTER than L; the gram formulation catches every repeat of length
≥ L tokens exactly (each such repeat contains a shared L-gram at its
start position), which is the knob the paper actually tunes (their
default: 50 BPE tokens).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .winnow import B, P, word_hash

#: minimum repeated run length, in tokens (Lee et al. use 50 BPE
#: tokens; the synthetic fixture corpus repeats much shorter spans)
MIN_TOKENS = 8


def _gram_hashes(toks: DataFrame, l_tokens: int):
    """(doc_id, pos, gh): Karp-Rabin hash of the L-gram starting at
    each 1-based position.  Horner with mod-after-multiply — exact
    int64, engine-portable."""

    def gram(wh, i):
        h = F.element_at(wh, i)
        for j in range(1, l_tokens):
            h = (h * F.lit(B) % F.lit(P) + F.element_at(wh, i + j)) % F.lit(P)
        return h

    # BIND wh as a real column before the HOF references it: Catalyst
    # does no common-subexpression elimination inside higher-order-
    # function lambdas, so an inline transform would recompute the
    # full per-doc md5 array for EVERY element_at — O(n·L) full-array
    # evaluations per document on the corpus-wide ExactSubstr hot path
    # (the minhash.shingles contract)
    toks = toks.withColumn(
        "wh", F.transform(F.col("toks"), word_hash)
    )
    wh = F.col("wh")
    n = F.size("toks")
    # docs shorter than L have no L-grams: emit NOTHING for them.  The
    # guard must be a `when`, not greatest(.., 0): Spark's sequence(1, 0)
    # is a DESCENDING [1, 0], so the unguarded form emitted two bogus
    # positions per short doc and gram() then indexed past the token
    # array (ANSI ArrayIndexOutOfBounds — hit by the sf0.1 curation
    # lane with exact_substr_min_tokens above the shortest doc).
    return toks.select(
        "doc_id",
        F.explode(
            F.when(
                n >= F.lit(l_tokens),
                F.transform(
                    F.sequence(F.lit(1), n - (l_tokens - 1)),
                    lambda i: F.struct(
                        i.alias("pos"), gram(wh, i).alias("gh")
                    ),
                ),
            ).otherwise(
                F.array().cast("array<struct<pos:int,gh:bigint>>")
            )
        ).alias("g"),
    ).select("doc_id", F.col("g.pos").alias("pos"), F.col("g.gh").alias("gh"))


def repeated_spans(
    documents: DataFrame, l_tokens: int = MIN_TOKENS
) -> DataFrame:
    """Maximal repeated spans: (doc_id, start_pos, end_pos) in 1-based
    token positions, end inclusive — every maximal run of tokens that
    appears verbatim (as ≥ L-token grams) in ≥2 documents."""
    toks = documents.select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    grams = _gram_hashes(toks, l_tokens)
    repeats = (
        grams.groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gh")
    )
    hits = grams.join(repeats, "gh").select("doc_id", "pos")
    # gaps-and-islands: positions ≤ L apart chain into one span
    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = (
        hits.withColumn("prev", F.lag("pos").over(w))
        .withColumn(
            "new_island",
            (
                F.col("prev").isNull()
                | (F.col("pos") - F.col("prev") > l_tokens)
            ).cast("long"),
        )
        .withColumn("island", F.sum("new_island").over(w))
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("start_pos"),
            (F.max("pos") + l_tokens - 1).alias("end_pos"),
        )
        .select("doc_id", "start_pos", "end_pos")
        .orderBy("doc_id", "start_pos")
    )


def remove_spans(
    documents: DataFrame, spans: DataFrame
) -> DataFrame:
    """Rebuild documents with their repeated spans cut out (token
    granularity).  Docs without spans pass through untouched; the only
    shuffle is the spans aggregation+join (spans are tiny next to the
    corpus), and the rebuild is a row-local filter over token
    positions."""
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("start_pos", "end_pos")).alias("cuts")
    )
    # bound column, not an inline split: element_at inside the HOF
    # would re-tokenize the document per position otherwise (the same
    # no-CSE-in-lambdas rule _gram_hashes follows)
    toks = F.col("_toks")
    keep = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.size(toks)),
            lambda i: F.struct(
                i.alias("i"), F.element_at(toks, i).alias("t")
            ),
        ),
        lambda s: ~F.exists(
            F.col("cuts"),
            lambda c: (s["i"] >= c["start_pos"])
            & (s["i"] <= c["end_pos"]),
        ),
    )
    cleaned = F.array_join(
        F.transform(keep, lambda s: s["t"]), " "
    )
    return (
        documents.join(per_doc, "doc_id", "left")
        .withColumn("_toks", F.split("text", " "))
        .withColumn(
            "text",
            F.when(F.col("cuts").isNull(), F.col("text")).otherwise(
                cleaned
            ),
        )
        .drop("cuts", "_toks")
    )
