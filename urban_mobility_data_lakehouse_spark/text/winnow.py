"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
SIGMOD 2003) — rolling-hash fingerprinting as pure Column expressions.

Per document:
  1. word hash: portable md5-60bit per token, reduced mod P=2^31-1
     (the same engine-portable base hash as dedup/minhash).
  2. rolling k-gram hash: the degree-(k-1) polynomial
     h_i = (w_i·B^(k-1) + … + w_{i+k-1}) mod P — the Karp-Rabin form
     (slideable as h_{i+1} = (h_i − w_i·B^(k-1))·B + w_{i+k}), computed
     directly per position inside one transform(); every multiply is
     interleaved with mod P so the arithmetic stays in exact int64 on
     both Spark and DuckDB.
  3. winnow: over every window of `w` consecutive gram hashes keep the
     minimum, rightmost on ties; the distinct selected (pos, hash) set
     is the fingerprint.  Tie-break is encoded arithmetically —
     enc = h·2^20 + (2^20−1−pos) — so window selection is a plain
     array_min over a slice and min(enc) IS (min hash, rightmost pos).

Guarantees (the reason winnowing beats "every k-gram" or "random
sample"): at least one fingerprint per window (no gap longer than w
grams), and any shared substring of ≥ w+k−1 tokens produces at least
one shared fingerprint — the property plagiarism/near-dup detectors
rely on.

Scale: everything up to the final explode is row-local codegen over
arrays (no shuffle); the output is ≈ 2/(w+1) of the gram count per
doc.  Positions are capped at 2^20−1 grams/doc by the encoding — far
past any real document; longer inputs should be chunked upstream.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

P = 2_147_483_647  # Mersenne prime 2^31 - 1 (shared with dedup/minhash)
B = 1_000_003  # polynomial base, < 2^20 so x·B < 2^51 stays exact
K = 3  # words per gram
W = 4  # grams per winnowing window

_POS_BITS = 20
_POS_MASK = (1 << _POS_BITS) - 1


def word_hash(col: Column) -> Column:
    """Portable 31-bit word hash: md5-60bit mod 2^31-1."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
        % F.lit(P)
    )


def _gram_hash(wh: Column, i, k: int) -> Column:
    """Polynomial k-gram hash at 1-based position i over the word-hash
    array, Horner form with mod after every multiply."""
    h = F.element_at(wh, i)
    for j in range(1, k):
        h = (h * F.lit(B) % F.lit(P) + F.element_at(wh, i + j)) % F.lit(P)
    return h


def winnow_fingerprints(
    documents: DataFrame, k: int = K, w: int = W
) -> DataFrame:
    """(doc_id, pos, fp) — winnowed rolling-hash fingerprints.

    `pos` is the 0-based gram position the fingerprint was selected at;
    documents shorter than k words fingerprint the whole text at pos 0.
    """
    toks = documents.select(
        "doc_id", "text", F.split("text", " ").alias("toks")
    )
    wh = F.transform(F.col("toks"), word_hash)
    n_grams = F.size(F.col("toks")) - (k - 1)

    grams = F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
            lambda i: _gram_hash(F.col("wh"), i, k),
        ),
    ).otherwise(F.array(word_hash(F.col("text"))))

    # enc = hash·2^20 + (2^20−1−pos): array_min picks min hash, and on
    # hash ties the larger pos (smaller complement) — winnowing's
    # rightmost-min rule
    enc = F.transform(
        F.col("grams"),
        lambda g, idx: F.shiftleft(g, _POS_BITS)
        + (F.lit(_POS_MASK) - idx.cast("long")),
    )
    n = F.size(F.col("enc"))
    selected = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - (w - 1), F.lit(1))),
            lambda i: F.array_min(F.slice(F.col("enc"), i, w)),
        )
    )
    return (
        toks.withColumn("wh", wh)
        .withColumn("grams", grams)
        .withColumn("enc", enc)
        .select("doc_id", F.explode(selected).alias("e"))
        .select(
            "doc_id",
            (F.lit(_POS_MASK) - F.col("e") % F.lit(_POS_MASK + 1)).alias(
                "pos"
            ),
            F.shiftright("e", _POS_BITS).alias("fp"),
        )
    )
