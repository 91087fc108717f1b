"""Exact deduplication: hash-groupBy on a normalized-content fingerprint.

Scale: the canonical 100 TB dedup pattern — one scan computing a 128-bit
fingerprint per row, one shuffle on the fingerprint (uniformly
distributed, so no skew), min() as the deterministic survivor rule.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..text.analysis import fingerprint


def duplicate_groups(documents: DataFrame) -> DataFrame:
    """All content groups with their copy count and canonical (min) id."""
    return (
        documents.select(
            "doc_id", fingerprint(F.col("text")).alias("fingerprint")
        )
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .orderBy("fingerprint")
    )


def deduplicate(documents: DataFrame) -> DataFrame:
    """Keep exactly the canonical (min doc_id) row per fingerprint."""
    fp = documents.withColumn("fingerprint", fingerprint(F.col("text")))
    canon = fp.groupBy("fingerprint").agg(
        F.min("doc_id").alias("canonical_doc_id")
    )
    return (
        fp.join(
            canon,
            (fp["fingerprint"] == canon["fingerprint"])
            & (fp["doc_id"] == canon["canonical_doc_id"]),
        )
        .select(documents["*"])
    )
