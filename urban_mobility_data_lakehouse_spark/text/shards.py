"""Training-shard export: packed sequences → versioned shard table.

The last mile of the curation pipeline: after `packing.pack_sequences`
assigns every document to a (shard, bin), training jobs want the TEXT
laid out shard-by-shard, in bin order, with a manifest saying exactly
what each shard holds.  This writes both as ordinary lakehouse commits:

  * `<schema>.<name>`       — one row per packed document (shard, bin,
    position-in-bin, doc_id, n_tokens, text), stored PARTITIONED BY
    shard so a data-loader rank reads exactly its shard's directory —
    a partition-pruned scan, no row-level filtering of other shards.
  * `<schema>.<name>_manifest` — one row per shard (bins, docs,
    tokens, fill ratio), the unit a training launcher schedules by.

Writing through the lakehouse (not bare parquet) buys the usual
contract: atomic visibility, versioned re-exports with time travel
(reproduce the exact shard set a run trained on), CDC between exports,
and idempotent re-runs.  Determinism end-to-end: shard/bin/position
are all derived from content hashes and stable sort keys, so two
exports of the same corpus are row-identical.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.lakehouse import Lakehouse
from .packing import bin_stats, pack_sequences


def export_shards(
    spark: SparkSession,
    documents: DataFrame,
    lake: Lakehouse,
    schema: str,
    name: str,
    budget: int = 2048,
    n_shards: int = 8,
) -> dict:
    """Pack `documents` (doc_id, text) and commit the shard table and
    its manifest atomically (one multi-table transaction).  Returns
    the manifest as a dict list for the caller's logs."""
    # localCheckpoint: the pack plan (a full-corpus groupBy +
    # applyInPandas pass) is consumed by the rows write, the manifest
    # build, AND the manifest collect below — without it each
    # consumer re-executes the whole pack (ContextCleaner frees the
    # blocks once the frames are GC'd, unlike a CacheManager entry)
    packed = pack_sequences(
        documents, budget=budget, n_shards=n_shards
    ).localCheckpoint(eager=False)
    pos = Window.partitionBy("shard", "bin").orderBy("doc_id")
    rows = (
        packed.join(documents.select("doc_id", "text"), "doc_id")
        .withColumn("pos", F.row_number().over(pos))
        .select("shard", "bin", "pos", "doc_id", "n_tokens", "text")
    )
    manifest = (
        bin_stats(packed, budget=budget)
        .join(
            packed.groupBy("shard").agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").alias("n_tokens"),
            ),
            "shard",
        )
        .select("shard", "n_bins", "n_docs", "n_tokens",
                "avg_fill", "waste_frac")
    )
    with lake.transaction() as txn:
        txn.overwrite_partitions(rows, schema, name, partition_col="shard")
        txn.overwrite(manifest, schema, f"{name}_manifest")
    return {
        "shards": [r.asDict() for r in manifest.orderBy("shard").collect()]
    }


def read_shard(
    spark: SparkSession,
    lake: Lakehouse,
    schema: str,
    name: str,
    shard: int,
) -> DataFrame:
    """One training rank's input: its shard, in (bin, pos) order —
    served by partition pruning, never by scanning other shards."""
    return (
        lake.read(spark, schema, name)
        .filter(F.col("shard").cast("string") == str(shard))
        # partition values come back as strings (inference is disabled
        # engine-wide for the bronze contract); restore the int type
        .withColumn("shard", F.col("shard").cast("int"))
        .orderBy("bin", "pos")
    )
