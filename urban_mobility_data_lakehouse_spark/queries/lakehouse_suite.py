"""Driver row composing the lakehouse's column-mapping + DML read
surface: overwrite → RENAME COLUMN → UPDATE (merge-on-read) → DELETE
(merge-on-read, deletion vectors) → ADD COLUMN (NULL default) → read.

This is exactly the composition the randomized manifest tape
(`tests/test_manifest_properties.py`) walks — pinned here as a driver
hash row so the logical→physical column translation under RENAME, the
MoR update/delete application at read time, and the projected NULL
default are all value-checked against an INDEPENDENT recomputation:
the oracle never sees the warehouse files, it derives the expected
table straight from the `events` source with the same arithmetic
(UPDATE as a CASE, DELETE as a WHERE, the renamed column as an alias).
A wrong physical rename, an unapplied deletion vector, or an update
leaking into the wrong rows each move the hash.

The builder materializes a THROWAWAY warehouse per call (per-PID tmp
dir, rebuilt from scratch) — the ops are cheap at driver scale and a
fresh build is what makes the row deterministic under parallel test
shards and repeated runs.
"""

from __future__ import annotations

import hashlib
import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.lakehouse import Lakehouse
from ..sources.testdata import load_table
from . import register

_FIXTURE_ROOT = "/tmp/umdl_fixtures"


@register(
    "lakehouse_roundtrip",
    oracle="""
    SELECT event_id AS id,
           event_type AS p,
           CASE WHEN event_id % 7 = 3 THEN value * 2 + 1
                ELSE value END AS v2,
           CAST(NULL AS VARCHAR) AS flag
    FROM events
    WHERE event_id % 11 != 0
    ORDER BY id
    """,
    tags=("lakehouse", "column-mapping", "update", "mor", "dv"),
)
def lakehouse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events as a partitioned lakehouse table, then walk the
    column-mapping + DML surface and return the final read:

      1. overwrite_partitions: (id, p=event_type, v=value), hive on p
      2. rename_column v → v2 (logical rename; physical bytes keep v)
      3. update_where id%7==3: SET v2 = v2*2+1, merge_on_read
         (writers must speak the NEW logical name — the translation
         the fixed manifest tape now exercises)
      4. delete_where id%11==0, merge_on_read (deletion vectors)
      5. add_column flag string DEFAULT NULL (projected, no rewrite)
      6. read → (id, p, v2, flag) ordered by id
    """
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = os.path.join(
        _FIXTURE_ROOT, f"lakeround_{tag}_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    lake = Lakehouse(root)
    lake.create_schemas("silver")
    events = load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("id"),
        F.col("event_type").alias("p"),
        F.col("value").alias("v"),
    )
    lake.overwrite_partitions(events, "silver", "t", partition_col="p")
    lake.rename_column(spark, "silver", "t", "v", "v2")
    lake.update_where(
        spark, "silver", "t",
        F.col("id") % 7 == 3,
        {"v2": F.col("v2") * 2 + 1},
        partition_col="p", mode="merge_on_read",
    )
    lake.delete_where(
        spark, "silver", "t",
        F.col("id") % 11 == 0,
        partition_col="p", mode="merge_on_read",
    )
    lake.add_column(spark, "silver", "t", "flag", "string", default=None)
    return (
        lake.read(spark, "silver", "t")
        .select("id", "p", "v2", "flag")
        .orderBy("id")
    )
