"""Runtime re-optimization evidence: AQE skew-join splitting and
runtime bloom-filter join pruning.

These are the two knobs that save a 100 TB join the static planner
can't: AQE splits a hot join partition into advisory-sized slices
AFTER seeing real shuffle sizes, and the runtime bloom filter built
from a selective dim side prunes fact rows at the scan before they
pay the shuffle.  Local data is small, so the tests lower the
trigger thresholds — the point is locking in that OUR session
configuration lets both optimizations fire and that results are
unchanged when they do.
"""

from __future__ import annotations

from contextlib import contextmanager

import pyspark.sql.functions as F


@contextmanager
def _confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        try:
            old[key] = spark.conf.get(key)
        except Exception:
            old[key] = None
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def _skewed_frames(spark):
    # 90% of left rows share key 0 → one hot shuffle partition
    left = spark.range(0, 300000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise(F.col("id"))
        .alias("k"),
        F.lit(1.0).alias("v"),
    )
    right = spark.range(0, 50000).select(
        (F.col("id") % 1000).alias("k"), F.lit(1.0).alias("w")
    )
    return left, right


def test_aqe_splits_skewed_join_partition(spark):
    """The hot partition is split (SortMergeJoin(skew=true)) and the
    join result is exactly what an unsplit join produces.

    Note the downstream matters: a groupBy on the JOIN KEY would
    suppress the split (splitting breaks the hash distribution the
    aggregation needs, and AQE won't add a shuffle to fix it unless
    forceOptimizeSkewedJoin) — so the assertion uses a global
    aggregate, the shape where splitting is free."""
    left, right = _skewed_frames(spark)
    with _confs(
        spark,
        spark__sql__autoBroadcastJoinThreshold="-1",
        spark__sql__adaptive__skewJoin__skewedPartitionThresholdInBytes="64KB",
        spark__sql__adaptive__advisoryPartitionSizeInBytes="32KB",
        spark__sql__adaptive__skewJoin__skewedPartitionFactor="2",
    ):
        agg = left.join(right, "k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        )
        row = agg.collect()[0]
        plan = agg._jdf.queryExecution().executedPlan().toString()
    # hot key 0: 270_000 left × 50 right; keys 9,19,…,999: 100 × 50
    expect = 270_000 * 50 + 100 * 50
    assert row["n"] == expect
    assert row["sv"] == float(expect)
    assert "skew=true" in plan, plan[:500]


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """A selective dim side injects a bloom filter on the fact side of
    a shuffle join (might_contain in the optimized plan); results are
    identical with the filter disabled."""
    fact = spark.range(0, 200000).select(
        F.col("id"), (F.col("id") % 1000).alias("k")
    )
    dim = (
        spark.range(0, 1000)
        .select(F.col("id").alias("k"))
        .filter(F.col("k") % 97 == 0)  # 11 of 1000 keys survive
    )
    common = dict(
        spark__sql__autoBroadcastJoinThreshold="-1",
        spark__sql__optimizer__runtime__bloomFilter__applicationSideScanSizeThreshold="0",
        spark__sql__optimizer__runtime__bloomFilter__creationSideThreshold="100MB",
    )
    with _confs(
        spark,
        spark__sql__optimizer__runtime__bloomFilter__enabled="true",
        **common,
    ):
        j = fact.join(dim, "k")
        optimized = j._jdf.queryExecution().optimizedPlan().toString()
        with_bloom = sorted(r["id"] for r in j.collect())
    assert "bloom" in optimized.lower(), optimized[:800]
    with _confs(
        spark,
        spark__sql__optimizer__runtime__bloomFilter__enabled="false",
        **common,
    ):
        without = sorted(
            r["id"] for r in fact.join(dim, "k").collect()
        )
    assert with_bloom == without
    assert len(with_bloom) == 200000 * 11 // 1000
