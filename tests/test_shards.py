"""Training-shard export (text/shards.py): deterministic layout,
manifest/table consistency, partition-pruned shard reads."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.sources.lakehouse import Lakehouse
from urban_mobility_data_lakehouse_spark.sources.testdata import load_table
from urban_mobility_data_lakehouse_spark.text.shards import (
    export_shards,
    read_shard,
)


@pytest.fixture()
def lake(tmp_path):
    lk = Lakehouse(str(tmp_path / "lake"))
    lk.create_schemas("gold")
    return lk


def test_export_and_read_back(spark, sf_dir, lake):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = export_shards(
        spark, docs, lake, "gold", "shards", budget=512, n_shards=4
    )
    manifest = {s["shard"]: s for s in out["shards"]}
    assert set(manifest) == {0, 1, 2, 3}
    # table totals agree with the manifest
    table = lake.read(spark, "gold", "shards")
    assert table.count() == sum(s["n_docs"] for s in manifest.values())
    assert table.count() == docs.count()
    got = {
        int(r["shard"]): (r["n"], r["t"])
        for r in table.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("t"))
        .collect()
    }
    for shard, s in manifest.items():
        assert got[int(shard)] == (s["n_docs"], s["n_tokens"])
    # bin budget honored for multi-doc bins (oversize docs sit alone)
    per_bin = (
        table.groupBy("shard", "bin")
        .agg(F.sum("n_tokens").alias("fill"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    assert per_bin.filter(F.col("fill") > 512).count() == 0


def test_shard_read_is_partition_pruned_and_ordered(spark, sf_dir, lake):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    export_shards(spark, docs, lake, "gold", "shards", n_shards=4)
    one = read_shard(spark, lake, "gold", "shards", shard=2)
    rows = one.collect()
    assert rows and all(r["shard"] == 2 for r in rows)
    # (bin, pos) ordering is the training-consumption order
    seq = [(r["bin"], r["pos"]) for r in rows]
    assert seq == sorted(seq)
    # partition pruning: the shard filter lands in PartitionFilters
    # (directory-level), not as a post-scan row filter
    from urban_mobility_data_lakehouse_spark.plans.explain import (
        partition_filters,
    )

    parts = partition_filters(read_shard(spark, lake, "gold", "shards", 2))
    assert parts and any("shard" in p for p in parts), parts


def test_reexport_is_deterministic(spark, sf_dir, lake):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    export_shards(spark, docs, lake, "gold", "shards", n_shards=4)
    v0 = sorted(
        tuple(r)
        for r in lake.read(spark, "gold", "shards")
        .select("shard", "bin", "pos", "doc_id")
        .collect()
    )
    export_shards(spark, docs, lake, "gold", "shards", n_shards=4)
    v1 = sorted(
        tuple(r)
        for r in lake.read(spark, "gold", "shards")
        .select("shard", "bin", "pos", "doc_id")
        .collect()
    )
    assert v0 == v1
    # and the previous export is still reachable by time travel
    assert len(lake.snapshots("gold", "shards")) == 2
