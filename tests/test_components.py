"""Connected components (dedup/components.py) — correctness vs a
union-find reference, worst-case chains, determinism."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.dedup.components import (
    connected_components,
    duplicate_clusters,
)


def _uf_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # canonical representative = min id in component
    comp: dict[int, int] = {}
    for n in parent:
        comp[n] = find(n)
    return comp


def _spark_components(spark, edges, driver_threshold=100_000):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = connected_components(df, driver_threshold=driver_threshold)
    return {r["node"]: r["component"] for r in out.collect()}


# 0 forces the distributed loop; the default exercises the
# driver-side union-find fast path — both must agree with the oracle
@pytest.mark.heavy  # random-graph sweep; cross-path bit-parity and
# directed topologies stay in the default lane below
@pytest.mark.parametrize("thresh", [100_000, 0])
def test_matches_union_find_on_random_graph(spark, thresh):
    rng = random.Random(42)
    edges = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _spark_components(spark, edges, thresh) == _uf_components(edges)


def test_long_chain_converges_via_pointer_jumping(spark):
    # a 300-node path: diameter 299 ≫ 25 rounds — only pointer
    # jumping's exponential compression can converge in time
    # (driver_threshold=0 forces the distributed loop)
    edges = [(i, i + 1) for i in range(300)]
    got = _spark_components(spark, edges, driver_threshold=0)
    assert set(got.values()) == {0}
    assert len(got) == 301


def test_driver_and_distributed_paths_bit_identical(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    assert _spark_components(spark, edges, 100_000) == _spark_components(
        spark, edges, 0
    )


def test_duplicate_heavy_list_takes_second_gate(spark):
    """A raw edge list far over the threshold whose UNIQUE edges fit
    the driver: the second gate (bounded collect over the distinct
    undirected frame the loop needs anyway) must route it to driver
    union-find — the final plan has no Join — and the output matches
    both the oracle and the forced distributed loop."""
    from urban_mobility_data_lakehouse_spark.dedup.components import (
        connected_components,
    )

    unique = [(0, 1), (1, 2), (5, 6), (8, 9), (9, 5)]
    edges = unique * 40  # 200 raw >> threshold 10; 5 unique << 2*10
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = connected_components(df, driver_threshold=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    got = {r["node"]: r["component"] for r in out.collect()}
    assert got == _uf_components(edges)
    assert got == _spark_components(spark, edges, 0)


def test_disjoint_cliques_and_pair(spark):
    clique1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    clique2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = clique1 + clique2 + [(100, 200)]
    got = _spark_components(spark, edges)
    assert {got[n] for n in range(5)} == {0}
    assert {got[n] for n in range(10, 14)} == {10}
    assert got[100] == got[200] == 100


def test_deterministic_across_runs_and_partitioning(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    a = _spark_components(spark, edges)
    df = spark.createDataFrame(edges, "doc_a long, doc_b long").repartition(17)
    b = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert a == b


def test_empty_edges(spark):
    df = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(df).count() == 0


def test_duplicate_clusters_column_names(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    out = duplicate_clusters(df)
    assert out.columns == ["doc_id", "cluster_id"]
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_dedup_corpus_keeps_one_per_cluster(spark, sf_dir):
    """End-to-end keep-one filter on a corpus with planted duplicates:
    the doubled corpus (id-shifted copy) collapses back to one survivor
    per duplicate family, and every survivor is its cluster minimum."""
    from urban_mobility_data_lakehouse_spark.dedup.components import (
        dedup_corpus,
        duplicate_clusters,
    )
    from urban_mobility_data_lakehouse_spark.dedup import minhash
    from urban_mobility_data_lakehouse_spark.sources.testdata import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    )
    kept = dedup_corpus(doubled)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    originals = {r["doc_id"] for r in docs.select("doc_id").collect()}
    # every planted copy (id+1e6) shares a cluster with its original
    # and is strictly larger than every original in that cluster, so
    # no copy ever survives keep-smallest dedup.  (Some ORIGINALS drop
    # too — the corpus has its own near-dup families; that's the point.)
    assert not (kept_ids & {i + 1_000_000 for i in originals})
    assert kept_ids <= originals
    assert kept_ids  # something survives
    # survivors are exactly (corpus − cluster non-minima)
    pairs = minhash.near_duplicates(doubled.select("doc_id", "text"))
    clusters = duplicate_clusters(pairs)
    losers = {
        r["doc_id"]
        for r in clusters.filter(
            F.col("doc_id") != F.col("cluster_id")
        ).collect()
    }
    all_ids = originals | {i + 1_000_000 for i in originals}
    assert kept_ids == all_ids - losers


def test_unconverged_raises(spark):
    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(df, max_iter=2, driver_threshold=0)
