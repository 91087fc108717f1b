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


def _spark_components(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = connected_components(df)
    return {r["node"]: r["component"] for r in out.collect()}


def test_matches_union_find_on_random_graph(spark):
    rng = random.Random(42)
    edges = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _spark_components(spark, edges) == _uf_components(edges)


def test_long_chain_converges_via_pointer_jumping(spark):
    # a 300-node path: diameter 299 ≫ 25 rounds — only pointer
    # jumping's exponential compression can converge in time
    edges = [(i, i + 1) for i in range(300)]
    got = _spark_components(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 301


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


def test_unconverged_raises(spark):
    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(df, max_iter=2)
