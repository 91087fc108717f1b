"""IVFADC (`PersistentIVFPQ`): the IVF×PQ composition — compressed
index storage, partition-pruned probes, frozen-quantizer adds, exact
re-rank parity and recall."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.similarity import pq
from urban_mobility_data_lakehouse_spark.similarity.persistent_ivf import (
    PersistentIVFPQ,
)
from urban_mobility_data_lakehouse_spark.sources.lakehouse import Lakehouse
from urban_mobility_data_lakehouse_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )


def _mk_index(tmp_path, **kw) -> PersistentIVFPQ:
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("gold")
    return PersistentIVFPQ(lake, **kw)


def test_index_stores_codes_not_vectors(spark, embeddings, tmp_path):
    idx = _mk_index(tmp_path)
    idx.build(spark, embeddings)
    stored = idx.lake.read(spark, "gold", "ivfpq_index")
    assert set(stored.columns) == {"vec_id", "cell", "codes"}
    assert stored.count() == embeddings.count()
    row = stored.first()
    assert len(row["codes"]) == pq.M
    # stored quantizers round-trip exactly
    assert idx.codebooks(spark) == pq.train_pq(embeddings)


def test_query_prunes_to_probed_cells(spark, embeddings, tmp_path):
    idx = _mk_index(tmp_path, n_cells=16, n_probe=2)
    idx.build(spark, embeddings)
    queries = embeddings.filter(F.col("vec_id") < 3)
    out = idx.query(spark, queries, k=3)
    cells = {
        int(seg.split("cell=")[1].split("/")[0])
        for f in out.inputFiles()
        if "cell=" in f
        for seg in [f]
    }
    # ≤ n_probe cells per query × 3 queries, far below all 16
    assert 0 < len(cells) <= 6


def test_rerank_query_finds_exact_neighbors(spark, embeddings, tmp_path):
    import numpy as np

    idx = _mk_index(tmp_path, n_probe=8)  # wide probe isolates PQ error
    idx.build(spark, embeddings)
    queries = embeddings.filter(F.col("vec_id") < 10)
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in idx.query(
            spark, queries, k=3, rerank_source=embeddings
        ).collect()
    }
    rows = embeddings.orderBy("vec_id").collect()
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    hits = total = 0
    for qi in range(10):
        d = ((x - x[qi]) ** 2).sum(axis=1)
        d[qi] = np.inf
        exact = {int(ids[i]) for i in np.lexsort((ids, d))[:3]}
        approx = {got[(qi, r)] for r in (1, 2, 3) if (qi, r) in got}
        hits += len(exact & approx)
        total += 3
    assert hits / total >= 0.8, f"IVFADC recall {hits}/{total}"


def test_add_uses_frozen_quantizers_and_optimize_is_layout_only(
    spark, embeddings, tmp_path
):
    half_a = embeddings.filter(F.col("vec_id") % 2 == 0)
    half_b = embeddings.filter(F.col("vec_id") % 2 == 1)
    idx = _mk_index(tmp_path)
    idx.build(spark, half_a)
    books_before = idx.codebooks(spark)
    cents_before = idx.centroids(spark)
    idx.add(spark, half_b)
    assert idx.codebooks(spark) == books_before  # frozen
    assert idx.centroids(spark) == cents_before
    queries = embeddings.filter(F.col("vec_id") < 5)
    before = idx.query(spark, queries, k=3).collect()
    idx.optimize(spark)
    after = idx.query(spark, queries, k=3).collect()
    assert before == after  # OPTIMIZE never changes results


def test_adc_only_and_rerank_modes_are_deterministic(
    spark, embeddings, tmp_path
):
    idx = _mk_index(tmp_path)
    idx.build(spark, embeddings)
    queries = embeddings.filter(F.col("vec_id") < 5)
    a1 = idx.query(spark, queries, k=3).collect()
    a2 = idx.query(spark, queries, k=3).collect()
    assert a1 == a2
    r1 = idx.query(spark, queries, k=3, rerank_source=embeddings).collect()
    r2 = idx.query(spark, queries, k=3, rerank_source=embeddings).collect()
    assert r1 == r2
    assert a1 != r1  # different metrics/columns: adc_dist vs l2_dist
