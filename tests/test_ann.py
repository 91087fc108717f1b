"""ANN quality tests: the approximate tiers (LSH, IVF) must actually
approximate the exact brute-force baseline — schema identity plus a
recall floor, the checks an oracle can't express."""

from __future__ import annotations

from urban_mobility_data_lakehouse_spark.similarity import ivf, knn
from urban_mobility_data_lakehouse_spark.sources.testdata import load_table


def _topk_sets(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = _topk_sets(knn.knn_bruteforce(emb, n_queries=10, k=3))
    approx = _topk_sets(
        ivf.knn_ivf(emb, n_queries=10, k=3, n_cells=16, n_probe=4)
    )
    assert set(approx) == set(exact)  # every query answered
    hits = sum(len(approx[q] & exact[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    assert hits / total >= 0.5, f"IVF recall {hits}/{total} too low"


def test_ivf_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = ivf.knn_ivf(emb, n_queries=5, k=3).collect()
    b = ivf.knn_ivf(emb, n_queries=5, k=3).collect()
    assert a == b


def test_ivf_cells_partition_corpus(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf.train_centroids(emb, n_cells=8)
    assert len(cents) == 8
    assigned = ivf.assign_cells(emb, cents)
    n = emb.count()
    assert assigned.count() == n  # assignment is total
    per_cell = {r["cell"]: r["cnt"] for r in
                assigned.groupBy("cell").count()
                .withColumnRenamed("count", "cnt").collect()}
    assert sum(per_cell.values()) == n
    assert len(per_cell) >= 4  # corpus actually spreads over cells
