"""IVF (inverted-file) approximate nearest-neighbor search.

The third rung of the ANN ladder (after brute-force and LSH in
`knn.py`), and the one production vector stores actually scale on:

  1. *Train*: a coarse quantizer — k-means centroids fitted on a small,
     deterministic sample of the corpus (FAISS trains IVF on a sample
     too; at 100 TB the sample is still a driver-sized array).
  2. *Assign*: every vector goes to its nearest centroid's cell.  The
     assignment is a pure codegen expression (one zip_with/aggregate
     per centroid — centroids are literals broadcast in the plan), so
     the 100 TB pass is a single narrow map with no shuffle; in a real
     deployment the cell id becomes a partition/bucket column.
  3. *Probe*: each query scores only the `n_probe` nearest cells —
     work per query is bounded by n_probe/n_cells of the corpus
     instead of all of it.

Everything is seed-deterministic: the sample is ordered by vec_id and
Lloyd's iterations run in fixed order, so repeated runs (and resumed
drivers) build identical indexes.  Results are approximate by
construction → registered as a rows-only query; recall vs the exact
brute-force baseline is asserted in tests.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from .knn import _as_double, cosine


def train_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    seed: int = 42,
    sample_size: int = 2048,
    n_iter: int = 10,
) -> list[list[float]]:
    """Driver-side Lloyd's k-means on a deterministic sample.

    The sample is the `sample_size` lowest vec_ids (stable across runs
    and partitionings — `.sample()` would not be); init is a seeded
    choice without replacement.  Empty cells are re-seeded from the
    farthest points so all n_cells survive.
    """
    import numpy as np

    rows = (
        embeddings.orderBy("vec_id")
        .limit(sample_size)
        .select(_as_double(F.col("embedding")).alias("e"))
        .collect()
    )
    x = np.array([r["e"] for r in rows], dtype=np.float64)
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(n_iter):
        # pairwise squared L2 → hard assignment
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
            else:  # re-seed dead cell with the worst-served point
                cents[c] = x[d2.min(axis=1).argmax()]
    return cents.tolist()


def _l2sq(emb: Column, centroid: list[float]) -> Column:
    lit = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(emb, lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cell_ranking(emb: Column, centroids: list[list[float]]) -> Column:
    """Array of cell ids ordered nearest-first (codegen-only)."""
    ranked = F.array_sort(
        F.array(
            *[
                F.struct(
                    _l2sq(emb, c).alias("d"), F.lit(i).alias("cell")
                )
                for i, c in enumerate(centroids)
            ]
        )
    )
    return F.transform(ranked, lambda s: s["cell"])


def assign_cells(
    embeddings: DataFrame, centroids: list[list[float]]
) -> DataFrame:
    """IVF assignment pass: adds the `cell` column (the bucketing key a
    100 TB deployment would partition the index by)."""
    emb = _as_double(F.col("embedding"))
    return embeddings.withColumn(
        "cell", cell_ranking(emb, centroids)[0].cast("int")
    )


def knn_ivf(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 3,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine: probe the n_probe nearest cells per
    query, exact re-rank inside the probed candidate set."""
    centroids = train_centroids(embeddings, n_cells=n_cells, seed=seed)
    emb = _as_double(F.col("embedding"))

    base = assign_cells(embeddings, centroids).select(
        F.col("vec_id").alias("neighbor_id"),
        emb.alias("emb_b"),
        "cell",
    )
    queries = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        emb.alias("emb_q"),
        F.slice(cell_ranking(emb, centroids), 1, n_probe).alias("probe"),
    )
    scored = base.join(
        F.broadcast(queries),
        F.array_contains(F.col("probe"), F.col("cell"))
        & (F.col("query_id") != F.col("neighbor_id")),
    ).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("emb_q"), F.col("emb_b")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 4).alias("cosine_sim"),
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )
