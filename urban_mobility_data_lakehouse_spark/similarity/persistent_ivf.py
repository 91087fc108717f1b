"""Persistent IVF: the ANN index as a lakehouse table, probed through
partition pruning.

`ivf.knn_ivf` builds its index per call — right for a benchmark query,
wrong for a serving path.  Production vector search materializes the
assignment once and lets STORAGE LAYOUT do the probe pruning: this
module stores `(vec_id, emb, cell)` as a lakehouse table partitioned
by `cell`, so scoring a query against its `n_probe` nearest cells
reads ONLY those cells' directories (directory-level pruning — the
scan plan's `inputFiles()` shrinks to n_probe/n_cells of the index).
This realizes the note in `ivf.py`: "in a real deployment `cell`
becomes a partition/bucket column at ingest".

Lifecycle mirrors a Delta-backed vector store:

  build(corpus)   train (driver-sized deterministic sample) → assign
                  (broadcast centroids, shuffle-free map) → commit
                  partitioned by cell; centroids land in a companion
                  table so every later reader/writer shares the frozen
                  quantizer.
  add(batch)      assign the batch against the FROZEN centroids and
                  append — the streaming-ingest fast path; appended
                  files span cells, so probes read them un-pruned
                  until…
  optimize()      `compact(partition_col="cell")` re-clusters
                  everything back into one right-sized file per cell
                  (the OPTIMIZE-after-streaming ritual), restoring
                  full probe pruning.  All three are ordinary
                  versioned commits: the index is time-travelable and
                  crash-safe like any other table.
  query(vectors)  rank cells per query row-locally, collect the
                  (tiny) union of probed cell ids, scan just those
                  partitions, exact cosine re-rank inside them —
                  identical math to `knn_ivf`, so results match the
                  in-memory path bit-for-bit when built from the same
                  corpus.

Scale: train is bounded (2048-row Arrow sample); assign is a
broadcast-join map with no shuffle; query cost is
n_probe/n_cells × |index| scan + a top-k window over scored
candidates.  The collected probe-cell union is ≤ n_cells ints —
driver-bounded regardless of corpus size.  Query batches are assumed
serving-sized (broadcast); for bulk query sets run the batch
`knn_ivf` shape instead.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.lakehouse import Lakehouse
from .knn import cosine
from .ivf import (
    assign_cells,
    centroid_table,
    train_centroids,
    with_ranked_cells,
)


class PersistentIVF:
    """IVF index persisted as `{schema}.{name}` (+ `…_centroids`)."""

    def __init__(
        self,
        lake: Lakehouse,
        schema: str = "gold",
        name: str = "ivf_index",
        n_cells: int = 16,
        n_probe: int = 4,
        seed: int = 42,
    ):
        self.lake = lake
        self.schema = schema
        self.name = name
        self.n_cells = n_cells
        self.n_probe = n_probe
        self.seed = seed

    # -- lifecycle ---------------------------------------------------------

    def build(self, spark: SparkSession, embeddings: DataFrame) -> None:
        """Train on `embeddings` and store the full assignment,
        partitioned by cell (one commit per table)."""
        centroids = train_centroids(
            embeddings, n_cells=self.n_cells, seed=self.seed
        )
        assigned = assign_cells(embeddings, centroids)
        self.lake.overwrite_partitions(
            assigned.repartition(F.col("cell")),
            self.schema,
            self.name,
            partition_col="cell",
        )
        self.lake.overwrite(
            centroid_table(spark, centroids),
            self.schema,
            f"{self.name}_centroids",
        )

    def centroids(self, spark: SparkSession) -> list[list[float]]:
        rows = (
            self.lake.read(spark, self.schema, f"{self.name}_centroids")
            .orderBy("cell")
            .collect()
        )
        return [list(r["centroid"]) for r in rows]

    def add(self, spark: SparkSession, embeddings: DataFrame) -> None:
        """Append a batch assigned against the frozen quantizer (no
        retrain — FAISS add() semantics).  Appended files are not yet
        cell-clustered; run `optimize()` to restore probe pruning."""
        assigned = assign_cells(embeddings, self.centroids(spark))
        self.lake.append(assigned, self.schema, self.name)

    def optimize(self, spark: SparkSession) -> dict:
        """Re-cluster the index into one file per cell partition."""
        return self.lake.compact(
            spark, self.schema, self.name, partition_col="cell"
        )

    # -- search ------------------------------------------------------------

    def query(
        self, spark: SparkSession, queries: DataFrame, k: int = 3
    ) -> DataFrame:
        """Top-k cosine neighbors for each (vec_id, embedding) query
        row.  Scans only the union of the queries' probed cells.
        Returns (query_id, neighbor_id, cosine_sim, rank) — the
        `knn_ivf` output shape."""
        centroids = self.centroids(spark)
        q = with_ranked_cells(queries, centroids, self.n_probe).select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("emb_q"),
            "probe",
        )
        probe_cells = sorted(
            r[0]
            for r in q.select(F.explode("probe").alias("c"))
            .distinct()
            .collect()
        )
        # directory-level pruning: only the probed cell= subdirs are
        # listed/planned (inputFiles() shrinks to n_probe/n_cells of
        # the index) — not a post-scan row filter
        index = self.lake.read(
            spark,
            self.schema,
            self.name,
            partition_values=[str(c) for c in probe_cells],
        )
        scored = index.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("emb").alias("emb_b"),
            F.col("cell").cast("int").alias("cell"),
        ).join(
            F.broadcast(q),
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
