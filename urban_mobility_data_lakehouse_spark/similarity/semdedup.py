"""SemDeDup — semantic deduplication via k-means-bucketed cosine.

The embedding-space analog of MinHash dedup (Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", arXiv:2303.09540): lexical fingerprints miss
paraphrases and re-renderings, but their embeddings land close
together.  All-pairs cosine over a corpus is O(n²); SemDeDup's
observation is that semantic duplicates fall in the SAME k-means
cluster of a coarse quantization, so only within-cluster pairs need
scoring — the exact cost shape IVF search already exploits
(`ivf.py`), and the two share the same trained centroids here.

Drop rule (the reference implementation's ordering trick, pinned to a
deterministic order): within a cluster, process items in ascending
`vec_id`; an item is DROPPED iff its max cosine to any LOWER-id
cluster-mate reaches the threshold.  Exactly one member of every
semantic-duplicate set survives (the minimum id — the same survivor
contract as the MinHash cluster closure in `dedup/components.py`),
and the decision for item v never depends on whether its prior
neighbors were themselves dropped, so the whole pass is ONE self-join
+ ONE window — no iteration.  (The paper picks survivors by distance
to the centroid / at random; a fixed id order changes which twin
survives, not what is deduplicated.)

Scale: the join key is the cluster id, so shuffled work is
Σ|cluster|² — SemDeDup at 100 TB runs with n_cells ≈ √n (the paper
uses 110k clusters for LAION), keeping every cluster's pair block
bounded; centroids stay a driver-sized broadcast exactly as in IVF.
Assignment itself is the shuffle-free broadcast map of
`ivf.assign_cells`.  Training is frozen + seeded (`ivf.lloyd`), so
the pyarrow twin trainer reproduces the centroids bit-identically
and the whole pass — assignment, pairing, max-sim, drop set — is
replayable in DuckDB for the driver's value-hash gate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .ivf import assign_cells, train_centroids
from .knn import cosine

# Per-task transient buffer cap for the blocked cosine: ~64 MB of
# float64 (8e6 elements × 8 B).  Row chunks are sized so
# chunk × |cell| ≤ this, bounding a skewed hot cell's task memory at
# O(|cell| · d) input + one 64 MB block instead of |cell|² floats.
# Module-level so the hot-cell test can shrink it and force many
# chunks on a small corpus.
_CHUNK_ELEMS = 8_000_000


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.4,
    n_cells: int | str = 16,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """The DROP side of SemDeDup: one row per discarded vector —
    ``(vec_id, cell, dup_of, max_prior_sim)`` where `dup_of` is the
    highest-similarity lower-id cluster-mate (ties → lowest id) and
    `max_prior_sim` its cosine.  Survivors = embeddings anti-joined
    against this frame; the drop set carries the evidence for every
    removal, which is what a curation audit actually wants stored.
    """
    if n_cells == "auto":
        # the paper's sizing: clusters ≈ √n keeps every within-cluster
        # pair block bounded as the corpus grows (one exact count job)
        import math

        n_cells = max(16, math.isqrt(embeddings.count()))
    if centroids is None:
        centroids = train_centroids(embeddings, n_cells=n_cells, seed=seed)
    assigned = assign_cells(embeddings, centroids)

    # One applyInPandas block per cell, NOT a within-cell pair join:
    # the join materializes Σ|cell|² pair rows and evaluates three
    # interpreted HOF folds per pair (~50 µs each, measured — the same
    # per-element HOF cost assign_cells/lsh_signatures shed); the block
    # computes the whole |cell|×|cell| cosine matrix as 64 vectorized
    # passes with the IDENTICAL IEEE op order (dot and norm accumulate
    # in the same j order as zip_with/aggregate's left fold, the
    # denominator multiplies norm_a·norm_b the same way, argmax's
    # first-maximum rule is the (cos desc, prior_id asc) tie-break) —
    # bit-identity vs the kept join+window twin is test-locked, which
    # is what keeps the DuckDB oracle replay exact.  Memory per task:
    # the cosine block is computed in ROW CHUNKS sized so a chunk's
    # float64 buffer stays under ~64 MB regardless of cell size — a
    # skewed hot cell (k-means cells skew hard on real embedding
    # corpora) costs O(chunk × |cell|) transient memory instead of the
    # full |cell|² matrix, which at 100k vectors would be an 80 GB task.
    # Each element dot[i,k] still accumulates over features j in the
    # SAME order whatever the chunking, so chunked and unchunked runs
    # are bit-identical (pinned by test_semdedup's hot-cell test).
    import numpy as np
    import pandas as pd

    chunk_elems = _CHUNK_ELEMS  # snapshot: closure ships to executors

    def _cell_drops(pdf: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame(
            {
                "vec_id": pd.Series([], dtype="int64"),
                "cell": pd.Series([], dtype="int32"),
                "dup_of": pd.Series([], dtype="int64"),
                "cos": pd.Series([], dtype="float64"),
            }
        )
        m = len(pdf)
        if m < 2:
            return empty
        order = np.argsort(pdf["vec_id"].to_numpy(), kind="stable")
        ids = pdf["vec_id"].to_numpy()[order]
        x = np.array(pdf["emb"].tolist(), dtype=np.float64)[order]
        nacc = np.zeros(m, dtype=np.float64)
        for j in range(x.shape[1]):
            nacc += x[:, j] * x[:, j]
        nrm = np.sqrt(nacc)
        rows_per_chunk = max(1, chunk_elems // m)
        best = np.zeros(m, dtype=np.int64)
        best_cos = np.full(m, -np.inf, dtype=np.float64)
        col_idx = np.arange(m)
        for a in range(0, m, rows_per_chunk):
            b = min(m, a + rows_per_chunk)
            dot = np.zeros((b - a, m), dtype=np.float64)
            for j in range(x.shape[1]):
                dot += x[a:b, j][:, None] * x[:, j][None, :]
            cos = dot / (nrm[a:b, None] * nrm[None, :])
            # priors = strictly lower ids = strictly lower row index
            cos[col_idx[None, :] >= np.arange(a, b)[:, None]] = -np.inf
            chunk_best = cos.argmax(axis=1)  # first max → lowest prior
            best[a:b] = chunk_best
            best_cos[a:b] = cos[np.arange(b - a), chunk_best]
        keep = best_cos >= threshold  # row 0 is -inf → never kept
        return pd.DataFrame(
            {
                "vec_id": ids[keep],
                "cell": pdf["cell"].to_numpy()[order][keep],
                "dup_of": ids[best[keep]],
                "cos": best_cos[keep],
            }
        )

    return (
        assigned.groupBy("cell")
        .applyInPandas(
            _cell_drops, "vec_id long, cell int, dup_of long, cos double"
        )
        .select(
            "vec_id",
            "cell",
            "dup_of",
            F.round("cos", 4).alias("max_prior_sim"),
        )
        .orderBy("vec_id")
    )


def semantic_dedup_join(
    embeddings: DataFrame,
    threshold: float = 0.4,
    n_cells: int | str = 16,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Join+window twin of `semantic_dedup` (the pre-Arrow form), kept
    as the reference implementation the equality test pins the blocked
    path against."""
    if n_cells == "auto":
        import math

        n_cells = max(16, math.isqrt(embeddings.count()))
    if centroids is None:
        centroids = train_centroids(embeddings, n_cells=n_cells, seed=seed)
    assigned = assign_cells(embeddings, centroids)
    prior = assigned.select(
        F.col("vec_id").alias("prior_id"),
        F.col("emb").alias("emb_p"),
        "cell",
    )
    scored = (
        assigned.join(prior, "cell")
        .filter(F.col("prior_id") < F.col("vec_id"))
        .select(
            "vec_id",
            "cell",
            "prior_id",
            cosine(F.col("emb"), F.col("emb_p")).alias("cos"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos").desc(), F.col("prior_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("cos") >= threshold))
        .select(
            "vec_id",
            "cell",
            F.col("prior_id").alias("dup_of"),
            F.round("cos", 4).alias("max_prior_sim"),
        )
        .orderBy("vec_id")
    )
