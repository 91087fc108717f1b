"""SemDeDup (similarity/semdedup.py) semantics.

Oracle parity for the registry row (`embedding_near_dups` part
'drop') runs in test_oracle_parity; here the operator's contract is
checked directly: planted semantic twins are dropped with the right
evidence, survivors are pairwise dissimilar within every cluster, and
the pass is deterministic.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from urban_mobility_data_lakehouse_spark.similarity.ivf import (
    assign_cells,
    train_centroids,
)
from urban_mobility_data_lakehouse_spark.similarity.knn import cosine
from urban_mobility_data_lakehouse_spark.similarity.semdedup import (
    semantic_dedup,
)
from urban_mobility_data_lakehouse_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"


def _planted(spark):
    """Corpus + exact copies of vec_ids 0-4 at ids 10000-10004."""
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    twins = emb.filter(F.col("vec_id") < 5).withColumn(
        "vec_id", F.col("vec_id") + 10000
    )
    return emb.unionByName(twins)


def test_planted_twins_dropped_with_evidence(spark):
    drops = semantic_dedup(_planted(spark), threshold=0.9).collect()
    by_id = {r["vec_id"]: r for r in drops}
    for i in range(5):
        r = by_id[10000 + i]
        # the twin is dropped, blamed on its identical lower-id
        # original (cos exactly 1.0 after round(4))
        assert r["dup_of"] == i, r
        assert r["max_prior_sim"] == 1.0, r
    # originals (the minimum id of each twin set) all survive
    assert not any(r["vec_id"] < 5 for r in drops)


def test_survivors_pairwise_dissimilar_within_cell(spark):
    emb = _planted(spark)
    tau = 0.5
    centroids = train_centroids(emb)
    drops = semantic_dedup(emb, threshold=tau, centroids=centroids)
    survivors = assign_cells(emb, centroids).join(
        drops.select("vec_id"), "vec_id", "left_anti"
    )
    a = survivors.select(
        F.col("vec_id").alias("ia"), F.col("emb").alias("ea"), "cell"
    )
    b = survivors.select(
        F.col("vec_id").alias("ib"), F.col("emb").alias("eb"), "cell"
    )
    offenders = (
        a.join(b, "cell")
        .filter(F.col("ia") < F.col("ib"))
        .filter(cosine(F.col("ea"), F.col("eb")) >= tau)
    )
    # the order rule guarantees this: any same-cell pair >= tau has
    # its higher id dropped, so no such pair can survive
    assert offenders.count() == 0


def test_deterministic_across_runs(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    r1 = semantic_dedup(emb, threshold=0.3).collect()
    r2 = semantic_dedup(emb, threshold=0.3).collect()
    assert r1 == r2
    assert len(r1) > 0  # tau=0.3 is inside the corpus tail: nonempty


def test_auto_cells_scales_with_corpus(spark):
    """n_cells='auto' sizes the clustering to ~sqrt(n) (the paper's
    guidance) and keeps the drop rule's semantics: planted twins are
    still caught."""
    emb = _planted(spark)
    drops = {
        r["vec_id"]
        for r in semantic_dedup(
            emb, threshold=0.9, n_cells="auto"
        ).collect()
    }
    assert {10000 + i for i in range(5)} <= drops
    # 505 vectors → 22 cells; cell ids must stay inside that range
    cells = {
        r["cell"]
        for r in semantic_dedup(
            emb, threshold=0.9, n_cells="auto"
        ).collect()
    }
    assert max(cells) < 22


def test_blocked_path_matches_join_window_twin(spark):
    """The applyInPandas per-cell block (no pair join, one |cell|²
    numpy matrix per task) must be BIT-identical to the join+window
    twin: same fold order for dot/norm, same (cos desc, prior_id asc)
    tie-break.  Exact ==, sf0.001 + the driver-oracle sf0.01."""
    from urban_mobility_data_lakehouse_spark.similarity.semdedup import (
        semantic_dedup_join,
    )

    for d in (SF_DIR, "/root/testdata/sf0.01"):
        emb = load_table(spark, d, "embeddings").select(
            "vec_id", "embedding"
        )
        blocked = {
            r["vec_id"]: (r["cell"], r["dup_of"], r["max_prior_sim"])
            for r in semantic_dedup(emb, threshold=0.3).collect()
        }
        joined = {
            r["vec_id"]: (r["cell"], r["dup_of"], r["max_prior_sim"])
            for r in semantic_dedup_join(emb, threshold=0.3).collect()
        }
        assert blocked == joined


def test_hot_cell_chunked_block_is_bit_identical(spark, monkeypatch):
    """Cell-skew memory bound: with n_cells=1 EVERY vector lands in one
    hot cell (the skew pathology — one cell ≫ average), and a tiny
    _CHUNK_ELEMS forces the blocked cosine through many row chunks.
    The chunked result must be BIT-identical to the join+window twin
    (same IEEE fold order per element, same first-max tie-break), and
    the per-chunk buffer stays at chunk×|cell| ≤ _CHUNK_ELEMS floats
    instead of |cell|² — the OOM hazard this bound exists to remove."""
    import urban_mobility_data_lakehouse_spark.similarity.semdedup as sd
    from urban_mobility_data_lakehouse_spark.similarity.semdedup import (
        semantic_dedup_join,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    # chunk_elems < |cell| → rows_per_chunk clamps to 1 (worst case);
    # also try a mid value that yields several multi-row chunks
    for elems in (n // 2, 7 * n):
        monkeypatch.setattr(sd, "_CHUNK_ELEMS", elems)
        blocked = {
            r["vec_id"]: (r["dup_of"], r["max_prior_sim"])
            for r in sd.semantic_dedup(
                emb, threshold=0.3, n_cells=1
            ).collect()
        }
        joined = {
            r["vec_id"]: (r["dup_of"], r["max_prior_sim"])
            for r in semantic_dedup_join(
                emb, threshold=0.3, n_cells=1
            ).collect()
        }
        assert blocked == joined and len(blocked) > 0
