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


def test_minhash_lsh_recall_floor(spark, sf_dir):
    """The 16-hash/4-band LSH must recover (as candidates) nearly all
    pairs whose EXACT shingle Jaccard is high — the S-curve gives
    P[candidate] = 1-(1-j^4)^4 ≈ 0.88 at j=0.8 and ≈ 0.999 at j=0.95,
    so a 0.75 floor on j ≥ 0.8 pairs has real slack."""
    import pyspark.sql.functions as F

    from urban_mobility_data_lakehouse_spark.dedup import minhash

    docs = load_table(spark, sf_dir, "documents")
    sh = minhash.doc_shingles(docs).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))

    # exact Jaccard for every pair sharing >=1 shingle (superset of
    # every pair with j >= 0.8) — fine at test scale, never at 100 TB
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    exact = (
        common.join(sizes.select(F.col("doc_id").alias("doc_a"),
                                 F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("n").alias("nb")), "doc_b")
        .filter(jac >= 0.8)
        .select("doc_a", "doc_b")
    )
    truth = {(r["doc_a"], r["doc_b"]) for r in exact.collect()}
    assert truth, "fixture corpus must contain high-jaccard near-dups"

    # candidates from the hashed pipeline; truth stays raw-string exact
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in minhash.candidate_pairs(docs).collect()
    }
    recall = len(truth & cand) / len(truth)
    assert recall >= 0.75, f"LSH recall {recall:.2f} over {len(truth)} pairs"


def test_ivf_trainer_paths_bit_identical(spark, sf_dir):
    """The knn_ivf oracle's whole validity rests on one invariant: the
    Spark trainer (orderBy/limit sample) and the pyarrow trainer
    (stable-argsort sample) feed `lloyd` identical inputs and therefore
    return bit-identical float64 centroids.  Assert exact equality on
    both the test and the driver-oracle scale factors."""
    from tests.conftest import SF_ORACLE_DIR

    for d in (sf_dir, SF_ORACLE_DIR):
        emb = load_table(spark, d, "embeddings")
        spark_cents = ivf.train_centroids(emb, n_cells=16, seed=42)
        arrow_cents = ivf.train_centroids_from_parquet(
            d, n_cells=16, seed=42
        )
        assert spark_cents == arrow_cents  # exact ==, not approx


def test_assign_cells_arrow_matches_hof(spark, sf_dir):
    """The Arrow-vectorized assignment (mapInPandas + numpy, the 100 TB
    path — HOF ranking measured ~150 µs/vector) must be BIT-identical
    to the pure-Column HOF twin: same left-fold add order for the
    squared-L2, same (distance, cell) tie-break.  Exact ==, both
    sf0.001 and the driver-oracle sf0.01."""
    from tests.conftest import SF_ORACLE_DIR

    for d in (sf_dir, SF_ORACLE_DIR):
        emb = load_table(spark, d, "embeddings")
        cents = ivf.train_centroids(emb, n_cells=16, seed=42)
        arrow = {
            r["vec_id"]: r["cell"]
            for r in ivf.assign_cells(emb, cents).collect()
        }
        hof = {
            r["vec_id"]: r["cell"]
            for r in ivf.assign_cells_hof(emb, cents).collect()
        }
        assert arrow == hof


def test_lsh_signatures_arrow_matches_hof(spark, sf_dir):
    """Arrow-vectorized hyperplane signatures must be BIT-identical to
    the pure-Column HOF twin: same x_j·p_j left-fold order, same >= 0
    sign, same shiftleft-or packing.  Exact ==, both sf0.001 and the
    driver-oracle sf0.01 — this is what keeps the SQL oracle's banded
    candidate replay exact."""
    from urban_mobility_data_lakehouse_spark.similarity import knn

    from tests.conftest import SF_ORACLE_DIR

    for d in (sf_dir, SF_ORACLE_DIR):
        emb = load_table(spark, d, "embeddings")
        arrow = {
            r["vec_id"]: r["lsh_sig"]
            for r in knn.lsh_signatures(emb).collect()
        }
        hof = {
            r["vec_id"]: r["lsh_sig"]
            for r in knn.lsh_signatures_hof(emb).collect()
        }
        assert arrow == hof


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


def test_pq_trainer_paths_bit_identical(spark, sf_dir):
    from urban_mobility_data_lakehouse_spark.similarity import pq

    a = pq.train_pq(load_table(spark, sf_dir, "embeddings"))
    b = pq.train_pq_from_parquet(sf_dir)
    assert a == b  # exact float equality — the oracle's load-bearing invariant


def test_pq_codes_shape_and_range(spark, sf_dir):
    from urban_mobility_data_lakehouse_spark.similarity import pq

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq.train_pq(emb)
    codes = pq.encode_pq(emb, books).collect()
    assert len(codes) == emb.count()
    for r in codes:
        assert len(r["codes"]) == pq.M
        assert all(0 <= c < pq.KSUB for c in r["codes"])


def test_bruteforce_arrow_bit_identical_to_hof_twin(spark, sf_dir):
    """The Arrow `knn_bruteforce` must reproduce the HOF twin exactly —
    same per-feature left-fold for dot/norms, same rank tie-break —
    at two SFs (the knn_ivf discipline)."""
    from urban_mobility_data_lakehouse_spark.similarity import knn

    for d in (sf_dir, "/root/testdata/sf0.01"):
        emb = load_table(spark, d, "embeddings")
        arrow = knn.knn_bruteforce(emb, n_queries=10, k=3).collect()
        hof = knn.knn_bruteforce_hof(emb, n_queries=10, k=3).collect()
        assert arrow == hof and len(arrow) == 30


def test_pq_arrow_encode_bit_identical_to_hof_twin(spark, sf_dir):
    """The Arrow `encode_pq` must reproduce the HOF twin's codes
    exactly — same (x−c)² dim-ordered 0.0-seeded fold, same
    lowest-code tie-break — at two SFs (the knn_ivf discipline).  This
    is what keeps the DuckDB oracle's inlined-codebook replay exact."""
    from urban_mobility_data_lakehouse_spark.similarity import pq

    for d in (sf_dir, "/root/testdata/sf0.01"):
        emb = load_table(spark, d, "embeddings")
        books = pq.train_pq(emb)
        arrow = {
            r["vec_id"]: list(r["codes"])
            for r in pq.encode_pq(emb, books).collect()
        }
        hof = {
            r["vec_id"]: list(r["codes"])
            for r in pq.encode_pq_hof(emb, books).collect()
        }
        assert arrow == hof and len(arrow) > 0


def test_pq_adc_recall_vs_exact_l2(spark, sf_dir):
    """The ADC-shortlist + exact-re-rank pipeline must retrieve nearly
    all of the exact squared-L2 top-k (pure ADC ordering alone is
    data-limited on this near-isotropic synthetic corpus — see
    similarity/pq.py — which is exactly why the operator re-ranks)."""
    import numpy as np

    from urban_mobility_data_lakehouse_spark.similarity import pq

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.orderBy("vec_id").collect()
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    k, nq = 3, 10
    exact: dict[int, set[int]] = {}
    for qi in range(nq):
        d = ((x - x[qi]) ** 2).sum(axis=1)
        d[qi] = np.inf
        order = np.lexsort((ids, d))[:k]
        exact[int(ids[qi])] = set(int(ids[i]) for i in order)
    approx = _topk_sets(pq.knn_pq(emb, n_queries=nq, k=k))
    assert set(approx) == set(exact)
    hits = sum(len(approx[q] & exact[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    assert hits / total >= 0.9, f"PQ recall {hits}/{total} too low"


def test_pq_deterministic(spark, sf_dir):
    from urban_mobility_data_lakehouse_spark.similarity import pq

    emb = load_table(spark, sf_dir, "embeddings")
    assert (
        pq.knn_pq(emb, n_queries=5, k=3).collect()
        == pq.knn_pq(emb, n_queries=5, k=3).collect()
    )


def test_lloyd_dead_cells_reseed_to_distinct_points():
    """≥2 cells dying in one Lloyd's round must re-seed to DISTINCT
    worst-served points (the old single-argmax re-seed collapsed all
    dead cells onto one seed), deterministically."""
    import numpy as np

    from urban_mobility_data_lakehouse_spark.similarity.ivf import lloyd

    # duplicate-heavy data (two 5-point coincident clusters + 4
    # outliers) with k=6: duplicate init centroids tie-break to the
    # first cell, so ≥2 cells die in one round.  Verified to collapse
    # to 5 distinct centroids under the old re-seed.
    x = np.vstack(
        [
            np.zeros((5, 3)),
            np.full((5, 3), 5.0),
            np.array(
                [[50.0, 0, 0], [0, 60.0, 0], [0, 0, 70.0], [80.0, 80, 0]]
            ),
        ]
    )
    cents = np.array(lloyd(x, n_cells=6, seed=0, n_iter=2))
    assert cents.shape == (6, 3)
    # all six centroids survive AND are pairwise distinct
    uniq = {tuple(np.round(c, 9)) for c in cents}
    assert len(uniq) == 6, f"collapsed centroids: {cents}"
    # deterministic across runs
    assert lloyd(x, n_cells=6, seed=0, n_iter=2) == lloyd(
        x, n_cells=6, seed=0, n_iter=2
    )


def test_knn_lsh_single_pass_matches_joined(spark, sf_dir):
    """The single-pass `knn_lsh` (r13: sign+bucket+score in one Arrow
    crossing) must reproduce the join-based twin exactly — identical
    signature fold, identical bucket ints, identical cosine fold and
    rank tie-breaks — at two SFs (the knn_ivf discipline).  This is
    what keeps the DuckDB oracle's lsh replay exact."""
    from urban_mobility_data_lakehouse_spark.similarity import knn

    for d in (sf_dir, "/root/testdata/sf0.01"):
        emb = load_table(spark, d, "embeddings")
        single = knn.knn_lsh(emb, n_queries=10, k=3).collect()
        joined = knn.knn_lsh_joined(emb, n_queries=10, k=3).collect()
        assert single == joined and len(single) > 0
