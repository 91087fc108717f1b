"""Similarity-search queries over the `embeddings` table.

The brute-force oracle reproduces Spark's exact fold order (left fold of
index-ordered products) so the doubles are bit-identical before rounding.
The LSH variant depends on seed-derived hyperplane constants → rows-only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..similarity import knn
from ..sources.testdata import load_table
from . import register


@register(
    "knn_cosine",
    oracle="""
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, e AS eq FROM v WHERE vec_id < 10),
    s AS (
        SELECT q.query_id, v.vec_id AS neighbor_id,
               list_reduce(
                   list_transform(generate_series(1, len(v.e)),
                                  i -> q.eq[i] * v.e[i]),
                   (a, b) -> a + b)
               / (sqrt(list_reduce(list_transform(q.eq, x -> x * x),
                                   (a, b) -> a + b))
                  * sqrt(list_reduce(list_transform(v.e, x -> x * x),
                                     (a, b) -> a + b))) AS cos
        FROM q JOIN v ON v.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id,
           round(cos, 4) AS cosine_sim,
           CAST(rnk AS BIGINT) AS rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id) AS rnk
        FROM s
    )
    WHERE rnk <= 3
    ORDER BY query_id, rank
    """,
    tags=("similarity", "knn"),
    bench=True,
)
def knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return knn.knn_bruteforce(
        load_table(spark, sf_dir, "embeddings"), n_queries=10, k=3
    )




def _lsh_oracle(n_queries: int = 10, k: int = 3, n_planes: int = 16,
                seed: int = 42, dim: int = 64) -> str:
    """Generate the DuckDB oracle for knn_lsh: the seed-derived
    hyperplanes are embedded as float literals (repr() round-trips
    doubles exactly; both engines then compute bit-identical dot
    products — sequential fold, same order — so sign bits, buckets,
    and the re-rank all agree)."""
    from ..similarity.knn import hyperplanes

    planes = hyperplanes(dim, n_planes, seed)
    values = ",\n        ".join(
        f"({i}, [{', '.join(repr(x) for x in p)}])"
        for i, p in enumerate(planes)
    )
    dot = ("list_reduce(list_transform(generate_series(1, {n}), "
           "i -> {a}[i] * {b}[i]), (x, y) -> x + y)")
    qb_dot = dot.format(n=dim, a="q.e", b="b.e")
    norm = ("sqrt(list_reduce(list_transform({a}, x -> x * x), "
            "(x, y) -> x + y))")
    return f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    planes(pid, p) AS (VALUES
        {values}
    ),
    bits AS (
        SELECT v.vec_id, pl.pid,
               CASE WHEN {dot.format(n=dim, a="v.e", b="pl.p")} >= 0
                    THEN 1 ELSE 0 END AS bit
        FROM v, planes pl
    ),
    sigs AS (
        SELECT vec_id,
               CAST(SUM(CAST(bit AS BIGINT) << ({n_planes - 1} - pid))
                    AS BIGINT) AS sig
        FROM bits GROUP BY vec_id
    ),
    side AS (
        SELECT s.vec_id, v.e, s.sig >> {n_planes // 2} AS bucket
        FROM sigs s JOIN v USING (vec_id)
    ),
    cands AS (
        SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
               {qb_dot} / ({norm.format(a="q.e")} * {norm.format(a="b.e")})
                   AS cos
        FROM side q JOIN side b
          ON q.bucket = b.bucket AND q.vec_id != b.vec_id
        WHERE q.vec_id < {n_queries}
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id ASC)
                   AS rank
        FROM cands
    )
    SELECT query_id, neighbor_id, round(cos, 4) AS cosine_sim,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {k}
    ORDER BY query_id, rank
    """

@register(
    "knn_lsh",
    oracle=_lsh_oracle(),  # seed-derived planes inlined as literals
    tags=("similarity", "knn", "lsh"),
)
def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return knn.knn_lsh(
        load_table(spark, sf_dir, "embeddings"), n_queries=10, k=3
    )


@register(
    "embedding_near_dups",
    oracle="""
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               list_reduce(
                   list_transform(generate_series(1, len(a.e)),
                                  i -> a.e[i] * b.e[i]),
                   (x, y) -> x + y)
               / (sqrt(list_reduce(list_transform(a.e, x -> x * x),
                                   (x, y) -> x + y))
                  * sqrt(list_reduce(list_transform(b.e, x -> x * x),
                                     (x, y) -> x + y))) AS cos
        FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, round(cos, 4) AS cosine_sim
    FROM pairs
    WHERE cos >= 0.45
    ORDER BY vec_a, vec_b
    """,
    tags=("similarity", "dedup", "embedding"),
)
def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the last dedup modality):
    exact all-pairs at oracle scale; the LSH-bucketed path (knn_lsh)
    is the 100 TB candidate-generation strategy for the same check."""
    from ..similarity.knn import _as_double, cosine

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        _as_double(F.col("embedding")).alias("ea"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        _as_double(F.col("embedding")).alias("eb"),
    )
    cos = cosine(F.col("ea"), F.col("eb"))
    return (
        a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
        .filter(cos >= 0.45)  # filter before rounding (oracle parity)
        .select(
            "vec_a", "vec_b", F.round(cos, 4).alias("cosine_sim")
        )
        .orderBy("vec_a", "vec_b")
    )


@register(
    "knn_ivf",
    oracle=None,  # approximate by construction (k-means cells); recall
    # vs the exact brute-force baseline is asserted in tests instead
    tags=("similarity", "ann", "ivf", "scale"),
    bench=True,
)
def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed ANN (similarity/ivf.py): the bucketed scale path —
    each query scores only n_probe of n_cells index cells."""
    from ..similarity import ivf

    return ivf.knn_ivf(
        load_table(spark, sf_dir, "embeddings"),
        n_queries=10,
        k=3,
        n_cells=16,
        n_probe=4,
    )
