"""Similarity-search queries over the `embeddings` table.

The brute-force oracle reproduces Spark's exact fold order (left fold of
index-ordered products) so the doubles are bit-identical before rounding.
The LSH variant depends on seed-derived hyperplane constants → rows-only.
"""

from __future__ import annotations

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


@register(
    "knn_lsh",
    oracle=None,  # hyperplane constants are driver-side → rows-only check
    tags=("similarity", "knn", "lsh"),
)
def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return knn.knn_lsh(
        load_table(spark, sf_dir, "embeddings"), n_queries=10, k=3
    )
