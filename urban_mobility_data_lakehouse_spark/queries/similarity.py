"""Similarity-search queries over the `embeddings` table.

The brute-force oracle reproduces Spark's exact fold order (left fold of
index-ordered products) so the doubles are bit-identical before rounding.
The LSH variant depends on seed-derived hyperplane constants → rows-only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..similarity import knn
from ..sources.localrel import values_df
from ..sources.testdata import load_table
from . import register


# brute-force exact top-k cosine — the ANN baseline every approximate
# index is judged against.  Folded into ann_suite's 'brute' part (was
# the standalone knn_cosine registry row) to free a driver slot.
_BRUTE_ORACLE = """
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
    """


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

def _pq_oracle(
    sf_dir: str, n_queries: int = 10, k: int = 3
) -> str:
    """DuckDB replay of `knn_pq` (similarity/pq.py): the pyarrow twin
    trainer reproduces the codebooks bit-identically; they're inlined
    as VALUES literals; encode = per-(vec, subspace) argmin with the
    same squared-L2 fold and the same lowest-code tie-break; ADC = the
    per-subspace distances re-folded in subspace order (DuckDB's
    `list(dj ORDER BY j)` pins the fold order SUM would not); then the
    ADC-shortlist rows are re-ranked by exact squared L2 with the same
    index-ordered fold."""
    from ..similarity import pq

    books = pq.train_pq_from_parquet(sf_dir)
    dsub = len(books[0][0])
    dim = dsub * len(books)
    shortlist = pq.SHORTLIST
    values = ",\n        ".join(
        f"({j}, {c}, [{', '.join(repr(x) for x in cw)}])"
        for j, book in enumerate(books)
        for c, cw in enumerate(book)
    )
    sub_l2 = (
        f"list_reduce(list_transform(generate_series(1, {dsub}), "
        "i -> ({a}[{off} + i] - {cw}[i]) * ({a}[{off} + i] - {cw}[i])), "
        "(x, y) -> x + y)"
    )
    enc_l2 = sub_l2.format(a="v.e", off=f"cb.j * {dsub}", cw="cb.cw")
    adc_l2 = sub_l2.format(a="q.eq", off=f"cb.j * {dsub}", cw="cb.cw")
    full_l2 = (
        f"list_reduce(list_transform(generate_series(1, {dim}), "
        "i -> (q.eq[i] - b.e[i]) * (q.eq[i] - b.e[i])), "
        "(x, y) -> x + y)"
    )
    return f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    cb(j, c, cw) AS (VALUES
        {values}
    ),
    d2 AS (
        SELECT v.vec_id, cb.j, cb.c, {enc_l2} AS d
        FROM v, cb
    ),
    codes AS (
        SELECT vec_id, j, c AS code FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id, j
                                         ORDER BY d, c) AS rn
            FROM d2
        ) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, e AS eq FROM v WHERE vec_id < {n_queries}),
    parts AS (
        SELECT q.query_id, co.vec_id AS neighbor_id, co.j,
               {adc_l2} AS dj
        FROM q
        JOIN codes co ON co.vec_id != q.query_id
        JOIN cb ON cb.j = co.j AND cb.c = co.code
    ),
    adc AS (
        SELECT query_id, neighbor_id,
               list_reduce(list(dj ORDER BY j), (x, y) -> x + y) AS adc
        FROM parts GROUP BY query_id, neighbor_id
    ),
    short AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY adc ASC, neighbor_id ASC)
                      AS srank
            FROM adc
        ) WHERE srank <= {shortlist}
    ),
    rer AS (
        SELECT s.query_id, s.neighbor_id, {full_l2} AS l2
        FROM short s
        JOIN q ON q.query_id = s.query_id
        JOIN v b ON b.vec_id = s.neighbor_id
    )
    SELECT query_id, neighbor_id, round(l2, 4) AS l2_dist,
           CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY l2 ASC, neighbor_id ASC)
                  AS rank
        FROM rer
    )
    WHERE rank <= {k}
    """


def _ann_suite_oracle(sf_dir: str) -> str:
    """brute part (exact baseline) + lsh part (static, seed-derived
    planes) + pq part (data-derived codebooks) in one labeled union."""
    return f"""
    SELECT * FROM (
        SELECT 'brute' AS part, query_id, neighbor_id,
               cosine_sim AS score, rank
        FROM ({_BRUTE_ORACLE})
        UNION ALL
        SELECT 'lsh', query_id, neighbor_id, cosine_sim, rank
        FROM ({_lsh_oracle()})
        UNION ALL
        SELECT 'pq', query_id, neighbor_id, l2_dist, rank
        FROM ({_pq_oracle(sf_dir)})
    )
    ORDER BY part, query_id, rank
    """


@register(
    "ann_suite",
    oracle=_ann_suite_oracle,  # callable: pq codebooks are data-derived
    tags=("similarity", "knn", "lsh", "pq", "adc", "scale"),
    bench=True,  # inherits the folded knn_cosine's bench slot
)
def ann_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three ANN strategies in one labeled union (was the singleton
    `knn_lsh`, then absorbed `knn_cosine`; folded to keep the registry
    at 50):

    `brute`: exact top-k cosine over the full corpus (knn_bruteforce)
    — the baseline every approximate index is judged against; score =
    cosine.  `lsh`: random-hyperplane bucketed top-k cosine
    (knn.knn_lsh) — score = cosine similarity.  `pq`: product-
    quantization ADC top-k (similarity/pq.py) — the corpus is
    compressed to 16 codes/vector, scanned asymmetrically for a
    50-candidate shortlist, then re-ranked with exact math; score =
    exact squared L2 of the winners.  All oracles replay the exact
    seed-derived constants, so the driver hash-checks the full index
    geometry end-to-end."""
    from ..similarity import pq

    emb = load_table(spark, sf_dir, "embeddings")
    # ONE bounded collect of the query panel serves all three
    # strategies (each used to run its own scan+collect job).  No
    # fan_out here: every part scores inside a numpy mapInPandas
    # batch, and round-robin-splitting 2 000 rows across 32 tasks
    # costs a shuffle plus 32 Python crossings to parallelize ~1 ms
    # of arithmetic (measured 1.16 → 0.79 s on the brute part alone).
    q_rows = knn.collect_queries(emb, n_queries=10)
    brute = knn.knn_bruteforce(
        emb, n_queries=10, k=3, q_rows=q_rows
    ).select(
        F.lit("brute").alias("part"),
        "query_id",
        "neighbor_id",
        F.col("cosine_sim").alias("score"),
        "rank",
    )
    lsh = knn.knn_lsh(emb, n_queries=10, k=3, q_rows=q_rows).select(
        F.lit("lsh").alias("part"),
        "query_id",
        "neighbor_id",
        F.col("cosine_sim").alias("score"),
        "rank",
    )
    # codebooks via the pyarrow twin (bit-identical to the Spark-
    # sampled trainer, memoized per sf_dir) — skips the per-build
    # orderBy+limit+toPandas sampling job, the knn_ivf pattern
    pq_part = pq.knn_pq(
        emb, n_queries=10, k=3,
        codebooks=pq.train_pq_from_parquet(sf_dir),
        q_rows=q_rows,
    ).select(
        F.lit("pq").alias("part"),
        "query_id",
        "neighbor_id",
        F.col("l2_dist").alias("score"),
        "rank",
    )
    return brute.unionByName(lsh).unionByName(pq_part).orderBy(
        "part", "query_id", "rank"
    )


def _banded_near_dups_oracle(
    threshold: float = 0.45,
    n_planes: int = 16,
    n_bands: int = 4,
    seed: int = 42,
    dim: int = 64,
) -> str:
    """DuckDB replay of `banded_near_dups`: seed-derived planes inlined
    as exact literals → sign-bit signatures (same MSB-first packing) →
    r-bit band keys → DISTINCT candidate pairs sharing any band →
    exact cosine (same fold order) ≥ threshold."""
    from ..similarity.knn import hyperplanes

    r = n_planes // n_bands
    planes = hyperplanes(dim, n_planes, seed)
    values = ",\n        ".join(
        f"({i}, [{', '.join(repr(x) for x in p)}])"
        for i, p in enumerate(planes)
    )
    dot_vp = ("list_reduce(list_transform(generate_series(1, {n}), "
              "i -> {a}[i] * {b}[i]), (x, y) -> x + y)")
    norm = ("sqrt(list_reduce(list_transform({a}, x -> x * x), "
            "(x, y) -> x + y))")
    bands_list = ", ".join(str(b) for b in range(n_bands))
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
               CASE WHEN {dot_vp.format(n=dim, a="v.e", b="pl.p")} >= 0
                    THEN 1 ELSE 0 END AS bit
        FROM v, planes pl
    ),
    sigs AS (
        SELECT vec_id,
               CAST(SUM(CAST(bit AS BIGINT) << ({n_planes - 1} - pid))
                    AS BIGINT) AS sig
        FROM bits GROUP BY vec_id
    ),
    bands AS (
        SELECT vec_id, band,
               (sig >> (({n_bands - 1} - band) * {r})) & {(1 << r) - 1}
                   AS key
        FROM sigs CROSS JOIN (SELECT unnest([{bands_list}]) AS band)
    ),
    cands AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
    ),
    scored AS (
        SELECT c.vec_a, c.vec_b,
               {dot_vp.format(n=dim, a="va.e", b="vb.e")}
               / ({norm.format(a="va.e")} * {norm.format(a="vb.e")}) AS cos
        FROM cands c
        JOIN v va ON va.vec_id = c.vec_a
        JOIN v vb ON vb.vec_id = c.vec_b
    )
    SELECT vec_a, vec_b, round(cos, 4) AS cosine_sim
    FROM scored
    WHERE cos >= {threshold}
    ORDER BY vec_a, vec_b
    """


def _semdedup_oracle(
    sf_dir: str,
    threshold: float = 0.4,
    n_cells: int = 16,
    seed: int = 42,
) -> str:
    """DuckDB replay of `similarity/semdedup.semantic_dedup`: the
    pyarrow twin trainer reproduces the k-means centroids
    bit-identically (the knn_ivf contract); assignment uses the same
    sequential L2 fold and (distance, cell) tie-break; then the
    within-cluster prior-max-cosine drop rule is one self-join + one
    window, same as the Spark plan."""
    from ..similarity.ivf import train_centroids_from_parquet

    cents = train_centroids_from_parquet(sf_dir, n_cells=n_cells, seed=seed)
    dim = len(cents[0])
    values = ",\n        ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}])"
        for i, c in enumerate(cents)
    )
    l2 = (
        f"list_reduce(list_transform(generate_series(1, {dim}), "
        "i -> (v.e[i] - cc.c[i]) * (v.e[i] - cc.c[i])), (a, b) -> a + b)"
    )
    dot = (
        f"list_reduce(list_transform(generate_series(1, {dim}), "
        "i -> vb.e[i] * vp.e[i]), (a, b) -> a + b)"
    )
    norm = ("sqrt(list_reduce(list_transform({a}, x -> x * x), "
            "(x, y) -> x + y))")
    return f"""
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    cents(cell, c) AS (VALUES
        {values}
    ),
    assigned AS (
        SELECT vec_id, cell FROM (
            SELECT v.vec_id, cc.cell,
                   row_number() OVER (PARTITION BY v.vec_id
                                      ORDER BY {l2} ASC, cc.cell ASC) AS r
            FROM v, cents cc
        ) WHERE r = 1
    ),
    scored AS (
        SELECT b.vec_id, b.cell, p.vec_id AS prior_id,
               {dot} / ({norm.format(a="vb.e")} * {norm.format(a="vp.e")})
                   AS cos
        FROM assigned b
        JOIN assigned p ON p.cell = b.cell AND p.vec_id < b.vec_id
        JOIN v vb ON vb.vec_id = b.vec_id
        JOIN v vp ON vp.vec_id = p.vec_id
    )
    SELECT vec_id, cell, prior_id AS dup_of,
           round(cos, 4) AS max_prior_sim
    FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cos DESC, prior_id ASC) AS rn
        FROM scored
    )
    WHERE rn = 1 AND cos >= {threshold}
    ORDER BY vec_id
    """


def _ivfadc_oracle(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 3,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> str:
    """DuckDB replay of the PersistentIVFPQ (IVFADC) rerank query:
    the `_ivf_oracle` probe geometry (injected coarse centroids,
    sequential-fold L2 cell ranking) spliced into the `_pq_oracle`
    code/ADC/shortlist/re-rank flow (injected codebooks, per-subspace
    argmin with lowest-code tie-break, subspace-ordered ADC fold,
    exact squared-L2 re-rank) — candidates restricted to probed-cell
    matches instead of the full corpus."""
    from ..similarity import pq
    from ..similarity.ivf import train_centroids_from_parquet

    cents = train_centroids_from_parquet(
        sf_dir, n_cells=n_cells, seed=seed
    )
    books = pq.train_pq_from_parquet(sf_dir, seed=seed)
    dim = len(cents[0])
    dsub = len(books[0][0])
    shortlist = pq.SHORTLIST
    cent_vals = ",\n        ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}])"
        for i, c in enumerate(cents)
    )
    book_vals = ",\n        ".join(
        f"({j}, {c}, [{', '.join(repr(x) for x in cw)}])"
        for j, book in enumerate(books)
        for c, cw in enumerate(book)
    )
    cell_l2 = (
        f"list_reduce(list_transform(generate_series(1, {dim}), "
        "i -> (v.e[i] - cc.c[i]) * (v.e[i] - cc.c[i])), (a, b) -> a + b)"
    )
    sub_l2 = (
        f"list_reduce(list_transform(generate_series(1, {dsub}), "
        "i -> ({a}[{off} + i] - {cw}[i]) * ({a}[{off} + i] - {cw}[i])), "
        "(x, y) -> x + y)"
    )
    enc_l2 = sub_l2.format(a="v.e", off=f"cb.j * {dsub}", cw="cb.cw")
    adc_l2 = sub_l2.format(a="q.eq", off=f"cb.j * {dsub}", cw="cb.cw")
    full_l2 = (
        f"list_reduce(list_transform(generate_series(1, {dim}), "
        "i -> (q.eq[i] - b.e[i]) * (q.eq[i] - b.e[i])), "
        "(x, y) -> x + y)"
    )
    return f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    adc_cents(cell, c) AS (VALUES
        {cent_vals}
    ),
    cb(j, code, cw) AS (VALUES
        {book_vals}
    ),
    ranked_cells AS (
        SELECT v.vec_id, cc.cell,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {cell_l2} ASC,
                                           cc.cell ASC) AS r
        FROM v, adc_cents cc
    ),
    assigned AS (SELECT vec_id, cell FROM ranked_cells WHERE r = 1),
    probed AS (
        SELECT vec_id, cell FROM ranked_cells
        WHERE r <= {n_probe} AND vec_id < {n_queries}
    ),
    d2 AS (
        SELECT v.vec_id, cb.j, cb.code, {enc_l2} AS d
        FROM v, cb
    ),
    codes AS (
        SELECT vec_id, j, code FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id, j
                                         ORDER BY d, code) AS rn
            FROM d2
        ) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, e AS eq FROM v
          WHERE vec_id < {n_queries}),
    cands AS (
        SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id
        FROM probed p JOIN assigned a ON a.cell = p.cell
        WHERE a.vec_id != p.vec_id
    ),
    parts AS (
        SELECT c.query_id, c.neighbor_id, cb.j, {adc_l2} AS dj
        FROM cands c
        JOIN codes co ON co.vec_id = c.neighbor_id
        JOIN cb ON cb.j = co.j AND cb.code = co.code
        JOIN q ON q.query_id = c.query_id
    ),
    adc AS (
        SELECT query_id, neighbor_id,
               list_reduce(list(dj ORDER BY j), (x, y) -> x + y) AS adc
        FROM parts GROUP BY query_id, neighbor_id
    ),
    short AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY adc ASC,
                                                  neighbor_id ASC)
                      AS srank
            FROM adc
        ) WHERE srank <= {shortlist}
    ),
    rer AS (
        SELECT s.query_id, s.neighbor_id, {full_l2} AS l2
        FROM short s
        JOIN q ON q.query_id = s.query_id
        JOIN v b ON b.vec_id = s.neighbor_id
    )
    SELECT query_id, neighbor_id, round(l2, 4) AS l2_dist,
           CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY l2 ASC, neighbor_id ASC)
                  AS rank
        FROM rer
    )
    WHERE rank <= {k}
    """


def _embedding_dedup_oracle(sf_dir: str) -> str:
    """pair part (static, seed-derived planes) + drop part (SemDeDup,
    data-derived centroids) + adc part (PersistentIVFPQ rerank query,
    replayed from injected coarse centroids + codebooks) + serve part
    (PersistentIVF lifecycle —
    its contract is bit-identity with the in-memory IVF path, so the
    oracle is the same first-principles replay from injected frozen
    centroids; hash equality proves build → add → OPTIMIZE →
    partition-pruned query converges to the batch answer, the
    bm25_search 'index' pattern) in one labeled union."""
    return f"""
    SELECT * FROM (
        SELECT 'pair' AS part, vec_a, vec_b, cosine_sim AS score
        FROM ({_banded_near_dups_oracle()})
        UNION ALL
        SELECT 'drop', vec_id, dup_of, max_prior_sim
        FROM ({_semdedup_oracle(sf_dir)})
        UNION ALL
        SELECT 'serve', query_id, neighbor_id, cosine_sim
        FROM ({_ivf_oracle(sf_dir)})
        UNION ALL
        SELECT 'adc', query_id, neighbor_id, l2_dist
        FROM ({_ivfadc_oracle(sf_dir)})
        UNION ALL
        -- stream: the foreachBatch MERGE-by-vec_id streaming-ingest
        -- path (persistent_ivf.py streaming_ingest).  Its contract is
        -- convergence to the batch build, so the oracle IS the batch
        -- oracle — hash equality proves streaming-merge ≡ batch build
        SELECT 'stream', query_id, neighbor_id, cosine_sim
        FROM ({_ivf_oracle(sf_dir)})
        UNION ALL
        -- move: streaming ingest with reassign_moved=True, movers
        -- re-delivered with cell-changing embeddings; oracle = batch
        -- build over the FINAL corpus state + cardinality/new-cell
        -- audits, so hash equality proves the stale old-cell rows
        -- died and the movers landed where the quantizer says
        SELECT 'move', vec_a, vec_b, score
        FROM ({_ivf_move_oracle(sf_dir)})
        UNION ALL
        -- tape (r12): the COMPOSED mutation walk — build, add, DV
        -- delete, re-add-with-changed-embeddings over live vectors,
        -- derived additions, second delete, optimize — hash-equal to
        -- a fresh batch build over the SQL-folded final corpus plus a
        -- cardinality audit
        SELECT 'tape', vec_a, vec_b, score
        FROM ({_ivf_tape_oracle(sf_dir)})
    )
    ORDER BY part, vec_a, vec_b
    """


@register(
    "embedding_near_dups",
    oracle=_embedding_dedup_oracle,  # callable: SemDeDup centroids are
    # data-derived, resolved per sf_dir at ask-time
    tags=("similarity", "dedup", "embedding", "semdedup", "scale"),
)
def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space dedup, both modalities in one labeled union:

    `pair`: embedding-cosine near-duplicate pairs via banded
    random-hyperplane candidates + exact cosine verify — the checked
    path IS the 100 TB plan: an equi-join on (band, key), no all-pairs
    product anywhere (asserted by a plan test); score = cosine.
    `drop`: SemDeDup (similarity/semdedup.py) — k-means-bucketed
    semantic dedup; one row per dropped vector with vec_b = the
    surviving lower-id cluster-mate that caused the drop and score =
    that max prior cosine.
    `serve`: the PersistentIVF serving lifecycle (see
    `_persistent_ivf_serve`) — split-batch build/add against a frozen
    quantizer, OPTIMIZE, then a partition-pruned top-3 query for the
    first 10 vectors; vec_a = query, vec_b = neighbor, score = cosine.
    `stream`: the same index maintained by STREAMING ingest (see
    `_persistent_ivf_stream`) — two foreachBatch MERGE-by-vec_id
    micro-batches against the frozen quantizer; hash equality against
    the batch oracle proves streaming-merge ≡ batch build.
    `move`: streaming ingest that RE-DELIVERS vectors with
    cell-changing embeddings under `reassign_moved=True` (see
    `_persistent_ivf_move`) — hash equality against a batch build
    over the final corpus state (+ cardinality and landed-cell audit
    rows) proves stale old-cell rows are purged and no vec_id ever
    answers twice.
    `tape` (r12): the COMPOSED mutation walk (see
    `_persistent_ivf_tape`) — build → add → DV delete →
    re-add-with-donor-embeddings over live vectors → derived
    additions → second DV delete → optimize — hash-equal to a fresh
    batch build over the SQL-folded final corpus plus a cardinality
    audit; the interleaving the per-mutation parts can't see.
    All three oracles replay the exact geometry (inlined hyperplanes /
    bit-identical twin-trained centroids), so the driver hash-checks
    candidate sets, scores, drop decisions, and the persisted-index
    answers end-to-end."""
    from ..similarity.knn import banded_near_dups
    from ..similarity.semdedup import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = banded_near_dups(emb, threshold=0.45).select(
        F.lit("pair").alias("part"),
        "vec_a",
        "vec_b",
        F.col("cosine_sim").alias("score"),
    )
    drops = semantic_dedup(emb, threshold=0.4).select(
        F.lit("drop").alias("part"),
        F.col("vec_id").alias("vec_a"),
        F.col("dup_of").alias("vec_b"),
        F.col("max_prior_sim").alias("score"),
    )
    serve = _persistent_ivf_serve(spark, sf_dir).select(
        F.lit("serve").alias("part"),
        F.col("query_id").alias("vec_a"),
        F.col("neighbor_id").alias("vec_b"),
        F.col("cosine_sim").alias("score"),
    )
    adc = _persistent_ivfadc(spark, sf_dir).select(
        F.lit("adc").alias("part"),
        F.col("query_id").alias("vec_a"),
        F.col("neighbor_id").alias("vec_b"),
        F.col("l2_dist").alias("score"),
    )
    stream = _persistent_ivf_stream(spark, sf_dir).select(
        F.lit("stream").alias("part"),
        F.col("query_id").alias("vec_a"),
        F.col("neighbor_id").alias("vec_b"),
        F.col("cosine_sim").alias("score"),
    )
    move = _persistent_ivf_move(spark, sf_dir).select(
        F.lit("move").alias("part"),
        F.col("query_id").alias("vec_a"),
        F.col("neighbor_id").alias("vec_b"),
        F.col("cosine_sim").alias("score"),
    )
    tape = _persistent_ivf_tape(spark, sf_dir).select(
        F.lit("tape").alias("part"),
        F.col("query_id").alias("vec_a"),
        F.col("neighbor_id").alias("vec_b"),
        F.col("cosine_sim").alias("score"),
    )
    return (
        pairs.unionByName(drops)
        .unionByName(serve)
        .unionByName(adc)
        .unionByName(stream)
        .unionByName(move)
        .unionByName(tape)
        .orderBy("part", "vec_a", "vec_b")
    )


def _ivf_oracle(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 3,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    corpus_cte: str | None = None,
) -> str:
    """Generate the DuckDB oracle for knn_ivf at a given sf_dir.

    IVF is deterministic once the centroids are fixed, and the centroids
    ARE reproducible outside Spark: `train_centroids_from_parquet`
    (similarity/ivf.py) reads the same lowest-vec_id sample with pyarrow
    and runs the same seeded `lloyd`, yielding bit-identical float64
    centroids.  They are inlined as exact literals (repr round-trips
    doubles; the knn_lsh trick), then DuckDB replays the whole pipeline:
    sequential-fold L2 cell distances (same order as Spark's
    aggregate/zip_with, so ties and all), rank cells per vector
    (distance, cell id), assign = rank-1 cell, probe = first n_probe,
    candidate join on neighbor-cell ∈ query-probe, cosine re-rank.

    `corpus_cte` swaps the leading corpus definition (everything up to
    and including the `v(vec_id, e)` CTE) for a caller-supplied one —
    the mover-reassignment part replays the SAME pipeline over a
    corpus whose mover rows carry their donors' embeddings.
    """
    from ..similarity.ivf import train_centroids_from_parquet

    cents = train_centroids_from_parquet(
        sf_dir, n_cells=n_cells, seed=seed
    )
    dim = len(cents[0])
    values = ",\n        ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}])"
        for i, c in enumerate(cents)
    )
    # sequential left folds reproduce Spark's aggregate() order exactly
    l2 = (
        f"list_reduce(list_transform(generate_series(1, {dim}), "
        "i -> (v.e[i] - cc.c[i]) * (v.e[i] - cc.c[i])), (a, b) -> a + b)"
    )
    dot = (
        f"list_reduce(list_transform(generate_series(1, {dim}), "
        "i -> vq.e[i] * vb.e[i]), (a, b) -> a + b)"
    )
    norm = ("sqrt(list_reduce(list_transform({a}, x -> x * x), "
            "(x, y) -> x + y))")
    if corpus_cte is None:
        corpus_cte = """v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    )"""
    return f"""
    WITH {corpus_cte},
    cents(cell, c) AS (VALUES
        {values}
    ),
    ranked_cells AS (
        SELECT v.vec_id, cc.cell,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {l2} ASC, cc.cell ASC) AS r
        FROM v, cents cc
    ),
    assigned AS (
        SELECT vec_id, cell FROM ranked_cells WHERE r = 1
    ),
    probed AS (
        SELECT vec_id, cell FROM ranked_cells WHERE r <= {n_probe}
    ),
    cands AS (
        SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id
        FROM probed q JOIN assigned b ON q.cell = b.cell
        WHERE q.vec_id < {n_queries} AND b.vec_id != q.vec_id
    ),
    scored AS (
        SELECT c.query_id, c.neighbor_id,
               {dot} / ({norm.format(a="vq.e")} * {norm.format(a="vb.e")})
                   AS cos
        FROM cands c
        JOIN v vq ON vq.vec_id = c.query_id
        JOIN v vb ON vb.vec_id = c.neighbor_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id ASC)
                   AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, round(cos, 4) AS cosine_sim,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {k}
    ORDER BY query_id, rank
    """


@register(
    "knn_ivf",
    oracle=_ivf_oracle,  # callable: centroids are data-derived, so the
    # oracle is generated per sf_dir at ask-time
    tags=("similarity", "ann", "ivf", "scale"),
    bench=True,
)
def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed ANN (similarity/ivf.py): the bucketed scale path —
    each query scores only n_probe of n_cells index cells.

    The quantizer trains via the pyarrow twin (no Spark job; the same
    `lloyd` on the same sample → bit-identical centroids to the Spark
    trainer, which is also exactly what the DuckDB oracle inlines)."""
    from ..similarity import ivf

    cents = ivf.train_centroids_from_parquet(sf_dir, n_cells=16)
    return ivf.knn_ivf(
        load_table(spark, sf_dir, "embeddings"),
        n_queries=10,
        k=3,
        n_cells=16,
        n_probe=4,
        centroids=cents,
        query_rows=ivf.query_probes_from_parquet(
            sf_dir, cents, n_queries=10, n_probe=4
        ),
    )


def _persistent_ivf_serve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PersistentIVF lifecycle (similarity/persistent_ivf.py): the
    serving-path twin of `knn_ivf` — the index lives as a lakehouse
    table partitioned by cell, probes prune to partition directories.

    Exercises the FULL write path, not just a one-shot build: build()
    ingests the even vec_ids against an externally frozen quantizer
    (the pyarrow-trained centroids `knn_ivf` uses — FAISS
    train-on-sample semantics), add() appends the odd vec_ids against
    the same frozen geometry, optimize() re-clusters to one file per
    cell partition, and query() answers the same 10 queries through
    directory-level probe pruning.  Because assignment is row-local
    and deterministic, the split-batch ingest MUST converge to the
    batch answer — which the injected-centroid DuckDB oracle
    recomputes independently.

    Scale shape: ingest batches assign via one broadcast-centroid
    Arrow map (no shuffle) and commit partition-scoped; queries read
    n_probe/n_cells of the index directories no matter the corpus
    size; the collected probe-cell union is ≤ n_cells ints."""
    from ..similarity import ivf
    from ..similarity.persistent_ivf import PersistentIVF
    from ..sources.lakehouse import temp_lakehouse

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    cents = ivf.train_centroids_from_parquet(sf_dir, n_cells=16)
    with temp_lakehouse(prefix="umdl_ivf_idx_") as lake:
        idx = PersistentIVF(lake, n_cells=16, n_probe=4)
        idx.build(
            spark, emb.filter(F.col("vec_id") % 2 == 0), centroids=cents
        )
        idx.add(spark, emb.filter(F.col("vec_id") % 2 == 1))
        idx.optimize(spark)
        # |queries|×k-bounded result: eager checkpoint pins it so the
        # throwaway index files can be deleted before consumption
        out = idx.query(
            spark, emb.filter(F.col("vec_id") < 10), k=3
        ).localCheckpoint(eager=True)
    return out


def _persistent_ivf_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PersistentIVF maintained by STREAMING ingest: the
    foreachBatch-merge path (`persistent_ivf.py` `streaming_ingest`)
    driven end-to-end and hash-checked against the same
    injected-centroid DuckDB oracle as the batch lifecycle.

    The corpus arrives as a seed build (vec_id % 3 == 0) plus TWO
    micro-batches (% 3 == 1, % 3 == 2) delivered through a
    maxFilesPerTrigger=1 AvailableNow file stream into the
    MERGE-by-vec_id sink; optimize() then restores one file per cell
    and the same 10 queries run partition-pruned.  Because assignment
    against the frozen quantizer is deterministic and the sink merges
    (idempotent under crash-replay) rather than appends, the merged
    state MUST equal the batch build — which the oracle recomputes
    from first principles, so hash equality proves
    streaming-merge ≡ batch build.

    Scale shape: each micro-batch is one broadcast-centroid Arrow
    assignment + a merge that rewrites only the cell partitions
    present in the batch; stream state is the file-source checkpoint
    only (no in-memory index)."""
    import shutil
    import tempfile

    from ..similarity import ivf
    from ..similarity.persistent_ivf import PersistentIVF
    from ..sources.lakehouse import temp_lakehouse

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    cents = ivf.train_centroids_from_parquet(sf_dir, n_cells=16)
    aux = tempfile.mkdtemp(prefix="umdl_ivf_stream_")
    try:
        for k in (1, 2):
            emb.filter(F.col("vec_id") % 3 == k).coalesce(1).write.parquet(
                f"{aux}/in/slice{k}"
            )
        with temp_lakehouse(prefix="umdl_ivf_sidx_") as lake:
            idx = PersistentIVF(lake, n_cells=16, n_probe=4)
            idx.build(
                spark, emb.filter(F.col("vec_id") % 3 == 0),
                centroids=cents,
            )
            stream = (
                spark.readStream.schema(emb.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{aux}/in/slice*")
            )
            # availableNow guarantees termination; the bounded wait is
            # a hang backstop — a False return means the stream is
            # STILL RUNNING and proceeding would race optimize/rmtree
            # against live micro-batches (half-merged index, vanishing
            # files), so fail loudly instead
            assert idx.streaming_ingest(
                spark, stream, f"{aux}/ckpt"
            ).awaitTermination(600), "streaming ingest did not drain"
            idx.optimize(spark)
            out = idx.query(
                spark, emb.filter(F.col("vec_id") < 10), k=3
            ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(aux, ignore_errors=True)
    return out


def _mover_plan(
    sf_dir: str, n_movers: int = 4, n_cells: int = 16
) -> tuple[tuple[int, int, int], ...]:
    """Deterministic cross-cell mover plan: (mover, donor,
    expected_new_cell) triples, derived with the pyarrow twin (zero
    Spark jobs — the oracle generator calls this too).

    Movers are the first `n_movers` seed-slice ids (vec_id % 3 == 0,
    ≥ 10 so the query rows 0–9 keep their original embeddings); each
    donor is the first candidate whose embedding assigns to a
    DIFFERENT cell under the frozen quantizer, so re-delivering the
    mover with the donor's embedding is a guaranteed cross-cell move.
    The fold is the same sequential `acc += (x-y)*(x-y)` /
    first-minimum argmin as `assign_cells` and the SQL replay, so all
    three agree on every cell.  Bounded: 40 candidate rows × n_cells,
    memoized per sf_dir."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..similarity.ivf import train_centroids_from_parquet

    cached = _mover_plan_cache.get(sf_dir)
    if cached is not None:
        return cached
    cents = train_centroids_from_parquet(sf_dir, n_cells=n_cells)
    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    tbl = (
        tbl.filter(pc.greater_equal(tbl.column("vec_id"), 10))
        .sort_by("vec_id")
        .slice(0, 40)
    )
    cells: dict[int, int] = {}
    for vid, e in zip(
        tbl.column("vec_id").to_pylist(),
        tbl.column("embedding").to_pylist(),
    ):
        e = [float(x) for x in e]  # float32→float64 is exact
        best_d, best_c = None, -1
        for cell, c in enumerate(cents):
            acc = 0.0
            for x, y in zip(e, c):
                d = x - y
                acc += d * d
            if best_d is None or acc < best_d:
                best_d, best_c = acc, cell
        cells[int(vid)] = best_c
    movers = [v for v in sorted(cells) if v % 3 == 0][:n_movers]
    plan = []
    for m in movers:
        donor = next(
            v
            for v in sorted(cells)
            if v not in movers and cells[v] != cells[m]
        )
        plan.append((m, donor, cells[donor]))
    assert len(plan) == n_movers, "mover plan underfilled"
    out = tuple(plan)
    _mover_plan_cache[sf_dir] = out
    return out


_mover_plan_cache: dict[str, tuple[tuple[int, int, int], ...]] = {}


def _persistent_ivf_move(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PersistentIVF streaming ingest with CROSS-CELL MOVERS: the
    `reassign_moved=True` path (`persistent_ivf.py` `streaming_ingest`
    → `_moved_ids` → `delete_vecs`) driven end-to-end and hash-checked
    against a batch-build oracle over the FINAL corpus state.

    The seed build ingests vec_id % 3 == 0; micro-batch 1 delivers
    % 3 == 1; micro-batch 2 delivers % 3 == 2 PLUS re-deliveries of
    the `_mover_plan` movers carrying their donors' embeddings — each
    one assigns to a different cell than the row already in the index,
    so the plain merge would leave a stale twin in the old cell.  With
    the flag, the batch deletes its movers (deletion-vector commit,
    Bloom-pruned probe) before merging; after optimize() the index
    must hold every vec_id exactly once, movers in their new cells.

    Two audit rows make those invariants hash-checked, not asserted:
      (-1, count(*), count(DISTINCT vec_id))  — a surviving stale row
          breaks count(*) == corpus size;
      (-2, movers-found-in-expected-cell, n_movers) — the expected
          cells come from the pyarrow twin on the Spark side and are
          re-derived from the SQL fold on the oracle side, so hash
          equality also cross-checks the two assignment replicas.
    The 10-query top-3 rows then prove the moved index ANSWERS like a
    from-scratch build over the final state (queries 0–9 are never
    movers, so both sides query with original embeddings)."""
    import shutil
    import tempfile
    from functools import reduce

    from ..similarity import ivf
    from ..similarity.persistent_ivf import PersistentIVF
    from ..sources.lakehouse import temp_lakehouse

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    cents = ivf.train_centroids_from_parquet(sf_dir, n_cells=16)
    plan = _mover_plan(sf_dir)
    pairs = values_df(
        spark, [(m, d) for m, d, _ in plan], "mid long, donor long"
    )
    redelivered = pairs.join(emb, pairs.donor == emb.vec_id).select(
        F.col("mid").alias("vec_id"), "embedding"
    )
    aux = tempfile.mkdtemp(prefix="umdl_ivf_move_")
    try:
        emb.filter(F.col("vec_id") % 3 == 1).coalesce(1).write.parquet(
            f"{aux}/in/slice1"
        )
        emb.filter(F.col("vec_id") % 3 == 2).unionByName(
            redelivered
        ).coalesce(1).write.parquet(f"{aux}/in/slice2")
        with temp_lakehouse(prefix="umdl_ivf_midx_") as lake:
            idx = PersistentIVF(lake, n_cells=16, n_probe=4)
            idx.build(
                spark, emb.filter(F.col("vec_id") % 3 == 0),
                centroids=cents,
            )
            stream = (
                spark.readStream.schema(emb.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{aux}/in/slice*")
            )
            assert idx.streaming_ingest(
                spark, stream, f"{aux}/ckpt", reassign_moved=True
            ).awaitTermination(600), "streaming ingest did not drain"
            idx.optimize(spark)
            landed = reduce(
                lambda a, b: a | b,
                [
                    (F.col("vec_id") == F.lit(m))
                    & (F.col("cell") == F.lit(c))
                    for m, _, c in plan
                ],
            )
            audit = (
                lake.read(spark, idx.schema, idx.name)
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.count_distinct("vec_id").alias("nd"),
                    F.sum(F.when(landed, 1).otherwise(0)).alias("ok"),
                )
                .collect()[0]  # three scalars
            )
            audits = values_df(
                spark,
                [
                    (-1, int(audit["n"]), float(audit["nd"])),
                    (-2, int(audit["ok"]), float(len(plan))),
                ],
                "query_id long, neighbor_id long, cosine_sim double",
            )
            out = (
                idx.query(spark, emb.filter(F.col("vec_id") < 10), k=3)
                .select("query_id", "neighbor_id", "cosine_sim")
                .unionByName(audits)
                .localCheckpoint(eager=True)
            )
    finally:
        shutil.rmtree(aux, ignore_errors=True)
    return out


def _ivf_move_oracle(sf_dir: str, n_cells: int = 16) -> str:
    """Batch-build-over-final-state oracle for the mover part: the
    standard `_ivf_oracle` pipeline over a corpus whose mover rows
    carry their donors' embeddings (COALESCE through the inlined
    mover→donor map), plus the two audit rows — corpus cardinality
    recomputed from the table, mover cells re-derived from the SQL
    fold and matched against the twin-predicted cells."""
    from ..similarity.ivf import train_centroids_from_parquet

    plan = _mover_plan(sf_dir, n_cells=n_cells)
    pairs = ", ".join(f"({m}, {d})" for m, d, _ in plan)
    expect = ", ".join(f"({m}, {d}, {c})" for m, d, c in plan)
    donors = ", ".join(str(d) for d in sorted({d for _, d, _ in plan}))
    corpus_cte = f"""base AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    moved(mid, donor) AS (VALUES {pairs}),
    v AS (
        SELECT b.vec_id, COALESCE(d.e, b.e) AS e
        FROM base b
        LEFT JOIN moved m ON m.mid = b.vec_id
        LEFT JOIN base d ON d.vec_id = m.donor
    )"""
    cents = train_centroids_from_parquet(sf_dir, n_cells=n_cells)
    dim = len(cents[0])
    values = ",\n        ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}])"
        for i, c in enumerate(cents)
    )
    l2 = (
        f"list_reduce(list_transform(generate_series(1, {dim}), "
        "i -> (dv.e[i] - cc.c[i]) * (dv.e[i] - cc.c[i])), "
        "(a, b) -> a + b)"
    )
    return f"""
    SELECT query_id AS vec_a, neighbor_id AS vec_b,
           cosine_sim AS score
    FROM ({_ivf_oracle(sf_dir, n_cells=n_cells, corpus_cte=corpus_cte)})
    UNION ALL
    SELECT CAST(-1 AS BIGINT), CAST(count(*) AS BIGINT),
           CAST(count(DISTINCT vec_id) AS DOUBLE)
    FROM embeddings
    UNION ALL
    SELECT CAST(-2 AS BIGINT), CAST(count(*) AS BIGINT),
           CAST({len(plan)} AS DOUBLE)
    FROM (
        WITH dv AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE))
                       AS e
            FROM embeddings WHERE vec_id IN ({donors})
        ),
        cents(cell, c) AS (VALUES
        {values}
        ),
        dc AS (
            SELECT dv.vec_id, cc.cell,
                   row_number() OVER (PARTITION BY dv.vec_id
                                      ORDER BY {l2} ASC, cc.cell ASC)
                       AS r
            FROM dv, cents cc
        ),
        expect(mover, donor, xcell) AS (VALUES {expect})
        SELECT e.mover
        FROM expect e
        JOIN dc ON dc.vec_id = e.donor AND dc.r = 1
               AND dc.cell = e.xcell
    )
    """


# r12 composed-tape constants (the IVF twin of bm25_search's 'tape'):
# deletes keep query rows 0-9 intact, derived additions land clear of
# the base id space, and every modulus is mirrored in the SQL fold.
_TAPE_DEL_MOD, _TAPE_DEL_REM = 23, 7
_TAPE_ADD_MOD, _TAPE_ADD_REM = 17, 3
_TAPE_DEL2_MOD, _TAPE_DEL2_REM = 5, 1
_TAPE_VOFF = 1_000_000


def _persistent_ivf_tape(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COMPOSED PersistentIVF mutation tape: the per-mutation parts
    (serve/stream/move) each prove one contract alone; this part
    proves their INTERLEAVING — the state a production index actually
    lives in.  Fixed six-step walk against the frozen quantizer:

      1. build(evens)               — cell-partitioned base
      2. add(odds)                  — additive commit, full corpus
      3. delete_vecs(%23==7, ≥10)   — DV erasure over both generations
      4. add(movers, replace_existing=True) — re-adds with DONOR
         embeddings; some movers were just deleted (re-add-after-
         delete), all change cells (DV-delete-then-append over live
         deletion vectors)
      5. add(derived: vec_id+1e6 for %17==3, minus the %5==1 subset
         deleted right after as a second DV commit)
      6. optimize()                 — materializes every vector,
         re-clusters one file per cell

    then the 10-query top-3 plus a cardinality audit row (-1,
    count(*), count(DISTINCT vec_id)) must hash-equal a fresh batch
    build over the SQL-folded final corpus — a stale old-cell twin, a
    resurrected deleted row, or a lost derived addition all break the
    hash.  Queries 0-9 never mutate, so both sides query with
    original embeddings."""
    from ..similarity import ivf
    from ..similarity.persistent_ivf import PersistentIVF
    from ..sources.lakehouse import temp_lakehouse

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    cents = ivf.train_centroids_from_parquet(sf_dir, n_cells=16)
    plan = _mover_plan(sf_dir)
    pairs = values_df(
        spark, [(m, d) for m, d, _ in plan], "mid long, donor long"
    )
    redelivered = pairs.join(emb, pairs.donor == emb.vec_id).select(
        F.col("mid").alias("vec_id"), "embedding"
    )
    with temp_lakehouse(prefix="umdl_ivf_tape_") as lake:
        idx = PersistentIVF(lake, n_cells=16, n_probe=4)
        idx.build(
            spark, emb.filter(F.col("vec_id") % 2 == 0),
            centroids=cents,
        )
        idx.add(spark, emb.filter(F.col("vec_id") % 2 == 1))
        del_ids = [
            int(r[0])
            for r in emb.filter(
                (F.col("vec_id") % _TAPE_DEL_MOD == _TAPE_DEL_REM)
                & (F.col("vec_id") >= 10)
            )
            .select("vec_id")
            .collect()
        ]
        idx.delete_vecs(spark, del_ids)
        idx.add(spark, redelivered, replace_existing=True)
        derived = emb.filter(
            F.col("vec_id") % _TAPE_ADD_MOD == _TAPE_ADD_REM
        ).select(
            (F.col("vec_id") + _TAPE_VOFF).alias("vec_id"),
            "embedding",
        )
        idx.add(spark, derived)
        del2_ids = [
            int(r[0]) + _TAPE_VOFF
            for r in emb.filter(
                (F.col("vec_id") % _TAPE_ADD_MOD == _TAPE_ADD_REM)
                & (F.col("vec_id") % _TAPE_DEL2_MOD == _TAPE_DEL2_REM)
            )
            .select("vec_id")
            .collect()
        ]
        if del2_ids:
            idx.delete_vecs(spark, del2_ids)
        idx.optimize(spark)
        audit = (
            lake.read(spark, idx.schema, idx.name)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count_distinct("vec_id").alias("nd"),
            )
            .collect()[0]  # two scalars
        )
        audits = values_df(
            spark,
            [(-1, int(audit["n"]), float(audit["nd"]))],
            "query_id long, neighbor_id long, cosine_sim double",
        )
        out = (
            idx.query(spark, emb.filter(F.col("vec_id") < 10), k=3)
            .select("query_id", "neighbor_id", "cosine_sim")
            .unionByName(audits)
            .localCheckpoint(eager=True)
        )
    return out


def _ivf_tape_corpus_cte(sf_dir: str) -> str:
    """The tape's folded final corpus as the `_ivf_oracle` corpus_cte:
    movers carry donor embeddings and survive (step 4 re-adds them
    after any step-3 deletion); other %23==7 ids ≥ 10 are gone;
    derived +1e6 copies of the %17==3 rows exist minus the %5==1
    subset."""
    plan = _mover_plan(sf_dir)
    pairs = ", ".join(f"({m}, {d})" for m, d, _ in plan)
    return f"""base AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    moved(mid, donor) AS (VALUES {pairs}),
    v AS (
        SELECT vec_id, e FROM (
            SELECT b.vec_id, COALESCE(d.e, b.e) AS e,
                   m.mid IS NOT NULL AS is_mover
            FROM base b
            LEFT JOIN moved m ON m.mid = b.vec_id
            LEFT JOIN base d ON d.vec_id = m.donor
        )
        WHERE is_mover
           OR NOT (vec_id % {_TAPE_DEL_MOD} = {_TAPE_DEL_REM}
                   AND vec_id >= 10)
        UNION ALL
        SELECT vec_id + {_TAPE_VOFF}, e FROM base
        WHERE vec_id % {_TAPE_ADD_MOD} = {_TAPE_ADD_REM}
          AND vec_id % {_TAPE_DEL2_MOD} != {_TAPE_DEL2_REM}
    )"""


def _ivf_tape_oracle(sf_dir: str) -> str:
    """Fresh-batch-build oracle over the folded tape corpus, plus the
    cardinality audit recomputed from the same fold (count ==
    distinct-count pins no-vector-answers-twice AND nothing lost)."""
    cte = _ivf_tape_corpus_cte(sf_dir)
    return f"""
    SELECT query_id AS vec_a, neighbor_id AS vec_b,
           cosine_sim AS score
    FROM ({_ivf_oracle(sf_dir, corpus_cte=cte)})
    UNION ALL
    SELECT CAST(-1 AS BIGINT), CAST(count(*) AS BIGINT),
           CAST(count(DISTINCT vec_id) AS DOUBLE)
    FROM (WITH {cte} SELECT vec_id FROM v)
    """


def _persistent_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PersistentIVFPQ (IVFADC) rerank query: the FAISS production
    composition as lakehouse tables — IVF cells for probe pruning ×
    PQ codes for storage (the index persists (vec_id, cell, codes)
    and nothing else), queried probe-pruned with ADC over the codes,
    then exact squared-L2 re-rank against the full-vector corpus
    (the refine stage).  Deterministic end-to-end, so the DuckDB twin
    replays it from the injected coarse centroids + codebooks.

    Scale shape: the index tier stores ~25×-compressed codes; query
    reads n_probe/n_cells partition dirs; ADC is a row-local fold
    against a broadcast codebook; the shortlist (50/query) bounds the
    exact re-rank."""
    from ..similarity.persistent_ivf import PersistentIVFPQ
    from ..sources.lakehouse import temp_lakehouse

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    from ..similarity import pq as _pq
    from ..similarity.ivf import train_centroids_from_parquet

    with temp_lakehouse(prefix="umdl_ivfpq_idx_") as lake:
        idx = PersistentIVFPQ(lake, n_cells=16, n_probe=4)
        # quantizers from the memoized pyarrow twins (no Spark jobs;
        # bit-identical to the in-engine trainers and to what the
        # oracle inlines)
        idx.build(
            spark,
            emb,
            centroids=train_centroids_from_parquet(sf_dir, n_cells=16),
            codebooks=_pq.train_pq_from_parquet(sf_dir),
        )
        out = idx.query(
            spark,
            emb.filter(F.col("vec_id") < 10),
            k=3,
            rerank_source=emb,
        ).localCheckpoint(eager=True)
    return out
