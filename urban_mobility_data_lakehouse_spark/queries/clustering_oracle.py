"""Generated DuckDB oracle for the deterministic k-means gold table.

`ml.clustering.deterministic_kmeans` is engineered so every arithmetic
step is bit-identical across engines (quantized profiles, DECIMAL
centroid sums, fixed fold order, lowest-cluster tie-break) — which
means DuckDB can recompute the FULL clustering, assignments included,
from plain SQL.  This module generates that SQL from the same
constants (k, iters, 24 hours) the Spark implementation uses, with the
Lloyd iterations unrolled as CTE pairs (assign_t, centroids_t).
"""

from __future__ import annotations

HOURS = list(range(24))


def _dist_sql(j: int) -> str:
    terms = [
        f"(v{h} - c{j}_{h}) * (v{h} - c{j}_{h})" for h in HOURS
    ]
    return "(" + " + ".join(terms) + ")"


def _assign_case(k: int) -> str:
    d = [_dist_sql(j) for j in range(k)]
    whens = []
    for j in range(k - 1):
        conds = " AND ".join(
            f"{d[j]} <= {d[m]}" for m in range(j + 1, k)
        )
        whens.append(f"WHEN {conds} THEN {j}")
    return "CASE " + " ".join(whens) + f" ELSE {k - 1} END"


def kmeans_with_body(k: int = 3, iters: int = 5) -> str:
    """The shared WITH-body (hourly … relabel CTEs, no `WITH` keyword)
    of the clustering replay: `kmeans_gold_oracle` appends the gold
    profile select, the polygon consultation (queries/domain.py)
    appends its own activity join.  The relabeled per-day assignment is
    `SELECT a.event_date, r.cluster_id FROM a{iters} a JOIN relabel r
    ON a.asg = r.asg`."""
    pivots = ",\n           ".join(
        f"coalesce(max(total) FILTER (WHERE hour = {h}), 0.0) AS p{h}"
        for h in HOURS
    )
    row_sum = "(" + " + ".join(f"p{h}" for h in HOURS) + ")"
    norms = ",\n           ".join(
        f"round(p{h} / rs, 6) AS v{h}" for h in HOURS
    )
    init_cols = ",\n           ".join(
        f"max(CASE WHEN rn = {j + 1} THEN v{h} END) AS c{j}_{h}"
        for j in range(k)
        for h in HOURS
    )
    assign = _assign_case(k)

    iter_ctes = []
    prev_c = "c0"
    for t in range(1, iters + 1):
        iter_ctes.append(
            f"a{t} AS (\n"
            f"    SELECT n.*, c.*, {assign} AS asg\n"
            f"    FROM norm n CROSS JOIN {prev_c} c\n"
            f")"
        )
        if t < iters:
            cent_cols = ",\n           ".join(
                f"coalesce(CAST(sum(CAST(v{h} AS DECIMAL(25,6))) "
                f"FILTER (WHERE asg = {j}) AS DOUBLE)"
                f" / sum(CASE WHEN asg = {j} THEN 1 END), "
                f"max(c{j}_{h})) AS c{j}_{h}"
                for j in range(k)
                for h in HOURS
            )
            iter_ctes.append(
                f"cent{t} AS (\n    SELECT {cent_cols}\n    FROM a{t}\n)"
            )
            prev_c = f"cent{t}"

    iters_sql = ",\n    ".join(iter_ctes)
    return f"""hourly AS (
        SELECT CAST(ts AS DATE) AS event_date, hour(ts) AS hour,
               CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total
        FROM events GROUP BY 1, 2
    ),
    wide AS (
        SELECT event_date,
           {pivots}
        FROM hourly GROUP BY 1
    ),
    norm AS (
        SELECT event_date,
           {norms}
        FROM (SELECT *, CASE WHEN {row_sum} = 0 THEN 1.0
                             ELSE {row_sum} END AS rs FROM wide)
    ),
    ranked AS (
        SELECT norm.*, row_number() OVER (ORDER BY event_date) AS rn
        FROM norm
    ),
    c0 AS (
        SELECT {init_cols}
        FROM ranked
    ),
    {iters_sql},
    sizes AS (
        SELECT asg, count(*) AS n_days, min(event_date) AS first_date
        FROM a{iters} GROUP BY 1
    ),
    relabel AS (
        SELECT asg,
               CAST(row_number() OVER (ORDER BY n_days DESC,
                                       first_date ASC) - 1 AS BIGINT)
                   AS cluster_id,
               n_days
        FROM sizes
    )"""


def kmeans_gold_oracle(k: int = 3, iters: int = 5) -> str:
    return f"""
    WITH {kmeans_with_body(k, iters)}
    SELECT cluster_id, hour,
           CAST((200 * su + 1000000 * n_rows)
                // (2000000 * n_rows) AS DOUBLE) / 100 AS avg_trips,
           CAST((su + 5000) // 10000 AS DOUBLE) / 100
               AS total_trips_sample,
           n_days
    FROM (
        SELECT r.cluster_id,
               CAST(h.hour AS BIGINT) AS hour,
               CAST(sum(CAST(round(h.total * 1000000, 0) AS BIGINT))
                    AS BIGINT) AS su,
               count(*) AS n_rows,
               max(r.n_days) AS n_days
        FROM hourly h
        JOIN a{iters} a ON h.event_date = a.event_date
        JOIN relabel r ON a.asg = r.asg
        GROUP BY 1, 2
    )
    ORDER BY cluster_id, hour
    """
