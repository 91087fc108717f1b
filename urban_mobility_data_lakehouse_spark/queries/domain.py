"""Domain analytics queries — the reference's gold layer re-expressed
over the synthetic star schema (nations play the role of mobility zones,
customer→supplier flows play origin→destination trips).

Covers: gravity-model infrastructure gaps (mobility_ingestion_pipeline.py
:817-852 + notebook v3 richer schema), haversine distance matrix,
bbox-filtered consultation top-k (mobility_consultations.py:126-167),
and the typical-day KMeans pipeline (U1–U4, rows-only check — clustering
is not SQL-expressible).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import broadcast

from ..functions.spatial import (
    haversine_km,
    haversine_km_sql,
    point_in_bbox,
    point_in_polygon,
    polygon_intersects_wkt,
    polygon_intersects_wkt_sql,
    synthetic_centroid_lat,
    synthetic_centroid_lon,
    synthetic_centroid_sql,
    wkt_coords_sql,
)
from ..operators.relational import davg, dsum, micro_units
from ..sources.testdata import load_table
from . import register

# Shared SQL fragments so the DuckDB oracle and any spark.sql variant are
# generated from one source of truth.
_LON_O, _LAT_O = synthetic_centroid_sql("z1.n_nationkey")
_LON_D, _LAT_D = synthetic_centroid_sql("z2.n_nationkey")
_DIST_SQL = haversine_km_sql(_LAT_O, _LON_O, _LAT_D, _LON_D)
# trig functions differ by ulps between the JVM and libm — round the
# distance to 4 decimals BEFORE it feeds any downstream formula so both
# engines compute from identical inputs
_DIST_R = f"round({_DIST_SQL}, 4)"

_GRAVITY_ORACLE = f"""
WITH od_pairs AS (
    SELECT c_nationkey AS org_zone_id, s_nationkey AS dest_zone_id,
           CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)
               AS total_actual_trips
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN supplier ON l_suppkey  = s_suppkey
    GROUP BY 1, 2
), zone_metrics AS (
    SELECT c_nationkey AS zone_id,
           count(*) AS population,
           -- no intermediate rounding: the decimal sum already makes this
           -- deterministic, and round() at a half-boundary differs between
           -- engines (BigDecimal HALF_UP vs scaled-double rounding)
           CAST(sum(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
               / count(c_acctbal) AS rent
    FROM customer GROUP BY 1
)
SELECT CAST(p.org_zone_id AS BIGINT) AS org_zone_id,
       CAST(p.dest_zone_id AS BIGINT) AS dest_zone_id,
       round(p.total_actual_trips, 2) AS total_actual_trips,
       {_DIST_R} AS geographic_distance_km,
       round((mo.population * md.population * ((mo.rent + md.rent) / 2))
             / pow(greatest(0.5, {_DIST_R}), 2), 6)
           AS estimated_potential_trips,
       round(p.total_actual_trips /
             nullif((mo.population * md.population * ((mo.rent + md.rent) / 2))
                    / pow(greatest(0.5, {_DIST_R}), 2), 0), 6)
           AS mismatch_ratio
FROM od_pairs p
JOIN zone_metrics mo ON p.org_zone_id  = mo.zone_id
JOIN zone_metrics md ON p.dest_zone_id = md.zone_id
JOIN nation z1 ON p.org_zone_id  = z1.n_nationkey
JOIN nation z2 ON p.dest_zone_id = z2.n_nationkey
ORDER BY org_zone_id, dest_zone_id
"""


def _gravity_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gravity model as a DataFrame plan.

    Scale shape (deliberate, per SURVEY §4 'pre-aggregation before join'):
    the fact is aggregated to OD pairs FIRST (zones² rows at most), then
    enriched with broadcast dim joins — Catalyst will not push an agg
    through a join on its own, so the plan is authored pre-aggregated.

    Plan-building is side-effect-free: the builder ATTACHES the
    bucketed orderkey layout `prepare`/`ensure_bucketed_facts` built
    (bench.py and scale_curve.py pay that one-time CTAS in warmup and
    report it as `layout_build_sec`); an unprepared session falls back
    to the plain parquet facts — same rows, one orderkey shuffle.
    """
    # The lineitem×orders orderkey join is FACT×FACT — the one join in
    # the registry that cannot broadcast.  Done naively it shuffles the
    # whole fact (the weak-scaling curve measured it as gravity's
    # dominant term at ×100: a full 60M-row exchange).  The 100 TB way
    # is write-time co-location: both facts live bucketed on orderkey
    # (ensure_bucketed_facts — the same layout bucketed_fact_join
    # proves zero-exchange), so the join needs NO shuffle and the OD
    # pre-agg's groupBy ships only map-side partials.  Column pruning
    # keeps each scan at exactly the columns used here.  Exact integer
    # micro-unit accumulation (operators/relational.micro_units) keeps
    # the sum order-independent, so physical layout cannot move the
    # oracle hash.
    from .functions_suite import attach_bucketed_facts

    names = attach_bucketed_facts(spark, sf_dir)
    if names is not None:
        lineitem, orders = (spark.table(n) for n in names)
    else:
        lineitem = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_suppkey", "l_quantity"
        )
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey"
        )
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    od_pairs = (
        lineitem.hint("MERGE")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("c_nationkey").alias("org_zone_id"),
            F.col("s_nationkey").alias("dest_zone_id"),
        )
        .agg(dsum("l_quantity").alias("total_actual_trips"))
    )
    zone_metrics = customer.groupBy(
        F.col("c_nationkey").alias("zone_id")
    ).agg(
        F.count(F.lit(1)).alias("population"),
        davg("c_acctbal").alias("rent"),
    )
    mo = zone_metrics.select(
        F.col("zone_id").alias("mo_zone"),
        F.col("population").alias("pop_o"),
        F.col("rent").alias("rent_o"),
    )
    md = zone_metrics.select(
        F.col("zone_id").alias("md_zone"),
        F.col("population").alias("pop_d"),
        F.col("rent").alias("rent_d"),
    )
    zones = nation.select(
        F.col("n_nationkey").alias("zkey"),
        synthetic_centroid_lon(F.col("n_nationkey")).alias("lon"),
        synthetic_centroid_lat(F.col("n_nationkey")).alias("lat"),
    )
    z1 = zones.select(
        F.col("zkey").alias("z1_key"),
        F.col("lon").alias("lon_o"),
        F.col("lat").alias("lat_o"),
    )
    z2 = zones.select(
        F.col("zkey").alias("z2_key"),
        F.col("lon").alias("lon_d"),
        F.col("lat").alias("lat_d"),
    )

    # round the distance before any downstream use — JVM vs libm trig
    # differ in the last ulps, and pow() amplifies that past round(…, 6)
    dist = F.round(
        haversine_km(
            F.col("lat_o"), F.col("lon_o"), F.col("lat_d"), F.col("lon_d")
        ),
        4,
    )
    # identical association order to the oracle: (pop_o * pop_d * avg_rent)
    potential = (
        F.col("pop_o") * F.col("pop_d") * ((F.col("rent_o") + F.col("rent_d")) / 2)
    ) / F.pow(F.greatest(F.lit(0.5), dist), 2)

    return (
        od_pairs.join(broadcast(mo), F.col("org_zone_id") == F.col("mo_zone"))
        .join(broadcast(md), F.col("dest_zone_id") == F.col("md_zone"))
        .join(broadcast(z1), F.col("org_zone_id") == F.col("z1_key"))
        .join(broadcast(z2), F.col("dest_zone_id") == F.col("z2_key"))
        .select(
            F.col("org_zone_id").cast("long").alias("org_zone_id"),
            F.col("dest_zone_id").cast("long").alias("dest_zone_id"),
            F.round(F.col("total_actual_trips"), 2).alias("total_actual_trips"),
            dist.alias("geographic_distance_km"),
            F.round(potential, 6).alias("estimated_potential_trips"),
            F.round(
                F.col("total_actual_trips")
                / F.nullif(potential, F.lit(0)), 6
            ).alias("mismatch_ratio"),
        )
    )


@register(
    "gravity_gaps",
    oracle=_GRAVITY_ORACLE,
    tags=("J7", "A10", "spatial", "gold"),
    bench=True,
)
def gravity_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _gravity_frame(spark, sf_dir).orderBy("org_zone_id", "dest_zone_id")


_BBOX = (-8.0, 36.5, 0.5, 41.0)  # fixed consultation parameter

@register(
    "consult_gaps_bbox",
    oracle=f"""
    WITH gaps AS ({_GRAVITY_ORACLE.replace("ORDER BY org_zone_id, dest_zone_id", "")})
    SELECT g.org_zone_id, g.dest_zone_id, g.total_actual_trips,
           g.geographic_distance_km, g.estimated_potential_trips,
           g.mismatch_ratio
    FROM gaps g JOIN nation z1 ON g.org_zone_id = z1.n_nationkey
    WHERE {_LON_O} BETWEEN {_BBOX[0]} AND {_BBOX[2]}
      AND {_LAT_O} BETWEEN {_BBOX[1]} AND {_BBOX[3]}
      AND g.mismatch_ratio IS NOT NULL
    ORDER BY g.mismatch_ratio ASC, g.org_zone_id, g.dest_zone_id
    LIMIT 10
    """,
    tags=("J9", "O2", "consultation"),
)
def consult_gaps_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serving-side consultation (mobility_consultations.py:126-167):
    worst infrastructure gaps whose origin centroid falls inside the
    caller's polygon — bbox variant, oracle-checkable.  Ascending
    mismatch = most-underserved first, as in the reference."""
    gaps = _gravity_frame(spark, sf_dir)
    key = F.col("org_zone_id").cast("int")
    in_box = point_in_bbox(
        synthetic_centroid_lon(key), synthetic_centroid_lat(key), *_BBOX
    )
    return (
        gaps.filter(in_box & F.col("mismatch_ratio").isNotNull())
        .orderBy(
            F.col("mismatch_ratio").asc(), "org_zone_id", "dest_zone_id"
        )
        .limit(10)
    )


def haversine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-centroid distance matrix — st_distance_spheroid parity unit
    (upper triangle only; the theta-join exercises range predicates).
    Folded into `spatial_suite`'s `dist` part (was a standalone
    registry row) to free a driver slot."""
    nation = load_table(spark, sf_dir, "nation")
    z1 = nation.select(
        F.col("n_nationkey").alias("ka"),
        synthetic_centroid_lon(F.col("n_nationkey")).alias("lon_a"),
        synthetic_centroid_lat(F.col("n_nationkey")).alias("lat_a"),
    )
    z2 = nation.select(
        F.col("n_nationkey").alias("kb"),
        synthetic_centroid_lon(F.col("n_nationkey")).alias("lon_b"),
        synthetic_centroid_lat(F.col("n_nationkey")).alias("lat_b"),
    )
    return (
        z1.join(z2, F.col("ka") < F.col("kb"))
        .select(
            F.col("ka").cast("long").alias("zone_a"),
            F.col("kb").cast("long").alias("zone_b"),
            F.round(
                haversine_km(
                    F.col("lat_a"), F.col("lon_a"),
                    F.col("lat_b"), F.col("lon_b"),
                ),
                4,
            ).alias("distance_km"),
        )
        .orderBy("zone_a", "zone_b")
    )


# --- polygon × polygon ST_Intersects consultation -------------------------

def _zone_wkt(key: int) -> str:
    """Deterministic hexagonal zone polygon around the synthetic
    centroid (radius varies by key so some zones straddle the query
    polygon's border).  Coordinates are formatted to 6 decimals so the
    Spark side and the DuckDB oracle parse byte-identical WKT."""
    import math

    cx = -9.5 + (key % 10) * 1.3
    cy = 36.0 + (key // 10) * 1.7 + (key % 3) * 0.4
    r = 0.45 + (key % 4) * 0.35
    pts = [
        (cx + r * math.cos(math.radians(a)),
         cy + r * math.sin(math.radians(a)))
        for a in range(0, 360, 60)
    ]
    pts.append(pts[0])
    body = ", ".join(f"{x:.6f} {y:.6f}" for x, y in pts)
    return f"POLYGON(({body}))"


# the consultation parameter: a simple (non-convex) pentagon over the
# synthetic zone grid — chosen so several zones intersect only through
# an edge (centroid outside), which is exactly the border-zone case the
# centroid approximation gets wrong
_QUERY_POLY = [
    (-6.0, 36.2),
    (-1.0, 35.8),
    (0.8, 38.5),
    (-2.5, 40.2),
    (-5.5, 39.0),
]

_ZONE_WKTS = [(k, _zone_wkt(k)) for k in range(25)]


def _point_in_const_sql() -> str:
    """Centroid-in-query-polygon as SQL (count-parity ray cast against
    the constant polygon; same branch math as point_in_polygon)."""
    lon, lat = synthetic_centroid_sql("zone_key")
    nq = len(_QUERY_POLY)
    terms = []
    for j in range(nq):
        x1, y1 = _QUERY_POLY[j]
        x2, y2 = _QUERY_POLY[(j + 1) % nq]
        if y1 == y2:
            continue
        terms.append(
            f"CASE WHEN (({y1} > {lat}) != ({y2} > {lat})) AND "
            f"({lon} < ({x2} - ({x1})) * ({lat} - ({y1})) / "
            f"({y2} - ({y1})) + ({x1})) THEN 1 ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ") % 2 = 1"


@register(
    "spatial_suite",
    oracle=f"""
    WITH zones(zone_key, wkt) AS (VALUES {", ".join(
        f"({k}, '{w}')" for k, w in _ZONE_WKTS
    )}),
    parsed AS (
        SELECT zone_key, wkt,
               {wkt_coords_sql('wkt', 1)} AS xx,
               {wkt_coords_sql('wkt', 2)} AS yy
        FROM zones
    ),
    flags AS (
        SELECT zone_key,
               ({polygon_intersects_wkt_sql('xx', 'yy', _QUERY_POLY)})
                   AS intersects,
               ({_point_in_const_sql()}) AS centroid_inside
        FROM parsed
    )
    SELECT * FROM (
        SELECT 'poly' AS part,
               CAST(f.zone_key AS BIGINT) AS zone_a,
               CAST(NULL AS BIGINT) AS zone_b,
               n.n_name AS zone_name,
               f.intersects,
               f.centroid_inside,
               (f.intersects AND NOT f.centroid_inside) AS border_zone,
               coalesce(c.n_customers, 0) AS n_customers,
               CAST(NULL AS DOUBLE) AS distance_km
        FROM flags f
        JOIN nation n ON f.zone_key = n.n_nationkey
        LEFT JOIN (SELECT c_nationkey, count(*) AS n_customers
                   FROM customer GROUP BY 1) c
          ON c.c_nationkey = f.zone_key
        UNION ALL
        SELECT 'dist',
               CAST(z1.n_nationkey AS BIGINT),
               CAST(z2.n_nationkey AS BIGINT),
               CAST(NULL AS VARCHAR), CAST(NULL AS BOOLEAN),
               CAST(NULL AS BOOLEAN), CAST(NULL AS BOOLEAN),
               CAST(NULL AS BIGINT),
               round({_DIST_SQL}, 4)
        FROM nation z1 JOIN nation z2
          ON z1.n_nationkey < z2.n_nationkey
    )
    ORDER BY part, zone_a, zone_b
    """,
    tags=("J9", "J5", "spatial", "consultation"),
)
def spatial_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two spatial consultations in one labeled union (the former
    `consult_polygon_intersects` plus the folded `haversine_pairs`,
    merged to free a driver slot):

    `poly`: true polygon×polygon ST_Intersects consultation
    (mobility_consultations.py:66-68,153-154 filters zone POLYGONS
    against the query polygon): every zone is flagged with the full
    intersection test AND the centroid approximation, exposing the
    border zones where the two disagree.  All pure Column exprs —
    WKT parse via regexp, ray-cast + edge-crossing via higher-order
    array functions; the zone dim is broadcast.
    `dist`: the zone-centroid haversine distance matrix (upper
    triangle; st_distance_spheroid parity unit) — zone_a/zone_b ids
    with distance_km."""
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    from ..sources.localrel import values_df

    zones = values_df(spark, _ZONE_WKTS, "zone_key int, wkt string")
    key = F.col("zone_key")
    flags = zones.select(
        key.cast("long").alias("zone_id"),
        polygon_intersects_wkt(F.col("wkt"), _QUERY_POLY).alias(
            "intersects"
        ),
        point_in_polygon(
            synthetic_centroid_lon(key),
            synthetic_centroid_lat(key),
            _QUERY_POLY,
        ).alias("centroid_inside"),
    )
    per_zone = customer.groupBy(
        F.col("c_nationkey").alias("ckey")
    ).agg(F.count(F.lit(1)).alias("n_customers"))
    null_b = F.lit(None).cast("boolean")
    poly_part = (
        broadcast(flags)
        .join(
            broadcast(nation),
            F.col("zone_id") == F.col("n_nationkey"),
        )
        .join(per_zone, F.col("zone_id") == F.col("ckey"), "left")
        .select(
            F.lit("poly").alias("part"),
            F.col("zone_id").alias("zone_a"),
            F.lit(None).cast("long").alias("zone_b"),
            F.col("n_name").alias("zone_name"),
            "intersects",
            "centroid_inside",
            (F.col("intersects") & ~F.col("centroid_inside")).alias(
                "border_zone"
            ),
            F.coalesce(F.col("n_customers"), F.lit(0)).alias(
                "n_customers"
            ),
            F.lit(None).cast("double").alias("distance_km"),
        )
    )
    dist_part = haversine_pairs(spark, sf_dir).select(
        F.lit("dist").alias("part"),
        "zone_a",
        "zone_b",
        F.lit(None).cast("string").alias("zone_name"),
        null_b.alias("intersects"),
        null_b.alias("centroid_inside"),
        null_b.alias("border_zone"),
        F.lit(None).cast("long").alias("n_customers"),
        "distance_km",
    )
    return poly_part.unionByName(dist_part).orderBy(
        "part", "zone_a", "zone_b"
    )


from .clustering_oracle import kmeans_with_body  # noqa: E402

# the consultation's date-range parameter (a strict subset of the
# fixtures' 2024-01-01..2024-01-30 span, so the BETWEEN actually cuts)
_CONSULT_START, _CONSULT_END = "2024-01-03", "2024-01-27"


def _clusters_with_consult_oracle(k: int = 3, iters: int = 5) -> str:
    """Gold profile + polygon consultation over ONE clustering replay:
    the `consult` part joins polygon-filtered activity (zones = user_id
    % 25 with synthetic centroids, same membership math as
    spatial_suite's centroid_inside) to the per-day assignments and
    re-aggregates to an hourly per-cluster profile — the reference's
    flagship serving entry point (mobility_consultations.py:27-124)."""
    zone_values = ", ".join(f"({z})" for z in range(25))
    return f"""
    WITH {kmeans_with_body(k, iters)},
    assignments AS (
        SELECT a.event_date, r.cluster_id
        FROM a{iters} a JOIN relabel r ON a.asg = r.asg
    ),
    zones(zone_key) AS (VALUES {zone_values}),
    zones_in AS (
        SELECT CAST(zone_key AS BIGINT) AS zone_key FROM zones
        WHERE {_point_in_const_sql()}
    ),
    activity AS (
        SELECT CAST(ts AS DATE) AS event_date,
               CAST(hour(ts) AS BIGINT) AS hour,
               CAST(value AS DECIMAL(25,6)) AS v,
               user_id % 25 AS zone_key
        FROM events
        WHERE CAST(ts AS DATE) BETWEEN DATE '{_CONSULT_START}'
                                   AND DATE '{_CONSULT_END}'
    ),
    consult AS (
        SELECT s.cluster_id, act.hour,
               CAST(sum(act.v) * 1000000 AS BIGINT) AS su,
               count(DISTINCT act.event_date) AS nd
        FROM activity act
        JOIN zones_in z ON act.zone_key = z.zone_key
        JOIN assignments s ON act.event_date = s.event_date
        GROUP BY 1, 2
    )
    SELECT part, cluster_id, hour, avg_trips, total_trips_sample,
           n_days
    FROM (
        SELECT 'gold' AS part, cluster_id, hour,
               CAST((200 * su + 1000000 * n_rows)
                    // (2000000 * n_rows) AS DOUBLE) / 100
                   AS avg_trips,
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
        UNION ALL
        SELECT 'consult', cluster_id, hour,
               CAST((200 * su + 1000000 * nd)
                    // (2000000 * nd) AS DOUBLE) / 100,
               CAST(NULL AS DOUBLE),
               nd
        FROM consult
    )
    ORDER BY part, cluster_id, hour
    """


@register(
    "typical_day_clusters",
    oracle=_clusters_with_consult_oracle(k=3, iters=5),
    tags=("U1", "U2", "U3", "U4", "J9", "consultation", "gold"),
    bench=True,
)
def typical_day_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gold.typical_day_by_cluster PLUS the polygon-consultation
    serving query, both fully oracle-checked in one labeled union.

    `gold`: deterministic Lloyd's k-means (fixed earliest-dates init, 5
    unrolled iterations, DECIMAL centroid sums, quantized profiles) —
    every arithmetic step bit-aligned with the generated DuckDB oracle,
    so the driver hashes assignments and gold values, not just row
    counts.  The seeded best-of-n-init sklearn-parity variant stays in
    the pipeline (ml/clustering.typical_day_clustering, semantic
    pytest).

    `consult` (r13): consult_clustering_by_polygon
    (mobility_consultations.py:27-124; pipeline/mobility.py twin) —
    date-ranged activity, zones polygon-filtered by synthetic centroid
    (broadcast semi-join), per-day cluster assignments joined in, then
    re-aggregated to avg trips per (cluster, hour) with the exact
    integer-micro-unit rounding the gold part uses.  avg divides by the
    group's ACTIVE distinct days, as the reference does."""
    from ..ml.clustering import deterministic_kmeans_suite

    events = load_table(spark, sf_dir, "events")
    # ONE events pass serves gold, the Lloyd's replay AND the consult:
    # pre-aggregate to (event_date, hour, zone_key) — |dates|·24·25
    # rows — in exact integer micro-units (value is a 6-dp decimal, so
    # sum(value)·10⁶ is an exact BIGINT; / 1e6 back to double is the
    # identical correctly-rounded value the DECIMAL(25,6)→DOUBLE cast
    # yields).  The former shape scanned events THREE times (gold
    # hourly, a second full kmeans replay for the assignments, the
    # consult activity) and ran the driver Lloyd's loop twice.
    zone_base = (
        events.groupBy(
            F.to_date("ts").alias("event_date"),
            F.hour("ts").alias("hour"),
            (F.col("user_id") % 25).alias("zone_key"),
        )
        .agg(F.sum(micro_units("value")).alias("vi"))
        .localCheckpoint(eager=False)
    )
    hourly = zone_base.groupBy("event_date", "hour").agg(
        (F.sum("vi").cast("double") / 1e6).alias("total_trips")
    )
    gold_rows, assignments_nd = deterministic_kmeans_suite(
        events, k=3, iters=5, hourly=hourly
    )
    gold = gold_rows.select(
        F.lit("gold").alias("part"), "cluster_id", "hour",
        "avg_trips", "total_trips_sample", "n_days",
    )
    assignments = assignments_nd.select("event_date", "cluster_id")
    zkey = F.col("id").cast("int")
    zones_in = (
        spark.range(25)
        .filter(
            point_in_polygon(
                synthetic_centroid_lon(zkey),
                synthetic_centroid_lat(zkey),
                _QUERY_POLY,
            )
        )
        .select(F.col("id").cast("long").alias("zone_key"))
    )
    consult = (
        zone_base.filter(
            F.col("event_date").between(_CONSULT_START, _CONSULT_END)
        )
        .join(broadcast(zones_in), "zone_key")
        .join(broadcast(assignments), "event_date")
        .groupBy("cluster_id", F.col("hour").cast("long").alias("hour"))
        .agg(
            F.sum("vi").alias("su"),
            F.countDistinct("event_date").alias("nd"),
        )
        .select(
            F.lit("consult").alias("part"),
            "cluster_id",
            "hour",
            (
                F.expr(
                    "(200 * su + 1000000 * nd) div (2000000 * nd)"
                ).cast("double")
                / 100
            ).alias("avg_trips"),
            F.lit(None).cast("double").alias("total_trips_sample"),
            F.col("nd").alias("n_days"),
        )
    )
    return gold.unionByName(consult).orderBy(
        "part", "cluster_id", "hour"
    )
