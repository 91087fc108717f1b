"""Spatial expression library — the reference's DuckDB `spatial` extension
surface (SURVEY.md §2.8-spatial) rebuilt as pure Catalyst expressions.

Spark has no GEOMETRY type; per the build plan we precompute centroid
lon/lat at dim-build time and express distance as a haversine over those
(matches `st_distance_spheroid` within <0.5% at intra-country distances,
reference use at mobility_ingestion_pipeline.py:838).  Everything here is
a whole-stage-codegen-able Column expression — no UDFs in the hot path.

Each builder has a twin that emits the same formula as ANSI SQL so the
DuckDB oracles stay bit-aligned with the Spark plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

EARTH_RADIUS_KM = 6371.0088


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (replaces st_distance_spheroid/1000)."""
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.pow(F.sin(dlat), 2) + (
        F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.pow(F.sin(dlon), 2)
    )
    return F.lit(2 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def haversine_km_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Identical formula as SQL text (for DuckDB oracles / spark.sql)."""
    return (
        f"2 * {EARTH_RADIUS_KM} * asin(sqrt("
        f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)))"
    )


def synthetic_centroid_lon(key: Column) -> Column:
    """Deterministic Spain-like lon for an integer zone key (testdata has
    no geography; FIXTURES.md A7 prescribes closed-form centroids)."""
    return F.lit(-9.5) + (key % 10).cast("double") * F.lit(1.3)


def synthetic_centroid_lat(key: Column) -> Column:
    return (
        F.lit(36.0)
        + F.floor(key / 10).cast("double") * F.lit(1.7)
        + (key % 3).cast("double") * F.lit(0.4)
    )


SYNTH_LON_SQL = "(-9.5 + (({k}) % 10) * 1.3)"
SYNTH_LAT_SQL = "(36.0 + floor(({k}) / 10) * 1.7 + (({k}) % 3) * 0.4)"


def synthetic_centroid_sql(key: str) -> tuple[str, str]:
    return SYNTH_LON_SQL.format(k=key), SYNTH_LAT_SQL.format(k=key)


def _wkt_ring_coords(wkt: Column, group: int) -> Column:
    """All x (group=1) or y (group=2) coordinates of a WKT polygon ring."""
    pat = r"(-?[0-9][0-9.]*) (-?[0-9][0-9.]*)"
    return F.transform(
        F.regexp_extract_all(wkt, F.lit(pat), F.lit(group)),
        lambda s: s.cast("double"),
    )


def _vertex_mean(coords: Column) -> Column:
    # drop the closing vertex (WKT rings repeat the first point)
    ring = F.slice(coords, 1, F.size(coords) - 1)
    return F.aggregate(ring, F.lit(0.0), lambda a, x: a + x) / F.size(ring)


def wkt_centroid_lon(wkt: Column) -> Column:
    """Vertex-mean centroid of a WKT POLYGON — the ST_Centroid stand-in
    (mobility_ingestion_pipeline.py:838).  Exact for the regular convex
    rings the zone fixtures use; for production-grade geometry plug in
    Apache Sedona's ST_Centroid (same column contract).  Pure Catalyst
    expressions: regexp + array fold, no UDF."""
    return _vertex_mean(_wkt_ring_coords(wkt, 1))


def wkt_centroid_lat(wkt: Column) -> Column:
    return _vertex_mean(_wkt_ring_coords(wkt, 2))


def point_in_bbox(
    lon: Column, lat: Column,
    min_lon: float, min_lat: float, max_lon: float, max_lat: float,
) -> Column:
    """Rectangular ST_Intersects stand-in (consultation polygon filter,
    mobility_consultations.py:66-68): centroid-in-bounding-box."""
    return (
        (lon >= F.lit(min_lon)) & (lon <= F.lit(max_lon))
        & (lat >= F.lit(min_lat)) & (lat <= F.lit(max_lat))
    )


def point_in_wkt_polygon(px: Column, py: Column, xs: Column, ys: Column) -> Column:
    """Ray-cast point-in-polygon where the polygon is DATA (coordinate
    arrays parsed from a WKT column), not a Python constant.

    Count-based parity test (crossings % 2 == 1) over the ring edges
    i → i+1, expressed with higher-order array functions — stays in
    whole-stage codegen, no UDF.  The DuckDB oracle twin
    (`point_in_wkt_polygon_sql`) emits the identical formula, so the
    branch decisions are bit-aligned.
    """
    def crossing(i: Column) -> Column:
        y1, y2 = F.element_at(ys, i), F.element_at(ys, i + F.lit(1))
        x1, x2 = F.element_at(xs, i), F.element_at(xs, i + F.lit(1))
        return ((y1 > py) != (y2 > py)) & (
            px < (x2 - x1) * (py - y1) / (y2 - y1) + x1
        )

    n_edges = F.size(xs) - 1  # ring repeats the first vertex
    crossings = F.size(F.filter(F.sequence(F.lit(1), n_edges), crossing))
    return crossings % 2 == F.lit(1)


def _orient_sql(ax, ay, bx, by, cx, cy) -> str:
    return (
        f"(({bx}) - ({ax})) * (({cy}) - ({ay}))"
        f" - (({by}) - ({ay})) * (({cx}) - ({ax}))"
    )


def _orient(ax, ay, bx, by, cx, cy) -> Column:
    """Signed cross product: >0 left turn, <0 right turn, 0 collinear."""
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def polygon_intersects_wkt(
    wkt: Column, query_poly: list[tuple[float, float]]
) -> Column:
    """True ST_Intersects for a WKT POLYGON column vs a constant simple
    polygon (the consultation parameter) — replaces the centroid-only
    approximation for border zones (mobility_consultations.py:66-68,
    153-154 filters zone POLYGONS, not centroids).

    Three-part test, all pure Column exprs:
      (a) any zone vertex inside the query polygon,
      (b) any query vertex inside the zone polygon,
      (c) any zone edge properly crossing any query edge.
    (a)∨(b) covers containment either way; (c) covers edge-through-edge
    overlap with no vertex containment.  Proper-crossing uses strict
    orientation signs; exact vertex-on-edge touching is out of contract
    (the synthetic fixtures never produce it).
    """
    xs, ys = _wkt_ring_coords(wkt, 1), _wkt_ring_coords(wkt, 2)
    n_edges = F.size(xs) - 1
    idx = F.sequence(F.lit(1), n_edges)

    # (a) any zone vertex in the constant query polygon
    any_zone_vertex_in = F.exists(
        idx,
        lambda i: point_in_polygon(
            F.element_at(xs, i), F.element_at(ys, i), query_poly
        ),
    )

    # (b) any query vertex in the zone polygon
    any_query_vertex_in = None
    for qx, qy in query_poly:
        t = point_in_wkt_polygon(F.lit(qx), F.lit(qy), xs, ys)
        any_query_vertex_in = (
            t if any_query_vertex_in is None else any_query_vertex_in | t
        )

    # (c) any zone edge × any query edge proper crossing
    def edge_cross(qx1, qy1, qx2, qy2):
        def cross(i: Column) -> Column:
            ax, ay = F.element_at(xs, i), F.element_at(ys, i)
            bx = F.element_at(xs, i + F.lit(1))
            by = F.element_at(ys, i + F.lit(1))
            d1 = _orient(ax, ay, bx, by, F.lit(qx1), F.lit(qy1))
            d2 = _orient(ax, ay, bx, by, F.lit(qx2), F.lit(qy2))
            d3 = _orient(
                F.lit(qx1), F.lit(qy1), F.lit(qx2), F.lit(qy2), ax, ay
            )
            d4 = _orient(
                F.lit(qx1), F.lit(qy1), F.lit(qx2), F.lit(qy2), bx, by
            )
            return (d1 * d2 < 0) & (d3 * d4 < 0)

        return F.exists(idx, cross)

    any_edge_cross = None
    nq = len(query_poly)
    for j in range(nq):
        qx1, qy1 = query_poly[j]
        qx2, qy2 = query_poly[(j + 1) % nq]
        t = edge_cross(qx1, qy1, qx2, qy2)
        any_edge_cross = t if any_edge_cross is None else any_edge_cross | t

    return any_zone_vertex_in | any_query_vertex_in | any_edge_cross


_WKT_PAIR_PAT = r"(-?[0-9][0-9.]*) (-?[0-9][0-9.]*)"


def wkt_coords_sql(wkt_expr: str, group: int) -> str:
    """DuckDB twin of _wkt_ring_coords."""
    return (
        f"list_transform(regexp_extract_all({wkt_expr}, "
        f"'{_WKT_PAIR_PAT}', {group}), s -> CAST(s AS DOUBLE))"
    )


def point_in_wkt_polygon_sql(px: str, py: str, xs: str, ys: str) -> str:
    """DuckDB twin of point_in_wkt_polygon (same count-based parity)."""
    crossing = (
        f"(({ys}[i] > ({py})) != ({ys}[i+1] > ({py}))) AND "
        f"(({px}) < ({xs}[i+1] - {xs}[i]) * (({py}) - {ys}[i])"
        f" / ({ys}[i+1] - {ys}[i]) + {xs}[i])"
    )
    return (
        f"(len(list_filter(range(1, len({xs})), i -> {crossing})) % 2 = 1)"
    )


def polygon_intersects_wkt_sql(
    xs_col: str, ys_col: str, query_poly: list[tuple[float, float]]
) -> str:
    """DuckDB twin of polygon_intersects_wkt — identical three-part
    test so the oracle's branch decisions match the Spark plan's.

    `xs_col`/`ys_col` name list-typed columns the caller computes once
    (via wkt_coords_sql in a CTE) — keeps the emitted SQL readable
    instead of inlining the regexp parse into every term."""

    # (a) any zone vertex in the constant query polygon (count parity)
    nq = len(query_poly)
    terms = []
    for j in range(nq):
        x1, y1 = query_poly[j]
        x2, y2 = query_poly[(j + 1) % nq]
        if y1 == y2:
            continue
        terms.append(
            f"CASE WHEN (({y1} > YY[i]) != ({y2} > YY[i])) AND "
            f"(XX[i] < ({x2} - {x1}) * (YY[i] - {y1}) / ({y2} - {y1})"
            f" + {x1}) THEN 1 ELSE 0 END"
        )
    const_count = " + ".join(terms)
    vertex_in_const = (
        f"list_bool_or(list_transform(range(1, len(XX)), "
        f"i -> ({const_count}) % 2 = 1))"
    )

    # (b) any query vertex in the zone polygon
    q_vertex_terms = " OR ".join(
        point_in_wkt_polygon_sql(str(qx), str(qy), "XX", "YY")
        for qx, qy in query_poly
    )

    # (c) any zone edge × any query edge proper crossing
    cross_terms = []
    for j in range(nq):
        qx1, qy1 = query_poly[j]
        qx2, qy2 = query_poly[(j + 1) % nq]
        d1 = _orient_sql("XX[i]", "YY[i]", "XX[i+1]", "YY[i+1]",
                         str(qx1), str(qy1))
        d2 = _orient_sql("XX[i]", "YY[i]", "XX[i+1]", "YY[i+1]",
                         str(qx2), str(qy2))
        d3 = _orient_sql(str(qx1), str(qy1), str(qx2), str(qy2),
                         "XX[i]", "YY[i]")
        d4 = _orient_sql(str(qx1), str(qy1), str(qx2), str(qy2),
                         "XX[i+1]", "YY[i+1]")
        cross_terms.append(
            f"list_bool_or(list_transform(range(1, len(XX)), "
            f"i -> (({d1}) * ({d2}) < 0) AND (({d3}) * ({d4}) < 0)))"
        )
    edge_cross = " OR ".join(cross_terms)

    body = f"({vertex_in_const}) OR ({q_vertex_terms}) OR ({edge_cross})"
    return body.replace("XX", xs_col).replace("YY", ys_col)


def point_in_polygon(lon: Column, lat: Column, polygon: list[tuple[float, float]]) -> Column:
    """Ray-casting point-in-polygon as a pure Column expression.

    The polygon is a Python-side constant (the consultation parameter), so
    we unroll one crossing test per edge and XOR-fold them — stays inside
    whole-stage codegen, no UDF.  Handles arbitrary simple polygons.
    """
    crossings = None
    n = len(polygon)
    for i in range(n):
        x1, y1 = polygon[i]
        x2, y2 = polygon[(i + 1) % n]
        if y1 == y2:
            continue  # horizontal edge never crosses a horizontal ray test
        cond = (
            ((F.lit(y1) > lat) != (F.lit(y2) > lat))
            & (
                lon
                < (F.lit(x2 - x1) * (lat - F.lit(y1)) / F.lit(y2 - y1))
                + F.lit(x1)
            )
        )
        # boolean XOR: != on booleans (PySpark Columns have no ^)
        crossings = cond if crossings is None else crossings != cond
    return crossings if crossings is not None else F.lit(False)


def grid_point_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    wkt_col: str = "wkt",
    cell_deg: float = 0.5,
) -> DataFrame:
    """Big-big point-in-polygon join — the spatial twin of
    `operators/temporal.interval_point_join`, for when NEITHER side
    broadcasts (billions of GPS points × millions of zone polygons).

    Strategy: quantize coordinates to integer MICROdegrees (exact, no
    float-boundary ambiguity), cut the plane into fixed `cell_deg`
    cells, replicate each polygon to every cell its bounding box
    overlaps (sequence+explode over the cell ranges — O(bbox area /
    cell area) copies), give each point its single containing cell,
    and equi-join on (cell_x, cell_y) with the exact ray-cast
    `point_in_wkt_polygon` verify applied afterwards.  A point lives
    in exactly ONE cell, so each qualifying (point, polygon) pair
    meets exactly once — no dedup pass.

    The plan is a plain shuffled equi-join: it partitions, spills and
    AQE-balances like any other join, with no
    BroadcastNestedLoopJoin/cartesian fallback (plan-tested).  Choose
    `cell_deg` on the order of typical polygon extent so replication
    stays O(1) per polygon; skewed megacity cells are ordinary join
    skew, handled by AQE skew splitting.

    `points` and `polygons` must share no column names; all point and
    polygon columns survive in the output.
    """
    overlap = set(points.columns) & set(polygons.columns)
    if overlap:
        raise ValueError(
            f"grid_point_polygon_join: ambiguous columns "
            f"{sorted(overlap)} — rename before joining"
        )
    cell_u = int(round(cell_deg * 1_000_000))

    def cells(c: Column) -> Column:
        # microdegree quantization BEFORE division: integer floor-div
        # is exact, so a coordinate can never straddle two cells in
        # one engine and not the other
        return F.floor(F.round(c * 1_000_000).cast("long") / F.lit(cell_u))

    p = points.withColumn("_cx", cells(F.col(lon_col))).withColumn(
        "_cy", cells(F.col(lat_col))
    )
    xs = _wkt_ring_coords(F.col(wkt_col), 1)
    ys = _wkt_ring_coords(F.col(wkt_col), 2)
    g = (
        polygons.withColumn("_xs", xs)
        .withColumn("_ys", ys)
        .withColumn(
            "_cx",
            F.explode(
                F.sequence(
                    cells(F.array_min(F.col("_xs"))),
                    cells(F.array_max(F.col("_xs"))),
                )
            ),
        )
        .withColumn(
            "_cy",
            F.explode(
                F.sequence(
                    cells(F.array_min(F.col("_ys"))),
                    cells(F.array_max(F.col("_ys"))),
                )
            ),
        )
    )
    return (
        p.join(g, ["_cx", "_cy"], "inner")
        .filter(
            point_in_wkt_polygon(
                F.col(lon_col), F.col(lat_col), F.col("_xs"), F.col("_ys")
            )
        )
        .drop("_cx", "_cy", "_xs", "_ys")
    )
