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
from pyspark.sql import Column

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
