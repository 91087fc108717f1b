"""Grid-blocked big-big point-in-polygon join
(`functions/spatial.grid_point_polygon_join`): equality with the naive
cross-join, exactly-once pair semantics, and a shuffled-equi-join plan
with no cartesian fallback."""

from __future__ import annotations

import pyspark.sql.functions as F

from urban_mobility_data_lakehouse_spark.functions.spatial import (
    grid_point_polygon_join,
    point_in_wkt_polygon,
    _wkt_ring_coords,
)


def _square(x0, y0, w):
    x1, y1 = x0 + w, y0 + w
    return (
        f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))"
    )


def _fixtures(spark):
    # 5x5 grid of 0.8-degree squares with 0.2-degree gaps → points can
    # fall inside, in gaps, or outside; squares span multiple 0.5° cells
    polys = spark.createDataFrame(
        [
            (f"z{ix}{iy}", _square(ix * 1.0, iy * 1.0, 0.8))
            for ix in range(5)
            for iy in range(5)
        ],
        "zone_id string, wkt string",
    )
    # deterministic pseudo-random points from a hash recurrence
    pts = spark.range(4000).select(
        F.col("id").alias("pt_id"),
        ((F.xxhash64("id") % 100000) / 100000.0 * 6 - 0.5).alias("lon"),
        ((F.xxhash64("id", F.lit(1)) % 100000) / 100000.0 * 6 - 0.5).alias(
            "lat"
        ),
    )
    return pts, polys


def test_matches_naive_cross_join(spark):
    pts, polys = _fixtures(spark)
    got = sorted(
        (r["pt_id"], r["zone_id"])
        for r in grid_point_polygon_join(pts, polys).collect()
    )
    xs = _wkt_ring_coords(F.col("wkt"), 1)
    ys = _wkt_ring_coords(F.col("wkt"), 2)
    want = sorted(
        (r["pt_id"], r["zone_id"])
        for r in pts.crossJoin(polys)
        .filter(point_in_wkt_polygon(F.col("lon"), F.col("lat"), xs, ys))
        .collect()
    )
    assert want  # fixture sanity: some points actually land in zones
    assert got == want


def test_each_pair_meets_exactly_once(spark):
    pts, polys = _fixtures(spark)
    out = grid_point_polygon_join(pts, polys).groupBy(
        "pt_id", "zone_id"
    ).count()
    assert out.filter(F.col("count") > 1).count() == 0


def test_plan_is_shuffled_equi_join_no_cartesian(spark):
    pts, polys = _fixtures(spark)
    plan = (
        grid_point_polygon_join(pts, polys)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Python" not in plan


def test_rejects_ambiguous_columns(spark):
    import pytest

    pts, polys = _fixtures(spark)
    with pytest.raises(ValueError, match="ambiguous"):
        grid_point_polygon_join(
            pts.withColumn("wkt", F.lit("x")), polys
        )
