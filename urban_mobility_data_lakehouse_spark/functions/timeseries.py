"""Time-series densification and gap filling — pure window Columns.

The reference's calendar work stops at densification (the holiday
bridge / date-spine cross joins, `mobility_ingestion_pipeline.py:403`);
real telemetry pipelines also need the VALUES filled once the grid is
dense: last-observation-carried-forward for step-like series and
linear interpolation for continuous ones.  Both are single-window
expressions here — per-key ordered windows over the densified grid, no
UDFs, no self-joins — so the shuffle cost is one hash-exchange on the
series key regardless of how many fill columns ride on it, and the
plan scales with the grid, not with gap width (an N-day gap is N rows,
not N window lookups: the anchors come from running last/first
aggregates, not per-row scans).

Semantics (matching pandas `ffill` / `interpolate(limit_direction=
'both')` where they overlap):

- `locf`: the most recent non-null observation at or before the row;
  leading gaps stay NULL.
- `interp`: observed rows keep their value; interior gaps are linear
  between the nearest observed anchors (exact fraction of the numeric
  time index); leading gaps backfill from the first observation,
  trailing gaps carry the last one forward.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F


def densify(
    series: DataFrame, spine: DataFrame, keys: list[str], time_col: str
) -> DataFrame:
    """Every (key-combination × spine row), observed values attached,
    NULL where the series has no observation.  `spine` must carry
    `time_col` (+ any derived calendar columns); key combinations come
    from the series itself (crossJoin of its distinct keys — bounded
    by the dimension, broadcast below any realistic cardinality)."""
    dims = series.select(*keys).distinct()
    grid = dims.crossJoin(F.broadcast(spine))
    return grid.join(series, [*keys, time_col], "left")


def with_fill_columns(
    dense: DataFrame,
    keys: list[str],
    order_col: str,
    index_col: str,
    value_col: str,
    locf_name: str = "locf",
    interp_name: str = "interp",
) -> DataFrame:
    """Add `locf` and `interp` columns next to a (possibly NULL)
    `value_col` on an already-dense grid.  `index_col` must be a
    numeric, equally-comparable time index (day number, epoch
    seconds…) — the interpolation fraction is computed on it."""
    v, t = F.col(value_col), F.col(index_col)
    back = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_v = F.last(v, ignorenulls=True).over(back)
    prev_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(back)
    next_v = F.first(v, ignorenulls=True).over(fwd)
    next_t = F.first(F.when(v.isNotNull(), t), ignorenulls=True).over(fwd)
    interp: Column = (
        F.when(v.isNotNull(), v)
        .when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t),
        )
        .otherwise(F.coalesce(prev_v, next_v))
    )
    return dense.withColumn(locf_name, prev_v).withColumn(
        interp_name, interp
    )
