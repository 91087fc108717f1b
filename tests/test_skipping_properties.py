"""Property-based equivalence for data-skipping reads: for ANY
conjunction of range/equality/in predicates over a table with nulls,
duplicate values, and multiple commit shapes, `read_where` must return
exactly what a full scan + filter returns.  Pruning is supposed to be
invisible — hypothesis hunts for a predicate where it isn't.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from urban_mobility_data_lakehouse_spark.sources.lakehouse import Lakehouse
from urban_mobility_data_lakehouse_spark.sources.skipping import (
    predicates_to_column,
)

COLS = {"id": "long", "v": "double", "s": "string"}
OPS = ["=", "<", "<=", ">", ">=", "in"]


@pytest.fixture(scope="module")
def skiptable(spark, tmp_path_factory):
    """One table, five commits of different shapes: disjoint ranges,
    overlapping ranges, nulls, duplicated values, and a tiny commit."""
    root = tmp_path_factory.mktemp("skipprop")
    lake = Lakehouse(str(root / "lake"))
    lake.create_schemas("silver")
    batches = [
        [(i, float(i) / 2, f"k{i % 7}") for i in range(0, 40)],
        [(i, float(80 - i), f"k{i % 5}") for i in range(30, 70)],
        [(i, None, None) for i in range(70, 90)],
        [(0, 0.0, "k0")] * 5,
        [(200, 50.5, "zz")],
    ]
    for rows in batches:
        lake.append(
            spark.createDataFrame(rows, "id long, v double, s string")
            .coalesce(1),
            "silver",
            "p",
        )
    return lake


def _value_for(col, seed: int):
    if col == "id":
        return seed % 250 - 10
    if col == "v":
        return float(seed % 100) - 5.5
    return f"k{seed % 9}" if seed % 3 else "zz"


predicate = st.tuples(
    st.sampled_from(sorted(COLS)),
    st.sampled_from(OPS),
    st.integers(min_value=0, max_value=10_000),
)


@pytest.mark.heavy  # 30-example sweep (~20 s); directed read_where
# equivalence coverage stays in the default lane (test_skipping.py)
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(preds=st.lists(predicate, min_size=1, max_size=3))
def test_read_where_equals_full_scan_filter(spark, skiptable, preds):
    predicates = [
        (
            col,
            op,
            [_value_for(col, seed + d) for d in range(seed % 3 + 1)]
            if op == "in"
            else _value_for(col, seed),
        )
        for col, op, seed in preds
    ]
    got = sorted(
        map(tuple, skiptable.read_where(
            spark, "silver", "p", predicates
        ).collect())
    )
    expect = sorted(
        map(tuple, skiptable.read(spark, "silver", "p")
            .filter(predicates_to_column(predicates))
            .collect())
    )
    assert got == expect, f"pruning changed results for {predicates}"
