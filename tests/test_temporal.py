"""As-of join semantics: exact-tie matching, missing-prior NULLs, and a
property test against a plain-Python reference implementation."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st

from urban_mobility_data_lakehouse_spark.operators.temporal import asof_join

T0 = datetime(2024, 1, 1)


def _ts(minutes: int) -> datetime:
    return T0 + timedelta(minutes=minutes)


def _run(spark, left_rows, right_rows):
    left = spark.createDataFrame(
        left_rows or [(None, None)], "k long, ts timestamp"
    ).filter("k is not null")
    right = spark.createDataFrame(
        right_rows or [(None, None, None)], "k long, ts timestamp, v double"
    ).filter("k is not null")
    out = asof_join(left, right, on=["k"], payload=["v"])
    return {(r["k"], r["ts"]): r["v"] for r in out.collect()}


def test_asof_tie_and_ordering(spark):
    got = _run(
        spark,
        [(1, _ts(10)), (1, _ts(30)), (1, _ts(5))],
        [(1, _ts(10), 10.0), (1, _ts(20), 20.0)],
    )
    assert got[(1, _ts(10))] == 10.0  # exact tie matches (>= semantics)
    assert got[(1, _ts(30))] == 20.0  # latest prior wins
    assert got[(1, _ts(5))] is None  # nothing prior → NULL


def test_asof_key_isolation(spark):
    got = _run(
        spark,
        [(1, _ts(10)), (2, _ts(10))],
        [(1, _ts(5), 1.0)],
    )
    assert got[(1, _ts(10))] == 1.0
    assert got[(2, _ts(10))] is None  # other key's rows invisible


def _python_asof(left_rows, right_rows):
    out = {}
    for k, lts in left_rows:
        best = None
        for rk, rts, v in right_rows:
            if rk == k and rts <= lts and (best is None or rts > best[0]):
                best = (rts, v)
        out[(k, lts)] = best[1] if best else None
    return out


@settings(max_examples=8, deadline=None)
@given(
    left=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 50)),
        min_size=1, max_size=12, unique=True,
    ),
    right=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 50)),
        min_size=0, max_size=12, unique=True,
    ),
)
def test_asof_matches_python_reference(spark, left, right):
    left_rows = [(k, _ts(m)) for k, m in left]
    # unique (k, ts) on the right: required contract
    right_rows = [(k, _ts(m), float(k * 100 + m)) for k, m in right]
    assert _run(spark, left_rows, right_rows) == _python_asof(
        left_rows, right_rows
    )
