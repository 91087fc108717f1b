"""Property tests for partition-transform pruning soundness
(sources/transforms.py) — pure Python, no Spark session.

THE invariant hidden partitioning lives or dies by: if a row matches
a predicate, the partition holding that row must SURVIVE pruning.
(The converse — pruning everything prunable — is a performance
property, checked by the directory-count assertions in
test_hidden_partitioning.py; losing it costs I/O, not rows.)
"""

from __future__ import annotations

import datetime as dt
import operator

from hypothesis import given, settings
from hypothesis import strategies as st

from urban_mobility_data_lakehouse_spark.sources.transforms import (
    PartitionSpec,
    partition_survives,
)

_OPS = {
    "=": operator.eq,
    ">": operator.gt,
    ">=": operator.ge,
    "<": operator.lt,
    "<=": operator.le,
}

_ts = st.datetimes(
    min_value=dt.datetime(1960, 1, 1),  # pre-1970: negative epoch days
    max_value=dt.datetime(2100, 1, 1),
    timezones=st.just(dt.timezone.utc),
)


@settings(max_examples=300, deadline=None)
@given(
    row=_ts,
    lit=_ts,
    op=st.sampled_from(sorted(_OPS)),
    transform=st.sampled_from(["hours", "days", "months"]),
)
def test_temporal_row_match_implies_partition_survives(
    row, lit, op, transform
):
    spec = PartitionSpec(transform, "ts")
    if _OPS[op](row, lit):
        assert partition_survives(
            spec, [("ts", op, lit)], spec.value_of(row)
        )


@settings(max_examples=300, deadline=None)
@given(
    row=st.integers(-10**9, 10**9),
    lit=st.integers(-10**9, 10**9),
    op=st.sampled_from(sorted(_OPS)),
    width=st.integers(1, 1000),
)
def test_int_truncate_row_match_implies_survives(row, lit, op, width):
    spec = PartitionSpec("truncate", "v", width)
    if _OPS[op](row, lit):
        assert partition_survives(
            spec, [("v", op, lit)], spec.value_of(row)
        )


@settings(max_examples=300, deadline=None)
@given(
    row=st.text(min_size=0, max_size=12),
    lit=st.text(min_size=0, max_size=12),
    op=st.sampled_from(sorted(_OPS)),
    width=st.integers(1, 8),
)
def test_str_truncate_row_match_implies_survives(row, lit, op, width):
    spec = PartitionSpec("truncate", "s", width)
    if _OPS[op](row, lit):
        assert partition_survives(
            spec, [("s", op, lit)], spec.value_of(row)
        )


@settings(max_examples=300, deadline=None)
@given(
    row=st.one_of(st.integers(-10**9, 10**9), st.text(max_size=12)),
    others=st.lists(
        st.one_of(st.integers(-10**9, 10**9), st.text(max_size=12)),
        max_size=4,
    ),
    n=st.integers(1, 64),
)
def test_bucket_eq_and_in_row_match_implies_survives(row, others, n):
    spec = PartitionSpec("bucket", "k", n)
    value = spec.value_of(row)
    assert partition_survives(spec, [("k", "=", row)], value)
    assert partition_survives(spec, [("k", "in", [*others, row])], value)
    # bucket must never range-prune: any range predicate survives
    if isinstance(row, int):
        assert partition_survives(spec, [("k", ">", row + 1)], value)


@settings(max_examples=200, deadline=None)
@given(
    row=_ts,
    lits=st.lists(_ts, min_size=1, max_size=4),
    transform=st.sampled_from(["hours", "days", "months"]),
)
def test_temporal_in_list_membership_survives(row, lits, transform):
    spec = PartitionSpec(transform, "ts")
    assert partition_survives(
        spec, [("ts", "in", [*lits, row])], spec.value_of(row)
    )
