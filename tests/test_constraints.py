"""CHECK constraints (Delta ADD CONSTRAINT analog): violating writes
raise before anything commits, UNKNOWN passes (SQL three-valued
semantics), transactions abort atomically, and existing data can be
validated on demand.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.sources.lakehouse import (
    ConstraintViolationError,
    Lakehouse,
)


def _lake(tmp_path) -> Lakehouse:
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("silver")
    return lake


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, value double, d string")


def test_violating_write_raises_and_commits_nothing(spark, tmp_path):
    lake = _lake(tmp_path)
    lake.add_constraint("silver", "t", "positive_value", "value > 0")
    ok = _df(spark, [(1, 1.0, "a"), (2, 2.0, "b")])
    lake.overwrite_partitions(ok, "silver", "t", partition_col="d")
    versions_before = len(lake.snapshots("silver", "t"))

    bad = _df(spark, [(3, -1.0, "a")])
    with pytest.raises(ConstraintViolationError, match="positive_value"):
        lake.overwrite_partitions(bad, "silver", "t", partition_col="d")
    with pytest.raises(ConstraintViolationError):
        lake.append(bad, "silver", "t")

    assert len(lake.snapshots("silver", "t")) == versions_before
    assert sorted(
        r["id"] for r in lake.read(spark, "silver", "t").collect()
    ) == [1, 2]


def test_unknown_passes_but_explicit_not_null_rejects(spark, tmp_path):
    lake = _lake(tmp_path)
    lake.add_constraint("silver", "t", "positive_value", "value > 0")
    # NULL value → predicate UNKNOWN → row passes (SQL CHECK semantics)
    lake.append(_df(spark, [(1, None, "a")]), "silver", "t")
    assert lake.read(spark, "silver", "t").count() == 1

    lake.add_constraint(
        "silver", "t", "value_not_null", "value IS NOT NULL"
    )
    with pytest.raises(ConstraintViolationError, match="value_not_null"):
        lake.append(_df(spark, [(2, None, "b")]), "silver", "t")
    # the earlier NULL row is now a retroactive violation validate() finds
    with pytest.raises(ConstraintViolationError):
        lake.validate(spark, "silver", "t")
    lake.drop_constraint("silver", "t", "value_not_null")
    lake.validate(spark, "silver", "t")  # clean again
    lake.append(_df(spark, [(2, None, "b")]), "silver", "t")
    assert lake.read(spark, "silver", "t").count() == 2


def test_transaction_aborts_atomically_on_violation(spark, tmp_path):
    lake = _lake(tmp_path)
    lake.add_constraint("silver", "audited", "in_range", "value <= 100")
    with pytest.raises(ConstraintViolationError):
        with lake.transaction() as txn:
            txn.append(_df(spark, [(1, 1.0, "a")]), "silver", "other")
            txn.append(
                _df(spark, [(2, 200.0, "b")]), "silver", "audited"
            )
    # the violation aborted the WHOLE transaction: staged files are
    # orphans, nothing committed, neither table readable
    for t in ("other", "audited"):
        assert lake.snapshots("silver", t) == []
        with pytest.raises(FileNotFoundError):
            lake.read(spark, "silver", t)
