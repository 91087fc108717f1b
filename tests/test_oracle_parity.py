"""Golden-query differential tests: every registered query with an
oracle must match DuckDB on the same parquet tables (the reference's
manual audit invariants, automated — SURVEY.md §5)."""

from __future__ import annotations

import pytest

from urban_mobility_data_lakehouse_spark.queries import (
    REGISTRY,
    _load_all,
)

from .oracle_utils import assert_frames_match

_load_all()
WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.builder(spark, sf_dir)
    # oracle_for resolves callable (data-derived) oracles at this sf_dir
    assert_frames_match(df, spec.oracle_for(sf_dir), sf_dir, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.builder(spark, sf_dir)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns  # stable, non-empty schema


def test_entry_smoke(spark):
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    mod = importlib.import_module("__spark_entry__")
    df = mod.entry(spark)
    assert len(df.collect()) > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())


# NOTE: the driver-canonicalizer scalar-only contract (no
# array/map/struct column in any registry row) is enforced inside
# tests/test_plans.py::test_no_python_udfs_in_registry_plans — the two
# registry-wide sweeps share one build of all 50 plans (~13 s each
# when separate) to keep the default lane lean.
