"""The local harness must be driver-strict: the driver hashes exact
typed values, so numeric type divergence between oracle and Spark
output (DuckDB HUGEINT/DECIMAL vs Spark BIGINT/DOUBLE) must fail
locally — round 1 shipped three such bugs because the old comparator
coerced them equal."""

from __future__ import annotations

from decimal import Decimal

from .oracle_utils import _val_eq, run_oracle


def test_decimal_vs_float_fails():
    assert not _val_eq(Decimal("100.0"), 100.0)
    assert not _val_eq(100.0, Decimal("100.0"))


def test_decimal_vs_int_fails():
    # HUGEINT-shaped: DuckDB SUM(BIGINT) arrives as Decimal via Arrow
    assert not _val_eq(Decimal("42"), 42)


def test_int_vs_float_fails():
    assert not _val_eq(42, 42.0)


def test_same_class_compares_by_value():
    assert _val_eq(42, 42)
    assert _val_eq(1.00000000001e-12, 0.0) is False or True  # tolerance path runs
    assert _val_eq(0.1 + 0.2, 0.3)  # float tolerance absorbs ulp noise
    assert not _val_eq("a", "b")
    assert not _val_eq(None, 0)
    assert _val_eq(None, None)


def test_duckdb_hugeint_shape_detected():
    """An un-cast SUM over BIGINT is HUGEINT; the Arrow fetch path must
    surface it as Decimal (fetchall would coerce it to int and mask
    it), and the comparator must refuse it against a Spark long."""
    _cols, rows = run_oracle(
        "SELECT sum(x) AS s FROM (SELECT CAST(1 AS BIGINT) AS x)",
        "/root/testdata/sf0.001",
    )
    (val,) = rows[0]
    assert isinstance(val, Decimal)  # the trap is visible locally
    assert not _val_eq(val, 1)  # and the comparator refuses it


def test_oracle_generation_runs_no_spark_jobs(spark, sf_dir):
    """The driver calls oracle_sql() outside any session we control;
    every data-derived oracle must resolve through the pyarrow twins
    (memoized, Spark-free).  Guard: generating ALL oracles fires zero
    Spark jobs (a twin regressing to a .collect() would show here)."""
    from urban_mobility_data_lakehouse_spark.queries import all_oracles
    from urban_mobility_data_lakehouse_spark.similarity.ivf import (
        _train_centroids_cached,
    )
    from urban_mobility_data_lakehouse_spark.similarity.pq import (
        _train_pq_cached,
    )
    from urban_mobility_data_lakehouse_spark.text.bpe import (
        _train_bpe_cached,
    )
    from urban_mobility_data_lakehouse_spark.text.classifier import (
        _train_clf_cached,
    )
    from urban_mobility_data_lakehouse_spark.text.lm import (
        _train_lm_cached,
    )
    from urban_mobility_data_lakehouse_spark.text.mixing import (
        _mix_rates_cached,
    )

    # bust the twin memos so the generation below really retrains
    for c in (_train_centroids_cached, _train_pq_cached,
              _train_bpe_cached, _train_clf_cached, _train_lm_cached,
              _mix_rates_cached):
        c.cache_clear()

    from urban_mobility_data_lakehouse_spark.queries import (
        REGISTRY,
        _load_all,
    )

    _load_all()
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    oracles = all_oracles(sf_dir)
    after = tracker.getJobIdsForGroup(None)
    # every registry row with an oracle resolves — no magic count, so
    # adding a registry row can't silently rot this guard
    assert len(oracles) == sum(1 for s in REGISTRY.values() if s.oracle)
    # …but the dynamic comparison alone would also pass if a query
    # module silently stopped registering (both sides shrink together).
    # Floor it at the r10 driver-gate census: the registry is capped at
    # 50 rows and every row carried an oracle, so dipping below 50
    # means surface was LOST, not rotated.
    assert len(REGISTRY) >= 50, sorted(REGISTRY)
    assert len(oracles) >= 50, sorted(oracles)
    assert list(before) == list(after), "oracle generation ran Spark jobs"
