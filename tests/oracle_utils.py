"""Local stand-in for the driver's DuckDB-oracle differential check:
row count + column names + order-insensitive value comparison (floats
with tolerance so genuine logic bugs surface, not summation noise —
the real driver hashes exact values, which is why every query rounds
its float outputs identically on both sides)."""

from __future__ import annotations

import math

import duckdb

from urban_mobility_data_lakehouse_spark.sources.testdata import (
    TESTDATA_TABLES,
)


def run_oracle(sql: str, sf_dir: str):
    """Fetch via Arrow, NOT fetchall: fetchall coerces HUGEINT to a
    plain Python int when the value fits, silently masking the exact
    oracle/Spark type divergence the driver hash-fails on (round 1
    shipped three of those).  Arrow surfaces HUGEINT/DECIMAL as
    `decimal.Decimal`, matching what the driver hashes."""
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    tbl = con.execute(sql).fetch_arrow_table()
    cols = list(tbl.column_names)
    rows = list(zip(*(c.to_pylist() for c in tbl.columns)))
    if not tbl.columns:
        rows = []
    return cols, rows


def normalize(cols, rows):
    """Sort columns by name (driver semantics), then sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(_norm_val(row[i]) for i in order))
    return sorted(cols), sorted(out, key=lambda r: tuple(map(str, r)))


def _norm_val(v):
    import datetime

    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    if isinstance(v, list):
        return tuple(_norm_val(x) for x in v)
    return v


def assert_frames_match(spark_df, oracle_sql: str, sf_dir: str, name: str):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)

    ns_cols, ns_rows = normalize(s_cols, s_rows)
    no_cols, no_rows = normalize(o_cols, o_rows)

    assert ns_cols == no_cols, (
        f"{name}: column mismatch spark={ns_cols} oracle={no_cols}"
    )
    assert len(ns_rows) == len(no_rows), (
        f"{name}: row count spark={len(ns_rows)} oracle={len(no_rows)}"
    )
    for i, (sr, orow) in enumerate(zip(ns_rows, no_rows)):
        for j, (sv, ov) in enumerate(zip(sr, orow)):
            assert _val_eq(sv, ov), (
                f"{name}: row {i} col {ns_cols[j]} spark={sv!r} "
                f"oracle={ov!r}\nspark_row={sr}\noracle_row={orow}"
            )


def _type_class(v) -> str:
    """Numeric type class for driver-strict comparison.  The driver
    hashes exact typed values, so DECIMAL vs DOUBLE or HUGEINT-shaped
    Decimal vs BIGINT must FAIL locally even though Python compares
    them numerically equal."""
    import decimal

    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, decimal.Decimal):
        return "decimal"
    return type(v).__name__


def _val_eq(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    ca, cb = _type_class(a), _type_class(b)
    if ca != cb:
        return False  # e.g. Decimal(100.0) vs 100.0 — driver hash-fails
    if ca == "float":
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b
