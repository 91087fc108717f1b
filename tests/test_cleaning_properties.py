"""Property-based tests (hypothesis) for the bronze→silver cleaning
expressions — each property runs ONE Spark job over a generated batch
of values and compares against a plain-Python reference."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

import pyspark.sql.functions as F

from urban_mobility_data_lakehouse_spark.functions.cleaning import (
    spanish_number,
    zero_trap_bigint,
)


def _py_spanish(s: str | None) -> float | None:
    if s is None:
        return None
    try:
        return float(s.replace(".", "").replace(",", "."))
    except ValueError:
        return None


def _eval(spark, values, expr_fn):
    df = spark.createDataFrame([(v,) for v in values], "raw string")
    return [r["out"] for r in df.select(expr_fn(F.col("raw")).alias("out")).collect()]


# well-formed Spanish numbers: optional thousands groups + decimal comma
spanish_strings = st.builds(
    lambda sign, ints, dec: f"{sign}{ints}{',' + dec if dec is not None else ''}",
    sign=st.sampled_from(["", "-"]),
    ints=st.from_regex(r"[1-9][0-9]{0,2}(\.[0-9]{3}){0,3}", fullmatch=True),
    dec=st.one_of(st.none(), st.from_regex(r"[0-9]{1,4}", fullmatch=True)),
)
junk_strings = st.sampled_from(["NA", "", "  ", "abc", "1,2,3", "fecha", "--"])


@settings(max_examples=12, deadline=None)
@given(vals=st.lists(st.one_of(spanish_strings, junk_strings), min_size=1, max_size=40))
def test_spanish_number_matches_python(spark, vals):
    got = _eval(spark, vals, spanish_number)
    expected = [_py_spanish(v) for v in vals]
    assert got == expected


@settings(max_examples=12, deadline=None)
@given(
    vals=st.lists(
        st.one_of(
            st.integers(-10**12, 10**12).map(lambda i: f"{i}.0"),
            st.integers(-10**12, 10**12).map(str),
            junk_strings,
        ),
        min_size=1,
        max_size=40,
    )
)
def test_zero_trap_matches_python(spark, vals):
    got = _eval(spark, vals, zero_trap_bigint)

    def py(v):
        try:
            return int(float(v))
        except ValueError:
            return None

    assert got == [py(v) for v in vals]
