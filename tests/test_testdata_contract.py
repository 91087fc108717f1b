"""Schema contract over the driver-generated testdata.

Round 3 was lost to a silent driver-side regeneration of
events.parquet (TIMESTAMP(NANOS) -> timestamp[us]) that the engine's
normalization didn't cover: the bench crashed with zero timing output
and six tests failed with an opaque AnalysisException.  This test
pins (a) the physical parquet footer types the engine knows how to
normalize and (b) the engine-facing dtypes after ``load_table`` — so
the next drift fails ONE clear test naming the drifted column instead
of detonating downstream.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from urban_mobility_data_lakehouse_spark.sources.testdata import (
    TESTDATA_TABLES,
    load_table,
)

# Engine-facing dtypes after load_table (the normalized contract every
# query/oracle pair is written against).
NORMALIZED_DTYPES: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {
        "n_nationkey": "int",
        "n_name": "string",
        "n_regionkey": "int",
    },
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # the load-bearing one: must be session-TZ
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}

# Physical footer encodings normalize_event_ts knows how to absorb.
KNOWN_TS_ENCODINGS = {"timestamp[us]", "timestamp[ns]", "int64"}


@pytest.mark.parametrize("name", TESTDATA_TABLES)
def test_testdata_contract(spark, sf_dir, name):
    footer = pq.read_schema(f"{sf_dir}/{name}.parquet")
    if name == "events":
        enc = str(footer.field("ts").type)
        assert enc in KNOWN_TS_ENCODINGS, (
            f"events.ts parquet encoding drifted to {enc!r}; teach "
            "sources/testdata.py normalize_event_ts this reading"
        )
    got = dict(load_table(spark, sf_dir, name).dtypes)
    assert got == NORMALIZED_DTYPES[name], (
        f"{name} engine-facing schema drifted: {got} != contract; "
        "update normalization (sources/testdata.py) or this contract"
    )


def test_documents_text_is_non_null(spark, sf_dir):
    """Several hash-checked parts (lm/strip/clf/mix in
    text_pairs_suite) tokenize documents.text with row-local
    split/size/sequence expressions whose NULL behavior DIVERGES from
    the DuckDB oracles' unnest-of-NULL (size(NULL) is -1, so
    sequence(1, -1) emits bogus descending indices).  The engine
    guards the worst offenders explicitly, but the fixture contract is
    the backstop: a regenerated documents.parquet that introduces NULL
    (or NaN-ish) text must fail HERE, naming the issue, instead of
    silently moving four part hashes."""
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet' "
        "WHERE text IS NULL"
    ).fetchone()[0]
    assert n == 0, (
        f"{n} NULL-text documents in {sf_dir}/documents.parquet — "
        "the lm/strip/clf/mix oracle replays assume non-null text"
    )
