"""Scalar-function coverage queries (SURVEY.md §2.8) + the remaining
operator gaps: pivot (U1), derived-key join (J2), lateral-alias filter
(P8), bare limit (O3), approx distinct, date spine, and the BASELINE
day-equivalent silver batch.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import broadcast

from ..operators.relational import dsum
from ..sources.testdata import load_table
from . import register


@register(
    "string_functions",
    oracle="""
    SELECT c_custkey,
           trim(c_name) AS name_trim,
           substr(c_name, 1, 8) AS name_prefix,
           replace(c_name, 'Customer', 'Cust') AS name_replaced,
           split_part(c_name, '#', 2) AS name_number,
           regexp_extract(c_name, '([1-9][0-9]*)', 1) AS first_digits,
           c_mktsegment || '-' || c_name AS tagged,
           upper(c_mktsegment) AS seg_upper,
           lower(c_mktsegment) AS seg_lower,
           CAST(length(c_name) AS BIGINT) AS name_len,
           CASE WHEN c_name LIKE '%00' THEN 'round' ELSE 'other' END
               AS name_class
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("strings", "P3"),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRIM/SUBSTR/REPLACE/split_part/REGEXP_EXTRACT/||/LIKE — the full
    §2.8 string list (mobility_ingestion_pipeline.py:226-305,763)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.trim("c_name").alias("name_trim"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.replace("c_name", F.lit("Customer"), F.lit("Cust")).alias(
            "name_replaced"
        ),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias(
            "name_number"
        ),
        F.regexp_extract("c_name", "([1-9][0-9]*)", 1).alias("first_digits"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("tagged"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").cast("long").alias("name_len"),
        F.when(F.col("c_name").like("%00"), "round")
        .otherwise("other")
        .alias("name_class"),
    ).orderBy("c_custkey")


@register(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           CAST(day(o_orderdate) AS BIGINT) AS order_day,
           dayname(o_orderdate) AS order_dayname,
           CAST(isodow(o_orderdate) AS BIGINT) AS order_isodow,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
           strftime(make_date(2023, month(o_orderdate), day(o_orderdate)),
                    '%Y-%m-%d') AS shifted_2023,
           strftime(CAST(o_orderdate + INTERVAL 7 DAY AS DATE), '%Y-%m-%d')
               AS plus_week,
           strftime(CAST(date_trunc('month', o_orderdate) AS DATE),
                    '%Y-%m-%d') AS month_start,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
               AS month_end,
           CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS BIGINT)
               AS days_since_epoch_95
    FROM orders
    WHERE o_orderkey < 200
    ORDER BY o_orderkey
    """,
    tags=("datetime",),
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/dayname/isodow/strftime/make_date/interval/trunc/
    last_day/datediff — §2.8 date list.  Spark weekday() is Mon=0, so
    ISODOW = weekday()+1."""
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return (
        o.filter(F.col("o_orderkey") < 200)
        .select(
            "o_orderkey",
            F.year(d).cast("long").alias("order_year"),
            F.month(d).cast("long").alias("order_month"),
            F.dayofmonth(d).cast("long").alias("order_day"),
            F.date_format(d, "EEEE").alias("order_dayname"),
            (F.weekday(d) + 1).cast("long").alias("order_isodow"),
            F.date_format(d, "yyyy-MM-dd").alias("order_date_str"),
            F.date_format(
                F.make_date(F.lit(2023), F.month(d), F.dayofmonth(d)),
                "yyyy-MM-dd",
            ).alias("shifted_2023"),
            F.date_format(F.date_add(d, 7), "yyyy-MM-dd").alias("plus_week"),
            F.date_format(F.trunc(d, "month"), "yyyy-MM-dd").alias(
                "month_start"
            ),
            F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
            F.datediff(d, F.lit("1995-01-01").cast("date"))
            .cast("long")
            .alias("days_since_epoch_95"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "date_spine",
    oracle="""
    WITH spine AS (
        SELECT CAST(d AS DATE) AS d
        FROM generate_series(DATE '2024-01-01', DATE '2024-01-31',
                             INTERVAL 1 DAY) t(d)
    ),
    spine_part AS (
        SELECT 'spine' AS part, r_name AS series,
               strftime(d, '%Y-%m-%d') AS spine_date,
               CAST(isodow(d) AS BIGINT) AS spine_isodow,
               CAST(NULL AS DOUBLE) AS raw,
               CAST(NULL AS DOUBLE) AS locf,
               CAST(NULL AS DOUBLE) AS interp
        FROM region CROSS JOIN spine
    ),
    observed AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               round(CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE), 4)
                   AS raw
        FROM events
        WHERE day(ts) % 3 = 0
        GROUP BY 1, 2
    ),
    dense AS (
        SELECT k.event_type, s.d, o.raw,
               datediff('day', DATE '2024-01-01', s.d) AS idx
        FROM (SELECT DISTINCT event_type FROM events
              WHERE day(ts) % 3 = 0) k
        CROSS JOIN spine s
        LEFT JOIN observed o
          ON o.event_type = k.event_type AND o.d = s.d
    ),
    anchored AS (
        SELECT event_type, d, raw, idx,
               last_value(raw IGNORE NULLS) OVER w_back AS prev_v,
               last_value(CASE WHEN raw IS NOT NULL THEN idx END
                          IGNORE NULLS) OVER w_back AS prev_t,
               first_value(raw IGNORE NULLS) OVER w_fwd AS next_v,
               first_value(CASE WHEN raw IS NOT NULL THEN idx END
                           IGNORE NULLS) OVER w_fwd AS next_t
        FROM dense
        WINDOW
          w_back AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          w_fwd AS (PARTITION BY event_type ORDER BY d
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ),
    fill_part AS (
        SELECT 'fill' AS part, event_type AS series,
               strftime(d, '%Y-%m-%d') AS spine_date,
               CAST(isodow(d) AS BIGINT) AS spine_isodow,
               raw,
               prev_v AS locf,
               round(CASE WHEN raw IS NOT NULL THEN raw
                          WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                            THEN prev_v + (next_v - prev_v)
                                 * (idx - prev_t) / (next_t - prev_t)
                          ELSE coalesce(prev_v, next_v) END, 4) AS interp
        FROM anchored
    )
    SELECT * FROM spine_part
    UNION ALL
    SELECT * FROM fill_part
    ORDER BY part, series, spine_date
    """,
    tags=("datetime", "J5", "timeseries", "gap-fill"),
)
def date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification AND gap filling, one suite.

    Part `spine`: sequence()+explode date spine × region — replaces the
    reference's driver-side pd.date_range→XCom hop
    (mobility_ingestion_pipeline.py:403-411) with a fully distributed
    spine; the dim×spine crossJoin is J5, the bridge every calendar
    densification needs (same shape as the holiday bridge in
    pipeline/mobility.py).

    Part `fill`: the step the reference never takes — a deliberately
    sparsified daily series (observations only every 3rd day) densified
    over the spine, then LOCF-filled and linearly interpolated via
    `functions/timeseries.py` (pure window Columns, one shuffle on the
    series key; day 31 exercises the trailing-gap carry-forward, days
    1–2 the leading-gap backfill)."""
    from ..functions.datetime_fns import date_sequence
    from ..functions.timeseries import densify, with_fill_columns
    from ..operators.relational import dsum

    spine = (
        spark.range(1)
        .select(
            F.explode(date_sequence("2024-01-01", "2024-01-31")).alias("d")
        )
        .select(
            F.col("d"),
            F.date_format("d", "yyyy-MM-dd").alias("spine_date"),
            (F.weekday("d") + 1).cast("long").alias("spine_isodow"),
        )
    )
    null_d = F.lit(None).cast("double")
    region = load_table(spark, sf_dir, "region").select("r_name")
    spine_part = region.crossJoin(broadcast(spine.drop("d"))).select(
        F.lit("spine").alias("part"),
        F.col("r_name").alias("series"),
        "spine_date",
        "spine_isodow",
        null_d.alias("raw"),
        null_d.alias("locf"),
        null_d.alias("interp"),
    )

    events = load_table(spark, sf_dir, "events")
    observed = (
        events.filter(F.dayofmonth("ts") % 3 == 0)
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.round(dsum("value"), 4).alias("raw"))
    )
    dense = densify(
        observed, spine.select("d"), keys=["event_type"], time_col="d"
    ).withColumn("idx", F.datediff("d", F.lit("2024-01-01")))
    filled = with_fill_columns(
        dense, keys=["event_type"], order_col="d", index_col="idx",
        value_col="raw",
    )
    fill_part = filled.select(
        F.lit("fill").alias("part"),
        F.col("event_type").alias("series"),
        F.date_format("d", "yyyy-MM-dd").alias("spine_date"),
        (F.weekday("d") + 1).cast("long").alias("spine_isodow"),
        "raw",
        "locf",
        F.round("interp", 4).alias("interp"),
    )
    return spine_part.unionByName(fill_part).orderBy(
        "part", "series", "spine_date"
    )


_PIVOT_HOURS = list(range(24))

@register(
    "pivot_day_profile",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS event_date,
    """ + ",\n".join(
        f"       coalesce(round(CAST(sum(CAST(value AS DECIMAL(25,6)))"
        f" FILTER (WHERE hour(ts) = {h}) AS DOUBLE), 4), 0.0) AS h{h}"
        for h in _PIVOT_HOURS
    ) + """
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("U1",),
)
def pivot_day_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 long→wide pivot with a pre-declared pivot domain (no extra
    distinct-values scan) — the clustering feature matrix."""
    events = load_table(spark, sf_dir, "events").withColumn(
        "hh", F.hour("ts")
    )
    wide = (
        events.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("event_date"))
        .pivot("hh", _PIVOT_HOURS)
        .agg(F.round(dsum("value"), 4))
        .na.fill(0.0)
    )
    renamed = wide.select(
        "event_date",
        *[F.col(str(h)).alias(f"h{h}") for h in _PIVOT_HOURS],
    )
    return renamed.orderBy("event_date")


@register(
    "silver_batch_audit",
    oracle="""
    SELECT count(*) AS n_rows,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE), 2)
               AS total_qty,
           count(DISTINCT strftime(l_shipdate, '%Y-%m-%d')) AS n_days,
           count(DISTINCT p_brand) AS n_brands,
           count(DISTINCT s_nationkey) AS n_supp_nations
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE TRY_CAST(l_quantity AS DOUBLE) IS NOT NULL
    """,
    tags=("S10", "BASELINE"),
    bench=True,
)
def silver_batch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BASELINE.md's day-equivalent batch shape: full fact scan + typed
    cast cleaning + two broadcast dim joins + batch audit — the workload
    whose per-day latency must stay flat as the table grows."""
    # r13: fan_out removed — with micro-unit partials (see dsum) the
    # probes + Expand + agg cost less than the fan_out exchange did
    # (A/B at sf0.1: 1.11 s → 0.90 s direct); production multi-split
    # layouts never fanned out anyway.
    #
    # Deliberately the FLAT three-COUNT(DISTINCT) form: the Expand it
    # plans (row per distinct clause) happens BEFORE the map-side
    # partial aggregate, so shuffled volume stays bounded by distinct
    # combos — and an A/B against the pre-group-on-the-triple
    # restructure measured the flat form FASTER at sf0.1 (1.58 s vs
    # 1.83 s min-of-3: the extra shuffle stage + per-group DECIMAL
    # partials cost more than the Expand saves).
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        lineitem.filter(
            F.col("l_quantity").cast("double").isNotNull()
        )
        .join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(dsum("l_quantity"), 2).alias("total_qty"),
            # to_date, not date_format: counting distinct DATES equals
            # counting distinct date STRINGS (bijection), and the
            # per-row timestamp→string format was measurable CPU in
            # this query's one big aggregate stage (guide §1.2 step 2)
            F.countDistinct(F.to_date("l_shipdate")).alias("n_days"),
            F.countDistinct("p_brand").alias("n_brands"),
            F.countDistinct("s_nationkey").alias("n_supp_nations"),
        )
    )


def fact_bucket_count(
    *parquet_paths: str,
    target_bytes: int = 16 << 20,
    floor: int = 16,
    cap: int = 4096,
) -> int:
    """Bucket count sized to the DATA, not a constant: one bucket per
    ~16 MB of source parquet, floored at 16.  A fixed bucket count is
    the classic bucketing trap — the weak-scaling curve measured it:
    16 buckets at ×100 the fact volume caps the join at 16 tasks and
    sorts ~4M rows per task (×23.7 wall at ×10 the data).  At 100 TB
    you size buckets so one bucket ≈ one task's comfortable sort, and
    both join sides must agree on the count (same rule, same inputs).
    """
    import math

    total = 0
    for p in parquet_paths:
        if os.path.isdir(p):
            for root, _d, fs in os.walk(p):
                total += sum(
                    os.path.getsize(os.path.join(root, f))
                    for f in fs
                    if f.endswith(".parquet")
                )
        elif os.path.exists(p):
            total += os.path.getsize(p)
    return max(floor, min(cap, math.ceil(total / target_bytes)))


def _bucketed_fact_specs(spark: SparkSession, sf_dir: str):
    """(n_buckets, {table_name: (df, bucket_key)}) for the shared
    bucketed lineitem/orders layout of `sf_dir`."""
    import hashlib

    n_buckets = fact_bucket_count(
        os.path.join(sf_dir, "lineitem.parquet"),
        os.path.join(sf_dir, "orders.parquet"),
    )
    # n_buckets is part of the tag: if the source bytes under the same
    # sf_dir change enough to move the derived count, the name changes
    # and the stale layout can never be attached under the new count
    # (attach_or_save_bucketed's _N_BUCKETS marker is the second lock)
    tag = hashlib.md5(
        f"{sf_dir}:{n_buckets}".encode()
    ).hexdigest()[:8]
    # column set serves EVERY orderkey-join consumer (bucketed_fact_join
    # needs price/discount; gravity_gaps adds suppkey/quantity/custkey)
    # — parquet column pruning keeps each query's scan narrow, so the
    # wider layout costs writes nothing at read time
    tables = {
        f"bf2_lineitem_{tag}": (
            load_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_suppkey", "l_quantity",
                "l_extendedprice", "l_discount"
            ),
            "l_orderkey",
        ),
        f"bf2_orders_{tag}": (
            load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey", "o_orderpriority"
            ),
            "o_orderkey",
        ),
    }
    return n_buckets, tables


def ensure_bucketed_facts(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str]:
    """Create-or-attach the bucketed lineitem/orders layout for
    `sf_dir` and return the two table names.  This is the EXPLICIT
    prepare step (`prepare` below aliases it): the one-time CTAS
    shuffle is DDL paid here — bench.py's warmup, scale_curve.py, and
    the plan tests call it; the query builders themselves never write
    (they attach-or-fall-back via `attach_bucketed_facts`)."""
    from ..sources.lakehouse import attach_or_save_bucketed

    n_buckets, tables = _bucketed_fact_specs(spark, sf_dir)
    for name, (df, key) in tables.items():
        # re-registers surviving bucket files from a previous session
        # instead of re-shuffling — write once, ever
        attach_or_save_bucketed(
            spark, df, name, key, n_buckets, sort_col=key
        )
    return tuple(tables)


def attach_bucketed_facts(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str] | None:
    """Attach-only twin of `ensure_bucketed_facts`: the two table names
    if the layout is already usable (session catalog, or surviving
    files re-registered — metadata-only DDL, no data written), else
    None.  Query builders call THIS, so building a plan never triggers
    the CTAS write as a side effect; an unprepared session falls back
    to the plain parquet scans (correct, one extra shuffle)."""
    from ..sources.lakehouse import attach_bucketed

    n_buckets, tables = _bucketed_fact_specs(spark, sf_dir)
    ok = all(
        attach_bucketed(spark, df, name, key, n_buckets, sort_col=key)
        for name, (df, key) in tables.items()
    )
    return tuple(tables) if ok else None


def prepare(spark: SparkSession, sf_dir: str) -> None:
    """Build every prepared layout the registry's queries can ride
    (currently: the bucketed lineitem/orders facts).  Call once per
    warehouse before benchmarking — queries stay side-effect-free."""
    ensure_bucketed_facts(spark, sf_dir)


@register(
    "bucketed_fact_join",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_lines,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(25,6))) AS DOUBLE), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1 ORDER BY 1
    """,
    tags=("join", "bucketing", "scale"),
    bench=True,
)
def bucketed_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact×fact join done the 100 TB way: both sides bucketed on
    the join key at write time (CLUSTERED BY ... INTO n BUCKETS, n
    sized to the data — see `fact_bucket_count`), so the join plans as
    a SortMergeJoin with NO Exchange on either side — the shuffle
    happened once at write time, not on every query
    (tests/test_plans.py proves the zero-exchange property).  The
    oracle is the plain unbucketed join: bucketing must be
    result-invariant.

    Plan-building is side-effect-free: the builder ATTACHES the layout
    `prepare`/`ensure_bucketed_facts` built (bench warmup and the plan
    tests call it); an unprepared session falls back to the plain
    parquet scans — same rows, one orderkey shuffle."""
    names = attach_bucketed_facts(spark, sf_dir)
    if names is not None:
        li, o = (spark.table(n) for n in names)
    else:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        )
    return (
        li.hint("MERGE")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "event_type_stats",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99,
           count(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_with_k,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
           max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("percentile", "json", "semi-structured", "A-family"),
)
def event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles + JSON path-extraction stats in one
    grouped pass.

    Percentiles: Spark's percentile() and DuckDB's quantile_cont share
    linear-interpolation semantics bit-for-bit; the 100 TB path is
    approx_percentile (t-digest, mergeable, single pass) validated
    against this exact baseline.  JSON: get_json_object stays in the
    JVM (Jackson) — no schema-inference pass over 100 TB (use
    from_json with an explicit schema when the shape is known)."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", "value", k.alias("k"))
        .groupBy("event_type")
        .agg(
            *[
                F.round(F.percentile("value", p), 4).alias(
                    f"p{int(p * 100)}"
                )
                for p in (0.5, 0.9, 0.99)
            ],
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )
