"""Relational-core queries (SURVEY.md §2.2–§2.7) with DuckDB oracles.

Column names and numeric types are aligned on both sides (aggregates
aliased identically, ints emitted as BIGINT, floats rounded the same way)
because the driver hashes values after sorting columns by name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import relational as R
from ..sources.testdata import load_table
from . import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- Aggregations ---------------------------------------------------------

@register(
    "hourly_demand",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS event_date,
           hour(ts) AS hour,
           round(CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE), 4) AS total_value,
           count(*) AS n_events
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("A1", "O1", "flagship"),
    bench=True,
)
def hourly_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.hourly_profile(_t(spark, sf_dir, "events"))


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE), 2) AS sum_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE), 2) AS sum_base_price,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE), 2) AS sum_disc_price,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / count(l_quantity), 4) AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / count(l_extendedprice), 4) AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) / count(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("A1",),
    bench=True,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.pricing_summary(_t(spark, sf_dir, "lineitem"))


@register(
    "global_stats",
    oracle="""
    SELECT count(*) AS n_rows,
           round(CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE), 4) AS sum_value,
           count(DISTINCT user_id) AS n_users,
           count(DISTINCT strftime(ts, '%Y-%m-%d')) AS n_days,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
    FROM events
    """,
    tags=("A2", "A3"),
)
def global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.global_stats(_t(spark, sf_dir, "events"))


@register(
    "conditional_agg",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           coalesce(count(*) FILTER (WHERE o_orderstatus = 'O'), 0) AS n_open,
           coalesce(count(*) FILTER (WHERE o_totalprice > 300000.0), 0)
               AS n_high_value,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6)))
                      FILTER (WHERE o_orderstatus = 'F') AS DOUBLE)
                 / count(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 4)
               AS avg_finished_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("A4",),
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.conditional_agg(_t(spark, sf_dir, "orders"))


@register(
    "min_dedup_map",
    oracle="""
    SELECT l_partkey AS part_key,
           min(l_suppkey) AS canonical_suppkey,
           count(*) AS n_lines
    FROM lineitem
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("A5",),
)
def min_dedup_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.min_dedup_map(_t(spark, sf_dir, "lineitem"))


@register(
    "two_level_agg",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS event_date,
               CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS daily_total
        FROM events GROUP BY 1
    )
    SELECT CASE WHEN isodow(event_date) >= 6 THEN 'weekend'
                ELSE 'weekday' END AS day_type,
           count(*) AS n_days,
           round(CAST(sum(CAST(daily_total AS DECIMAL(25,6))) AS DOUBLE) / count(daily_total), 4) AS avg_daily_total
    FROM daily
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("A11",),
)
def two_level_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.two_level_agg(_t(spark, sf_dir, "events"))


@register(
    "modal_event_type",
    oracle="""
    WITH counts AS (
        SELECT user_id, event_type, count(*) AS cnt
        FROM events GROUP BY 1, 2
    ), ranked AS (
        SELECT user_id, event_type, cnt,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY cnt DESC, event_type ASC) AS rn
        FROM counts
    )
    SELECT user_id, event_type AS modal_type, cnt AS modal_count
    FROM ranked WHERE rn = 1
    ORDER BY user_id
    """,
    tags=("A7",),
)
def modal_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.modal_event_type(_t(spark, sf_dir, "events"))


@register(
    "ordered_set_agg",
    oracle="""
    SELECT user_id,
           array_to_string(array_agg(DISTINCT event_type ORDER BY event_type),
                           ',') AS event_types,
           count(DISTINCT event_type) AS n_types
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("A8",),
)
def ordered_set_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.ordered_set_agg(_t(spark, sf_dir, "events"))


@register(
    "summarize_profile",
    oracle="""
    SELECT * FROM (
        SELECT 'o_custkey' AS column_name, count(*) AS n_rows,
               count(*) - count(o_custkey) AS n_nulls,
               count(DISTINCT o_custkey) AS n_distinct,
               min(CAST(o_custkey AS VARCHAR)) AS min_value,
               max(CAST(o_custkey AS VARCHAR)) AS max_value
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
               count(DISTINCT o_orderstatus),
               min(CAST(o_orderstatus AS VARCHAR)),
               max(CAST(o_orderstatus AS VARCHAR))
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
               count(DISTINCT o_totalprice),
               min(CAST(o_totalprice AS VARCHAR)),
               max(CAST(o_totalprice AS VARCHAR))
        FROM orders
    ) ORDER BY column_name
    """,
    tags=("A12", "S12"),
)
def summarize_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.summarize_profile(
        _t(spark, sf_dir, "orders"),
        ["o_custkey", "o_orderstatus", "o_totalprice"],
    )


@register(
    "scalar_subquery_coverage",
    oracle="""
    SELECT (SELECT count(DISTINCT c_nationkey) FROM customer) AS nations_with_customers,
           (SELECT count(*) FROM nation) AS n_nations,
           CAST(round((SELECT count(DISTINCT c_nationkey) FROM customer) * 100.0
                 / nullif((SELECT count(*) FROM nation), 0), 4) AS DOUBLE)
               AS coverage_pct
    """,
    tags=("A9",),
)
def scalar_subquery_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql("""
        SELECT (SELECT count(DISTINCT c_nationkey) FROM customer)
                   AS nations_with_customers,
               (SELECT count(*) FROM nation) AS n_nations,
               CAST(round(
                   (SELECT count(DISTINCT c_nationkey) FROM customer) * 100.0
                     / nullif((SELECT count(*) FROM nation), 0), 4) AS DOUBLE)
                   AS coverage_pct
    """)


# --- Joins ----------------------------------------------------------------

@register(
    "sales_by_nation",
    oracle="""
    SELECT n_name,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE), 2) AS total_sales,
           count(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    tags=("J1",),
    bench=True,
)
def sales_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.sales_by_nation(
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "nation"),
    )


@register(
    "roleplay_nations",
    oracle="""
    SELECT cn.n_name AS cust_nation,
           sn.n_name AS supp_nation,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("J7", "J1"),
    bench=True,
)
def roleplay_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.roleplay_nations(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
    )


@register(
    "left_join_enrich",
    oracle="""
    WITH per_nation AS (
        SELECT c_nationkey, count(*) AS cnt,
               CAST(sum(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS bal
        FROM customer GROUP BY 1
    )
    SELECT n_name,
           coalesce(cnt, 0) AS n_customers,
           round(coalesce(bal, 0.0), 2) AS total_acctbal
    FROM nation LEFT JOIN per_nation ON n_nationkey = c_nationkey
    ORDER BY n_name
    """,
    tags=("J3", "A10"),
)
def left_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.left_join_enrich(
        _t(spark, sf_dir, "nation"), _t(spark, sf_dir, "customer")
    )


@register(
    "compound_key_join",
    oracle="""
    WITH daily AS (
        SELECT o_custkey AS d_custkey, o_orderdate AS d_orderdate,
               count(*) AS orders_that_day
        FROM orders GROUP BY 1, 2
    )
    SELECT o_orderkey, o_custkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           orders_that_day
    FROM orders
    JOIN daily ON o_custkey = d_custkey AND o_orderdate = d_orderdate
    WHERE orders_that_day > 1
    ORDER BY o_orderkey
    """,
    tags=("J4",),
)
def compound_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.compound_key_join(_t(spark, sf_dir, "orders"))


@register(
    "cross_join_bridge",
    oracle="""
    SELECT r_name, o_orderpriority
    FROM region
    CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders)
    ORDER BY r_name, o_orderpriority
    """,
    tags=("J5",),
)
def cross_join_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.cross_join_bridge(
        _t(spark, sf_dir, "region"), _t(spark, sf_dir, "orders")
    )


@register(
    "anti_join_orphans",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    tags=("J6",),
)
def anti_join_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.anti_join_orphans(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


@register(
    "semi_join_active",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    ORDER BY c_custkey
    """,
    tags=("J6",),
)
def semi_join_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.semi_join_active(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


# --- Windows, sorts, top-k ------------------------------------------------

@register(
    "surrogate_keys",
    oracle="""
    SELECT row_number() OVER (ORDER BY n_name) AS zone_id,
           n_name AS zone_name,
           CAST(n_regionkey AS BIGINT) AS region_key
    FROM nation
    ORDER BY zone_id
    """,
    tags=("W1",),
)
def surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.surrogate_keys(_t(spark, sf_dir, "nation"))


@register(
    "ntile_tiers",
    oracle="""
    WITH tiers AS (
        SELECT c_custkey,
               ntile(4) OVER (ORDER BY c_acctbal ASC, c_custkey ASC)
                   AS balance_tier
        FROM customer
    )
    SELECT balance_tier, count(*) AS n_customers
    FROM tiers GROUP BY 1 ORDER BY 1
    """,
    tags=("W2",),
)
def ntile_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.ntile_tiers(_t(spark, sf_dir, "customer"))


@register(
    "running_totals",
    oracle="""
    SELECT user_id, event_id,
           round(sum(value) OVER w_run, 4) AS running_value,
           round(lag(value, 1) OVER w_ord, 4) AS prev_value,
           round(avg(value) OVER w_mov, 4) AS moving_avg_3
    FROM events
    WINDOW w_ord AS (PARTITION BY user_id ORDER BY ts, event_id),
           w_run AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w_mov AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
    tags=("window", "beyond-reference"),
    bench=True,
)
def running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.running_totals(_t(spark, sf_dir, "events"))


@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
    tags=("O2",),
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.topk(_t(spark, sf_dir, "orders"))


# --- Filters / projections / set ops --------------------------------------

@register(
    "filter_suite",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, CAST(p_size AS BIGINT) AS p_size
    FROM part
    WHERE p_name LIKE '%widget%'
      AND p_brand NOT LIKE '%#1'
      AND p_type IN ('ECONOMY', 'PROMO', 'LARGE')
      AND regexp_matches(p_brand, '#\\d{2}$')
      AND p_size != 0
    ORDER BY p_partkey
    """,
    tags=("P3", "P4", "P6", "P7"),
)
def filter_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.filter_suite(_t(spark, sf_dir, "part"))


@register(
    "between_and_in",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE), 2) AS total_price
    FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY 1 ORDER BY 1
    """,
    tags=("P5", "P6"),
)
def between_and_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.between_and_in(_t(spark, sf_dir, "orders"))


@register(
    "try_cast_clean",
    oracle="""
    SELECT event_id,
           TRY_CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)
               AS k_value,
           CAST(round(TRY_CAST(value AS DOUBLE), 0) AS BIGINT) AS value_int
    FROM events
    WHERE TRY_CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)
          IS NOT NULL
    ORDER BY event_id
    """,
    tags=("P10",),
)
def try_cast_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.try_cast_clean(_t(spark, sf_dir, "events"))


@register(
    "distinct_days",
    oracle="""
    SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS event_date
    FROM events ORDER BY 1
    """,
    tags=("P9",),
)
def distinct_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.distinct_days(_t(spark, sf_dir, "events"))


@register(
    "set_ops",
    oracle="""
    SELECT nkey, 'both' AS membership FROM
        (SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nkey FROM customer
         INTERSECT
         SELECT DISTINCT CAST(s_nationkey AS BIGINT) FROM supplier)
    UNION ALL
    SELECT nkey, 'customer_only' FROM
        (SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nkey FROM customer
         EXCEPT
         SELECT DISTINCT CAST(s_nationkey AS BIGINT) FROM supplier)
    UNION ALL
    SELECT nkey, 'supplier_only' FROM
        (SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS nkey FROM supplier
         EXCEPT
         SELECT DISTINCT CAST(c_nationkey AS BIGINT) FROM customer)
    ORDER BY nkey, membership
    """,
    tags=("setops",),
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.set_ops(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "supplier")
    )


@register(
    "salted_agg",
    oracle="""
    SELECT event_type,
           round(CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE), 4)
               AS total_value,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("A1", "skew", "scale"),
    bench=True,
)
def salted_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted two-stage aggregation; the oracle is the plain
    unsalted GROUP BY — salting must be result-invariant."""
    return R.salted_agg(_t(spark, sf_dir, "events"))


@register(
    "sessionize_events",
    oracle=None,  # set below (shared template with the streaming tests)
    tags=("sessionization", "window", "streaming-analog"),
    bench=True,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (gaps-and-islands): the batch form of
    the stateful streaming operator in streaming/sessions.py."""
    import pyspark.sql.functions as F

    from ..streaming.sessions import sessionize

    return sessionize(_t(spark, sf_dir, "events"), gap_minutes=30).select(
        "user_id",
        "session_no",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias(
            "session_end"
        ),
        "n_events",
        "total_value",
    )


def _set_sessionize_oracle() -> None:
    from ..streaming.sessions import SESSIONIZE_ORACLE
    from . import REGISTRY, QuerySpec

    spec = REGISTRY["sessionize_events"]
    REGISTRY["sessionize_events"] = QuerySpec(
        spec.name,
        spec.builder,
        SESSIONIZE_ORACLE.format(gap_us=30 * 60 * 1_000_000),
        spec.tags,
        spec.bench,
    )


_set_sessionize_oracle()
