"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's query registry
(urban_mobility_data_lakehouse_spark/queries/): every implemented
operator from SURVEY.md §2 is registered there as a (Spark builder,
DuckDB oracle SQL) pair.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from urban_mobility_data_lakehouse_spark.queries import (
    all_oracles,
    all_queries,
)

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the hourly demand profile (the
    reference's most load-bearing query shape)."""
    return all_queries()["hourly_demand"](spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """Oracle SQL per query name.

    The driver contract gives this function no sf_dir parameter, and the
    driver executes the comparison at sf=0.01 — so data-derived callable
    oracles (knn_ivf's trained centroids) are resolved against
    DRIVER_SF_DIR (default /root/testdata/sf0.01, overridable via
    SPARK_GRAFT_ORACLE_SF_DIR should the driver ever move).  Static SQL
    oracles are scale-independent and unaffected.
    """
    return all_oracles()
