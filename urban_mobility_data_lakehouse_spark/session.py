"""SparkSession factory tuned for the engine.

The reference delegates execution to DuckDB's vectorized engine
(docs/report/main.tex:135); the Spark-first equivalent is whole-stage
codegen + Tungsten with AQE enabled, Arrow for any pandas interchange,
and shuffle partitioning sized for the target data scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime confs every entry point needs regardless of who built the session
# (the driver harness builds its own SparkSession for queries()).
RUNTIME_CONFS: dict[str, str] = {
    # testdata events.parquet carries TIMESTAMP(NANOS); Spark 4 refuses it
    # unless nanos are surfaced as raw long (we rebuild the timestamp).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Oracle comparisons run against DuckDB's naive timestamps: pin UTC so
    # hour()/date extraction agree.  (The mobility pipeline itself pins
    # Europe/Madrid — see pipeline/mobility.py.)
    "spark.sql.session.timeZone": "UTC",
    # Runtime re-planning: coalesce tiny shuffle partitions, split skewed
    # ones — the local stand-in for what matters at 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # AQE's parallelism-first coalescing floors post-shuffle partitions
    # at minPartitionSize (default 1 MB): a 2-3 MB window/sessionize
    # shuffle coalesces to 2 tasks and serializes CPU-bound sort+window
    # work on a 32-core box (measured: running_totals 1.14 → 0.82 s,
    # sessionize 1.22 → 1.01 s, simhash 2.3 → 1.6 s at sf0.1 with 64k).
    # Scale-adaptive, not local-tuned: the floor only binds when
    # total-shuffle-bytes/parallelism < 1 MB — at 100 TB real shuffles
    # are orders of magnitude past it and AQE's advisory size governs;
    # env-overridable for deployments that want the 1 MB floor back.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": os.environ.get(
        "SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "64k"
    ),
    # Arrow for the few pandas crossings (KMeans profiles, reporting edge).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Bronze tables are partitioned by raw string dates (fecha=YYYYMMDD);
    # inference would silently read them back as INT, breaking the
    # all-varchar schema-on-read contract.
    "spark.sql.sources.partitionColumnTypeInference.enabled": "false",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally built session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # non-runtime-settable in this build → only settable at create
            pass
    return spark


def get_spark(
    app_name: str = "urban-mobility-lakehouse-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned session.

    local[$SPARK_GRAFT_CPUS] by default; shuffle partitions default to the
    local core count — on a real cluster you would size this to
    ~2-3× total executor cores (or leave AQE's coalescing to shrink an
    intentionally high initial number).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(cpus)),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    if extra_confs:
        for k, v in extra_confs.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return apply_runtime_confs(spark)
