"""JSON-Lines ingestion — the native interchange format of large-scale
training-data pipelines (web-crawl dumps, shard manifests, eval sets).

The reference's bronze contract (all-varchar CSV + audit columns,
mobility_ingestion_pipeline.py:186-190) generalized to JSONL with the
same philosophy applied to JSON's failure modes:

  - **Schema is explicit or sampled, never full-scan-inferred.**  With
    no `schema`, structure is inferred from the first
    `sample_files` files only (at 100 TB a whole-corpus inference
    pass costs a full read before the first real job; a bounded sample
    costs seconds and drifting late files surface in the corrupt lane
    instead of silently widening the schema).
  - **Malformed lines are captured, not dropped.**  PERMISSIVE mode
    routes unparseable lines into `_corrupt_record`;
    `split_corrupt` separates the clean rows from a quarantine
    frame carrying (raw line, filename) — the training-data analog of
    the reference's ignore_errors=true, but auditable: crawl dumps
    routinely carry truncated/interleaved lines and "dropped 0.3% of
    bronze" must be a queryable fact, not a silent default.
  - Audit columns appended exactly like `read_bronze_csv`:
    ingestion_timestamp, source_url, filename.
  - `.jsonl.gz` / `.json.gz` are handled natively by Spark (one gz
    file = one task; crawl dumps ship as many such files, so
    parallelism comes from file count — same note as the CSV source).

`write_jsonl` is the matching sink (shard-manifest/eval-set export):
one directory of `part-*.json[.gz]` files, newline-delimited, the
format `read_jsonl` round-trips.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    source_url: str | None = None,
    sample_files: int = 8,
    multiline: bool = False,
) -> DataFrame:
    """PERMISSIVE JSONL scan with a corrupt-record lane + audit columns.

    `schema`: explicit StructType/DDL string (production path — exact,
    zero inference jobs).  When None, the schema is inferred from the
    first `sample_files` files (lexicographic, deterministic) and then
    applied to the full glob — bounded driver work regardless of
    corpus size.  Either way the applied schema gains a string
    `_corrupt_record` column so unparseable lines surface as rows
    with every data field NULL and the raw line preserved.

    `multiline=True` reads whole-file JSON documents (one record per
    file or a top-level array) instead of line-delimited records —
    Spark then cannot split within a file, so it is the small-config-
    file path, not the corpus path.
    """
    if schema is None:
        files = _sample_paths(spark, path, sample_files)
        inferred = (
            spark.read.option("multiLine", str(multiline).lower())
            .json(files if files else path)
            .schema
        )
        fields = [f for f in inferred.fields if f.name != CORRUPT_COL]
        schema = StructType(fields)
    elif isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    with_corrupt = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    df = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", str(multiline).lower())
        .schema(with_corrupt)
        .json(path)
    )
    return df.select(
        "*",
        F.current_timestamp().alias("ingestion_timestamp"),
        F.lit(source_url or path).alias("source_url"),
        F.input_file_name().alias("filename"),
    )


def materialize_bronze(df: DataFrame) -> DataFrame:
    """One-pass materialization of a `read_jsonl` frame so corrupt-lane
    queries are legal and the raw JSON is parsed exactly once.

    Spark refuses plans whose file-scan schema is ONLY the corrupt
    column (`[UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN]`:
    the parser prunes data fields, so "which rows failed" is
    unknowable from a corrupt-only scan) — the documented contract is
    to materialize the parsed result, then split.  This is the
    session-local form: a lazy `localCheckpoint` computes all columns
    on first action and serves every later query (clean, quarantine,
    stats) from the checkpoint blocks — ONE scan+parse total, blocks
    freed by the ContextCleaner when the frame is dropped.  The
    production form at 100 TB is the same move spelled durably: land
    bronze as a lakehouse table in a single write, split from the
    table — parse-once is exactly what a bronze layer is FOR.
    """
    plan = df._jdf.queryExecution().logical().toString()
    if "LogicalRDD" in plan or "ExistingRDD" in plan:
        return df  # already materialized — don't re-checkpoint
    return df.localCheckpoint(eager=False)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) from a `read_jsonl` frame.

    clean = parseable rows without the corrupt/audit plumbing column;
    quarantine = (raw_line, filename, ingestion_timestamp) for every
    line the parser could not decode — the auditable drop lane.
    Routes through `materialize_bronze` (see there for why); callers
    that also want `corrupt_stats` should materialize once themselves
    and pass the same frame to both.
    """
    df = materialize_bronze(df)
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line"),
        "filename",
        "ingestion_timestamp",
    )
    return clean, quarantine


def corrupt_stats(df: DataFrame) -> DataFrame:
    """Per-file parse health: (filename, n_rows, n_corrupt, corrupt_pct).
    One aggregate over the (materialized) scan — the monitoring query
    a crawl-ingest job logs per batch."""
    return (
        materialize_bronze(df)
        .groupBy("filename")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.col(CORRUPT_COL)).alias("n_corrupt"),
        )
        .select(
            "filename",
            "n_rows",
            "n_corrupt",
            F.round(F.col("n_corrupt") * 100.0 / F.col("n_rows"), 4).alias(
                "corrupt_pct"
            ),
        )
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """Newline-delimited JSON sink (shard manifests, eval-set export).
    `compression='gzip'` writes `.json.gz` parts; the reader round-
    trips either.  Audit/plumbing columns are the caller's to drop —
    this writes exactly the frame it is given."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    source_url: str | None = None,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """Streaming twin of `read_jsonl` for continuous crawl-dump ingest:
    `readStream` over the landing directory with the same PERMISSIVE
    corrupt-record lane and audit columns.  Pair with
    `streaming.daily.stream_to_table` (exactly-once lakehouse sink) and
    Trigger.AvailableNow for bounded backlog drains — the checkpoint
    tracks consumed files, so re-running is a no-op.  Schema must be
    explicit (streams cannot run an inference pass); land corrupt rows
    with the batch and split from the bronze table (see
    `materialize_bronze` — parse-once applies doubly to streams).
    """
    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    with_corrupt = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    return (
        spark.readStream.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
        .select(
            "*",
            F.current_timestamp().alias("ingestion_timestamp"),
            F.lit(source_url or path).alias("source_url"),
            F.input_file_name().alias("filename"),
        )
    )


def _sample_paths(spark: SparkSession, path: str, n: int) -> list[str]:
    """First `n` matching files, lexicographic — deterministic and
    driver-cheap (one FileSystem glob, no Spark job)."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    try:
        statuses = fs.globStatus(p)
        if statuses is None or len(statuses) == 0:
            # a directory path: list its data files
            statuses = fs.globStatus(
                jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "/*")
            )
    except Exception:
        return []
    if statuses is None:
        return []
    files = sorted(
        s.getPath().toString()
        for s in statuses
        if s.isFile() and not s.getPath().getName().startswith(("_", "."))
    )
    return files[:n]
