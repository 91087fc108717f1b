"""Driver row for the JSONL bronze source's corrupt-record lane.

The crawl-ingest shape (`sources/jsonl.py`): a landing directory of
newline-delimited JSON shards where some lines are truncated or
interleaved garbage — the PERMISSIVE reader quarantines them instead
of dropping, and "we dropped 0.3% of bronze" is a queryable fact.

The fixture is generated DETERMINISTICALLY from the sf_dir's own
documents.parquet (pyarrow, no Spark) so both the Spark builder and
the DuckDB oracle generator can materialize the identical landing
dir: 4 shard files, ~1-in-12 lines corrupted (doc_id % 23 == 5 →
truncation, % 23 == 11 → garbage).  The oracle replays the whole lane
in DuckDB: `read_json(ignore_errors=true)` for the clean side and a
`read_text` line-split with `json_valid` for totals/quarantine —
exactly the ignore_errors twin the reference's CSV ingest uses
(`mobility_ingestion_pipeline.py`, ignore_errors=true), made
auditable.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.jsonl import (
    corrupt_stats,
    materialize_bronze,
    read_jsonl,
    split_corrupt,
)
from . import register

_FIXTURE_ROOT = "/tmp/umdl_fixtures"
_DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
_DOC_COLUMNS = ("doc_id", "text", "lang", "source", "n_chars")
N_SHARDS = 4


def ensure_jsonl_corpus(sf_dir: str) -> str:
    """Idempotently materialize the deterministic JSONL landing dir for
    `sf_dir` and return its path.  Pure pyarrow + json — callable from
    the oracle generator, which has no SparkSession.

    Corruption plan (seeded by doc_id, so replication/retry-stable):
    doc_id % 23 == 5 → the JSON line truncated at 60% (a strict prefix
    of a JSON object is never valid JSON); % 23 == 11 → a non-JSON
    garbage marker line.  Everything else round-trips the document row
    exactly.  Lines are ensure_ascii JSON (both engines decode \\uXXXX
    escapes identically) and newline-free by construction.
    """
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out = os.path.join(_FIXTURE_ROOT, f"jsonl_corrupt_{tag}")
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    import pyarrow.parquet as pq

    rows = (
        pq.read_table(
            os.path.join(sf_dir, "documents.parquet"),
            columns=list(_DOC_COLUMNS),
        )
        .sort_by("doc_id")
        .to_pylist()
    )
    os.makedirs(out, exist_ok=True)
    shards = [
        open(
            os.path.join(out, f"shard-{i}.jsonl.tmp"),
            "w",
            encoding="utf-8",
        )
        for i in range(N_SHARDS)
    ]
    try:
        for r in rows:
            line = json.dumps(
                {k: r[k] for k in _DOC_COLUMNS},
                ensure_ascii=True,
                separators=(",", ":"),
            )
            m = r["doc_id"] % 23
            if m == 5:
                line = line[: max(10, (len(line) * 3) // 5)]
            elif m == 11:
                line = f"###corrupt###{r['doc_id']}"
            shards[r["doc_id"] % N_SHARDS].write(line + "\n")
    finally:
        for f in shards:
            f.close()
    for i in range(N_SHARDS):
        os.replace(
            os.path.join(out, f"shard-{i}.jsonl.tmp"),
            os.path.join(out, f"shard-{i}.jsonl"),
        )
    with open(marker, "w") as f:
        f.write("ok")
    return out


def _jsonl_oracle(sf_dir: str) -> str:
    path = ensure_jsonl_corpus(sf_dir)
    glob = os.path.join(path, "*.jsonl")
    return f"""
    WITH clean AS (
        SELECT *, regexp_extract(filename, '[^/]+$') AS fname
        FROM read_json('{glob}',
                       format='newline_delimited',
                       ignore_errors=true,
                       filename=true,
                       columns={{'doc_id': 'BIGINT', 'text': 'VARCHAR',
                                 'lang': 'VARCHAR', 'source': 'VARCHAR',
                                 'n_chars': 'BIGINT'}})
    ),
    lines AS (
        SELECT regexp_extract(filename, '[^/]+$') AS fname,
               unnest(string_split(rtrim(content, chr(10)), chr(10)))
                   AS line
        FROM read_text('{glob}')
    ),
    per_file AS (
        SELECT fname, count(*) AS n_rows,
               count(*) FILTER (WHERE NOT json_valid(line)) AS n_bad
        FROM lines GROUP BY fname
    )
    SELECT * FROM (
        SELECT 'file' AS part, fname AS key, n_rows, n_bad,
               round(n_bad * 100.0 / n_rows, 4) AS val
        FROM per_file
        UNION ALL
        -- ignore_errors=true surfaces unparseable lines as all-NULL
        -- rows (it does not skip them); every clean fixture line
        -- carries doc_id, so non-NULL doc_id == parsed
        SELECT 'lang', lang, count(*), CAST(NULL AS BIGINT),
               round(avg(octet_length(encode(text))), 4)
        FROM clean WHERE doc_id IS NOT NULL GROUP BY lang
        UNION ALL
        SELECT 'quarantine', 'all', count(*), CAST(NULL AS BIGINT),
               round(avg(octet_length(encode(line))), 4)
        FROM lines WHERE NOT json_valid(line)
    )
    ORDER BY part, key
    """


@register(
    "jsonl_corrupt_lane",
    oracle=_jsonl_oracle,  # callable: the fixture path derives from sf_dir
    tags=("source", "jsonl", "bronze", "corrupt-lane"),
)
def jsonl_corrupt_lane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full corrupt-lane audit of a JSONL landing dir, one labeled
    union (scalar columns only, per the driver canonicalizer):

    `file`: per-shard parse health — key = shard file name, n_rows =
    total lines, n_bad = quarantined lines, val = corrupt percentage
    (the monitoring row a crawl-ingest job logs per batch).
    `lang`: per-language profile of the CLEAN side — n_rows = docs,
    val = avg byte length (content-sensitive: any mis-parsed field
    moves the hash).  `quarantine`: the raw-line lane — n_rows =
    total quarantined lines, val = their avg byte length (the raw
    bytes are preserved verbatim, so this pins the quarantine payload
    too).  One scan + parse total: the bronze frame is materialized
    once (`materialize_bronze`) and every part reads the checkpoint.
    """
    path = ensure_jsonl_corpus(sf_dir)
    bronze = materialize_bronze(
        read_jsonl(spark, path, schema=_DOC_SCHEMA)
    )
    file_part = corrupt_stats(bronze).select(
        F.lit("file").alias("part"),
        F.element_at(F.split(F.col("filename"), "/"), -1).alias("key"),
        "n_rows",
        F.col("n_corrupt").alias("n_bad"),
        F.col("corrupt_pct").alias("val"),
    )
    clean, quarantine = split_corrupt(bronze)
    lang_part = clean.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.avg(F.octet_length("text")), 4).alias("val"),
    ).select(
        F.lit("lang").alias("part"),
        F.col("lang").alias("key"),
        "n_rows",
        F.lit(None).cast("long").alias("n_bad"),
        "val",
    )
    quar_part = quarantine.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.avg(F.octet_length("raw_line")), 4).alias("val"),
    ).select(
        F.lit("quarantine").alias("part"),
        F.lit("all").alias("key"),
        "n_rows",
        F.lit(None).cast("long").alias("n_bad"),
        "val",
    )
    return file_part.unionByName(lang_part).unionByName(
        quar_part
    ).orderBy("part", "key")
