"""JSONL source/sink tests: PERMISSIVE corrupt-record lane, bounded
schema sampling, gz round-trip, per-file parse-health stats."""

from __future__ import annotations

import gzip
import json

import pyspark.sql.functions as F

from urban_mobility_data_lakehouse_spark.sources.jsonl import (
    corrupt_stats,
    materialize_bronze,
    read_jsonl,
    split_corrupt,
    write_jsonl,
)


def _write_lines(path, lines):
    path.write_text("\n".join(lines) + "\n")


def test_read_jsonl_explicit_schema_and_audit(spark, tmp_path):
    _write_lines(
        tmp_path / "a.jsonl",
        [
            json.dumps({"doc_id": 1, "text": "hello", "lang": "en"}),
            json.dumps({"doc_id": 2, "text": "hola", "lang": "es"}),
        ],
    )
    df = read_jsonl(
        spark,
        str(tmp_path / "a.jsonl"),
        schema="doc_id long, text string, lang string",
        source_url="s3://crawl/dump-01",
    )
    rows = df.collect()
    assert {"doc_id", "text", "lang", "_corrupt_record",
            "ingestion_timestamp", "source_url", "filename"} <= set(df.columns)
    assert sorted(r["doc_id"] for r in rows) == [1, 2]
    assert all(r["source_url"] == "s3://crawl/dump-01" for r in rows)
    assert all(r["filename"].endswith("a.jsonl") for r in rows)


def test_corrupt_lane_captures_raw_line(spark, tmp_path):
    """Truncated/garbage lines land in quarantine with the raw text
    preserved; clean side drops the plumbing column. Missing fields
    are NULL, not corrupt (JSON is schema-flexible by design)."""
    _write_lines(
        tmp_path / "b.jsonl",
        [
            json.dumps({"doc_id": 1, "text": "ok"}),
            '{"doc_id": 2, "text": "trunca',  # truncated mid-record
            "not json at all",
            json.dumps({"doc_id": 3}),  # missing field -> NULL, clean
        ],
    )
    df = read_jsonl(spark, str(tmp_path / "b.jsonl"),
                    schema="doc_id long, text string")
    clean, quarantine = split_corrupt(df)
    crows = clean.orderBy("doc_id").collect()
    assert [r["doc_id"] for r in crows] == [1, 3]
    assert "_corrupt_record" not in clean.columns
    qrows = quarantine.collect()
    assert len(qrows) == 2
    raws = {r["raw_line"] for r in qrows}
    assert '{"doc_id": 2, "text": "trunca' in raws
    assert "not json at all" in raws
    assert all(r["filename"].endswith("b.jsonl") for r in qrows)


def test_corrupt_stats_per_file(spark, tmp_path):
    _write_lines(tmp_path / "good.jsonl",
                 [json.dumps({"doc_id": i}) for i in range(4)])
    _write_lines(tmp_path / "bad.jsonl",
                 [json.dumps({"doc_id": 9}), "garbage", "{broken"])
    df = read_jsonl(spark, str(tmp_path / "*.jsonl"), schema="doc_id long")
    stats = {r["filename"].rsplit("/", 1)[-1]: r
             for r in corrupt_stats(df).collect()}
    assert stats["good.jsonl"]["n_corrupt"] == 0
    assert stats["bad.jsonl"]["n_rows"] == 3
    assert stats["bad.jsonl"]["n_corrupt"] == 2
    assert abs(stats["bad.jsonl"]["corrupt_pct"] - 200.0 / 3) < 0.01


def test_schema_sampled_from_bounded_file_set(spark, tmp_path):
    """Inference reads only the first `sample_files` files
    (lexicographic): a column that first appears in a later file is
    NOT in the schema — its rows still parse (JSON ignores unknown
    keys), proving inference cost is bounded by the sample, not the
    corpus."""
    _write_lines(tmp_path / "a.jsonl", [json.dumps({"doc_id": 1, "t": "x"})])
    _write_lines(tmp_path / "z.jsonl",
                 [json.dumps({"doc_id": 2, "t": "y", "late_col": 7})])
    df = read_jsonl(spark, str(tmp_path / "*.jsonl"), sample_files=1)
    assert "late_col" not in df.columns
    assert "doc_id" in df.columns and "t" in df.columns
    clean, quarantine = split_corrupt(df)
    assert clean.count() == 2 and quarantine.count() == 0


def test_gz_roundtrip_and_sink(spark, tmp_path):
    docs = [{"doc_id": i, "text": f"doc {i}"} for i in range(10)]
    gz = tmp_path / "in.jsonl.gz"
    with gzip.open(gz, "wt") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
    df = read_jsonl(spark, str(gz), schema="doc_id long, text string")
    clean, _ = split_corrupt(df)
    assert clean.count() == 10

    out = tmp_path / "out"
    write_jsonl(
        clean.select("doc_id", "text"), str(out), compression="gzip"
    )
    back = read_jsonl(spark, str(out), schema="doc_id long, text string")
    bclean, bquar = split_corrupt(back)
    assert bquar.count() == 0
    got = sorted(
        (r["doc_id"], r["text"])
        for r in bclean.select("doc_id", "text").collect()
    )
    assert got == [(d["doc_id"], d["text"]) for d in docs]


def test_split_sides_share_one_materialized_parse(spark, tmp_path):
    """Both split sides are shuffle-free filters over ONE shared
    checkpoint (parse-once), and a pre-materialized frame is not
    re-checkpointed by the helpers."""
    _write_lines(tmp_path / "c.jsonl", [json.dumps({"doc_id": 1})])
    df = materialize_bronze(
        read_jsonl(spark, str(tmp_path / "c.jsonl"), schema="doc_id long")
    )
    assert materialize_bronze(df) is df  # idempotent, no double parse
    clean, quarantine = split_corrupt(df)
    for side in (clean, quarantine):
        plan = side._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "ExistingRDD" in plan  # served from the checkpoint
    assert clean.count() == 1 and quarantine.count() == 0


def test_streaming_jsonl_ingest_exactly_once(spark, tmp_path):
    """read_jsonl_stream + stream_to_table: crawl files drain with
    AvailableNow into a lakehouse bronze table, corrupt lines ride
    along in the corrupt lane, and a re-run adds nothing."""
    from urban_mobility_data_lakehouse_spark.sources.jsonl import (
        read_jsonl_stream,
    )
    from urban_mobility_data_lakehouse_spark.sources.lakehouse import (
        Lakehouse,
    )
    from urban_mobility_data_lakehouse_spark.streaming.daily import (
        stream_to_table,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    _write_lines(
        landing / "d0.jsonl",
        [json.dumps({"doc_id": 1, "text": "a"}), "garbage line"],
    )
    _write_lines(landing / "d1.jsonl", [json.dumps({"doc_id": 2, "text": "b"})])

    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("bronze")

    def run():
        q = stream_to_table(
            read_jsonl_stream(
                spark, str(landing), schema="doc_id long, text string"
            ),
            lake,
            "bronze",
            "crawl",
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        q.awaitTermination(120)

    run()
    df = lake.read(spark, "bronze", "crawl")
    assert df.count() == 3
    clean, quarantine = split_corrupt(df)
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]
    assert quarantine.count() == 1
    run()  # replay: checkpoint + table-level batch ids make it a no-op
    assert lake.read(spark, "bronze", "crawl").count() == 3
