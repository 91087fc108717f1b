"""Per-file Bloom filter indexes (`sources/bloom.py`).

The scale claim: equality probes on high-cardinality columns whose
per-file [min, max] ranges fully overlap — where stats skipping is
useless — must still shrink `read_where`'s planned file set.  And the
safety claim: pruning is advisory; no lookup may ever lose rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from urban_mobility_data_lakehouse_spark.sources import bloom
from urban_mobility_data_lakehouse_spark.sources.lakehouse import Lakehouse


def _mk_lake(tmp_path) -> Lakehouse:
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("silver")
    return lake


def _append_users(spark, lake, start, step, n=200, name="t"):
    """n rows with user_key 'user_<start + i*step>' — interleaved steps
    make every file's [min, max] string range overlap completely."""
    df = (
        spark.range(n)
        .select(
            F.concat(
                F.lit("user_"),
                F.lpad((F.col("id") * step + start).cast("string"), 6, "0"),
            ).alias("user_key"),
            (F.col("id") * step + start).alias("num"),
        )
        .coalesce(1)
    )
    lake.append(df, "silver", name)


def test_spark_and_python_probe_positions_agree(spark):
    vals = ["user_000042", "x", "", "héllo", 12345]
    df = spark.createDataFrame([(str(v),) for v in vals], "v string").select(
        bloom.bloom_positions_col(F.col("v"), 4096, 3).alias("p")
    )
    got = [list(r["p"]) for r in df.collect()]
    want = [bloom.bloom_positions_py(str(v), 4096, 3) for v in vals]
    assert got == want


def test_bloom_prunes_where_minmax_cannot(spark, tmp_path):
    lake = _mk_lake(tmp_path)
    lake.add_bloom_index("silver", "t", "user_key")
    _append_users(spark, lake, 0, 2)  # evens
    _append_users(spark, lake, 1, 2)  # odds — identical string range
    full = lake.read(spark, "silver", "t")
    assert len(full.inputFiles()) == 2

    probe = [("user_key", "=", "user_000042")]  # an even key
    pruned = lake.read_where(spark, "silver", "t", probe)
    assert len(pruned.inputFiles()) == 1  # stats overlap; bloom prunes
    assert [r["num"] for r in pruned.collect()] == [42]

    # absent key: both files may prune (modulo false positives), and
    # the result must still be exactly empty
    gone = lake.read_where(
        spark, "silver", "t", [("user_key", "=", "user_999999")]
    )
    assert gone.count() == 0


def test_bloom_in_predicate_unions_candidates(spark, tmp_path):
    lake = _mk_lake(tmp_path)
    lake.add_bloom_index("silver", "t", "user_key")
    _append_users(spark, lake, 0, 2)
    _append_users(spark, lake, 1, 2)
    both = lake.read_where(
        spark, "silver", "t",
        [("user_key", "in", ["user_000042", "user_000043"])],
    )
    assert len(both.inputFiles()) == 2
    assert sorted(r["num"] for r in both.collect()) == [42, 43]
    one = lake.read_where(
        spark, "silver", "t", [("user_key", "in", ["user_000042"])]
    )
    assert len(one.inputFiles()) == 1


def test_bloom_never_loses_rows(spark, tmp_path):
    lake = _mk_lake(tmp_path)
    lake.add_bloom_index("silver", "t", "user_key")
    for s in range(4):
        _append_users(spark, lake, s, 4, n=100)
    full = lake.read(spark, "silver", "t")
    for key in ("user_000000", "user_000157", "user_000399", "user_777777"):
        got = sorted(
            r["num"]
            for r in lake.read_where(
                spark, "silver", "t", [("user_key", "=", key)]
            ).collect()
        )
        want = sorted(
            r["num"]
            for r in full.filter(F.col("user_key") == key).collect()
        )
        assert got == want


def test_files_written_before_index_never_prune(spark, tmp_path):
    lake = _mk_lake(tmp_path)
    _append_users(spark, lake, 0, 2)  # pre-index: no bloom recorded
    lake.add_bloom_index("silver", "t", "user_key")
    _append_users(spark, lake, 1, 2)
    # a key from the *pre-index* file: its file has no filter, so it
    # must survive; the indexed odd file proves absence and prunes
    pruned = lake.read_where(
        spark, "silver", "t", [("user_key", "=", "user_000042")]
    )
    assert len(pruned.inputFiles()) == 1
    assert [r["num"] for r in pruned.collect()] == [42]


def test_compaction_reindexes_bloom(spark, tmp_path):
    lake = _mk_lake(tmp_path)
    lake.add_bloom_index("silver", "t", "user_key")
    _append_users(spark, lake, 0, 2)
    _append_users(spark, lake, 1, 2)
    lake.compact(spark, "silver", "t")
    entry = lake.snapshots("silver", "t")[-1]
    assert entry["operation"].startswith("compact")
    assert all("bloom" in f and "user_key" in f["bloom"]
               for f in entry["files"])
    got = lake.read_where(
        spark, "silver", "t", [("user_key", "=", "user_000042")]
    )
    assert [r["num"] for r in got.collect()] == [42]


def test_bloom_composes_with_minmax_stats(spark, tmp_path):
    """num carries range stats, user_key carries the bloom — a
    conjunctive predicate must apply both layers."""
    lake = _mk_lake(tmp_path)
    lake.add_bloom_index("silver", "t", "user_key")
    _append_users(spark, lake, 0, 2, n=100)      # num 0..198 even
    _append_users(spark, lake, 1, 2, n=100)      # num 1..199 odd
    _append_users(spark, lake, 1000, 1, n=100)   # num 1000..1099
    pruned = lake.read_where(
        spark, "silver", "t",
        [("user_key", "=", "user_000042"), ("num", "<", 500)],
    )
    # range stats kill the 1000+ file, bloom kills the odd file
    assert len(pruned.inputFiles()) == 1
    assert [r["num"] for r in pruned.collect()] == [42]
