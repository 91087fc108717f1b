"""Deterministic curation primitives: content-hash splits and samples
must be stable under repartitioning (the property rand(seed)/sampleBy
lack) and land near their target proportions."""

from __future__ import annotations

import pyspark.sql.functions as F

from urban_mobility_data_lakehouse_spark.sources.testdata import load_table
from urban_mobility_data_lakehouse_spark.text.curation import (
    hash_sample,
    split_label,
    stratified_hash_sample,
)


def test_split_proportions_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    labeled = docs.select(
        "doc_id", split_label(F.col("doc_id").cast("string"))
    )
    counts = {r["split"]: r["count"] for r in
              labeled.groupBy("split").count().collect()}
    n = sum(counts.values())
    assert n == docs.count()
    assert abs(counts["train"] / n - 0.8) < 0.06
    assert abs(counts.get("val", 0) / n - 0.1) < 0.05
    assert abs(counts.get("test", 0) / n - 0.1) < 0.05

    # stable under repartitioning — the whole point
    shuffled = (
        docs.repartition(13)
        .select("doc_id", split_label(F.col("doc_id").cast("string")))
    )
    assert sorted(map(tuple, labeled.collect())) == sorted(
        map(tuple, shuffled.collect())
    )


def test_hash_sample_fraction_and_composability(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    half = hash_sample(docs, "doc_id", 0.5, salt="a")
    assert abs(half.count() / n - 0.5) < 0.08
    # independent salts compose to the product fraction
    quarter = hash_sample(half, "doc_id", 0.5, salt="b")
    assert abs(quarter.count() / n - 0.25) < 0.08
    # same salt is idempotent, not compounding
    assert hash_sample(half, "doc_id", 0.5, salt="a").count() == half.count()


def test_stratified_sample_per_stratum(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    fractions = {"en": 0.5, "es": 0.1}
    sampled = stratified_hash_sample(docs, "lang", fractions, "doc_id")
    got = {r["lang"]: r["count"] for r in
           sampled.groupBy("lang").count().collect()}
    base = {r["lang"]: r["count"] for r in
            docs.groupBy("lang").count().collect()}
    assert set(got) <= set(fractions)  # unlisted strata fully dropped
    for k, frac in fractions.items():
        if base.get(k, 0) >= 50:
            assert abs(got.get(k, 0) / base[k] - frac) < 0.12, k


# -- PII redaction ---------------------------------------------------------


def test_redaction_scrubs_and_counts(spark):
    from urban_mobility_data_lakehouse_spark.text.redact import (
        redact_documents,
    )

    docs = spark.createDataFrame(
        [
            (1, "mail me at ana.garcia+x@example.org or call +34 91 123 45 67"),
            (2, "see https://example.com/a?b=c#d and 10.0.0.1"),
            (3, "card 4111 1111 1111 1111 iban ES91 2100 0418 4502 0005 1332"),
            (4, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["text"], r["n_redactions"])
        for r in redact_documents(docs).collect()
    }
    assert out[1] == ("mail me at <EMAIL> or call <PHONE>", 2)
    assert out[2] == ("see <URL> and <IP>", 2)
    assert out[3] == ("card <CARD> iban <IBAN>", 2)
    assert out[4] == ("nothing sensitive here", 0)


def test_redaction_count_ignores_preexisting_placeholders(spark):
    """n_redactions counts replacements performed, not placeholder
    tokens in the output — source text that already contains `<EMAIL>`
    must not inflate the audit metric."""
    from urban_mobility_data_lakehouse_spark.text.redact import (
        redact_documents,
    )

    docs = spark.createDataFrame(
        [
            (1, "literal <EMAIL> placeholder, nothing real"),
            (2, "<URL> plus a real one: bob@example.com"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["text"], r["n_redactions"])
        for r in redact_documents(docs).collect()
    }
    assert out[1] == ("literal <EMAIL> placeholder, nothing real", 0)
    assert out[2] == ("<URL> plus a real one: <EMAIL>", 1)


def test_redaction_is_pure_catalyst(spark):
    """The scrub chain must stay in codegen — no Python in the row path."""
    from urban_mobility_data_lakehouse_spark.text.redact import (
        redact_documents,
    )

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = (
        redact_documents(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


# -- sequence packing ------------------------------------------------------


def test_pack_sequences_respects_budget(spark, sf_dir):
    from urban_mobility_data_lakehouse_spark.sources.testdata import (
        load_table,
    )
    from urban_mobility_data_lakehouse_spark.text.packing import (
        pack_sequences,
    )

    docs = load_table(spark, sf_dir, "documents")
    budget = 64
    packed = pack_sequences(docs, budget=budget, n_shards=4)
    rows = packed.collect()
    assert len(rows) == docs.count()  # every doc assigned exactly once
    assert len({r["doc_id"] for r in rows}) == len(rows)

    fills: dict[tuple, list[int]] = {}
    for r in rows:
        fills.setdefault((r["shard"], r["bin"]), []).append(r["n_tokens"])
    for (shard, b), toks in fills.items():
        if any(t > budget for t in toks):
            # an over-budget doc always sits alone
            assert len(toks) == 1, (shard, b, toks)
        else:
            assert sum(toks) <= budget, (shard, b, toks)


def test_pack_sequences_deterministic_under_repartition(spark, sf_dir):
    from urban_mobility_data_lakehouse_spark.sources.testdata import (
        load_table,
    )
    from urban_mobility_data_lakehouse_spark.text.packing import (
        pack_sequences,
    )

    docs = load_table(spark, sf_dir, "documents")
    a = {
        (r["doc_id"], r["shard"], r["bin"])
        for r in pack_sequences(docs, budget=64, n_shards=4).collect()
    }
    b = {
        (r["doc_id"], r["shard"], r["bin"])
        for r in pack_sequences(
            docs.repartition(7), budget=64, n_shards=4
        ).collect()
    }
    assert a == b


def test_bin_stats_fill_accounting(spark, sf_dir):
    from urban_mobility_data_lakehouse_spark.sources.testdata import (
        load_table,
    )
    from urban_mobility_data_lakehouse_spark.text.packing import (
        bin_stats,
        pack_sequences,
    )

    docs = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(docs, budget=64, n_shards=4)
    stats = {r["shard"]: r for r in bin_stats(packed, budget=64).collect()}
    assert set(stats) == {0, 1, 2, 3}
    for r in stats.values():
        assert 0 < r["avg_fill"] <= 1.0
        assert 0 <= r["waste_frac"] < 1.0
        assert abs((1 - r["waste_frac"]) - r["avg_fill"]) < 1e-3


# -- repetition filters ----------------------------------------------------


def test_repetition_features(spark):
    from urban_mobility_data_lakehouse_spark.text.analysis import (
        repetition_features,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "buy now buy now buy now buy now"),
            (3, "header\nbody one\nheader\nbody two\nheader"),
            (4, "solo"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["dup_line_frac"], r["top_bigram_frac"])
        for r in repetition_features(docs).collect()
    }
    assert out[1][0] == 0.0 and out[1][1] < 0.2   # prose passes filters
    assert out[2][1] >= 0.5                        # template spam flagged
    assert out[3][0] == 0.4                        # 2 of 5 lines are repeats
    assert out[4] == (0.0, 0.0) and out[5] == (0.0, 0.0)  # edges


def test_repetition_features_pure_catalyst(spark):
    from urban_mobility_data_lakehouse_spark.text.analysis import (
        repetition_features,
    )

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = (
        repetition_features(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_leakage_safe_split_keeps_clusters_together(spark, sf_dir):
    """Near-dup clusters must not straddle train/val/test: every member
    gets its cluster representative's split; singletons fall back to
    the plain per-document split exactly."""
    import pyspark.sql.functions as F

    from urban_mobility_data_lakehouse_spark.dedup.components import (
        duplicate_clusters,
    )
    from urban_mobility_data_lakehouse_spark.dedup.minhash import (
        near_duplicates,
    )
    from urban_mobility_data_lakehouse_spark.sources.testdata import (
        load_table,
    )
    from urban_mobility_data_lakehouse_spark.text.curation import (
        leakage_safe_split,
        split_label,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    )
    pairs = near_duplicates(doubled)
    clusters = duplicate_clusters(pairs.select("doc_a", "doc_b"))
    out = leakage_safe_split(doubled, clusters).persist()

    # every cluster is split-pure
    impure = (
        out.join(
            clusters.withColumnRenamed("doc_id", "doc_id"), ["doc_id"]
        )
        .groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert impure == 0
    # in particular: each planted copy shares its original's split
    orig = out.filter(F.col("doc_id") < 1_000_000).select(
        F.col("doc_id"), F.col("split").alias("s1")
    )
    copy = out.filter(F.col("doc_id") >= 1_000_000).select(
        (F.col("doc_id") - 1_000_000).alias("doc_id"),
        F.col("split").alias("s2"),
    )
    assert orig.join(copy, "doc_id").filter(
        F.col("s1") != F.col("s2")
    ).count() == 0

    # singletons match the plain split bit-for-bit
    clustered_ids = clusters.select("doc_id")
    singles = out.join(clustered_ids, "doc_id", "left_anti")
    plain = doubled.join(clustered_ids, "doc_id", "left_anti").select(
        "doc_id",
        split_label(F.col("doc_id").cast("string")).alias("plain"),
    )
    assert singles.join(plain, "doc_id").filter(
        F.col("split") != F.col("plain")
    ).count() == 0
    # all three splits materialize at corpus size
    assert out.select("split").distinct().count() == 3
    out.unpersist()
