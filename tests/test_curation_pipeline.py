"""End-to-end corpus curation (text/pipeline.py).

The chain is the already-tested operators; what's locked here is the
COMPOSITION: stage invariants hold on the final output, the lakehouse
mode commits every stage as a versioned table plus an atomically
exported shard set, and the run is deterministic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.sources.lakehouse import Lakehouse
from urban_mobility_data_lakehouse_spark.sources.testdata import load_table
from urban_mobility_data_lakehouse_spark.text.pipeline import curate_corpus


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )


@pytest.fixture(scope="module")
def eval_docs(docs):
    return docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")


def test_lazy_chain_invariants(spark, docs, eval_docs):
    train, stats = curate_corpus(
        spark, docs, eval_docs=eval_docs, min_quality=0.3
    )
    rows = train.collect()
    assert rows, "pipeline emptied the corpus"
    # monotone funnel
    assert (
        stats["exact_dedup"]
        >= stats["near_dedup"]
        >= stats["decontaminated"]
        >= stats["quality_filtered"]
        > 0
    )
    # no exact-duplicate texts survive
    texts = [r["text"] for r in rows]
    assert len(set(texts)) == len(texts)
    # every survivor clears the quality bar
    assert all(r["quality_score"] >= 0.3 for r in rows)
    # eval members were removed (self-contamination)
    eval_ids = {r["doc_id"] for r in eval_docs.collect()}
    assert not eval_ids & {r["doc_id"] for r in rows}
    # split accounting covers the filtered corpus
    assert sum(stats["split"].values()) == stats["quality_filtered"]


def test_lakehouse_mode_commits_stages_and_shards(
    spark, docs, eval_docs, tmp_path
):
    lake = Lakehouse(str(tmp_path / "lake"))
    train, stats = curate_corpus(
        spark,
        docs,
        eval_docs=eval_docs,
        lake=lake,
        n_shards=4,
        shard_budget=256,
    )
    tables = set(lake.list_tables("curated"))
    assert {
        "exact_dedup", "near_dedup", "decontaminated",
        "quality_filtered", "dup_clusters", "train_shards",
        "train_shards_manifest",
    } <= tables

    # the shard export is consistent with the returned train split
    shard_rows = lake.read(spark, "curated", "train_shards")
    assert shard_rows.count() == train.count()
    manifest = {
        r["shard"]: r
        for r in lake.read(
            spark, "curated", "train_shards_manifest"
        ).collect()
    }
    assert len(manifest) == 4
    assert stats["shards"]
    # stage tables are versioned evidence: time travel reads v0
    assert lake.read(spark, "curated", "exact_dedup", version=0).count() == (
        stats["exact_dedup"]
    )


def test_mixing_stage_upsamples_into_shards(spark, docs, tmp_path):
    weights = {r["source"]: 1.0 for r in docs.select("source").distinct().collect()}
    train, stats = curate_corpus(
        spark,
        docs,
        mix_weights=weights,
        mix_budget_tokens=5_000,
        audit=True,
    )
    assert stats["mixed"] > 0
    # synthetic ids from upsampling stay unique
    ids = [r["doc_id"] for r in train.select("doc_id").collect()]
    assert len(ids) == len(set(ids))


def test_optional_boilerplate_and_perplexity_stages(spark, docs):
    train, stats = curate_corpus(
        spark,
        docs,
        boilerplate_min_docs=5,
        perplexity_band=(0.05, 0.95),
        min_quality=0.0,
    )
    assert "boilerplate_stripped" in stats
    assert "perplexity_filtered" in stats
    # the perplexity band trims both tails of the quality-filtered set
    assert 0 < stats["perplexity_filtered"] <= stats["quality_filtered"]
    assert sum(stats["split"].values()) == stats["perplexity_filtered"]
    assert train.count() > 0


def test_optional_model_filter_stage(spark, docs):
    train, stats = curate_corpus(
        spark, docs, min_quality=0.0, model_score_min=0.2
    )
    assert "model_filtered" in stats
    assert 0 < stats["model_filtered"] <= stats["quality_filtered"]
    assert sum(stats["split"].values()) == stats["model_filtered"]


def test_optional_exact_substr_stage(spark, docs):
    """The ExactSubstr stage cuts a cross-document verbatim license
    block before dedup; surviving docs keep their unique text."""
    import pyspark.sql.functions as F

    from urban_mobility_data_lakehouse_spark.text.pipeline import (
        curate_corpus,
    )

    lic = "licensed under the apache license version two point zero"
    # bounded slice: salting the FULL 500-doc corpus with one shared
    # prefix builds a 500-clique (every rolling-hash window of the
    # block appears in every doc), which costs minutes without proving
    # anything ~70 docs don't — the license-cut semantics and the
    # pass-through of unique text are per-doc properties
    salted = docs.filter(F.col("doc_id") % 7 == 0).withColumn(
        "text", F.concat(F.lit(lic + " "), F.col("text"))
    )
    out, stats = curate_corpus(
        spark,
        salted,
        min_quality=0.0,
        exact_substr_min_tokens=8,
        audit=True,
    )
    assert "exact_substr_deduped" in stats
    rows = out.collect()
    assert rows
    for r in rows:
        assert lic not in r["text"]


def test_optional_url_stage(spark, docs):
    """URL stage (RefinedWeb ordering — first, before any text is
    read): blocklisted registrable domains leave, normalized-URL twins
    collapse to the lowest doc_id, per-domain caps hold."""
    from urban_mobility_data_lakehouse_spark.text.urls import (
        doc_urls,
        parse_url,
        registrable_domain,
    )

    with_urls = doc_urls(docs)
    # plant a tracking-param twin of doc 1's URL on a fresh id
    twin = with_urls.filter(F.col("doc_id") == 1).withColumn(
        "doc_id", F.lit(900001)
    ).withColumn(
        "url", F.concat("url", F.lit("&utm_medium=twin"))
    )
    corpus = with_urls.unionByName(twin)
    train, stats = curate_corpus(
        spark,
        corpus,
        min_quality=0.0,
        url_col="url",
        blocked_domains=("example.co.uk",),
        max_per_domain=20,
    )
    assert "url_filtered" in stats
    out_ids = {r["doc_id"] for r in train.collect()}
    assert 900001 not in out_ids  # URL twin collapsed to doc 1
    # blocklist: no surviving co.uk doc anywhere downstream
    host = parse_url(F.col("url"))["host"]
    kept_urls = corpus.join(
        spark.createDataFrame(
            [(i,) for i in out_ids], "doc_id long"
        ),
        "doc_id",
    )
    blocked = kept_urls.filter(
        registrable_domain(host) == "example.co.uk"
    )
    assert blocked.count() == 0
    # cap: 20 per registrable domain at the stage boundary
    assert stats["url_filtered"] <= 20 * 2  # example.com + unparseable…
    assert stats["url_filtered"] > 0


def test_optional_semdedup_stage(spark, docs, sf_dir):
    """SemDeDup stage: docs whose embedding is semantically-dropped
    leave the funnel; docs without an embedding pass through."""
    from urban_mobility_data_lakehouse_spark.similarity.semdedup import (
        semantic_dedup,
    )

    # embed only doc_ids < 400 so 400+ exercise the unembedded path
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 400
    )
    train, stats = curate_corpus(
        spark,
        docs,
        min_quality=0.0,
        embeddings=emb,
        semdedup_threshold=0.3,
    )
    assert "semantic_deduped" in stats
    assert 0 < stats["semantic_deduped"] <= stats["near_dedup"]
    dropped = {
        r["vec_id"] for r in semantic_dedup(emb, threshold=0.3).collect()
    }
    assert dropped, "threshold 0.3 must produce a nonempty drop set"
    out_ids = {r["doc_id"] for r in train.collect()}
    assert not dropped & out_ids
    # unembedded docs (doc_id beyond the embedded range) survive
    assert any(i >= 400 for i in out_ids)


def test_url_stage_with_public_suffixes(spark):
    """curate_corpus(url_col=..., public_suffixes=...) keys the URL
    stage's blocklist and quota on PSL registrable domains."""
    from urban_mobility_data_lakehouse_spark.text.pipeline import (
        curate_corpus,
    )
    from urban_mobility_data_lakehouse_spark.text.urls import (
        load_public_suffixes,
    )
    import pyspark.sql.functions as F

    rows = [
        (i, f"https://user{i % 2}.github.io/d/{i}",
         f"document number {i} with some repeated shared text body "
         f"unique tail {i}")
        for i in range(8)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, url string, text string"
    )
    train, stats = curate_corpus(
        spark,
        docs,
        url_col="url",
        blocked_domains=("user1.github.io",),
        public_suffixes=load_public_suffixes(),
        min_quality=0.0,
    )
    # PSL blocklist drops exactly the user1 site (odd doc_ids)
    assert stats["url_filtered"] == 4
    assert train.filter(F.col("doc_id") % 2 == 1).count() == 0


def test_url_stage_keeps_all_null_url_docs(spark):
    """NULL-url docs have no URL identity: the URL-dedup window must
    not collapse them into one kept row."""
    from urban_mobility_data_lakehouse_spark.text.pipeline import (
        curate_corpus,
    )
    import pyspark.sql.functions as F

    rows = [
        (i, f"https://s.com/{i}", f"doc body number {i} unique text {i}")
        for i in range(4)
    ] + [
        (
            10 + i,
            None,
            " ".join(f"w{i}x{j}" for j in range(12)),  # fully distinct
        )
        for i in range(5)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, url string, text string"
    )
    train, stats = curate_corpus(
        spark, docs, url_col="url", min_quality=0.0
    )
    assert stats["url_filtered"] == 9  # nothing silently merged
    # every null-url doc survives to the end of the FILTER funnel
    # (the train/val/test split then divides them, so count the last
    # pre-split stage, not the returned train slice)
    assert stats["quality_filtered"] == 9
    assert train.filter(F.col("url").isNull()).count() >= 1


def test_mixing_overflow_guard(spark):
    """A mixture whose rate would overflow the doc_id*1000+copy_no
    remap is refused loudly instead of silently colliding doc ids."""
    from urban_mobility_data_lakehouse_spark.text.pipeline import (
        curate_corpus,
    )

    rows = [
        (i, "big", " ".join(f"tok{j}" for j in range(50)))
        for i in range(20)
    ] + [(100, "tiny", "just three tokens")]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    with pytest.raises(ValueError, match="overflow"):
        curate_corpus(
            spark, docs, min_quality=0.0,
            mix_weights={"big": 0.01, "tiny": 0.99},
            mix_budget_tokens=100_000,
        )
