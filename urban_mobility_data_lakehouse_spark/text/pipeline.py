"""End-to-end corpus curation: the full pretraining-data pass.

One composable function chains the engine's training-data operators in
the order production pipelines run them (CCNet / RefinedWeb / FineWeb
publish the same skeleton):

    exact dedup → near-dup keep-one-per-cluster → benchmark
    decontamination → quality filter → leakage-safe split →
    (optional) domain mixing → packed shard export

Every stage is the already-tested operator; this module adds the
composition contract: stages stay LAZY (one logical plan end-to-end —
Catalyst sees through the whole chain, so column pruning and scan
reuse cross stage boundaries), and the audit counts are optional
because each count forces a job.

At 100 TB you'd checkpoint stage outputs to lakehouse tables instead
of composing one plan (restartability beats plan fusion at that
scale); `curate_corpus(..., lake=...)` does exactly that when given a
lakehouse — each stage lands as a versioned table, so a crashed run
resumes from the last committed stage and every intermediate is
time-travelable evidence for data-lineage audits.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.lakehouse import Lakehouse
from .analysis import quality_features
from .contamination import mark_contaminated
from .curation import leakage_safe_split
from .mixing import group_token_totals, mixing_rates, sample_mixture
from .shards import export_shards


def curate_corpus(
    spark: SparkSession,
    documents: DataFrame,
    eval_docs: DataFrame | None = None,
    min_quality: float = 0.3,
    near_dup_threshold: float = 0.5,
    url_col: str | None = None,
    blocked_domains: tuple[str, ...] = (),
    max_per_domain: int | None = None,
    public_suffixes: frozenset[str] | str | None = "psl",
    boilerplate_min_docs: int | None = None,
    exact_substr_min_tokens: int | None = None,
    perplexity_band: tuple[float, float] | None = None,
    model_score_min: float | None = None,
    embeddings: DataFrame | None = None,
    semdedup_threshold: float | None = None,
    mix_weights: dict[str, float] | None = None,
    mix_budget_tokens: int | None = None,
    contamination_plan: str = "auto",
    lake: Lakehouse | None = None,
    schema: str = "curated",
    shard_budget: int = 2048,
    n_shards: int = 8,
    audit: bool = True,
) -> tuple[DataFrame, dict]:
    """Run the full curation chain; returns (train_df, audit dict).

    `documents` needs (doc_id, text[, source]).  When `lake` is given,
    each stage is committed as `schema`.<stage> and the train split is
    shard-exported; otherwise everything stays one lazy plan.
    """
    # Imported here, not at module top: dedup.exact imports
    # text.analysis, so a module-level import from text/ back into
    # dedup/ is a circular-import bomb whose detonation depends on
    # which package a caller happens to import first.
    from ..dedup import minhash
    from ..dedup.components import duplicate_clusters
    from ..dedup.exact import deduplicate

    stats: dict = {}

    def _checkpoint(df: DataFrame, stage: str) -> DataFrame:
        if lake is not None:
            lake.create_schemas(schema)
            lake.overwrite(df, schema, stage)
            df = lake.read(spark, schema, stage)
            if audit:
                stats[stage] = df.count()
            return df
        if audit:
            # the count forces a job anyway — checkpoint FIRST so the
            # job materializes the stage and downstream stages (and
            # the next stage's count) reuse its blocks instead of
            # re-executing the whole upstream chain per stage (that
            # recompute is quadratic in stage count).  audit=False
            # remains the single-fused-plan mode the module docstring
            # describes.
            df = df.localCheckpoint(eager=False)
            stats[stage] = df.count()
        return df

    if url_col is not None:
        # URL stage FIRST (RefinedWeb's ordering: URL filtering runs
        # before anything reads text — it's the only stage that can
        # drop a document without touching its bytes): blocklist →
        # URL-level exact dedup on the normalized form (tracking-param
        # / fragment twins collapse; keep-lowest-doc_id) → per-domain
        # balance cap.  Unparseable URLs fall back to their raw string
        # as the dedup key — kept, never silently merged.
        from pyspark.sql import Window

        from .urls import domain_quota, filter_blocklist, normalize_url

        docs = documents
        if blocked_domains:
            docs = filter_blocklist(
                docs, url_col, list(blocked_domains),
                suffixes=public_suffixes,
            )
        canon = F.coalesce(
            normalize_url(F.col(url_col)), F.col(url_col)
        )
        w = Window.partitionBy(canon).orderBy(F.col("doc_id").asc())
        # NULL-url docs are EXEMPT from URL dedup (they have no URL
        # identity — the window would otherwise herd every no-URL doc
        # into one NULL partition and keep exactly one of them)
        docs = (
            docs.withColumn("_ur", F.row_number().over(w))
            .filter((F.col("_ur") == 1) | F.col(url_col).isNull())
            .drop("_ur")
        )
        if max_per_domain is not None:
            docs = domain_quota(
                docs, url_col, max_per_domain, suffixes=public_suffixes
            )
        documents = _checkpoint(docs, "url_filtered")

    if boilerplate_min_docs is not None:
        from .boilerplate import strip_boilerplate

        documents = _checkpoint(
            strip_boilerplate(documents, min_docs=boilerplate_min_docs)
            .drop("n_boilerplate_lines")
            .filter(F.length("text") > 0),
            "boilerplate_stripped",
        )

    if exact_substr_min_tokens is not None:
        # ExactSubstr (Lee et al. 2022): cut cross-document verbatim
        # runs BEFORE whole-document dedup, so license/quotation spans
        # can't glue otherwise-distinct docs into near-dup clusters
        from .spans import remove_spans, repeated_spans

        documents = _checkpoint(
            remove_spans(
                documents,
                repeated_spans(documents, exact_substr_min_tokens),
            ).filter(F.length("text") > 0),
            "exact_substr_deduped",
        )

    stage = _checkpoint(deduplicate(documents), "exact_dedup")

    # near-dup pairs computed ONCE, reused for keep-one-per-cluster
    # dedup AND the leakage-safe split (the cluster map is the shared
    # artifact — production pipelines persist it for lineage)
    clusters = duplicate_clusters(
        minhash.near_duplicates(stage, near_dup_threshold)
    )
    if lake is not None:
        lake.create_schemas(schema)
        lake.overwrite(clusters, schema, "dup_clusters")
        clusters = lake.read(spark, schema, "dup_clusters")
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    stage = _checkpoint(
        stage.join(losers, ["doc_id"], "left_anti"), "near_dedup"
    )

    if embeddings is not None and semdedup_threshold is not None:
        # SemDeDup (Abbas et al. 2023) on top of lexical dedup: drop
        # docs whose embedding has a surviving semantic twin.  The
        # paper's ordering — semantic dedup AFTER exact/near dedup,
        # BEFORE quality filtering — so paraphrase mass doesn't skew
        # the quality model's corpus statistics.  `embeddings` is
        # (id, embedding) with id joinable to doc_id; docs without an
        # embedding pass through (no silent loss of unembedded rows).
        from ..similarity.semdedup import semantic_dedup

        emb = embeddings.select(
            F.col(embeddings.columns[0]).alias("vec_id"), "embedding"
        )
        sem_losers = semantic_dedup(
            emb, threshold=semdedup_threshold
        ).select(F.col("vec_id").alias("doc_id"))
        stage = _checkpoint(
            stage.join(sem_losers, ["doc_id"], "left_anti"),
            "semantic_deduped",
        )

    if eval_docs is not None:
        # contamination_plan: "auto" sizes the eval dictionary with one
        # tiny build-time job; pass "array"/"join" to keep the whole
        # curation chain a single lazy plan (zero jobs until action)
        stage = _checkpoint(
            mark_contaminated(stage, eval_docs, plan=contamination_plan)
            .filter(~F.col("contaminated"))
            .drop("contam_hits", "contaminated"),
            "decontaminated",
        )

    quality = quality_features(stage).select("doc_id", "quality_score")
    stage = _checkpoint(
        stage.join(quality, "doc_id").filter(
            F.col("quality_score") >= min_quality
        ),
        "quality_filtered",
    )

    if perplexity_band is not None:
        from .lm import perplexity_band_filter, unigram_model

        lo, hi = perplexity_band
        model, oov = unigram_model(stage)
        stage = _checkpoint(
            perplexity_band_filter(stage, model, oov, lo, hi).drop(
                "xent", "perplexity", "n_tokens"
            ),
            "perplexity_filtered",
        )

    if model_score_min is not None:
        from .classifier import score_documents, self_train_quality_model

        w, b = self_train_quality_model(stage)
        stage = _checkpoint(
            score_documents(stage, w, b)
            .filter(F.col("model_score") >= model_score_min)
            .drop("quality_logit", "model_score"),
            "model_filtered",
        )

    split = leakage_safe_split(stage, clusters)
    train = split.filter(F.col("split") == "train").drop("split")
    if audit:
        stats["split"] = {
            r["split"]: r["n"]
            for r in split.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    if mix_weights is not None and mix_budget_tokens is not None:
        rates = mixing_rates(
            group_token_totals(train), mix_weights, mix_budget_tokens
        )
        # packing keys on doc_id: upsampled copies stay distinct via
        # doc_id*1000 + copy_no — which silently COLLIDES once any
        # rate reaches 1000 (doc 5 copy 1000 == doc 6 copy 0), so an
        # overflowing mixture is refused loudly instead
        top = max(rates.values(), default=0.0)
        if top >= 999:
            raise ValueError(
                f"mixing rate {top:.1f} >= 999 would overflow the "
                "doc_id*1000+copy_no remap — lower the weight/budget "
                "for the tiny source or widen the multiplier"
            )
        train = sample_mixture(train, rates)
        train = train.withColumn(
            "doc_id",
            F.col("doc_id") * 1000 + F.col("copy_no"),
        ).drop("copy_no")
        if audit:
            stats["mixed"] = train.count()

    if lake is not None:
        stats["shards"] = export_shards(
            spark,
            train.select("doc_id", "text"),
            lake,
            schema,
            "train_shards",
            budget=shard_budget,
            n_shards=n_shards,
        )["shards"]
    return train, stats
