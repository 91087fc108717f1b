"""Unigram LM perplexity scoring (text/lm.py)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.text.lm import (
    cross_entropy,
    perplexity_band_filter,
    unigram_model,
)
from urban_mobility_data_lakehouse_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def test_model_matches_python_reference(spark):
    ref = spark.createDataFrame(
        [(0, "a a a b"), (1, "a b c")], "doc_id long, text string"
    )
    model, oov = unigram_model(ref, vocab_size=2)
    got = {r["token"]: r["log2p"] for r in model.collect()}
    # counts: a=4, b=2, c=1; n=7, types=3, denom=11
    assert set(got) == {"a", "b"}  # top-2
    assert abs(got["a"] - math.log2(5 / 11)) < 1e-12
    assert abs(got["b"] - math.log2(3 / 11)) < 1e-12
    assert abs(oov - math.log2(1 / 11)) < 1e-12


def test_cross_entropy_exact_on_known_doc(spark):
    ref = spark.createDataFrame(
        [(0, "a a a b"), (1, "a b c")], "doc_id long, text string"
    )
    model, oov = unigram_model(ref, vocab_size=2)
    target = spark.createDataFrame(
        [(7, "a b zzz")], "doc_id long, text string"
    )
    [row] = cross_entropy(target, model, oov).collect()
    want = -(math.log2(5 / 11) + math.log2(3 / 11) + math.log2(1 / 11)) / 3
    assert abs(row["xent"] - want) < 1e-12
    assert abs(row["perplexity"] - 2**want) < 1e-9
    assert row["n_tokens"] == 3


def test_in_domain_scores_below_noise(spark, docs):
    model, oov = unigram_model(docs, vocab_size=1024)
    noise = spark.createDataFrame(
        [(990001, "qqxz vbnw zzkj mmpl wrtt yyuu")],
        "doc_id long, text string",
    )
    scored = cross_entropy(docs.union(noise), model, oov)
    noise_x = scored.filter(F.col("doc_id") == 990001).collect()[0]["xent"]
    med = scored.filter(F.col("doc_id") != 990001).agg(
        F.expr("percentile(xent, 0.5)")
    ).collect()[0][0]
    assert noise_x > med + 1.0, (noise_x, med)


def test_band_filter_drops_both_tails(spark, docs):
    model, oov = unigram_model(docs, vocab_size=1024)
    kept = perplexity_band_filter(docs, model, oov, 0.10, 0.90)
    n, total = kept.count(), docs.count()
    assert 0.6 * total < n < 0.95 * total
    # determinism
    assert kept.count() == perplexity_band_filter(
        docs, model, oov, 0.10, 0.90
    ).count()


def test_corpus_join_side_is_broadcast(spark, docs):
    model, oov = unigram_model(docs, vocab_size=256)
    plan = (
        cross_entropy(docs, model, oov)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


# -- Interpolated bigram LM -------------------------------------------------


def test_bigram_exact_hand_computation(spark):
    """p('b'|'a') on a corpus where 'a b' is the only continuation of
    'a': interpolated value must equal λ·1 + (1−λ)·p_uni('b')."""
    import math

    from urban_mobility_data_lakehouse_spark.text.lm import (
        BIGRAM_LAMBDA,
        bigram_cross_entropy,
        bigram_model,
    )

    ref = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "c d c d")],
        "doc_id bigint, text string",
    )
    bigram, uni, oov = bigram_model(ref, vocab_size=10)
    # unigram side: 10 tokens total, 4 types → denom = 15
    # p_uni(b) = (3+1)/15
    pu_b = 4 / 15
    want = math.log2(BIGRAM_LAMBDA * 1.0 + (1 - BIGRAM_LAMBDA) * pu_b)
    got = {
        (r["prev"], r["cur"]): r["log2p"] for r in bigram.collect()
    }[("a", "b")]
    assert abs(got - want) < 1e-12

    # score a two-token doc "a b": token1 = unigram p(a), token2 = the
    # bigram value above
    doc = spark.createDataFrame([(7, "a b")], "doc_id bigint, text string")
    out = bigram_cross_entropy(doc, bigram, uni, oov).collect()[0]
    pu_a = 4 / 15
    want_xent = -(math.log2(pu_a) + want) / 2
    assert abs(out["xent"] - want_xent) < 1e-12


def test_bigram_model_rewards_word_order(spark):
    """Scrambling word order must hurt the bigram score but leave the
    unigram score unchanged — the signal the upgrade exists for."""
    from urban_mobility_data_lakehouse_spark.text.lm import (
        bigram_cross_entropy,
        bigram_model,
        cross_entropy,
        unigram_model,
    )

    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat " * 5) for i in range(10)],
        "doc_id bigint, text string",
    )
    fluent = "the cat sat on the mat the cat sat on the mat"
    scrambled = "mat the on sat cat the mat the on sat cat the"
    docs = spark.createDataFrame(
        [(1, fluent), (2, scrambled)], "doc_id bigint, text string"
    )
    big, uni, oov = bigram_model(ref, vocab_size=100)
    bx = {
        r["doc_id"]: r["xent"]
        for r in bigram_cross_entropy(docs, big, uni, oov).collect()
    }
    u_model, u_oov = unigram_model(ref, vocab_size=100)
    ux = {
        r["doc_id"]: r["xent"]
        for r in cross_entropy(docs, u_model, u_oov).collect()
    }
    assert abs(ux[1] - ux[2]) < 1e-9  # unigram: blind to order
    assert bx[1] < bx[2] - 0.5  # bigram: clearly prefers fluent order


def test_bigram_scoring_plan_broadcasts_models(spark):
    from urban_mobility_data_lakehouse_spark.text.lm import (
        bigram_cross_entropy,
        bigram_model,
    )

    ref = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id bigint, text string"
    )
    big, uni, oov = bigram_model(ref, vocab_size=10)
    plan = (
        bigram_cross_entropy(ref, big, uni, oov)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan


def test_micro_lm_scores_match_pure_python_replay(spark, sf_dir):
    """The exact integer micro-log scores (the text_pairs_suite lm
    parts) must equal an independent pure-Python replay of the model
    semantics: per-token coalesce over (observed pair | fallback |
    OOV) and order-independent integer accumulation."""
    from urban_mobility_data_lakehouse_spark.sources.testdata import (
        load_table,
    )
    from urban_mobility_data_lakehouse_spark.text.lm import (
        micro_lm_scores,
        train_lm_micrologs,
    )

    m = train_lm_micrologs(sf_dir)
    uni = {t: (u, fb) for t, u, fb in m["uni"]}
    bi = {(a, b): u for a, b, u in m["bi"]}

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 20
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["uni_u"], r["bi_u"])
        for r in micro_lm_scores(docs, m).collect()
    }

    for row in docs.select("doc_id", "text").collect():
        toks = row["text"].split(" ")
        su = sb = 0
        for i, cur in enumerate(toks):
            lpu = uni[cur][0] if cur in uni else m["oov_u"]
            su += lpu
            if i == 0:
                sb += lpu
            elif (toks[i - 1], cur) in bi:
                sb += bi[(toks[i - 1], cur)]
            else:
                sb += uni[cur][1] if cur in uni else m["oov_fb_u"]
        assert got[row["doc_id"]] == (len(toks), -su, -sb)


def test_micro_lm_trainer_quantizes_float_model(sf_dir):
    """Micro-log literals are the float trainer's log2 probabilities
    rounded to 1e-9 bits — close enough that no band/filter decision
    can move, and memoized identically for builder and oracle."""
    import math

    from urban_mobility_data_lakehouse_spark.text.lm import (
        MICRO,
        train_lm_micrologs,
    )

    m1 = train_lm_micrologs(sf_dir)
    m2 = train_lm_micrologs(sf_dir)
    assert m1 == m2  # memoized + copy-safe
    # spot-check quantization: u/MICRO must be a log2 of a probability
    # in (0, 1), and fb = log2(1-lam) + u within one quantum
    lam_term = math.log2(1.0 - 0.7)
    for tok, u, fb in m1["uni"]:
        assert u < 0
        assert abs((fb - u) / MICRO - lam_term) < 2e-9


def test_micro_lm_plan_broadcasts_and_stays_jvm_side(spark, sf_dir):
    from urban_mobility_data_lakehouse_spark.sources.testdata import (
        load_table,
    )
    from urban_mobility_data_lakehouse_spark.text.lm import (
        micro_lm_scores,
        train_lm_micrologs,
    )

    docs = load_table(spark, sf_dir, "documents")
    plan = (
        micro_lm_scores(docs, train_lm_micrologs(sf_dir))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan
