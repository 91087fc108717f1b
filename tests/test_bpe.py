"""BPE tokenizer (text/bpe.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.text.bpe import (
    EOW,
    decode_tokens,
    encode_documents,
    train_bpe,
    word_frequencies,
)
from urban_mobility_data_lakehouse_spark.sources.testdata import load_table


def test_classic_sennrich_example():
    """The canonical low/lower/newest/widest corpus: BPE must learn
    'es', 'est', 'est</w>', 'lo', 'low' among its first merges."""
    freqs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(freqs, n_merges=10)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", EOW)
    assert ("l", "o") in merges and ("lo", "w") in merges


def test_training_is_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    f1 = word_frequencies(docs, max_word_types=5000)
    f2 = word_frequencies(docs.repartition(7), max_word_types=5000)
    assert f1 == f2
    assert train_bpe(f1, 50) == train_bpe(f2, 50)


def test_encode_respects_merges_and_decodes_exactly(spark):
    corpus = spark.createDataFrame(
        [(0, "low lower newest widest low newest")],
        "doc_id long, text string",
    )
    merges = train_bpe(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)], 10
    )
    [row] = encode_documents(corpus, merges).collect()
    toks = list(row["bpe_tokens"])
    # 'newest' must surface the learned 'est</w>' unit
    assert any(t.endswith("est" + EOW) or t == "est" + EOW for t in toks)
    assert decode_tokens(toks) == "low lower newest widest low newest"
    assert row["n_bpe_tokens"] == len(toks)


def test_oov_words_fall_back_to_characters(spark):
    corpus = spark.createDataFrame([(0, "zzqq")], "doc_id long, text string")
    merges = train_bpe([("low", 5)], 5)
    [row] = encode_documents(corpus, merges).collect()
    assert decode_tokens(list(row["bpe_tokens"])) == "zzqq"
    assert row["n_bpe_tokens"] == 5  # z z q q </w>


def test_corpus_encode_round_trips(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = train_bpe(word_frequencies(docs, max_word_types=5000), 100)
    enc = encode_documents(docs, merges)
    back = {
        r["doc_id"]: decode_tokens(list(r["bpe_tokens"]))
        for r in enc.collect()
    }
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert back == orig
    # merges genuinely compress: fewer BPE tokens than characters
    n_bpe = enc.agg(F.sum("n_bpe_tokens")).collect()[0][0]
    n_chars = docs.agg(F.sum(F.length("text"))).collect()[0][0]
    assert n_bpe < n_chars


def test_bpe_counts_drive_packing(spark, sf_dir):
    """Composition: encode with BPE, pack bins by n_bpe_tokens — the
    real shard-building flow (whitespace counts under-estimate what a
    trained tokenizer produces)."""
    from urban_mobility_data_lakehouse_spark.text.packing import (
        pack_sequences,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = train_bpe(word_frequencies(docs, max_word_types=5000), 100)
    enc = encode_documents(docs, merges)
    packed = pack_sequences(enc, budget=256, token_col="n_bpe_tokens")
    # every doc packed exactly once, bins respect the BPE budget
    assert packed.count() == docs.count()
    over = (
        packed.groupBy("shard", "bin")
        .agg(
            F.sum("n_tokens").alias("t"),
            F.count(F.lit(1)).alias("k"),
        )
        .filter((F.col("t") > 256) & (F.col("k") > 1))
        .count()
    )
    assert over == 0


def test_parquet_twin_trainer_matches_spark_pipeline(spark, sf_dir):
    """train_bpe_from_parquet (the oracle/builder twin) must learn the
    SAME merges as the Spark word-frequency pass + train_bpe — both
    deterministic over the same corpus multiset."""
    from urban_mobility_data_lakehouse_spark.sources.testdata import (
        load_table,
    )
    from urban_mobility_data_lakehouse_spark.text.bpe import (
        train_bpe,
        train_bpe_from_parquet,
        word_frequencies,
    )

    docs = load_table(spark, sf_dir, "documents")
    via_spark = train_bpe(word_frequencies(docs), n_merges=48)
    via_arrow = train_bpe_from_parquet(sf_dir, n_merges=48)
    assert via_arrow == via_spark
    # memoized + copy-safe
    again = train_bpe_from_parquet(sf_dir, n_merges=48)
    assert again == via_arrow and again is not via_arrow


def test_null_text_encodes_to_zero_tokens(spark):
    """NULL text must yield bpe_tokens=[] (and so NO rows after a
    posexplode), matching the DuckDB oracle where string_split(NULL)
    unnests to nothing — not the literal 'None'/'nan' word str()
    would manufacture."""
    from urban_mobility_data_lakehouse_spark.text.bpe import (
        encode_documents,
    )

    docs = spark.createDataFrame(
        [(1, "low lower"), (2, None), (3, "")],
        "doc_id bigint, text string",
    )
    rows = {
        r["doc_id"]: (list(r["bpe_tokens"]), r["n_bpe_tokens"])
        for r in encode_documents(docs, merges=[]).collect()
    }
    assert rows[2] == ([], 0)
    assert rows[3] == ([], 0)  # empty string: all-empty words skipped
    assert rows[1][1] > 0 and "None" not in "".join(rows[1][0])


# -- Property: the oracle's replace-fold replay is exactly the greedy
# encoder, for ANY merges train_bpe can produce ---------------------------

from hypothesis import given, settings as hsettings, strategies as hst


def _replay_replace_fold(word, merges):
    """Pure-Python twin of the DuckDB bpe oracle: wrap every symbol as
    \x1f sym \x1e, apply each merge in rank order as a global
    left-to-right non-overlapping string replacement, then unwrap."""
    from urban_mobility_data_lakehouse_spark.text.bpe import EOW

    s = "".join(f"\x1f{c}\x1e" for c in word) + f"\x1f{EOW}\x1e"
    for a, b in merges:
        s = s.replace(f"\x1f{a}\x1e\x1f{b}\x1e", f"\x1f{a}{b}\x1e")
    return [t[:-1] for t in s.split("\x1f") if t]


@given(
    corpus=hst.lists(
        hst.text(alphabet="abc", min_size=1, max_size=8),
        min_size=1,
        max_size=30,
    ),
    words=hst.lists(
        hst.text(alphabet="abcd", min_size=1, max_size=12),
        min_size=1,
        max_size=10,
    ),
    n_merges=hst.integers(0, 24),
)
@hsettings(max_examples=60, deadline=None)
def test_replace_fold_replay_equals_greedy_encoder(
    corpus, words, n_merges
):
    """The DuckDB oracle's soundness rests on this invariant: because
    a merged symbol only participates in LATER-rank merges, applying
    merges in rank order with left-to-right non-overlapping
    replacement reproduces the leftmost-lowest-rank greedy loop of
    `_encode_word` exactly — including on words with characters the
    trainer never saw (char fallback) and degenerate repeats
    ('aaaa')."""
    from collections import Counter

    from urban_mobility_data_lakehouse_spark.text.bpe import (
        _encode_word,
        train_bpe,
    )

    wf = sorted(Counter(corpus).items(), key=lambda kv: (-kv[1], kv[0]))
    merges = train_bpe(wf, n_merges=n_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in words + corpus:
        assert _replay_replace_fold(w, merges) == _encode_word(w, ranks)
