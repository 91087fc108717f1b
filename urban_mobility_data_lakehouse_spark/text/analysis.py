"""Text-analysis operators for training-data pipelines (beyond-reference
surface required by BASELINE.json): token stats, quality scoring,
heuristic language ID, document fingerprinting.

All hot-path logic is built-in Column expressions (split/filter/aggregate
lambdas run JVM-side inside codegen) — no Python UDFs, so the same plan
scales to 100 TB of documents with a single scan and no shuffle at all
(every operator here is row-local until the caller aggregates).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

STOPWORDS: dict[str, tuple[str, ...]] = {
    # tiny per-language function-word lists for the n-gram/stopword
    # heuristic language identifier
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "ist", "das"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("的", "是", "了", "在", "我"),
}

_PUNCT_RE = r"[.,!?;:]"
_TOKEN_RE = r"([a-z]+|[A-Z][a-z]*|[0-9]+|\S)"  # BPE-ish coarse splitter


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def token_stats(documents: DataFrame) -> DataFrame:
    """Whitespace token count, BPE-ish regex token count, char stats."""
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks)
    # total token chars == chars minus separators (single-space corpus)
    token_chars = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    return documents.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.length("text").cast("long").alias("n_chars_actual"),
        n_tokens.cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_TOKEN_RE), F.lit(1)))
        .cast("long")
        .alias("n_subtokens"),
        F.round(token_chars / n_tokens, 4).alias("avg_token_len"),
    ).orderBy("doc_id")


def quality_features(documents: DataFrame) -> DataFrame:
    """Quality-scoring features: length, punctuation/digit density,
    stopword ratio, and a composite score — the standard pretraining
    corpus filters."""
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    punct = n_chars - F.length(
        F.regexp_replace(F.col("text"), _PUNCT_RE, "")
    )
    digits = n_chars - F.length(
        F.regexp_replace(F.col("text"), r"[0-9]", "")
    )
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS["en"])))
    punct_ratio = punct / n_chars
    digit_ratio = digits / n_chars
    stop_ratio = stop / n_tokens
    score = (
        F.least(F.lit(1.0), n_tokens / F.lit(200.0)) * 0.5
        + F.when((stop_ratio >= 0.05) & (stop_ratio <= 0.6), 0.3).otherwise(0.0)
        + F.when(punct_ratio < 0.1, 0.2).otherwise(0.0)
    )
    return documents.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(digit_ratio, 4).alias("digit_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality_score"),
    ).orderBy("doc_id")


def language_id(documents: DataFrame) -> DataFrame:
    """Heuristic language ID: function-word hit counts per language with
    a fixed-priority argmax (deterministic tie-break: en→es→de→fr→zh)."""
    toks = tokens(F.lower(F.col("text")))
    hits = {
        lang: stopword_hits(toks, words)
        for lang, words in STOPWORDS.items()
    }
    langs = list(STOPWORDS)
    # CASE chain, fixed priority: a language wins if its hit count is >=
    # every later language's (first match wins — mirrors the SQL oracle).
    predicted = F.lit(langs[-1])
    for i in range(len(langs) - 2, -1, -1):
        lang = langs[i]
        cond = None
        for other in langs[i + 1:]:
            c = hits[lang] >= hits[other]
            cond = c if cond is None else (cond & c)
        predicted = F.when(cond, lang).otherwise(predicted)
    scored = documents.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        predicted.alias("predicted_lang"),
    )
    return (
        scored.groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("labeled_lang", "predicted_lang")
    )


def fingerprint(text: Column) -> Column:
    """Normalized-content fingerprint: md5 over lowercased,
    whitespace-collapsed text (the exact-dedup key)."""
    return F.md5(
        F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    return documents.select(
        "doc_id", fingerprint(F.col("text")).alias("fingerprint")
    ).orderBy("doc_id")


def _max_run(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a SORTED array — i.e.
    the max frequency of any value — as one row-local `aggregate`
    recurrence (struct accumulator: previous element, current run,
    best run).  Frequency-of-mode inside a row can't be a groupBy
    (that would shuffle per-doc token lists); the higher-order
    aggregate keeps it codegen and embarrassingly parallel."""
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("int").alias("run"),
        F.lit(0).cast("int").alias("best"),
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(sorted_arr, acc0, step, lambda acc: acc["best"])


def repetition_features(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1): the
    strongest cheap signals that a document is boilerplate/template
    spam rather than prose.

      * dup_line_frac — fraction of lines that are repeats of an
        earlier line;
      * top_bigram_frac — fraction of all word bigrams taken by the
        single most frequent bigram.

    Both are pure row-local array expressions (split / array_distinct /
    zip_with / sort_array / aggregate) — no shuffle, no UDF; the usual
    pretraining thresholds (e.g. drop if dup_line_frac > 0.3 or
    top_bigram_frac > 0.2) stay a downstream filter decision."""
    lines = F.split(F.col("text"), "\n")
    n_lines = F.size(lines)
    dup_line_frac = F.round(
        (n_lines - F.size(F.array_distinct(lines))) / n_lines, 4
    )
    toks = tokens(F.col("text"))
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    top_bigram_frac = F.when(n <= 1, F.lit(0.0)).otherwise(
        F.round(_max_run(F.sort_array(bigrams)) / (n - 1), 4)
    )
    return documents.select(
        "doc_id",
        dup_line_frac.alias("dup_line_frac"),
        top_bigram_frac.alias("top_bigram_frac"),
    ).orderBy("doc_id")
