"""Text-analysis queries over the `documents` table, with DuckDB oracles.

The Spark side and the oracle compute byte-identical expressions (same
regexes, same fold order for any float math) so value hashes match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.testdata import load_table
from ..text import analysis as T
from . import register

_EN = "'the','and','of','to','a'"


@register(
    "doc_token_stats",
    oracle=r"""
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text,
                '([a-z]+|[A-Z][a-z]*|[0-9]+|\S)', 1)) AS BIGINT)
               AS n_subtokens,
           round(length(replace(text, ' ', '')) * 1.0
                 / len(string_split(text, ' ')), 4) AS avg_token_len
    FROM documents ORDER BY doc_id
    """,
    tags=("text",),
    bench=True,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.token_stats(load_table(spark, sf_dir, "documents"))


@register(
    "doc_quality",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, text,
               string_split(text, ' ') AS toks,
               length(text) AS nc
        FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           round((nc - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                 * 1.0 / nc, 4) AS punct_ratio,
           round((nc - length(regexp_replace(text, '[0-9]', '', 'g')))
                 * 1.0 / nc, 4) AS digit_ratio,
           round(len(list_filter(toks, x -> x IN ({_EN})))
                 * 1.0 / len(toks), 4) AS stopword_ratio,
           round(least(1.0, len(toks) / 200.0) * 0.5
                 + CASE WHEN len(list_filter(toks, x -> x IN ({_EN})))
                             * 1.0 / len(toks) BETWEEN 0.05 AND 0.6
                        THEN 0.3 ELSE 0.0 END
                 + CASE WHEN (nc - length(regexp_replace(text, '[.,!?;:]',
                                                         '', 'g')))
                             * 1.0 / nc < 0.1
                        THEN 0.2 ELSE 0.0 END, 4) AS quality_score
    FROM t ORDER BY doc_id
    """,
    tags=("text",),
)
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.quality_features(load_table(spark, sf_dir, "documents"))


def _hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in T.STOPWORDS[lang])
    return (
        f"len(list_filter(string_split(lower(text), ' '), "
        f"x -> x IN ({words})))"
    )


_LANGS = list(T.STOPWORDS)
_CASE = "CASE " + " ".join(
    "WHEN "
    + " AND ".join(
        f"{_hits_sql(lang)} >= {_hits_sql(other)}"
        for other in _LANGS[i + 1:]
    )
    + f" THEN '{lang}'"
    for i, lang in enumerate(_LANGS[:-1])
) + f" ELSE '{_LANGS[-1]}' END"


@register(
    "doc_lang_confusion",
    oracle=f"""
    SELECT lang AS labeled_lang,
           {_CASE} AS predicted_lang,
           count(*) AS n_docs
    FROM documents
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("text", "lang-id"),
)
def doc_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.language_id(load_table(spark, sf_dir, "documents"))


@register(
    "doc_fingerprints",
    oracle=r"""
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
               AS fingerprint
    FROM documents ORDER BY doc_id
    """,
    tags=("text", "dedup"),
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.fingerprints(load_table(spark, sf_dir, "documents"))


@register(
    "fuzzy_name_pairs",
    oracle="""
    SELECT a.n_nationkey AS key_a, b.n_nationkey AS key_b,
           levenshtein(a.n_name, b.n_name) AS edit_distance
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    ORDER BY key_a, key_b
    """,
    tags=("text", "fuzzy", "levenshtein"),
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-match dedup primitive: pairwise edit distances over a
    (small, broadcast) name dimension — Spark's levenshtein and
    DuckDB's agree exactly.  At 100 TB you never run this on a fact
    table; fuzzy joins go through blocking (phonetic key / q-gram
    prefilter) and this exact check runs per candidate pair."""
    import pyspark.sql.functions as F

    nation = load_table(spark, sf_dir, "nation")
    a = nation.select(
        F.col("n_nationkey").alias("key_a"), F.col("n_name").alias("na")
    )
    b = nation.select(
        F.col("n_nationkey").alias("key_b"), F.col("n_name").alias("nb")
    )
    return (
        a.join(F.broadcast(b), F.col("key_a") < F.col("key_b"))
        .select(
            "key_a",
            "key_b",
            F.levenshtein("na", "nb").alias("edit_distance"),
        )
        .orderBy("key_a", "key_b")
    )


@register(
    "token_positions",
    oracle="""
    SELECT doc_id,
           unnest(generate_series(1, len(toks))) - 1 AS pos,
           unnest(toks) AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE doc_id < 5)
    ORDER BY doc_id, pos
    """,
    tags=("text", "posexplode", "unnest"),
)
def token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (posexplode / UNNEST WITH ORDINALITY): the
    fan-out primitive every tokenizer-at-scale is built on — position
    is computed during the explode, not by a window after it."""
    import pyspark.sql.functions as F

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 5)
    return (
        docs.select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("pos", "token"),
        )
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "token")
        .orderBy("doc_id", "pos")
    )
