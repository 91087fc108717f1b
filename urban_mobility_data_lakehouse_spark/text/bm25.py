"""BM25 keyword retrieval over the documents corpus.

The retrieval primitive of a training-data pipeline (corpus search,
eval-set mining, targeted sampling) re-expressed Spark-first:

- **One bounded corpus pass** computes the collection statistics the
  scorer needs — N, total token count, and per-query-term document
  frequencies — as a single aggregate returning ONE row (a handful of
  integers collected to the driver; same bounded-collect shape as the
  IVF trainer's sample).
- **Scoring is a pure row-local scan.** The per-term IDF weights are
  computed driver-side from those exact integers and inlined into the
  scoring expression as double literals (the knn_lsh / knn_ivf
  inline-the-constants pattern), so the 100 TB-side plan is one
  filter+project over `documents` with NO join, NO shuffle, and no
  Python in the hot path: term frequencies come from
  `size(filter(tokens, x -> x = term))`, the rest is literal double
  arithmetic inside whole-stage codegen.  Top-k lands in
  `TakeOrderedAndProject` — the only "sort" is the bounded heap.
- **Engine-portable by construction.** The oracle generator computes
  the SAME statistics with DuckDB on the same parquet, runs the SAME
  `math.log` on the SAME integers, and emits textually identical
  arithmetic (left-associated term sum, identical literals via
  `repr()` round-tripping), so scores match bit-for-bit and the
  driver's value-hash check passes without tolerance.

At 1000 executors the stats pass is a map-side-combined aggregate over
the corpus (one tiny shuffle of partial counters), and the scoring scan
is embarrassingly parallel; an inverted-index variant only wins when
queries arrive online and the corpus is indexed once — for batch
corpus mining this broadcast-constants scan IS the scale path.

Reference parity: the reference has no retrieval operator; this extends
its text surface (SURVEY.md beyond-reference training-data stack).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

K1 = 1.2
B = 0.75

# fixed registry query: mid-frequency corpus terms, deterministic order
QUERY_TERMS: tuple[str, ...] = ("customer", "spark", "stream", "vector")
TOP_K = 20


def corpus_stats(docs: DataFrame, terms: tuple[str, ...]) -> dict:
    """ONE aggregate pass → {n_docs, sum_dl, df: {term: df}} (exact
    integers, so driver-side IDF math is reproducible anywhere)."""
    toks = F.split(F.col("text"), " ")
    row = (
        docs.select(
            F.size(toks).alias("dl"),
            *[
                F.array_contains(toks, t).cast("long").alias(f"c{i}")
                for i, t in enumerate(terms)
            ],
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").alias("sum_dl"),
            *[F.sum(f"c{i}").alias(f"df{i}") for i in range(len(terms))],
        )
        .collect()[0]
    )
    return {
        "n_docs": int(row["n_docs"]),
        "sum_dl": int(row["sum_dl"]),
        "df": {t: int(row[f"df{i}"]) for i, t in enumerate(terms)},
    }


def idf_weights(stats: dict, terms: tuple[str, ...]) -> dict[str, float]:
    """Robertson-Sparck-Jones IDF: ln(1 + (N - df + 0.5)/(df + 0.5)).

    Computed in PYTHON from exact integer stats so the Spark builder and
    the DuckDB oracle inline bit-identical double literals — neither
    engine ever evaluates a log.
    """
    n = stats["n_docs"]
    return {
        t: math.log(1.0 + (n - stats["df"][t] + 0.5) / (stats["df"][t] + 0.5))
        for t in terms
    }


def _q(term: str) -> str:
    """DuckDB-side literal escape: single quotes doubled, the ONLY
    metacharacter in DuckDB's '...'-quoted literals (no backslash
    escapes there).  The space tokenizer keeps apostrophes, so "don't"
    is a legal corpus token and MUST NOT crash (or rewrite) the
    generated expression."""
    return term.replace("'", "''")


def _q_spark(term: str) -> str:
    """Spark-side literal escape: Spark's default parser ALSO processes
    backslash escapes inside '...'-quoted literals (unlike DuckDB), so
    backslashes must be doubled FIRST — a term with a trailing '\\'
    would otherwise escape the closing quote, and an interior one
    would silently decode (diverging from the DuckDB oracle)."""
    return term.replace("\\", "\\\\").replace("'", "''")


def _score_sql(
    terms: tuple[str, ...],
    idf: dict[str, float],
    avgdl: float,
    tf_template: str,
    esc=_q,
) -> str:
    """The shared scoring expression, textually identical in both
    engines modulo the tf primitive (`size(filter(toks, ...))` in
    Spark, `len(list_filter(toks, ...))` in DuckDB; `tf_template` has
    one `{t}` hole for the term) and the engine's literal escaper
    `esc` (`_q_spark` for Spark, `_q` for DuckDB).  Left-associated
    sum in fixed term order; every constant is a repr() round-trip
    double literal."""
    parts = []
    for t in terms:
        tf = f"CAST({tf_template.format(t=esc(t))} AS DOUBLE)"
        denom = (
            f"({tf} + {K1!r} * (1 - {B!r} + {B!r} * dl / {avgdl!r}))"
        )
        parts.append(f"{idf[t]!r} * ({tf} * ({K1!r} + 1)) / {denom}")
    return " + ".join(parts)


def bm25_topk(
    docs: DataFrame,
    terms: tuple[str, ...] = QUERY_TERMS,
    k: int = TOP_K,
    stats: dict | None = None,
) -> DataFrame:
    """Top-k docs by BM25 — columns (doc_id, dl, score).

    `stats` may be precomputed (e.g. cached across many queries over
    the same corpus snapshot); by default one bounded aggregate pass
    computes it from `docs` itself.
    """
    stats = stats or corpus_stats(docs, terms)
    idf = idf_weights(stats, terms)
    avgdl = stats["sum_dl"] / stats["n_docs"]
    score = _score_sql(
        terms, idf, avgdl, "size(filter(toks, x -> x = '{t}'))",
        esc=_q_spark,
    )
    terms_arr = ", ".join(f"'{_q_spark(t)}'" for t in terms)
    return (
        docs.select(
            "doc_id",
            F.split(F.col("text"), " ").alias("toks"),
        )
        .withColumn("dl", F.expr("CAST(size(toks) AS DOUBLE)"))
        # retrieval filter: candidate docs must contain >=1 query term
        .filter(F.expr(f"arrays_overlap(toks, array({terms_arr}))"))
        .select(
            "doc_id",
            F.col("dl").cast("long").alias("dl"),
            F.expr(f"round({score}, 4)").alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_oracle_sql(
    sf_dir: str,
    terms: tuple[str, ...] = QUERY_TERMS,
    k: int = TOP_K,
    where: str = "",
    text_expr: str = "text",
    corpus_sql: str | None = None,
) -> str:
    """Generate the DuckDB twin for `bm25_topk` at this sf_dir:
    identical integers → identical Python-side IDF → identical literal
    arithmetic.  `where` restricts the corpus snapshot (applied to the
    stats pass AND the scoring scan — the twin of scoring a historical
    index GENERATION whose tables froze a filtered corpus).
    `text_expr` substitutes a SQL expression for the raw text column
    in BOTH passes — the twin of scoring an index whose documents were
    REINDEXED with changed content (e.g. a CASE mapping specific
    doc_ids to their new text).

    `corpus_sql` replaces the corpus SOURCE entirely: a SELECT body
    yielding (doc_id, text) with one ``{docs}`` hole for the documents
    relation (filled with the parquet path for the generator's stats
    probe, the registered view name in the emitted SQL) — the twin of
    an index whose final state FOLDS a whole mutation tape (deletes +
    reindexes + derived additions) rather than filtering/mapping the
    base table in place.  Exclusive with `where`/`text_expr`."""
    import duckdb

    if corpus_sql is not None and (where or text_expr != "text"):
        raise ValueError(
            "bm25_oracle_sql: corpus_sql already defines the corpus — "
            "where/text_expr don't compose with it"
        )
    cond = f"WHERE {where}" if where else ""
    stats_src = (
        f"'{sf_dir}/documents.parquet' {cond}"
        if corpus_sql is None
        else "("
        # .replace, not .format: only the documented {docs} hole is
        # substituted, so literal braces elsewhere in the caller's SQL
        # (struct literals, quoted '{') can never raise Key/ValueError.
        + corpus_sql.replace("{docs}", f"'{sf_dir}/documents.parquet'")
        + ")"
    )
    con = duckdb.connect()
    cols = ", ".join(
        f"sum(CAST(list_contains(string_split({text_expr}, ' '), "
        f"'{_q(t)}') AS BIGINT))"
        for t in terms
    )
    n, sum_dl, *dfs = con.execute(
        f"SELECT count(*), sum(len(string_split({text_expr}, ' '))), "
        f"{cols} "
        f"FROM {stats_src}"
    ).fetchone()
    con.close()
    stats = {
        "n_docs": int(n),
        "sum_dl": int(sum_dl),
        "df": {t: int(d) for t, d in zip(terms, dfs)},
    }
    idf = idf_weights(stats, terms)
    avgdl = stats["sum_dl"] / stats["n_docs"]
    score = _score_sql(
        terms, idf, avgdl, "len(list_filter(toks, x -> x = '{t}'))"
    )
    terms_arr = ", ".join(f"'{_q(t)}'" for t in terms)
    emit_src = (
        f"documents {cond}"
        if corpus_sql is None
        else "(" + corpus_sql.replace("{docs}", "documents") + ")"
    )
    return f"""
    SELECT doc_id, CAST(dl AS BIGINT) AS dl, round({score}, 4) AS score
    FROM (
        SELECT doc_id, string_split({text_expr}, ' ') AS toks,
               CAST(len(string_split({text_expr}, ' ')) AS DOUBLE) AS dl
        FROM {emit_src}
    )
    WHERE len(list_intersect(toks, [{terms_arr}])) > 0
    ORDER BY score DESC, doc_id ASC
    LIMIT {k}
    """


def rrf_fuse(
    rankings: list[DataFrame],
    key_col: str = "doc_id",
    k: int = 60,
    topn: int = TOP_K,
) -> DataFrame:
    """Reciprocal rank fusion (Cormack et al., SIGIR 2009) — the
    standard way to combine BM25 and vector rankings into one hybrid
    retrieval list without score calibration:

        rrf(d) = Σ_i 1 / (k + rank_i(d))

    Each input needs (key_col, rank) with rank 1-based; a document
    absent from a ranking simply contributes nothing (full outer
    join + coalesce-0).  Ranks are small integers, so the fusion join
    inputs are top-N-sized — broadcastable no matter how big the
    corpus that produced them.  Output (key, rrf_score, rank),
    deterministic: ties break on the key.
    """
    fused = None
    for i, r in enumerate(rankings):
        contrib = r.select(
            key_col,
            (1.0 / (F.lit(k) + F.col("rank"))).alias(f"_c{i}"),
        )
        fused = (
            contrib
            if fused is None
            else fused.join(contrib, key_col, "full_outer")
        )
    score = None
    for i in range(len(rankings)):
        c = F.coalesce(F.col(f"_c{i}"), F.lit(0.0))
        score = c if score is None else score + c
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("rrf_score"), F.asc(key_col))
    return (
        fused.select(key_col, score.alias("rrf_score"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topn)
        .orderBy("rank")
    )
