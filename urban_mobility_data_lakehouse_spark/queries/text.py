"""Text-analysis queries over the `documents` table, with DuckDB oracles.

The Spark side and the oracle compute byte-identical expressions (same
regexes, same fold order for any float math) so value hashes match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.testdata import fan_out, load_table
from ..text import analysis as T
from ..text import bm25, winnow
from . import register

_EN = "'the','and','of','to','a'"

# lookbehind-free PII patterns, portable Java-regex ∩ RE2 (the library's
# phone/IBAN rules use lookbehind, which RE2 lacks — counted locally only)
_PII_PATTERNS = (
    r"(?i)\bhttps?://[^\s<>]+",
    r"(?i)\b[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}\b",
    r"\b\d{1,3}(?:\.\d{1,3}){3}\b",
    r"\b\d{4}(?:[ -]\d{4}){3}\b",
)
_PII_SQL = " + ".join(
    f"len(regexp_extract_all(text, '{p}'))" for p in _PII_PATTERNS
)


@register(
    "doc_profile",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id, text, n_chars,
               string_split(text, ' ') AS toks,
               length(text) AS nc
        FROM documents
    )
    SELECT doc_id,
           CAST(len(string_split(text, chr(10)))
                - len(list_distinct(string_split(text, chr(10))))
               AS BIGINT) AS n_dup_lines,
           CAST(COALESCE(tb.c, 0) AS BIGINT) AS top_bigram_count,
           CAST({_PII_SQL} AS BIGINT) AS n_pii,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(nc AS BIGINT) AS n_chars_actual,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text,
                '([a-z]+|[A-Z][a-z]*|[0-9]+|\S)', 1)) AS BIGINT)
               AS n_subtokens,
           round(length(replace(text, ' ', '')) * 1.0
                 / len(toks), 4) AS avg_token_len,
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
                        THEN 0.2 ELSE 0.0 END, 4) AS quality_score,
           CASE WHEN CAST(CAST(CONCAT('0x', substr(md5('split:' ||
                         CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT)
                     AS BIGINT) % 10000 < 8000 THEN 'train'
                WHEN CAST(CAST(CONCAT('0x', substr(md5('split:' ||
                         CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT)
                     AS BIGINT) % 10000 < 9000 THEN 'val'
                ELSE 'test' END AS split
    FROM t, LATERAL (
        SELECT max(cnt) AS c FROM (
            SELECT count(*) AS cnt
            FROM unnest(list_transform(
                     generate_series(1, greatest(len(toks) - 1, 0)),
                     i -> toks[i] || ' ' || toks[i + 1])) AS u(g)
            GROUP BY g)
    ) tb
    ORDER BY doc_id
    """,
    tags=("text", "tokens", "quality"),
    bench=True,
)
def doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token stats + quality features + repetition/PII
    counts + deterministic 80/10/10 train/val/test assignment in one
    row-local pass (token counting, BPE-ish subtoken split,
    punctuation/digit/stopword ratios, composite quality score,
    duplicate-line and top-bigram counts as exact integers — the
    Gopher-filter numerators, float-free for the value-hash — PII
    match count over the lookbehind-free rule subset, content-hash
    split — stable across runs/partitionings, unlike rand(seed)).
    Every column is a row-local expression, so the whole profile is
    ONE projection over ONE scan of `documents` — no joins, no
    shuffle beyond the oracle-stability sort.  (Earlier versions
    joined `token_stats` × `quality_features` × a repetition frame on
    doc_id; at 100 TB that is three scans and two shuffles of the
    corpus for columns that never needed to leave their row.)"""
    import pyspark.sql.functions as F

    from ..text.analysis import _max_run
    from ..text.curation import split_label

    # fan_out: regex/tokenize profiling is CPU-bound row-local map
    # work (see sources/testdata.fan_out; no-op on production layouts)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    lines = F.split("text", "\n")
    toks = T.tokens(F.col("text"))
    n = F.size(toks)
    n_chars = F.length("text")
    token_chars = F.length(
        F.replace(F.col("text"), F.lit(" "), F.lit(""))
    )
    punct = n_chars - F.length(
        F.regexp_replace(F.col("text"), r"[.,!?;:]", "")
    )
    digits = n_chars - F.length(
        F.regexp_replace(F.col("text"), r"[0-9]", "")
    )
    stop = F.size(F.filter(toks, lambda t: t.isin(*T.STOPWORDS["en"])))
    punct_ratio = punct / n_chars
    digit_ratio = digits / n_chars
    stop_ratio = stop / n
    score = (
        F.least(F.lit(1.0), n / F.lit(200.0)) * 0.5
        + F.when((stop_ratio >= 0.05) & (stop_ratio <= 0.6), 0.3)
        .otherwise(0.0)
        + F.when(punct_ratio < 0.1, 0.2).otherwise(0.0)
    )
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    n_pii = None
    for p in _PII_PATTERNS:
        c = F.size(F.regexp_extract_all("text", F.lit(p), F.lit(0)))
        n_pii = c if n_pii is None else n_pii + c
    return docs.select(
        "doc_id",
        (F.size(lines) - F.size(F.array_distinct(lines)))
        .cast("long")
        .alias("n_dup_lines"),
        F.when(n <= 1, F.lit(0))
        .otherwise(_max_run(F.sort_array(bigrams)))
        .cast("long")
        .alias("top_bigram_count"),
        n_pii.cast("long").alias("n_pii"),
        F.col("n_chars").cast("long").alias("n_chars"),
        n_chars.cast("long").alias("n_chars_actual"),
        n.cast("long").alias("n_tokens"),
        F.size(
            F.regexp_extract_all("text", F.lit(T._TOKEN_RE), F.lit(1))
        )
        .cast("long")
        .alias("n_subtokens"),
        F.round(token_chars / n, 4).alias("avg_token_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(digit_ratio, 4).alias("digit_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality_score"),
        split_label(F.col("doc_id").cast("string")).alias("split"),
    ).orderBy("doc_id")


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


_WINNOW_HASH = (
    "CAST(CAST(CONCAT('0x', substr(md5({x}), 1, 15)) AS UBIGINT) AS BIGINT)"
    f" % {winnow.P}"
)

# the same Horner nesting as winnow._gram_hash: mod after every multiply
_WINNOW_GRAM = (
    f"((((wh[i] * {winnow.B} % {winnow.P}) + wh[i+1]) % {winnow.P}"
    f" * {winnow.B} % {winnow.P}) + wh[i+2]) % {winnow.P}"
)

_WINNOW_SQL = f"""
    SELECT 'winnow' AS part,
           CAST(doc_id AS BIGINT) AS k1,
           {(1 << 20) - 1} - (e % {1 << 20}) AS k2,
           CAST(NULL AS VARCHAR) AS token,
           e // {1 << 20} AS n
    FROM (
        SELECT doc_id, unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(enc) - {winnow.W - 1}, 1)),
                   i -> list_min(list_slice(enc, i, i + {winnow.W - 1}))
               ))) AS e
        FROM (
            SELECT doc_id, list_transform(
                       generate_series(1, len(grams)),
                       j -> (grams[j] * {1 << 20})
                            + ({(1 << 20) - 1} - (j - 1))
                   ) AS enc
            FROM (
                SELECT doc_id,
                       CASE WHEN len(wh) - {winnow.K - 1} >= 1
                            THEN list_transform(
                                generate_series(1, len(wh) - {winnow.K - 1}),
                                i -> {_WINNOW_GRAM})
                            ELSE [{_WINNOW_HASH.format(x='text')}] END
                           AS grams
                FROM (SELECT doc_id, text,
                             list_transform(string_split(text, ' '),
                                 t -> {_WINNOW_HASH.format(x='t')}) AS wh
                      FROM documents)
            )
        )
    )
"""


# ExactSubstr span-dedup parts (text/spans.py, r12): L-gram Karp-Rabin
# hashes → ≥2-doc repeat set → gaps-and-islands span merge → row-local
# removal.  'span' emits every maximal repeated span's (doc, start,
# end) boundaries; 'spancut' emits, for each affected doc, the md5 +
# char length of the text rebuilt with its spans cut out — the oracle
# re-derives both from the raw corpus with the same portable word-hash
# arithmetic the winnow part already replays.
_SPAN_L = 8  # == text.spans.MIN_TOKENS (import-asserted in the suite)


def _span_gram() -> str:
    """DuckDB twin of spans._gram_hashes' Horner fold: mod after every
    multiply, exact int64 (h < 2^31, B < 2^20 ⇒ products < 2^51)."""
    h = "wh[i]"
    for j in range(1, _SPAN_L):
        h = f"(({h}) * {winnow.B} % {winnow.P} + wh[i+{j}]) % {winnow.P}"
    return h


_SPAN_SQL = f"""
span_pos AS (
    SELECT doc_id, g.pos AS pos, g.gh AS gh
    FROM (
        SELECT doc_id, unnest(list_transform(
                   generate_series(1, len(wh) - {_SPAN_L - 1}),
                   i -> struct_pack(pos := i, gh := {_span_gram()}))) AS g
        FROM (
            SELECT doc_id,
                   list_transform(string_split(text, ' '),
                       t -> {_WINNOW_HASH.format(x='t')}) AS wh
            FROM documents
        )
        WHERE len(wh) >= {_SPAN_L}
    )
),
span_hits AS (
    SELECT doc_id, pos FROM span_pos
    WHERE gh IN (SELECT gh FROM span_pos
                 GROUP BY gh HAVING count(DISTINCT doc_id) >= 2)
),
span_isl AS (
    SELECT doc_id, pos,
           CASE WHEN lag(pos) OVER w IS NULL
                     OR pos - lag(pos) OVER w > {_SPAN_L}
                THEN 1 ELSE 0 END AS ni
    FROM span_hits
    WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
span_spans AS (
    SELECT doc_id, min(pos) AS s, max(pos) + {_SPAN_L - 1} AS e
    FROM (
        SELECT doc_id, pos,
               sum(ni) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS island
        FROM span_isl
    )
    GROUP BY doc_id, island
),
span_cut AS (
    -- COALESCE: DuckDB's array_to_string maps the empty list to NULL
    -- (a fully-covered doc rebuilds to ''), Spark's array_join to ''
    SELECT d.doc_id,
           COALESCE(array_to_string(
               list_transform(
                   list_filter(
                       generate_series(1, len(d.t)),
                       i -> len(list_filter(c.cuts,
                               x -> i >= x.s AND i <= x.e)) = 0),
                   i -> d.t[i]),
               ' '), '') AS cleaned
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) d
    JOIN (SELECT doc_id, list(struct_pack(s := s, e := e)) AS cuts
          FROM span_spans GROUP BY doc_id) c USING (doc_id)
)
"""


# decontamination part: docs with doc_id % 97 == 0 play the "eval
# benchmark"; every doc reports how many distinct eval 8-grams it
# contains (text/contamination.py semantics, same portable md5-31bit
# gram hash as the MinHash stack)
_CONTAM_N = 8
_CONTAM_GRAM = " || ' ' || ".join(f"t[i+{j}]" for j in range(_CONTAM_N))
_CONTAM_HASH = (
    "CAST(CAST(CONCAT('0x', substr(md5(s), 1, 15)) AS UBIGINT) AS BIGINT)"
    " % 2147483647"
)
_CONTAM_SQL = f"""
contam_grams AS (
    SELECT doc_id, unnest(list_distinct(list_transform(
        CASE WHEN len(t) >= {_CONTAM_N}
             THEN list_transform(generate_series(1, len(t) - {_CONTAM_N - 1}),
                                 i -> {_CONTAM_GRAM})
             ELSE [text] END,
        s -> {_CONTAM_HASH}))) AS h
    FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)
),
contam_eval AS (
    SELECT DISTINCT h FROM contam_grams WHERE doc_id % 97 = 0
)
"""

# chunking part: small window/overlap so the fixture corpus exercises
# multi-chunk docs densely; n = chunk-text char length pins the exact
# token slice boundaries
_CHUNK_MAX = 16
_CHUNK_OVERLAP = 4
_CHUNK_STRIDE = _CHUNK_MAX - _CHUNK_OVERLAP

# suite-level packing parameters: a small budget exercises bin
# boundaries densely on the fixture corpus
_PACK_BUDGET = 64
_PACK_SHARDS = 4

_PACK_HASH = (
    "CAST(CAST(CONCAT('0x', substr(md5('pack:' || "
    "CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT)"
)


def _cms_pos_sql(r: int, width: int, key: str = "token") -> str:
    """DuckDB twin of operators.sketches._cms_pos (portable md5-31bit
    reduced mod width, r-salted)."""
    return (
        f"CAST(CAST(CONCAT('0x', substr(md5('{r}:' || {key}), 1, 15)) "
        f"AS UBIGINT) AS BIGINT) % {width}"
    )


def _cms_sql(depth: int, width: int) -> str:
    """Sketch-build + probe CTEs replaying cms_sketch/cms_estimate."""
    build = "\n        UNION ALL ".join(
        f"SELECT {r} AS r, {_cms_pos_sql(r, width)} AS pos FROM cms_tok"
        for r in range(depth)
    )
    probe = "\n        UNION ALL ".join(
        f"SELECT token, {r} AS r, {_cms_pos_sql(r, width)} AS pos "
        "FROM cms_vocab"
        for r in range(depth)
    )
    return f"""
    cms_tok AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    cms_vocab AS (SELECT DISTINCT token FROM cms_tok),
    cms_sk AS (
        SELECT r, pos, CAST(count(*) AS BIGINT) AS cnt
        FROM ({build})
        GROUP BY r, pos
    ),
    cms_probe AS ({probe}),
    cms_est AS (
        SELECT p.token, CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS est
        FROM cms_probe p
        LEFT JOIN cms_sk s ON s.r = p.r AND s.pos = p.pos
        GROUP BY p.token
    )
"""


from ..operators import sketches as _S

_CMS_SQL = _cms_sql(_S.CMS_DEPTH, _S.CMS_WIDTH)

# mergeable-histogram replay: INTEGER binning (n_tokens div width) and
# an exact-rational quantile rank — no float crosses an engine boundary
_HIST_W = 8
_HIST_QS = ((50, 100), (90, 100), (99, 100))  # (num, den) per quantile
_HIST_SQL = f"""
    hist AS (
        SELECT CAST(len(string_split(text, ' ')) // {_HIST_W} AS BIGINT)
                   AS bin,
               CAST(count(*) AS BIGINT) AS cnt
        FROM documents GROUP BY 1
    ),
    hist_cum AS (
        SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum,
               sum(cnt) OVER () AS total
        FROM hist
    ),
    histq AS (
        """ + "\n        UNION ALL ".join(
    f"SELECT {num} AS pct, (min(bin) + 1) * {_HIST_W} - 1 AS est "
    f"FROM hist_cum WHERE cum >= ({num} * total + {den - 1}) // {den}"
    for num, den in _HIST_QS
) + """
    )
"""

# DuckDB CAN express the sequential greedy recurrence — as a recursive
# CTE stepping row_number per shard — which is exactly why it works as
# the oracle for the applyInPandas packing operator.
_PACK_SQL = f"""
pack_base AS (
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           {_PACK_HASH} % {_PACK_SHARDS} AS shard,
           md5('pack:' || CAST(doc_id AS VARCHAR)) AS ord
    FROM documents
),
pack_rn AS (
    SELECT *,
           row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id)
               AS rnum,
           least(n_tokens, {_PACK_BUDGET}) AS c
    FROM pack_base
),
pack_packed AS (
    SELECT doc_id, n_tokens, shard, rnum, c,
           CAST(0 AS BIGINT) AS bin, c AS used
    FROM pack_rn WHERE rnum = 1
    UNION ALL
    SELECT r.doc_id, r.n_tokens, r.shard, r.rnum, r.c,
           CASE WHEN p.used + r.c > {_PACK_BUDGET}
                THEN p.bin + 1 ELSE p.bin END,
           CASE WHEN p.used + r.c > {_PACK_BUDGET}
                THEN r.c ELSE p.used + r.c END
    FROM pack_rn r
    JOIN pack_packed p ON r.shard = p.shard AND r.rnum = p.rnum + 1
)
"""



# LM-scoring part: integer micro-log2 model literals injected into both
# engines (text/lm.py train_lm_micrologs); band thresholds in micro-bits
# per token, compared by exact integer cross-multiplication
_LM_LO_U = 9_000_000_000   # 9.0 bits/token
_LM_HI_U = 11_000_000_000  # 11.0 bits/token


def _lm_sq(s: str) -> str:
    return s.replace("'", "''")


def _lm_sql(sf_dir: str) -> str:
    """DuckDB CTEs replaying `micro_lm_scores` from first principles:
    the injected integer micro-log model (the bm25 inlined-literals
    pattern — neither engine evaluates a log), a positional
    (prev, cur) event explode, the unigram/bigram/fallback/OOV
    coalesce chain, and EXACT per-doc BIGINT sums (order-independent,
    so DuckDB's parallel hash agg and Spark's partial aggregation
    cannot diverge)."""
    from ..text import lm as lm_mod

    m = lm_mod.train_lm_micrologs(sf_dir)
    if not m["uni"] or not m["bi"]:
        raise ValueError(
            f"corpus at {sf_dir} too small to train the LM model "
            f"(|uni|={len(m['uni'])}, |bi|={len(m['bi'])}) — an empty "
            "VALUES list is not valid SQL"
        )
    uni_vals = ",\n        ".join(
        f"('{_lm_sq(t)}', {u}, {fb})" for t, u, fb in m["uni"]
    )
    bi_vals = ",\n        ".join(
        f"('{_lm_sq(a)}', '{_lm_sq(b)}', {u})" for a, b, u in m["bi"]
    )
    return f"""
lm_uni(tok, u, fb) AS (VALUES
        {uni_vals}
),
lm_bi(prev, cur, ub) AS (VALUES
        {bi_vals}
),
lm_events AS (
    SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
),
lm_scored AS (
    SELECT e.doc_id,
           COALESCE(u.u, {m["oov_u"]}) AS lp_uni,
           CASE WHEN e.i = 1 THEN COALESCE(u.u, {m["oov_u"]})
                WHEN b.ub IS NOT NULL THEN b.ub
                ELSE COALESCE(u.fb, {m["oov_fb_u"]}) END AS lp_bi
    FROM (SELECT doc_id, i,
                 CASE WHEN i = 1 THEN NULL ELSE t[i - 1] END AS prev,
                 t[i] AS cur
          FROM lm_events) e
    LEFT JOIN lm_uni u ON u.tok = e.cur
    LEFT JOIN lm_bi b ON b.prev = e.prev AND b.cur = e.cur
),
lm_doc AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
           CAST(-SUM(lp_uni) AS BIGINT) AS su,
           CAST(-SUM(lp_bi) AS BIGINT) AS sb
    FROM lm_scored GROUP BY doc_id
)
"""


# BPE part: the learned merges injected as a (k, pat, rep) table; the
# oracle replays the greedy encoder as a rank-ordered replace() fold
# over \x1f-sym-\x1e wrapped symbols (exact: a merged symbol only
# participates in LATER-rank merges, so rank-ordered left-to-right
# non-overlapping replacement == the leftmost-lowest-rank loop of
# text/bpe._encode_word), applied per DISTINCT word via a recursive
# CTE stepping k — |types| x |merges| rows, never corpus-sized
_BPE_MERGES = 48
_BPE_DOCS = 50  # encode subcorpus: doc_id < 50 (positional rows)


def _bpe_sql(sf_dir: str) -> str:
    from ..text import bpe as bpe_mod

    merges = bpe_mod.train_bpe_from_parquet(sf_dir, n_merges=_BPE_MERGES)
    if not merges:
        raise ValueError(
            f"corpus at {sf_dir} too small to train BPE merges — an "
            "empty VALUES list is not valid SQL"
        )
    o, c = bpe_mod._ORACLE_OPEN, bpe_mod._ORACLE_CLOSE

    def q(x: str) -> str:
        return x.replace("'", "''")

    mvals = ",\n        ".join(
        f"({k + 1}, '{q(o + a + c + o + b + c)}', '{q(o + a + b + c)}')"
        for k, (a, b) in enumerate(merges)
    )
    K = len(merges)
    return f"""
bpe_docs AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
    FROM documents WHERE doc_id < {_BPE_DOCS}
),
bpe_words AS (SELECT DISTINCT unnest(ws) AS w FROM bpe_docs),
bpe_merges(k, pat, rep) AS (VALUES
        {mvals}
),
bpe_steps AS (
    SELECT w,
           array_to_string(list_transform(generate_series(1, length(w)),
               i -> chr(31) || substr(w, i, 1) || chr(30)), '')
           || chr(31) || '{bpe_mod.EOW}' || chr(30) AS s,
           0 AS k
    FROM bpe_words
    UNION ALL
    SELECT b.w, replace(b.s, m.pat, m.rep), b.k + 1
    FROM bpe_steps b JOIN bpe_merges m ON m.k = b.k + 1
),
bpe_done AS (
    SELECT w, list_transform(
               list_filter(string_split(s, chr(31)), x -> x <> ''),
               x -> rtrim(x, chr(30))) AS toks
    FROM bpe_steps WHERE k = {K}
),
bpe_wordpos AS (
    SELECT doc_id, unnest(ws) AS w,
           unnest(generate_series(1, len(ws))) AS wi
    FROM bpe_docs
),
bpe_tokpos AS (
    SELECT doc_id, wi, unnest(toks) AS tok,
           unnest(generate_series(1, len(toks))) AS ti
    FROM bpe_wordpos JOIN bpe_done USING (w)
),
bpe_out AS (
    SELECT doc_id,
           row_number() OVER (PARTITION BY doc_id ORDER BY wi, ti) - 1
               AS pos,
           tok,
           count(*) OVER (PARTITION BY doc_id) AS n
    FROM bpe_tokpos
)
"""


# boilerplate-strip part: census >=2 docs (the hotline set), then the
# rebuilt text per doc — anti-join on the line hash, ordered
# string_agg rebuild; md5 of the rebuilt text is the portable witness
_STRIP_SQL = f"""
strip_hot AS (
    SELECT h FROM (
        SELECT doc_id, unnest(list_distinct(list_transform(
            string_split(text, chr(10)), s -> {_CONTAM_HASH}))) AS h
        FROM documents
    ) GROUP BY h HAVING count(*) >= 2
),
strip_kept AS (
    SELECT doc_id, l, i FROM (
        SELECT doc_id, unnest(string_split(text, chr(10))) AS l,
               unnest(generate_series(1,
                   len(string_split(text, chr(10))))) AS i
        FROM documents
    ) WHERE CAST(CAST(CONCAT('0x', substr(md5(l), 1, 15)) AS UBIGINT) AS BIGINT) % 2147483647
          NOT IN (SELECT h FROM strip_hot)
),
strip_out AS (
    SELECT d.doc_id,
           CAST(len(string_split(d.text, chr(10)))
                - COALESCE(k.nk, 0) AS BIGINT) AS removed,
           md5(COALESCE(k.txt, '')) AS h2,
           CAST(length(COALESCE(k.txt, '')) AS BIGINT) AS n2
    FROM documents d LEFT JOIN (
        SELECT doc_id, count(*) AS nk,
               string_agg(l, chr(10) ORDER BY i) AS txt
        FROM strip_kept GROUP BY doc_id
    ) k USING (doc_id)
)
"""


# classifier part: hashed-BoW quality scorer under twin-trained
# injected weights — the logit is a bias-seeded LEFT FOLD of weight
# literals in token order, so both engines produce the identical
# float64 before the micro-unit rounding
def _clf_sql(sf_dir: str) -> str:
    from ..text import classifier as clf_mod

    w, b = clf_mod.self_train_quality_model_from_parquet(sf_dir)
    d = len(w)
    w_list = ", ".join(repr(x) for x in w)
    bucket = (
        "CAST((CAST(CONCAT('0x', substr(md5(t), 1, 15)) AS UBIGINT) "
        f"% 2147483647) % {d} AS BIGINT)"
    )
    return f"""
clf_w AS (SELECT [{w_list}] AS w),
clf_doc AS (
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST({b!r} AS DOUBLE),
                   list_transform(string_split(text, ' '),
                       t -> w[{bucket} + 1])),
               (a, b) -> a + b) AS logit
    FROM documents, clf_w
)
"""


# mixing part: the domain sampler's registry weights — src0-4
# upsampled (rate ≈ 2.2-2.4: two full copies + a hash-gated
# fractional), src5-14 downsampled (≈ 0.7-0.9), src15-19 dropped
_MIX_WEIGHTS = tuple(sorted(
    {f"src{i}": (3.0 if i < 5 else 1.0) for i in range(15)}.items()
))


def _mix_sql(sf_dir: str) -> str:
    from ..text import mixing as mix_mod

    rates = mix_mod.mixing_rates_from_parquet(sf_dir, _MIX_WEIGHTS)
    # CAST each rate literal: DuckDB parses bare decimal literals as
    # DECIMAL (whose fractional-part arithmetic overflows and differs
    # from Spark's double math); both engines must compare the hash
    # against the SAME float64 threshold
    cases = " ".join(
        f"WHEN '{g}' THEN CAST({r!r} AS DOUBLE)"
        for g, r in sorted(rates.items())
    )
    return f"""
mix_doc AS (
    SELECT doc_id, source,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
           CASE source {cases} ELSE 0.0 END AS rate
    FROM documents
),
mix_n AS (
    SELECT doc_id, source, ntok,
           CAST(floor(rate) AS INT)
           + CASE WHEN CAST(CAST(CONCAT('0x', substr(md5('mix:' ||
                      CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT)
                  AS BIGINT) % 10000
                  < (rate - floor(rate)) * 10000 THEN 1 ELSE 0 END AS n
    FROM mix_doc
),
mix_out AS (
    SELECT doc_id, source, ntok,
           unnest(generate_series(0, n - 1)) AS copy_no
    FROM mix_n WHERE n > 0
)
"""


def _lm_band_sql(col: str) -> str:
    return (
        f"CASE WHEN {col} < {_LM_LO_U} * n_toks THEN 'low' "
        f"WHEN {col} > {_LM_HI_U} * n_toks THEN 'high' "
        f"ELSE 'mid' END"
    )


def _text_pairs_oracle(sf_dir: str) -> str:
    return f"""
    WITH RECURSIVE {_PACK_SQL}, {_CONTAM_SQL}, {_CMS_SQL},
    {_HIST_SQL}, {_STRIP_SQL}, {_SPAN_SQL}, {_lm_sql(sf_dir)},
    {_bpe_sql(sf_dir)}, {_clf_sql(sf_dir)}, {_mix_sql(sf_dir)}
    SELECT 'levenshtein' AS part,
           CAST(a.n_nationkey AS BIGINT) AS k1,
           CAST(b.n_nationkey AS BIGINT) AS k2,
           CAST(NULL AS VARCHAR) AS token,
           CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS n
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    UNION ALL
    SELECT 'posexplode',
           CAST(doc_id AS BIGINT),
           unnest(generate_series(1, len(toks))) - 1,
           unnest(toks),
           CAST(NULL AS BIGINT)
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE doc_id < 5)
    UNION ALL
    {_WINNOW_SQL}
    UNION ALL
    SELECT 'pack',
           CAST(doc_id AS BIGINT),
           CAST(shard AS BIGINT),
           CAST(n_tokens AS VARCHAR),
           bin
    FROM pack_packed
    UNION ALL
    SELECT 'contam',
           CAST(doc_id AS BIGINT),
           CAST(NULL AS BIGINT),
           CAST(NULL AS VARCHAR),
           CAST(count(*) FILTER (WHERE h IN (SELECT h FROM contam_eval))
               AS BIGINT)
    FROM contam_grams GROUP BY doc_id
    UNION ALL
    SELECT 'hotline',
           CAST(h AS BIGINT),
           CAST(NULL AS BIGINT),
           CAST(NULL AS VARCHAR),
           CAST(n AS BIGINT)
    FROM (
        SELECT h, count(*) AS n
        FROM (
            SELECT doc_id, unnest(list_distinct(list_transform(
                string_split(text, chr(10)), s -> {_CONTAM_HASH}))) AS h
            FROM documents
        ) GROUP BY h HAVING count(*) >= 2
    )
    UNION ALL
    SELECT 'chunk',
           CAST(doc_id AS BIGINT),
           chunk_no,
           CAST(NULL AS VARCHAR),
           CAST(length(array_to_string(
               list_slice(t, chunk_no * {_CHUNK_STRIDE} + 1,
                          chunk_no * {_CHUNK_STRIDE} + {_CHUNK_MAX}),
               ' ')) AS BIGINT)
    FROM (
        SELECT doc_id, t,
               unnest(generate_series(0, nc - 1)) AS chunk_no
        FROM (
            SELECT doc_id, string_split(text, ' ') AS t,
                   greatest(1, CAST(ceil(
                       (len(string_split(text, ' ')) - {_CHUNK_OVERLAP})
                       / {_CHUNK_STRIDE}.0) AS BIGINT)) AS nc
            FROM documents
        )
    )
    UNION ALL
    SELECT 'vocab',
           CAST(rnk AS BIGINT),
           CAST(NULL AS BIGINT),
           token,
           cnt
    FROM (
        SELECT token, cnt,
               row_number() OVER (ORDER BY cnt DESC, token) AS rnk
        FROM (
            SELECT token, CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT unnest(string_split(text, ' ')) AS token
                  FROM documents)
            GROUP BY token
        )
    ) WHERE rnk <= 50
    UNION ALL
    SELECT 'cms',
           CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT),
           token,
           est
    FROM cms_est
    UNION ALL
    SELECT 'hist', bin, CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), cnt
    FROM hist
    UNION ALL
    SELECT 'histq', CAST(pct AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS VARCHAR), CAST(est AS BIGINT)
    FROM histq
    UNION ALL
    SELECT 'lmuni', CAST(doc_id AS BIGINT), n_toks,
           {_lm_band_sql("su")}, su
    FROM lm_doc
    UNION ALL
    SELECT 'lmbi', CAST(doc_id AS BIGINT), n_toks,
           {_lm_band_sql("sb")}, sb
    FROM lm_doc
    UNION ALL
    SELECT 'bpe', CAST(doc_id AS BIGINT), pos, tok, n
    FROM bpe_out
    UNION ALL
    SELECT 'strip', CAST(doc_id AS BIGINT), removed, h2, n2
    FROM strip_out
    UNION ALL
    SELECT 'clf', CAST(doc_id AS BIGINT), CAST(NULL AS BIGINT),
           CASE WHEN logit > 0 THEN 'good' ELSE 'bad' END,
           CAST(round(logit * 1000000) AS BIGINT)
    FROM clf_doc
    UNION ALL
    SELECT 'mix', CAST(doc_id AS BIGINT), CAST(copy_no AS BIGINT),
           source, ntok
    FROM mix_out
    UNION ALL
    SELECT 'span', CAST(doc_id AS BIGINT), CAST(s AS BIGINT),
           CAST(NULL AS VARCHAR), CAST(e AS BIGINT)
    FROM span_spans
    UNION ALL
    SELECT 'spancut', CAST(doc_id AS BIGINT), CAST(NULL AS BIGINT),
           md5(cleaned), CAST(length(cleaned) AS BIGINT)
    FROM span_cut
    ORDER BY part, k1, k2, n
    """


@register(
    "text_pairs_suite",
    oracle=_text_pairs_oracle,  # callable: the LM part injects
    # corpus-trained integer micro-log literals per sf_dir
    tags=("text", "fuzzy", "levenshtein", "posexplode", "winnow", "pack",
          "cms", "lm"),
)
def text_pairs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-at-scale primitives in one labeled union.

    `levenshtein`: pairwise edit distances over a (small, broadcast)
    name dimension — at 100 TB fuzzy joins go through blocking
    (phonetic key / q-gram prefilter) and this exact check runs per
    candidate pair.  `posexplode`: positional explode (UNNEST WITH
    ORDINALITY) — position computed during the explode, not by a
    window after it.  `winnow`: rolling-hash winnowing fingerprints
    (text/winnow.py) over every document — k1=doc_id, k2=selected gram
    position, n=fingerprint hash.  Per-document exact fingerprints
    (md5) are driver-checked inside exact_dup_groups.  `pack`:
    deterministic greedy sequence packing (text/packing.py) —
    k1=doc_id, k2=shard, token=n_tokens, n=bin; the oracle replays the
    sequential greedy recurrence as a DuckDB recursive CTE, verifying
    the applyInPandas operator bin-for-bin.  `contam`: benchmark
    decontamination (text/contamination.py) — docs with doc_id%97==0
    act as the eval set; k1=doc_id, n=distinct eval 8-grams found
    (broadcast-array plan, corpus side shuffle-free).  `vocab`: global
    top-50 token frequencies (TakeOrderedAndProject — the vocabulary
    pass of a tokenizer-training pipeline) — k1=rank, token, n=count.
    `cms`: count-min sketch estimates for every vocab token
    (operators/sketches.py — sparse (r, pos, cnt) counter relation,
    portable md5 positions; the oracle rebuilds the sketch and probes
    it in SQL, so sketch AND estimator are hash-checked end-to-end) —
    token, n=estimate (≥ true count by construction).  `lmuni`/
    `lmbi` (r9): exact unigram / interpolated-bigram LM scores under
    the driver-trained integer micro-log2 model (text/lm.py
    micro_lm_scores) — k1=doc_id, k2=n_tokens, n=exact negated
    micro-bit sum, token=perplexity band decided by integer
    cross-multiplication; no float enters the hash.  `bpe` (r9): the
    Arrow mapInPandas BPE encoder's positional token stream for
    doc_id<50 under pyarrow-twin-trained merges — k1=doc_id,
    k2=position, token=subword, n=doc token count; the oracle replays
    the merges as a rank-ordered boundary-exact replace() fold.
    `span`/`spancut` (r12): ExactSubstr span dedup (text/spans.py, Lee
    et al. ACL 2022 re-derived relationally) — 'span' emits every
    maximal ≥2-doc repeated span's (doc_id=k1, start=k2, end=n) token
    boundaries, 'spancut' the md5 (token) + char length (n) of each
    affected doc's text rebuilt with its spans removed; the oracle
    re-derives Karp-Rabin grams, the repeat census, the
    gaps-and-islands merge and the positional cut from the raw corpus.
    """
    import pyspark.sql.functions as F

    nation = load_table(spark, sf_dir, "nation")
    a = nation.select(
        F.col("n_nationkey").cast("long").alias("k1"),
        F.col("n_name").alias("na"),
    )
    b = nation.select(
        F.col("n_nationkey").cast("long").alias("k2"),
        F.col("n_name").alias("nb"),
    )
    fuzzy = (
        a.join(F.broadcast(b), F.col("k1") < F.col("k2"))
        .select(
            F.lit("levenshtein").alias("part"),
            "k1",
            "k2",
            F.lit(None).cast("string").alias("token"),
            F.levenshtein("na", "nb").cast("long").alias("n"),
        )
    )
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 5)
    tokpos = (
        docs.select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("pos", "token"),
        )
        .select(
            F.lit("posexplode").alias("part"),
            F.col("doc_id").cast("long").alias("k1"),
            F.col("pos").cast("long").alias("k2"),
            "token",
            F.lit(None).cast("long").alias("n"),
        )
    )
    # fan_out: rolling-hash fingerprinting is CPU-bound row-local map
    # work over every document; the single-row-group local layout runs
    # it as ONE task otherwise (no-op on production layouts, and the
    # fingerprint SET is row-order-free)
    fps = winnow.winnow_fingerprints(
        fan_out(load_table(spark, sf_dir, "documents"))
    ).select(
        F.lit("winnow").alias("part"),
        F.col("doc_id").cast("long").alias("k1"),
        F.col("pos").alias("k2"),
        F.lit(None).cast("string").alias("token"),
        F.col("fp").alias("n"),
    )
    from ..text.packing import pack_sequences

    packed = pack_sequences(
        load_table(spark, sf_dir, "documents"),
        budget=_PACK_BUDGET,
        n_shards=_PACK_SHARDS,
    ).select(
        F.lit("pack").alias("part"),
        F.col("doc_id").cast("long").alias("k1"),
        F.col("shard").cast("long").alias("k2"),
        F.col("n_tokens").cast("string").alias("token"),
        F.col("bin").alias("n"),
    )
    from ..text.contamination import mark_contaminated

    # fan_out: gram hashing (8 element_at + md5 per position) is the
    # suite's heaviest row-local map work — measured 12.4 s as ONE
    # task at sf0.1; every consumer below (contam/vocab/hotline/chunk/
    # cms/hist) is order-independent (integer counts / row-local exprs)
    docs_all = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    contam = mark_contaminated(
        docs_all, docs_all.filter(F.col("doc_id") % 97 == 0), n=_CONTAM_N
    ).select(
        F.lit("contam").alias("part"),
        F.col("doc_id").cast("long").alias("k1"),
        F.lit(None).cast("long").alias("k2"),
        F.lit(None).cast("string").alias("token"),
        F.col("contam_hits").alias("n"),
    )
    from pyspark.sql import Window

    counts = (
        docs_all.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(50)  # TakeOrderedAndProject: the only global sort is top-k
    )
    vocab = counts.withColumn(
        "rnk",
        F.row_number().over(
            Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
        ),
    ).select(
        F.lit("vocab").alias("part"),
        F.col("rnk").cast("long").alias("k1"),
        F.lit(None).cast("long").alias("k2"),
        "token",
        F.col("cnt").alias("n"),
    )
    from ..text.boilerplate import hot_lines

    hot = hot_lines(docs_all, min_docs=2).select(
        F.lit("hotline").alias("part"),
        F.col("line_hash").alias("k1"),
        F.lit(None).cast("long").alias("k2"),
        F.lit(None).cast("string").alias("token"),
        F.col("n_docs").alias("n"),
    )
    # span/spancut: ExactSubstr dedup (text/spans.py) driven through
    # the hash gate — maximal repeated-span boundaries, then the
    # row-local removal witnessed by md5 + length of each affected
    # doc's rebuilt text (only affected docs: the untouched rest is
    # identity by construction)
    from ..text import spans as spans_mod

    assert spans_mod.MIN_TOKENS == _SPAN_L  # oracle literal pin
    span_frame = spans_mod.repeated_spans(docs_all, l_tokens=_SPAN_L)
    span_part = span_frame.select(
        F.lit("span").alias("part"),
        F.col("doc_id").cast("long").alias("k1"),
        F.col("start_pos").cast("long").alias("k2"),
        F.lit(None).cast("string").alias("token"),
        F.col("end_pos").cast("long").alias("n"),
    )
    spancut_part = (
        spans_mod.remove_spans(docs_all, span_frame)
        .join(
            span_frame.select("doc_id").distinct(),
            "doc_id",
            "left_semi",
        )
        .select(
            F.lit("spancut").alias("part"),
            F.col("doc_id").cast("long").alias("k1"),
            F.lit(None).cast("long").alias("k2"),
            F.md5("text").alias("token"),
            F.length("text").cast("long").alias("n"),
        )
    )
    from ..text.chunking import chunk_documents

    chunks = chunk_documents(
        docs_all, max_tokens=_CHUNK_MAX, overlap=_CHUNK_OVERLAP
    ).select(
        F.lit("chunk").alias("part"),
        F.col("doc_id").cast("long").alias("k1"),
        F.col("chunk_no").alias("k2"),
        F.lit(None).cast("string").alias("token"),
        F.length("chunk_text").cast("long").alias("n"),
    )
    cms_toks = docs_all.select(
        F.explode(F.split("text", " ")).alias("token")
    )
    cms = _S.cms_estimate(
        _S.cms_sketch(cms_toks, "token"),
        cms_toks.select("token").distinct(),
        "token",
    ).select(
        F.lit("cms").alias("part"),
        F.lit(None).cast("long").alias("k1"),
        F.lit(None).cast("long").alias("k2"),
        "token",
        F.col("est").cast("long").alias("n"),
    )
    ntok = docs_all.select(F.size(F.split("text", " ")).alias("n"))
    hist_df = _S.hist_sketch(ntok, "n", bin_width=_HIST_W)
    hist = hist_df.select(
        F.lit("hist").alias("part"),
        F.col("bin").alias("k1"),
        F.lit(None).cast("long").alias("k2"),
        F.lit(None).cast("string").alias("token"),
        F.col("cnt").alias("n"),
    )
    histq = _S.hist_quantile(
        hist_df,
        qs=tuple(num / den for num, den in _HIST_QS),
        bin_width=_HIST_W,
    ).select(
        F.lit("histq").alias("part"),
        F.round(F.col("q") * 100).cast("long").alias("k1"),
        F.lit(None).cast("long").alias("k2"),
        F.lit(None).cast("string").alias("token"),
        F.col("est").cast("long").alias("n"),
    )
    from ..text import lm as lm_mod

    from ..text.boilerplate import strip_boilerplate

    # strip part: the CCNet boilerplate REMOVAL itself (the census is
    # part 'hotline') — rebuilt text witnessed by md5 + length, with
    # the removed-line count; same min_docs=2 hot set as hotline.
    # Fixture corpora below sf0.1 contain no cross-doc repeated lines,
    # so the small-SF hash pins the exact split→filter→rebuild
    # identity (newline round-trip); sf0.1 exercises real removal (16
    # lines — asserted in the SLOW lane and measured on the ladder)
    strip_part = strip_boilerplate(docs_all, min_docs=2).select(
        F.lit("strip").alias("part"),
        F.col("doc_id").cast("long").alias("k1"),
        F.col("n_boilerplate_lines").alias("k2"),
        F.md5("text").alias("token"),
        F.length("text").cast("long").alias("n"),
    )

    from ..text import classifier as clf_mod

    from ..text import mixing as mix_mod

    # mix part: deterministic domain-mixing sampler under twin-derived
    # injected rates — one row per surviving (doc, copy_no); the
    # decision is a pure content-hash function, repartition-invariant
    mixed = mix_mod.sample_mixture(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "source"
        ),
        mix_mod.mixing_rates_from_parquet(sf_dir, _MIX_WEIGHTS),
    )
    mix_part = mixed.select(
        F.lit("mix").alias("part"),
        F.col("doc_id").cast("long").alias("k1"),
        F.col("copy_no").cast("long").alias("k2"),
        F.col("source").alias("token"),
        F.size(F.split("text", " ")).cast("long").alias("n"),
    )

    # clf part: model-based quality scores under the twin-trained
    # injected weight vector (logit in exact micro-units + the
    # good/bad decision; score_documents compiles to codegen)
    clf_w, clf_b = clf_mod.self_train_quality_model_from_parquet(sf_dir)
    clf_part = clf_mod.score_documents(docs_all, clf_w, clf_b).select(
        F.lit("clf").alias("part"),
        F.col("doc_id").cast("long").alias("k1"),
        F.lit(None).cast("long").alias("k2"),
        F.when(F.col("quality_logit") > 0, "good")
        .otherwise("bad")
        .alias("token"),
        F.round(F.col("quality_logit") * 1e6).cast("long").alias("n"),
    )

    # lm parts: exact integer micro-log2 LM scores (unigram + JM
    # bigram) under the driver-trained injected model — n carries the
    # exact negated micro-bit sum, token the integer-compared band
    lm_doc = lm_mod.micro_lm_scores(
        docs_all, lm_mod.train_lm_micrologs(sf_dir)
    )

    def _lm_band(col: str):
        n_tok = F.col("n_tokens")
        return (
            F.when(F.col(col) < F.lit(_LM_LO_U) * n_tok, "low")
            .when(F.col(col) > F.lit(_LM_HI_U) * n_tok, "high")
            .otherwise("mid")
        )

    lmuni = lm_doc.select(
        F.lit("lmuni").alias("part"),
        F.col("doc_id").cast("long").alias("k1"),
        F.col("n_tokens").cast("long").alias("k2"),
        _lm_band("uni_u").alias("token"),
        F.col("uni_u").alias("n"),
    )
    lmbi = lm_doc.select(
        F.lit("lmbi").alias("part"),
        F.col("doc_id").cast("long").alias("k1"),
        F.col("n_tokens").cast("long").alias("k2"),
        _lm_band("bi_u").alias("token"),
        F.col("bi_u").alias("n"),
    )
    from ..text import bpe as bpe_mod

    # bpe part: the real Arrow mapInPandas encoder over the subcorpus
    # under merges trained by the pyarrow twin (no Spark job); the
    # oracle replays the SAME merges as a rank-ordered replace() fold
    bpe_part = (
        bpe_mod.encode_documents(
            docs_all.filter(F.col("doc_id") < _BPE_DOCS),
            bpe_mod.train_bpe_from_parquet(sf_dir, n_merges=_BPE_MERGES),
        )
        .select(
            "doc_id",
            "n_bpe_tokens",
            F.posexplode("bpe_tokens").alias("pos", "tok"),
        )
        .select(
            F.lit("bpe").alias("part"),
            F.col("doc_id").cast("long").alias("k1"),
            F.col("pos").cast("long").alias("k2"),
            F.col("tok").alias("token"),
            F.col("n_bpe_tokens").alias("n"),
        )
    )
    return (
        fuzzy.unionByName(tokpos)
        .unionByName(fps)
        .unionByName(packed)
        .unionByName(contam)
        .unionByName(vocab)
        .unionByName(hot)
        .unionByName(chunks)
        .unionByName(cms)
        .unionByName(hist)
        .unionByName(histq)
        .unionByName(lmuni)
        .unionByName(lmbi)
        .unionByName(bpe_part)
        .unionByName(strip_part)
        .unionByName(clf_part)
        .unionByName(mix_part)
        .unionByName(span_part)
        .unionByName(spancut_part)
        .orderBy("part", "k1", "k2", "n")
    )


# fixed registry phrase for the persistent-index part: consecutive
# corpus tokens with healthy frequency at every test SF
PHRASE: tuple[str, str] = ("table", "scan")

# fixed registry NEAR/n probe (distinct from the phrase pair): terms
# with healthy proximity co-occurrence at every test SF, window 4
NEAR_TERMS: tuple[str, str] = ("customer", "spark")
NEAR_WINDOW = 4

# r10 mutation parts: docs with doc_id % REIDX_MOD == REIDX_REM are
# REINDEXED with REIDX_TEXT (dropping all their old terms — the
# stale-postings case), then docs with doc_id % DEL_MOD == 0 are
# DELETED.  Shared by the builder and the oracle so both replay the
# identical corpus mutation.
REIDX_MOD, REIDX_REM = 113, 5
REIDX_TEXT = "customer stream"
DEL_MOD = 19
_REIDX_CASE = (
    f"CASE WHEN doc_id % {REIDX_MOD} = {REIDX_REM} "
    f"THEN '{REIDX_TEXT}' ELSE text END"
)

# r12 COMPOSED mutation tape: the per-mutation parts prove each
# contract alone; the tape proves their INTERLEAVING — the state a
# real index actually lives in.  Continuing from the 'del' state
# (REIDX-mapped corpus minus the DEL docs), a fixed four-step walk:
#   1. bulk add of DERIVED documents (orig %7==3 → doc_id+TAPE_OFF,
#      'tape '-prefixed text) — a merge over an index carrying live
#      deletion vectors,
#   2. point delete of orig ids %131==17 (some already gone — a
#      delete overlapping prior deletes must be a no-op there),
#   3. reindex of surviving orig ids %89==7 to TAPE_RX_TEXT — an
#      upsert over rows some of which the FIRST reindex already
#      rewrote,
#   4. point delete of added ids (orig %7==3 AND %151==6) + TAPE_OFF.
# The oracle folds the identical tape in SQL (_TAPE_CORPUS) and
# rescans it from scratch: hash equality proves the composed walk
# leaves the index ≡ a fresh build over the folded corpus.
TAPE_OFF = 1_000_000
TAPE_ADD_MOD, TAPE_ADD_REM = 7, 3
TAPE_DEL2_MOD, TAPE_DEL2_REM = 131, 17
TAPE_RX_MOD, TAPE_RX_REM = 89, 7
TAPE_RX_TEXT = "vector table customer"
TAPE_DEL3_MOD, TAPE_DEL3_REM = 151, 6
# the folded final corpus, one {docs} hole (bm25_oracle_sql
# corpus_sql contract).  CASE order matters: step-3's reindex lands
# AFTER the first one, so %89 wins over %113 where both match; the
# WHERE legs fold both delete steps; the UNION leg folds the derived
# additions minus step-4's erasure.
_TAPE_CORPUS = f"""
        SELECT doc_id,
               CASE WHEN doc_id % {TAPE_RX_MOD} = {TAPE_RX_REM}
                         THEN '{TAPE_RX_TEXT}'
                    WHEN doc_id % {REIDX_MOD} = {REIDX_REM}
                         THEN '{REIDX_TEXT}'
                    ELSE text END AS text
        FROM {{docs}}
        WHERE doc_id % {DEL_MOD} != 0
          AND doc_id % {TAPE_DEL2_MOD} != {TAPE_DEL2_REM}
        UNION ALL
        SELECT doc_id + {TAPE_OFF} AS doc_id,
               'tape ' || text AS text
        FROM {{docs}}
        WHERE doc_id % {TAPE_ADD_MOD} = {TAPE_ADD_REM}
          AND doc_id % {TAPE_DEL3_MOD} != {TAPE_DEL3_REM}
"""

# r13 'ttdv' part: the MID-TAPE state (after tape steps 1-2, before
# 3-4) — a generation whose snapshot carries LIVE deletion vectors
# (the 'del' erasure plus step-2's overlap-delete, all unmaterialized)
# while LATER generations add more mutations on top.  Time-traveling
# back to it must re-apply exactly the vectors live AT that version:
# a reader that ignores them resurrects deleted docs; one that
# over-applies later vectors (or the later reindex/delete commits)
# loses live ones.  The oracle rescans this fold point from scratch.
_TAPE_MID_CORPUS = f"""
        SELECT doc_id,
               CASE WHEN doc_id % {REIDX_MOD} = {REIDX_REM}
                         THEN '{REIDX_TEXT}'
                    ELSE text END AS text
        FROM {{docs}}
        WHERE doc_id % {DEL_MOD} != 0
          AND doc_id % {TAPE_DEL2_MOD} != {TAPE_DEL2_REM}
        UNION ALL
        SELECT doc_id + {TAPE_OFF} AS doc_id,
               'tape ' || text AS text
        FROM {{docs}}
        WHERE doc_id % {TAPE_ADD_MOD} = {TAPE_ADD_REM}
"""


def _hybrid_oracle_sql(sf_dir: str, k: int = 20) -> str:
    """DuckDB twin of `bm25_search`'s five-part retrieval row.

    The BM25 leg reuses `bm25.bm25_oracle_sql` verbatim as a subquery
    (identical inlined IDF/avgdl literals); the vector leg replays the
    `knn_cosine` fold (same sequential dot-product reduction, so
    cosines are bit-identical); the fused leg recomputes RRF exactly:
    CAST(1 AS DOUBLE)/(60 + rank) summed bm25-leg-first — the same
    two-term left-associated double add `rrf_fuse` emits.  The
    'index' leg (PersistentBM25 lifecycle) re-emits the bm CTE — the
    index contract IS bit-identity with the scan scorer; the 'phrase'
    leg recomputes exact-phrase counts independently from the raw
    token stream."""
    bm_body = bm25.bm25_oracle_sql(sf_dir, k=k)
    bmv1_body = bm25.bm25_oracle_sql(sf_dir, k=k, where="doc_id % 2 = 0")
    # r10 mutation twins: 'reidx' rescans the CASE-mapped corpus from
    # scratch (fresh stats, IDF and all); 'del' rescans the mapped
    # corpus minus the deleted ids — hash equality proves
    # reindex()/delete_docs() leave the index equal to a fresh build
    # over the mutated corpus
    bmre_body = bm25.bm25_oracle_sql(sf_dir, k=k, text_expr=_REIDX_CASE)
    bmdel_body = bm25.bm25_oracle_sql(
        sf_dir, k=k,
        where=f"doc_id % {DEL_MOD} != 0",
        text_expr=_REIDX_CASE,
    )
    # r12 tape twin: a fresh scan-scorer over the SQL-folded final
    # corpus (stats, IDF literals and all recomputed for it)
    bmtape_body = bm25.bm25_oracle_sql(
        sf_dir, k=k, corpus_sql=_TAPE_CORPUS
    )
    # r13 'ttdv' twin: fresh scan-scorer over the mid-tape fold point
    bmmid_body = bm25.bm25_oracle_sql(
        sf_dir, k=k, corpus_sql=_TAPE_MID_CORPUS
    )
    return f"""
    WITH bm AS (
        SELECT doc_id, score,
               row_number() OVER (ORDER BY score DESC, doc_id ASC)
                   AS rank
        FROM ({bm_body})
    ),
    bmv1 AS (
        SELECT doc_id, score,
               row_number() OVER (ORDER BY score DESC, doc_id ASC)
                   AS rank
        FROM ({bmv1_body})
    ),
    bmre AS (
        SELECT doc_id, score,
               row_number() OVER (ORDER BY score DESC, doc_id ASC)
                   AS rank
        FROM ({bmre_body})
    ),
    bmdel AS (
        SELECT doc_id, score,
               row_number() OVER (ORDER BY score DESC, doc_id ASC)
                   AS rank
        FROM ({bmdel_body})
    ),
    bmtape AS (
        SELECT doc_id, score,
               row_number() OVER (ORDER BY score DESC, doc_id ASC)
                   AS rank
        FROM ({bmtape_body})
    ),
    bmmid AS (
        SELECT doc_id, score,
               row_number() OVER (ORDER BY score DESC, doc_id ASC)
                   AS rank
        FROM ({bmmid_body})
    ),
    v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    q AS (SELECT e AS eq FROM v WHERE vec_id = 0),
    s AS (
        SELECT v.vec_id AS doc_id,
               list_reduce(
                   list_transform(generate_series(1, len(v.e)),
                                  i -> q.eq[i] * v.e[i]),
                   (a, b) -> a + b)
               / (sqrt(list_reduce(list_transform(q.eq, x -> x * x),
                                   (a, b) -> a + b))
                  * sqrt(list_reduce(list_transform(v.e, x -> x * x),
                                     (a, b) -> a + b))) AS cos
        FROM q, v WHERE v.vec_id != 0
    ),
    kn AS (
        SELECT doc_id, round(cos, 4) AS score, rank
        FROM (
            SELECT doc_id, cos,
                   row_number() OVER (ORDER BY cos DESC, doc_id ASC)
                       AS rank
            FROM s
        )
        WHERE rank <= {k}
    ),
    c0 AS (SELECT doc_id, CAST(1 AS DOUBLE) / (60 + rank) AS c FROM bm),
    c1 AS (SELECT doc_id, CAST(1 AS DOUBLE) / (60 + rank) AS c FROM kn),
    f AS (
        SELECT doc_id,
               COALESCE(c0.c, CAST(0 AS DOUBLE))
               + COALESCE(c1.c, CAST(0 AS DOUBLE)) AS rrf
        FROM c0 FULL OUTER JOIN c1 USING (doc_id)
    ),
    fused AS (
        SELECT doc_id, round(rrf, 6) AS score, rank
        FROM (
            SELECT doc_id, rrf,
                   row_number() OVER (ORDER BY rrf DESC, doc_id ASC)
                       AS rank
            FROM f
        )
        WHERE rank <= {k}
    ),
    nearq AS (
        SELECT doc_id, CAST(n_near AS DOUBLE) AS score,
               row_number() OVER (ORDER BY n_near DESC, doc_id ASC)
                   AS rank
        FROM (
            SELECT doc_id,
                   len(list_filter(generate_series(1, len(t)),
                       i -> t[i] = '{NEAR_TERMS[0]}'
                            AND len(list_filter(
                                generate_series(
                                    greatest(1, i - {NEAR_WINDOW}),
                                    least(len(t), i + {NEAR_WINDOW})),
                                j -> t[j] = '{NEAR_TERMS[1]}')) > 0))
                   AS n_near
            FROM (SELECT doc_id, string_split(text, ' ') AS t
                  FROM documents)
        )
        WHERE n_near > 0
    ),
    phr AS (
        SELECT doc_id, CAST(n_phrase AS DOUBLE) AS score,
               row_number() OVER (ORDER BY n_phrase DESC, doc_id ASC)
                   AS rank
        FROM (
            SELECT doc_id,
                   len(list_filter(generate_series(1, len(t) - 1),
                       i -> t[i] = '{PHRASE[0]}'
                            AND t[i + 1] = '{PHRASE[1]}')) AS n_phrase
            FROM (SELECT doc_id, string_split(text, ' ') AS t
                  FROM documents)
        )
        WHERE n_phrase > 0
    )
    SELECT 'bm25' AS part, doc_id, CAST(rank AS BIGINT) AS rank, score
    FROM bm
    UNION ALL
    SELECT 'knn' AS part, doc_id, CAST(rank AS BIGINT) AS rank, score
    FROM kn
    UNION ALL
    SELECT 'fused' AS part, doc_id, CAST(rank AS BIGINT) AS rank, score
    FROM fused
    UNION ALL
    -- the persistent index is bit-identical to the scan scorer by
    -- contract, so its oracle IS the bm leg re-labeled: hash equality
    -- proves the whole build -> bucket-pruned read -> pivot -> literal
    -- scoring lifecycle reproduces the scan
    SELECT 'index' AS part, doc_id, CAST(rank AS BIGINT) AS rank, score
    FROM bm
    UNION ALL
    -- phrase semantics recomputed INDEPENDENTLY from the raw text
    -- (consecutive-token count), not by replaying the index - the
    -- positional-intersection fold is checked against first principles
    SELECT 'phrase' AS part, doc_id, CAST(rank AS BIGINT) AS rank, score
    FROM phr WHERE rank <= {k}
    UNION ALL
    -- time travel: generation 1 froze the evens-only corpus, so its
    -- replay must equal the scan scorer over that snapshot (stats,
    -- IDF literals and all recomputed for the filtered corpus)
    SELECT 'tt' AS part, doc_id, CAST(rank AS BIGINT) AS rank, score
    FROM bmv1
    UNION ALL
    -- NEAR/n proximity recomputed INDEPENDENTLY from the raw token
    -- stream (a-occurrences with a b-neighbor within the window), not
    -- by replaying the positional postings
    SELECT 'near' AS part, doc_id, CAST(rank AS BIGINT) AS rank, score
    FROM nearq WHERE rank <= {k}
    UNION ALL
    -- reindexed generation: scan scorer over the CASE-mapped corpus
    SELECT 'reidx' AS part, doc_id, CAST(rank AS BIGINT) AS rank, score
    FROM bmre
    UNION ALL
    -- post-delete generation: mapped corpus minus the deleted ids
    SELECT 'del' AS part, doc_id, CAST(rank AS BIGINT) AS rank, score
    FROM bmdel
    UNION ALL
    -- composed mutation tape: the interleaved add/delete/reindex walk
    -- must leave the index equal to a fresh build over the folded
    -- final corpus
    SELECT 'tape' AS part, doc_id, CAST(rank AS BIGINT) AS rank, score
    FROM bmtape
    UNION ALL
    -- time travel ACROSS live deletion vectors: the mid-tape
    -- generation queried after the walk completed — its snapshot's
    -- unmaterialized vectors (and only those) must re-apply
    SELECT 'ttdv' AS part, doc_id, CAST(rank AS BIGINT) AS rank, score
    FROM bmmid
    ORDER BY part, rank
    """


@register(
    "bm25_search",
    oracle=_hybrid_oracle_sql,  # callable: IDF weights + avgdl are
    # corpus-derived, computed driver-side from exact integer stats and
    # inlined as identical literals into BOTH engines (no log evaluated
    # by either engine) — the knn_ivf data-derived-constants pattern
    tags=("text", "retrieval", "bm25", "knn", "hybrid", "rrf", "scale"),
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval suite: BM25 top-20 keyword ranking (text/bm25.py),
    vector top-20 cosine ranking (similarity/knn.py, query = vec 0),
    their reciprocal-rank fusion (`rrf_fuse`, Cormack et al.), the
    PersistentBM25 index lifecycle (build → bucket-pruned query, part
    'index' — must hash-equal the scan scorer), and exact-phrase
    retrieval from the positional postings (part 'phrase', oracle
    recomputed from first principles over the raw token stream) —
    plus a version=0 time-travel
    query whose oracle is the scan scorer over the frozen
    evens-only snapshot (part 'tt'), the NEAR/n proximity part
    (oracle recomputed from the raw token stream), and the r10
    mutation parts: 'reidx' queries the index after reindex()
    replaced the REIDX docs' texts (stale dropped-term postings must
    be purged — oracle rescans the CASE-mapped corpus), 'del' after
    delete_docs() erased the DEL docs (oracle filters them out), and
    the r12 'tape' part: a COMPOSED four-step walk (bulk add of
    derived docs over live deletion vectors → overlapping point
    delete → second reindex upserting over first-reindex rows →
    point delete of additions) whose final index must hash-equal a
    fresh scan-scorer build over the SQL-folded final corpus
    (_TAPE_CORPUS), and the r13 'ttdv' part: time travel back to the
    MID-tape generation — a snapshot carrying live unmaterialized
    deletion vectors with more mutations committed past it — whose
    oracle rescans that fold point (_TAPE_MID_CORPUS) — eleven
    parts, one hash.

    Scale shape: the BM25 leg is one bounded stats aggregate then a
    shuffle-free row-local scoring scan (TakeOrderedAndProject heap);
    the vector leg broadcasts the single query row; fusion joins two
    top-20 lists — driver-broadcastable no matter the corpus size;
    index queries read ≤|terms| of 64 postings buckets."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from ..similarity import knn

    k = 20
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    w_bm = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    bm = (
        bm25.bm25_topk(docs, k=k)
        .withColumn("rank", F.row_number().over(w_bm).cast("long"))
        .select("doc_id", "rank", "score")
    )
    kn = knn.knn_bruteforce(emb, n_queries=1, k=k).select(
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank"),
        F.col("cosine_sim").alias("score"),
    )
    fused = bm25.rrf_fuse(
        [bm.select("doc_id", "rank"), kn.select("doc_id", "rank")],
        topn=k,
    ).select(
        "doc_id",
        F.col("rank"),
        F.round("rrf_score", 6).alias("score"),
    )
    # persistent-index lifecycle over a throwaway lakehouse: build
    # (postings bucket(64, term) + doclen + stats in one atomic txn),
    # then a bucket-pruned BM25 query — bit-identical to the scan
    # scorer by contract — and an exact-phrase query answered by the
    # positional-intersection fold.  Results are |k|-bounded: eager
    # checkpoint pins them so the index files can be deleted before
    # the frame is consumed.
    from ..sources.lakehouse import temp_lakehouse
    from ..text.bm25_index import PersistentBM25

    with temp_lakehouse(prefix="umdl_bm25_idx_") as lake:
        idx = PersistentBM25(lake)
        # split ingest: generation 1 = evens, generation 2 = +odds —
        # part 'index' (gen 2) now ALSO hash-checks add()'s
        # merge-convergence against the full-corpus scan scorer, and
        # part 'tt' time-travels to gen 1 (the frozen evens snapshot)
        corpus = docs.select("doc_id", "text")
        idx.build(spark, corpus.filter(F.col("doc_id") % 2 == 0))
        idx.add(spark, corpus.filter(F.col("doc_id") % 2 == 1))
        w_ph = Window.orderBy(F.desc("n_phrase"), F.asc("doc_id"))
        index_part = (
            idx.query(spark, bm25.QUERY_TERMS, k=k)
            .withColumn("rank", F.row_number().over(w_bm).cast("long"))
            .select("doc_id", "rank", "score")
            .localCheckpoint(eager=True)
        )
        phrase_part = (
            idx.phrase_query(spark, PHRASE, k=k)
            .withColumn("rank", F.row_number().over(w_ph).cast("long"))
            .select(
                "doc_id",
                "rank",
                F.col("n_phrase").cast("double").alias("score"),
            )
            .localCheckpoint(eager=True)
        )
        tt_part = (
            idx.query(spark, bm25.QUERY_TERMS, k=k, version=0)
            .withColumn("rank", F.row_number().over(w_bm).cast("long"))
            .select("doc_id", "rank", "score")
            .localCheckpoint(eager=True)
        )
        w_nr = Window.orderBy(F.desc("n_near"), F.asc("doc_id"))
        near_part = (
            idx.near_query(
                spark, *NEAR_TERMS, window=NEAR_WINDOW, k=k
            )
            .withColumn("rank", F.row_number().over(w_nr).cast("long"))
            .select(
                "doc_id",
                "rank",
                F.col("n_near").cast("double").alias("score"),
            )
            .localCheckpoint(eager=True)
        )
        # -- r10 mutation parts: the delete/reindex machinery driven
        # through the hash gate.  reindex() replaces the REIDX docs'
        # texts (dropping every old term — the stale-postings case the
        # fast-path add can't fix); the oracle rescans the CASE-mapped
        # corpus from scratch.  delete_docs() then erases the DEL docs
        # entirely; its oracle filters them out of the same mapped
        # corpus.  Order matters and is pinned: reidx state = mapped
        # corpus, del state = mapped corpus minus deletions.
        changed = corpus.filter(
            F.col("doc_id") % REIDX_MOD == REIDX_REM
        ).withColumn("text", F.lit(REIDX_TEXT))
        idx.reindex(spark, changed)
        reidx_part = (
            idx.query(spark, bm25.QUERY_TERMS, k=k)
            .withColumn("rank", F.row_number().over(w_bm).cast("long"))
            .select("doc_id", "rank", "score")
            .localCheckpoint(eager=True)
        )
        del_ids = [
            int(r[0])
            for r in corpus.filter(F.col("doc_id") % DEL_MOD == 0)
            .select("doc_id")
            .collect()
        ]
        idx.delete_docs(spark, del_ids)
        del_part = (
            idx.query(spark, bm25.QUERY_TERMS, k=k)
            .withColumn("rank", F.row_number().over(w_bm).cast("long"))
            .select("doc_id", "rank", "score")
            .localCheckpoint(eager=True)
        )
        # -- r12 composed mutation tape (constants block above): four
        # more interleaved steps over the post-'del' index — a bulk
        # add merging over live deletion vectors, a point delete
        # overlapping prior deletes, a second reindex upserting over
        # first-reindex rows, a point delete of derived additions —
        # then one query whose oracle rescans the SQL-folded final
        # corpus from scratch.  TAPE_OFF keeps derived ids clear of
        # the base id space (documents doc_ids are corpus-row-scaled,
        # far below 1e6 at every test SF).
        added = corpus.filter(
            F.col("doc_id") % TAPE_ADD_MOD == TAPE_ADD_REM
        ).select(
            (F.col("doc_id") + TAPE_OFF).alias("doc_id"),
            F.concat(F.lit("tape "), F.col("text")).alias("text"),
        )
        idx.add(spark, added)
        del2_ids = [
            int(r[0])
            for r in corpus.filter(
                F.col("doc_id") % TAPE_DEL2_MOD == TAPE_DEL2_REM
            )
            .select("doc_id")
            .collect()
        ]
        idx.delete_docs(spark, del2_ids)
        # pin the mid-tape generation: its snapshot carries the live
        # (unmaterialized) deletion vectors of 'del' AND the step-2
        # overlap-delete; steps 3-4 mutate past it.  Queried at the
        # END of the walk (part 'ttdv') so time travel must select
        # exactly the vectors live at THIS version.
        v_mid = idx.version()
        changed2 = corpus.filter(
            (F.col("doc_id") % TAPE_RX_MOD == TAPE_RX_REM)
            & (F.col("doc_id") % DEL_MOD != 0)
            & (F.col("doc_id") % TAPE_DEL2_MOD != TAPE_DEL2_REM)
        ).withColumn("text", F.lit(TAPE_RX_TEXT))
        idx.reindex(spark, changed2)
        del3_ids = [
            int(r[0]) + TAPE_OFF
            for r in corpus.filter(
                (F.col("doc_id") % TAPE_ADD_MOD == TAPE_ADD_REM)
                & (F.col("doc_id") % TAPE_DEL3_MOD == TAPE_DEL3_REM)
            )
            .select("doc_id")
            .collect()
        ]
        if del3_ids:
            idx.delete_docs(spark, del3_ids)
        tape_part = (
            idx.query(spark, bm25.QUERY_TERMS, k=k)
            .withColumn("rank", F.row_number().over(w_bm).cast("long"))
            .select("doc_id", "rank", "score")
            .localCheckpoint(eager=True)
        )
        ttdv_part = (
            idx.query(spark, bm25.QUERY_TERMS, k=k, version=v_mid)
            .withColumn("rank", F.row_number().over(w_bm).cast("long"))
            .select("doc_id", "rank", "score")
            .localCheckpoint(eager=True)
        )

    part = lambda df, p: df.select(  # noqa: E731
        F.lit(p).alias("part"), "doc_id", "rank", "score"
    )
    return (
        part(bm, "bm25")
        .unionByName(part(kn, "knn"))
        .unionByName(part(fused, "fused"))
        .unionByName(part(index_part, "index"))
        .unionByName(part(phrase_part, "phrase"))
        .unionByName(part(tt_part, "tt"))
        .unionByName(part(near_part, "near"))
        .unionByName(part(reidx_part, "reidx"))
        .unionByName(part(del_part, "del"))
        .unionByName(part(tape_part, "tape"))
        .unionByName(part(ttdv_part, "ttdv"))
        .orderBy("part", "rank")
    )
