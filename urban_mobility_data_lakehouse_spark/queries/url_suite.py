"""Driver row for the URL-curation operators (`text/urls.py`).

The corpus is the deterministic `doc_urls` derivation over documents
(mixed case, www, default/explicit ports, tracking params, unsorted
query params, fragments, co.uk hosts) DOUBLED with a tracking-param
twin per document (shifted id, `&utm_campaign=tw` injected into the
query) — so URL-level dedup has real work: every canonical group holds
exactly the original and its twin.

The DuckDB oracle replays the WHOLE family with its own string
machinery: the same URL derivation, the same general normalization
rules (regexp authority split, www/default-port strip, tracking-param
filter, sorted params), registrable-domain label logic, the
keep-lowest-md5 per-domain quota (both engines md5 the same decimal
string → identical hex → identical order), and the blocklist — so the
value hash pins canonical forms, group structure, quota selection, and
blocklist semantics end-to-end.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.testdata import load_table
from ..text.urls import (
    SECOND_LEVEL_SUFFIXES,
    TRACKING_PARAMS,
    doc_urls,
    domain_quota,
    filter_blocklist,
    normalize_url,
    parse_url,
    registrable_domain,
)
from . import register

QUOTA = 50

# ---- DuckDB twins of the text/urls.py Column expressions ---------------

_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"

_DERIVE = """
    SELECT doc_id,
           'HTTPS://'
           || CASE WHEN doc_id % 7 = 0 THEN 'WWW.' ELSE '' END
           || source
           || CASE WHEN doc_id % 5 = 0 THEN '.example.co.uk'
                   ELSE '.example.com' END
           || CASE WHEN doc_id % 11 = 0 THEN ':443'
                   WHEN doc_id % 13 = 0 THEN ':8080'
                   ELSE '' END
           || '/docs/' || CAST(doc_id AS VARCHAR) || '?b=2&a=1'
           || CASE WHEN doc_id % 3 = 0
                   THEN '&utm_source=feed&fbclid=xyz' ELSE '' END
           || CASE WHEN doc_id % 2 = 0 THEN '#section-2' ELSE '' END
               AS url
    FROM documents
"""

_TRACKING_LIST = ", ".join(f"'{p}'" for p in TRACKING_PARAMS)
_SLS_LIST = ", ".join(f"'{s}'" for s in SECOND_LEVEL_SUFFIXES)

_PARSE = f"""
    SELECT doc_id, url,
           lower(regexp_extract(url, '{_RE}', 1)) AS scheme,
           lower(list_extract(string_split(list_extract(
               string_split(regexp_extract(url, '{_RE}', 2), '@'), -1),
               ':'), 1)) AS host,
           CASE WHEN len(string_split(list_extract(
                    string_split(regexp_extract(url, '{_RE}', 2), '@'),
                    -1), ':')) > 1
                THEN CAST(list_extract(string_split(list_extract(
                    string_split(regexp_extract(url, '{_RE}', 2), '@'),
                    -1), ':'), 2) AS INT) END AS port,
           regexp_extract(url, '{_RE}', 3) AS path,
           regexp_extract(url, '{_RE}', 4) AS query
    FROM corpus
"""

_NORM = f"""
    SELECT doc_id, url, host,
           scheme || '://' || regexp_replace(host, '^www\\.', '')
           || CASE WHEN port IS NOT NULL AND NOT (
                       (scheme = 'http' AND port = 80)
                       OR (scheme = 'https' AND port = 443))
                   THEN ':' || CAST(port AS VARCHAR) ELSE '' END
           || CASE WHEN path = '/' THEN '' ELSE path END
           || CASE WHEN len(params) > 0
                   THEN '?' || array_to_string(params, '&')
                   ELSE '' END AS canon
    FROM (
        SELECT *, list_sort(list_filter(string_split(query, '&'),
                   p -> strlen(p) > 0
                        AND NOT starts_with(p, 'utm_')
                        AND NOT list_contains(
                            [{_TRACKING_LIST}],
                            list_extract(string_split(p, '='), 1))))
                   AS params
        FROM parsed
    )
"""

_RD = f"""
    SELECT doc_id, canon,
           CASE WHEN len(sp) >= 3 AND strlen(sp[len(sp)]) = 2
                     AND list_contains([{_SLS_LIST}], sp[len(sp) - 1])
                THEN array_to_string(list_slice(sp, len(sp) - 2,
                                                len(sp)), '.')
                WHEN len(sp) >= 2
                THEN array_to_string(list_slice(sp, len(sp) - 1,
                                                len(sp)), '.')
                ELSE host END AS rd
    FROM (SELECT *, string_split(host, '.') AS sp FROM normed)
"""


def _oracle(sf_dir: str) -> str:
    return f"""
    WITH derived AS ({_DERIVE}),
    corpus AS (
        SELECT doc_id, url FROM derived
        UNION ALL
        SELECT doc_id + 1000000,
               replace(url, '?b=2', '?b=2&utm_campaign=tw')
        FROM derived
    ),
    parsed AS ({_PARSE}),
    normed AS ({_NORM}),
    rdd AS ({_RD}),
    quota AS (
        SELECT doc_id, rd FROM (
            SELECT doc_id, rd,
                   row_number() OVER (
                       PARTITION BY rd
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rq
            FROM rdd
        ) WHERE rq <= {QUOTA}
    )
    SELECT * FROM (
        SELECT 'canon' AS part, canon AS key,
               count(*) AS n, CAST(min(doc_id) AS BIGINT) AS keep
        FROM normed GROUP BY canon
        UNION ALL
        SELECT 'domain', rd, count(*), CAST(NULL AS BIGINT)
        FROM rdd GROUP BY rd
        UNION ALL
        SELECT 'quota', rd, count(*), CAST(sum(doc_id) AS BIGINT)
        FROM quota GROUP BY rd
        UNION ALL
        SELECT 'block', 'kept', count(*), CAST(sum(doc_id) AS BIGINT)
        FROM rdd WHERE rd != 'example.com'
    )
    ORDER BY part, key
    """


@register(
    "url_curation",
    oracle=_oracle,
    tags=("text", "url", "curation", "dedup"),
)
def url_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-curation audit, one labeled union (scalar columns only):

    `canon`: URL-level dedup groups — key = the canonical
    (normalized) URL, n = members (always 2 here: original + planted
    tracking twin), keep = the surviving lowest doc_id.  `domain`:
    docs per registrable domain.  `quota`: after
    `domain_quota(max_per_domain={QUOTA})` — n ≤ cap per domain, keep
    = sum of the SELECTED doc_ids (pins the keep-lowest-md5 choice,
    not just the count).  `block`: survivors of blocking
    example.com — count + id-sum digest."""
    base = doc_urls(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "source"
        )
    ).select("doc_id", "url")
    twins = base.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.regexp_replace(
            "url", r"\?b=2", "?b=2&utm_campaign=tw"
        ).alias("url"),
    )
    corpus = base.unionByName(twins)
    host = parse_url(F.col("url"))["host"]
    rd = registrable_domain(host)
    canon_part = (
        corpus.groupBy(normalize_url(F.col("url")).alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").alias("keep"),
        )
        .select(F.lit("canon").alias("part"), "key", "n", "keep")
    )
    domain_part = (
        corpus.groupBy(rd.alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("domain").alias("part"),
            "key",
            "n",
            F.lit(None).cast("long").alias("keep"),
        )
    )
    quota_part = (
        domain_quota(corpus, "url", QUOTA)
        .groupBy(rd.alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").alias("keep"),
        )
        .select(F.lit("quota").alias("part"), "key", "n", "keep")
    )
    block_part = filter_blocklist(corpus, "url", ["example.com"]).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("doc_id").alias("keep"),
    ).select(
        F.lit("block").alias("part"),
        F.lit("kept").alias("key"),
        "n",
        "keep",
    )
    return (
        canon_part.unionByName(domain_part)
        .unionByName(quota_part)
        .unionByName(block_part)
        .orderBy("part", "key")
    )
