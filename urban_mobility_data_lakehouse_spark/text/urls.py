"""URL curation operators — the crawl-side half of a training-data
pipeline (C4 dropped documents by URL blocklist; RefinedWeb's first
stage is URL filtering + per-domain balancing before any text is read).

Everything here is pure Column expressions (split / array ops /
regexp) — JVM-side, codegen-friendly, zero Python in the hot path —
because URL work runs over EVERY crawl record at 100 TB, before any
dedup has shrunk the corpus:

  - `parse_url` / `normalize_url` — canonical form for URL-level exact
    dedup: scheme+host lowercased, userinfo/default-port/fragment
    stripped, leading `www.` dropped, tracking params (utm_*, fbclid,
    gclid, ref, …) removed, surviving query params SORTED (param order
    is presentation, not identity), trailing-slash-only paths folded.
  - `registrable_domain` — the per-site key for quotas/blocklists:
    last-two-labels heuristic widened to three for second-level public
    suffixes (co.uk shape).  A full public-suffix list is a data file,
    not an algorithm: `registrable_domain_psl` loads the shipped
    offline PSL snapshot (`public_suffixes.dat`) into per-length
    literal arrays — longest suffix match + 1 label, heuristic
    fallback for unlisted hosts, `extra` hook for deployment domains.
  - `domain_quota` — C4-style per-domain cap: deterministic
    keep-lowest-md5 ranking inside each domain, so the sample is
    reproducible under repartition/retry and never favors crawl order.
  - `filter_blocklist` — broadcast anti-join on registrable domain.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

# query params that track, not identify, content
TRACKING_PREFIXES = ("utm_",)
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "ref", "mc_cid", "mc_eid")

# second-level public suffixes under which ONE more label is needed to
# reach the registrable domain (the co.uk shape) — extendable per call
SECOND_LEVEL_SUFFIXES = (
    "co", "com", "net", "org", "ac", "gov", "edu", "or", "ne",
)

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"


def parse_url(url: Column) -> Column:
    """STRUCT(scheme, host, port, path, query) from a URL string —
    unparseable rows get NULL fields (scheme stays empty), callers
    filter on `parse_url(u).scheme != ''`."""
    authority = F.regexp_extract(url, _URL_RE, 2)
    # strip userinfo, then split host:port — an IPv6 literal host is
    # bracketed ([::1]:8080) and contains ':' itself, so it takes the
    # bracket-aware lane (a naive ':' split would map EVERY v6 host to
    # '[' and URL-level dedup would merge distinct hosts)
    hostport = F.element_at(F.split(authority, "@"), -1)
    is_v6 = hostport.startswith("[")
    v6_host = F.lower(F.regexp_extract(hostport, r"^(\[[^\]]*\])", 1))
    v6_port = F.regexp_extract(hostport, r"^\[[^\]]*\]:(\d+)$", 1)
    host = F.when(is_v6, v6_host).otherwise(
        F.lower(F.element_at(F.split(hostport, ":"), 1))
    )
    port = F.when(
        is_v6, F.when(v6_port != "", v6_port.cast("int"))
    ).otherwise(
        F.when(
            F.size(F.split(hostport, ":")) > 1,
            F.element_at(F.split(hostport, ":"), 2).cast("int"),
        )
    )
    return F.struct(
        F.lower(F.regexp_extract(url, _URL_RE, 1)).alias("scheme"),
        host.alias("host"),
        port.alias("port"),
        F.regexp_extract(url, _URL_RE, 3).alias("path"),
        F.regexp_extract(url, _URL_RE, 4).alias("query"),
    )


def _clean_params(query: Column) -> Column:
    """Sorted array of surviving k=v params (tracking params dropped,
    empty strings removed)."""
    params = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0)
        & ~F.exists(
            F.array(*[F.lit(x) for x in TRACKING_PREFIXES]),
            lambda pre: p.startswith(pre),
        )
        & ~F.element_at(F.split(p, "="), 1).isin(*TRACKING_PARAMS),
    )
    return F.array_sort(params)


def normalize_url(url: Column) -> Column:
    """Canonical URL string for exact URL-level dedup (see module
    docstring for the rules).  NULL for unparseable input."""
    u = parse_url(url)
    host = F.regexp_replace(u["host"], r"^www\.", "")
    default_port = (
        (u["scheme"] == "http") & (u["port"] == 80)
    ) | ((u["scheme"] == "https") & (u["port"] == 443))
    port = F.when(
        u["port"].isNotNull() & ~default_port,
        F.concat(F.lit(":"), u["port"].cast("string")),
    ).otherwise(F.lit(""))
    path = F.when(u["path"] == "/", F.lit("")).otherwise(u["path"])
    params = _clean_params(u["query"])
    query = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))
    return F.when(
        u["scheme"] != "",
        F.concat(u["scheme"], F.lit("://"), host, port, path, query),
    )


def registrable_domain(
    host: Column,
    second_level: tuple[str, ...] = SECOND_LEVEL_SUFFIXES,
) -> Column:
    """Registrable domain of a (lowercased) host: the last two labels,
    or three when the second-to-last is a known second-level public
    suffix and the TLD is a 2-letter ccTLD (the co.uk shape)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    second = F.element_at(labels, -2)
    tld = F.element_at(labels, -1)
    take3 = (
        (n >= 3)
        & (F.length(tld) == 2)
        & second.isin(*second_level)
    )
    return F.when(
        take3, F.array_join(F.slice(labels, -3, 3), ".")
    ).otherwise(
        F.when(n >= 2, F.array_join(F.slice(labels, -2, 2), "."))
        .otherwise(host)
    )


def _resolve_suffixes(
    suffixes: frozenset[str] | str | None,
) -> frozenset[str] | None:
    """Suffix-set knob shared by `domain_quota` / `filter_blocklist` /
    `curate_corpus`:

    * "psl" (the DEFAULT since r9) — the shipped offline snapshot
      (`load_public_suffixes()`), falling back to the heuristic if the
      data file is missing.  PSL keys are the deliberate default: the
      heuristic lumps every *.github.io user site into ONE quota /
      blocklist bucket, which at crawl scale starves or nukes
      unrelated sites; the snapshot costs one memoized file read and a
      few literal arrays in the row-local when-chain.
    * None — the 9-entry co.uk-shape heuristic only.
    * a frozenset — as given (e.g. `load_public_suffixes(extra=...)`).
    """
    if isinstance(suffixes, str):
        if suffixes != "psl":
            # a stray string would be iterated character-by-character
            # downstream — fail loudly instead
            raise ValueError(
                f"suffixes must be 'psl', None, or a frozenset; "
                f"got {suffixes!r}"
            )
        try:
            return load_public_suffixes()
        except OSError:
            return None
    return suffixes  # frozenset or None


def domain_quota(
    docs: DataFrame,
    url_col: str,
    max_per_domain: int,
    id_col: str = "doc_id",
    suffixes: frozenset[str] | str | None = "psl",
) -> DataFrame:
    """Keep at most `max_per_domain` docs per registrable domain —
    the C4-style balance cap that stops one mega-site from dominating
    a shard.  Selection is keep-lowest-md5(id): deterministic under
    repartition/retry and independent of crawl order (a head-N cap
    samples whatever the crawler saw first, which skews freshness).
    One shuffle on the domain key — the semantics require it.

    Quota keys default to PSL-accurate registrable domains (the
    shipped snapshot — each *.github.io user site its own bucket);
    see `_resolve_suffixes` for the knob."""
    suffixes = _resolve_suffixes(suffixes)
    host = parse_url(F.col(url_col))["host"]
    rd = (
        registrable_domain_psl(host, suffixes)
        if suffixes is not None
        else registrable_domain(host)
    )
    # docs with NO domain identity (NULL url, or a scheme-less/
    # malformed one that parses to an empty host) are EXEMPT from the
    # quota: they would otherwise all share one window partition and
    # max_per_domain unrelated documents would survive out of millions
    no_domain = F.col(url_col).isNull() | (
        F.coalesce(rd, F.lit("")) == ""
    )
    w = Window.partitionBy("_rd").orderBy(
        F.md5(F.col(id_col).cast("string")).asc(),
        F.col(id_col).asc(),
    )
    return (
        docs.withColumn("_nd", no_domain)
        .withColumn("_rd", rd)
        .withColumn("_rq", F.row_number().over(w))
        .filter(F.col("_nd") | (F.col("_rq") <= max_per_domain))
        .drop("_nd", "_rd", "_rq")
    )


def filter_blocklist(
    docs: DataFrame,
    url_col: str,
    blocked_domains: list[str],
    suffixes: frozenset[str] | str | None = "psl",
) -> DataFrame:
    """Drop docs whose registrable domain is blocklisted.  The list is
    folded to ONE broadcast array literal probed row-locally — the
    corpus side stays shuffle-free (blocklists are small; a million-
    entry list would switch to a broadcast anti-join instead).
    Blocking granularity defaults to PSL-accurate registrable domains
    (block one github.io user site, not all of github.io); see
    `_resolve_suffixes` for the knob."""
    suffixes = _resolve_suffixes(suffixes)
    host = parse_url(F.col(url_col))["host"]
    rd = (
        registrable_domain_psl(host, suffixes)
        if suffixes is not None
        else registrable_domain(host)
    )
    blocked = F.array(*[F.lit(d.lower()) for d in blocked_domains])
    # NULL url → NULL rd → array_contains is NULL; coalesce keeps the
    # row (no-URL docs pass through to later content-based filters)
    return docs.filter(
        F.coalesce(~F.array_contains(blocked, rd), F.lit(True))
    )


def doc_urls(documents: DataFrame) -> DataFrame:
    """Deterministic URL column derived from the synthetic documents
    table (TESTDATA has no native URL column — the `documents_as_media`
    fixture pattern): doc_id picks path/params/noise, `source` picks
    the site.  Exercises every normalization rule: mixed case, www,
    default and explicit ports, tracking params, unsorted params,
    fragments, co.uk-shaped hosts."""
    d = F.col("doc_id")
    site = F.concat(
        F.when(d % 7 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.col("source"),
        F.when(d % 5 == 0, F.lit(".example.co.uk")).otherwise(
            F.lit(".example.com")
        ),
    )
    port = (
        F.when(d % 11 == 0, F.lit(":443"))
        .when(d % 13 == 0, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    tracking = F.when(
        d % 3 == 0, F.lit("&utm_source=feed&fbclid=xyz")
    ).otherwise(F.lit(""))
    frag = F.when(d % 2 == 0, F.lit("#section-2")).otherwise(F.lit(""))
    return documents.withColumn(
        "url",
        F.concat(
            F.lit("HTTPS://"),
            site,
            port,
            F.lit("/docs/"),
            d.cast("string"),
            F.lit("?b=2&a=1"),
            tracking,
            frag,
        ),
    )


# -- public-suffix-list-backed registrable domain ------------------------

_PSL_PATH = __file__.rsplit("/", 1)[0] + "/public_suffixes.dat"


import functools


@functools.lru_cache(maxsize=8)
def load_public_suffixes(
    path: str = _PSL_PATH, extra: tuple[str, ...] = ()
) -> frozenset[str]:
    """Multi-label public suffixes from the offline PSL snapshot that
    ships as a DATA FILE (`public_suffixes.dat`, a documented subset
    of publicsuffix.org) — a suffix list is data, not an algorithm.
    `extra` adds deployment-specific entries (e.g. an internal
    hosting platform's domain).  Memoized per (path, extra): the
    shipped file never changes within a process, the returned
    frozenset is immutable, and `registrable_domain_psl(host)` with
    the default argument would otherwise re-read and re-parse the
    file on every plan build."""
    out = {s.lower() for s in extra}
    with open(path) as f:
        for line in f:
            line = line.strip().lower()
            if line and not line.startswith(("//", "#")):
                out.add(line)
    return frozenset(out)


def registrable_domain_psl(
    host: Column, suffixes: frozenset[str] | None = None
) -> Column:
    """PSL-backed registrable domain: the LONGEST data-file suffix that
    matches the host's tail, plus one label — so a.b.github.io
    registers as b.github.io (github.io is a per-user platform) and
    shop.example.com.au as example.com.au.  Hosts no entry matches
    fall back to the `registrable_domain` heuristic, so this is a
    strict refinement.  The suffix set folds into per-length literal
    arrays probed row-locally (broadcast semantics, pure Column
    expressions — the list is a few hundred entries; corpus side
    stays shuffle-free and Python-free)."""
    if suffixes is None:
        suffixes = load_public_suffixes()
    by_len: dict[int, list[str]] = {}
    for s in suffixes:
        by_len.setdefault(s.count(".") + 1, []).append(s)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    expr = registrable_domain(host)  # heuristic fallback
    # ascending build → longest suffix length ends up OUTERMOST in the
    # when-chain, i.e. checked first: longest match wins, per the PSL
    # algorithm
    for k in sorted(by_len):
        tail = F.array_join(F.slice(labels, -k, k), ".")
        expr = F.when(
            (n >= k + 1) & tail.isin(*sorted(by_len[k])),
            F.array_join(F.slice(labels, -(k + 1), k + 1), "."),
        ).otherwise(expr)
    return expr
