"""URL curation (text/urls.py): normalization canon, registrable
domains, deterministic per-domain quotas, blocklist filtering — all
pure Column expressions (no Python in the plan)."""

from __future__ import annotations

import pyspark.sql.functions as F

from urban_mobility_data_lakehouse_spark.sources.testdata import load_table
from urban_mobility_data_lakehouse_spark.text.urls import (
    doc_urls,
    domain_quota,
    filter_blocklist,
    normalize_url,
    registrable_domain,
)

SF_DIR = "/root/testdata/sf0.001"


def _norm(spark, url: str) -> str:
    return (
        spark.createDataFrame([(url,)], "u string")
        .select(normalize_url(F.col("u")).alias("n"))
        .collect()[0]["n"]
    )


def test_normalize_url_canon(spark):
    cases = {
        # case, www, fragment, tracking params, param order
        "HTTPS://WWW.Example.COM/a?b=2&utm_source=x&a=1#frag":
            "https://example.com/a?a=1&b=2",
        # default port stripped, explicit kept
        "https://example.com:443/a": "https://example.com/a",
        "http://example.com:80/a": "http://example.com/a",
        "http://example.com:8080/a": "http://example.com:8080/a",
        # userinfo stripped; root path folded; empty query dropped
        "https://user:pw@example.com/": "https://example.com",
        "https://example.com/a?fbclid=zz": "https://example.com/a",
        # tracking-only vs real param named like a prefix-match miss
        "https://example.com/a?ref=t&refid=7":
            "https://example.com/a?refid=7",
    }
    for raw, want in cases.items():
        assert _norm(spark, raw) == want, raw
    # unparseable → NULL (callers filter)
    assert _norm(spark, "not a url") is None


def test_normalized_twins_collide_raw_urls_do_not(spark):
    a = "https://www.example.com/x?b=2&a=1&utm_source=s#top"
    b = "HTTPS://example.com/x?a=1&b=2"
    assert a != b and _norm(spark, a) == _norm(spark, b)


def test_registrable_domain(spark):
    cases = {
        "news.bbc.co.uk": "bbc.co.uk",
        "a.b.example.com": "example.com",
        "example.com": "example.com",
        "localhost": "localhost",
        "www.gov.ac.jp": "gov.ac.jp",
    }
    df = spark.createDataFrame(
        [(h,) for h in cases], "h string"
    ).select("h", registrable_domain(F.col("h")).alias("rd"))
    got = {r["h"]: r["rd"] for r in df.collect()}
    assert got == cases


def test_domain_quota_cap_and_determinism(spark):
    docs = doc_urls(load_table(spark, SF_DIR, "documents"))
    capped = domain_quota(docs, "url", max_per_domain=5)
    host = F.split(
        F.regexp_replace("url", r"^[A-Za-z]+://", ""), "/"
    )[0]
    per = (
        capped.withColumn(
            "rd", registrable_domain(F.lower(host))
        )
        .groupBy("rd")
        .count()
        .collect()
    )
    assert per and all(r["count"] <= 5 for r in per)
    # deterministic under repartition: same survivors, not same count
    ids1 = {r["doc_id"] for r in capped.select("doc_id").collect()}
    ids2 = {
        r["doc_id"]
        for r in domain_quota(docs.repartition(13), "url", 5)
        .select("doc_id")
        .collect()
    }
    assert ids1 == ids2


def test_blocklist_drops_only_blocked_domains(spark):
    docs = doc_urls(load_table(spark, SF_DIR, "documents"))
    # blocklists operate at REGISTRABLE-domain granularity: every
    # synthetic *.example.com host registers as example.com, so
    # blocking it drops them all; the *.example.co.uk family
    # (registrable example.co.uk) survives
    kept = filter_blocklist(docs, "url", ["example.com"])
    assert 0 < kept.count() < docs.count()
    leaked = kept.filter(
        F.lower("url").rlike(r"\.example\.com[:/]")
    )
    assert leaked.count() == 0
    assert kept.count() == docs.filter(
        F.col("doc_id") % 5 == 0
    ).count()
    # plan stays Python-free (pure Column exprs end-to-end)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_normalize_url_idempotent_property(spark):
    """normalize(normalize(u)) == normalize(u) over generated URLs —
    canonical forms must be fixed points, or URL-dedup keys drift
    between pipeline runs that normalize different numbers of times.
    One batched Spark job over the whole generated corpus."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    label = st.text("abcDEF123", min_size=1, max_size=6)
    urls = st.builds(
        lambda scheme, www, host, tld, port, path, params, frag: (
            f"{scheme}://{'www.' if www else ''}{host}.{tld}"
            f"{port}{path}"
            + ("?" + "&".join(params) if params else "")
            + frag
        ),
        st.sampled_from(["http", "HTTPS", "https"]),
        st.booleans(),
        label,
        st.sampled_from(["com", "co.uk", "org", "io"]),
        st.sampled_from(["", ":80", ":443", ":8080"]),
        st.sampled_from(["", "/", "/a", "/a/b%20c"]),
        st.lists(
            st.sampled_from(
                ["a=1", "b=2", "utm_source=x", "fbclid=y", "z="]
            ),
            max_size=3,
        ),
        st.sampled_from(["", "#f", "#a/b?c"]),
    )

    @given(st.lists(urls, min_size=1, max_size=25, unique=True))
    @settings(max_examples=10, deadline=None)
    def check(batch):
        df = spark.createDataFrame([(u,) for u in batch], "u string")
        rows = df.select(
            normalize_url(F.col("u")).alias("once"),
            normalize_url(normalize_url(F.col("u"))).alias("twice"),
        ).collect()
        for r in rows:
            assert r["once"] == r["twice"], r

    check()


def test_url_dedup_via_normalization(spark):
    """The end shape: normalize → exact groupBy — URL-level dedup
    catches tracking-param/fragment twins raw strings miss."""
    rows = [
        (1, "https://www.site.com/a?utm_source=x&b=1"),
        (2, "HTTPS://site.com/a?b=1#frag"),
        (3, "https://site.com/other"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    groups = (
        df.groupBy(normalize_url(F.col("url")).alias("canon"))
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("keep"))
        .collect()
    )
    by_n = sorted(r["n"] for r in groups)
    assert by_n == [1, 2]
    assert {r["keep"] for r in groups if r["n"] == 2} == {1}


def test_ipv6_literal_hosts_stay_distinct(spark):
    """Bracketed IPv6 hosts must parse as whole literals — a naive
    ':' split maps every v6 host to '[' and URL dedup would merge
    distinct hosts (and drop distinct documents)."""
    n1 = _norm(spark, "https://[::1]:8080/x")
    n2 = _norm(spark, "https://[::2]:8080/x")
    assert n1 != n2
    assert n1 == "https://[::1]:8080/x"
    # default port stripped for v6 too; hex lowered
    assert _norm(spark, "https://[2001:DB8::1]:443/x") == (
        "https://[2001:db8::1]/x"
    )
    assert _norm(spark, "https://[::1]/x") == "https://[::1]/x"


def test_blocklist_keeps_null_urls(spark):
    """A NULL url must pass through the blocklist (later content-based
    filters own those rows) — array_contains(NULL) must not silently
    drop them."""
    rows = [(1, "https://bad.com/a"), (2, None), (3, "https://ok.com/b")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = filter_blocklist(df, "url", ["bad.com"])
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]


def test_registrable_domain_psl_matrix(spark):
    """PSL-data-file-backed registrable domains: second-level ccTLD
    registries (co.uk / com.au), private hosting platforms
    (github.io — per-user sites the heuristic can't know about), the
    longest-match rule, the heuristic fallback for unlisted hosts,
    and the `extra` hook."""
    from urban_mobility_data_lakehouse_spark.text.urls import (
        load_public_suffixes,
        registrable_domain_psl,
    )

    cases = [
        ("www.foo.co.uk", "foo.co.uk"),
        ("deep.sub.shop.example.com.au", "example.com.au"),
        ("alice.github.io", "alice.github.io"),      # suffix + 1 label
        ("docs.alice.github.io", "alice.github.io"),
        ("mybucket.s3.amazonaws.com", "mybucket.s3.amazonaws.com"),
        ("a.pvt.k12.ma.us", "a.pvt.k12.ma.us"),      # 4-label suffix
        ("b.a.pvt.k12.ma.us", "a.pvt.k12.ma.us"),    # longest match wins
        ("www.example.com", "example.com"),          # fallback: take 2
        ("sub.example.org", "example.org"),
        ("example.co.uk", "example.co.uk"),
        ("foo.unknownplatform.dev", "unknownplatform.dev"),  # fallback
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = {
        r["host"]: r["rd"]
        for r in df.select(
            "host", registrable_domain_psl(F.col("host")).alias("rd")
        ).collect()
    }
    for host, want in cases:
        assert got[host] == want, (host, got[host], want)
    # the data file loaded and is multi-label only
    psl = load_public_suffixes()
    assert "co.uk" in psl and "github.io" in psl
    assert all("." in s for s in psl)
    # extra deployment suffixes refine further
    extra = load_public_suffixes(extra=("internal.corp",))
    df2 = spark.createDataFrame(
        [("team.internal.corp",), ("x.team.internal.corp",)],
        "host string",
    )
    got2 = [
        r["rd"]
        for r in df2.select(
            registrable_domain_psl(F.col("host"), extra).alias("rd")
        ).collect()
    ]
    assert got2 == ["team.internal.corp", "team.internal.corp"]
    # plan stays Python-free
    plan = (
        df.select(registrable_domain_psl(F.col("host")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan


def test_quota_and_blocklist_default_to_psl_suffixes(spark):
    """PSL keys are the DEFAULT (r9): quota buckets and blocklist
    granularity follow PSL registrable domains out of the box — each
    *.github.io user site is its own quota bucket / blocklist key, and
    co.uk hosts keep their three-label keys.  suffixes=None opts back
    into the bare heuristic."""
    rows = [
        (i, f"https://user{i % 3}.github.io/p/{i}") for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")

    # DEFAULT: three buckets (user0/1/2.github.io) → cap 2 keeps 6
    assert domain_quota(df, "url", 2).count() == 6
    # heuristic opt-out: ONE bucket (github.io) → cap 2 keeps 2
    assert domain_quota(df, "url", 2, suffixes=None).count() == 2

    # DEFAULT blocklist granularity: blocks exactly one user site
    kept = filter_blocklist(df, "url", ["user1.github.io"])
    assert kept.count() == 8
    assert kept.filter(F.col("url").contains("user1")).count() == 0
    # blocking the platform suffix itself matches no PSL key…
    assert filter_blocklist(df, "url", ["github.io"]).count() == 12
    # …while the heuristic opt-out nukes everything under it
    assert (
        filter_blocklist(df, "url", ["github.io"], suffixes=None).count()
        == 0
    )

    # co.uk under the default: three-label quota keys (PSL and the
    # heuristic agree here — the snapshot refines, never regresses)
    uk = spark.createDataFrame(
        [(i, f"https://shop{i % 2}.example.co.uk/{i}") for i in range(6)],
        "doc_id long, url string",
    )
    from urban_mobility_data_lakehouse_spark.text.urls import (
        load_public_suffixes,
        parse_url,
        registrable_domain_psl,
    )

    host = parse_url(F.col("url"))["host"]

    keys = {
        r[0]
        for r in uk.select(
            registrable_domain_psl(host, load_public_suffixes())
        ).collect()
    }
    assert keys == {"example.co.uk"}
    assert domain_quota(uk, "url", 1).count() == 1


def test_domain_quota_exempts_docs_without_domain_identity(spark):
    """NULL urls and scheme-less/malformed urls (empty parsed host)
    have no domain identity: the quota must pass them through, not
    herd them into one bucket and drop all but max_per_domain."""
    rows = (
        [(i, f"https://site{i % 2}.com/p") for i in range(8)]
        + [(100 + i, "example.com/no-scheme") for i in range(6)]
        + [(200 + i, None) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = domain_quota(df, "url", 2)
    # 2 per real domain (site0.com, site1.com) + ALL 11 identity-less
    assert kept.count() == 4 + 6 + 5
    assert kept.filter(F.col("url").isNull()).count() == 5


def test_suffixes_rejects_stray_strings(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, "https://a.example.com/x")], "doc_id long, url string"
    )
    with pytest.raises(ValueError):
        domain_quota(df, "url", 1, suffixes="public_suffix_list")
    with pytest.raises(ValueError):
        filter_blocklist(df, "url", ["a.com"], suffixes="PSL")
