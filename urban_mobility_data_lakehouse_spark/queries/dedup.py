"""Deduplication queries with DuckDB oracles.

The minhash scheme (one portable md5-60bit per shingle, K linear
congruences mod 2^31-1 as the permutations) is engine-portable: both
sides compute identical exact int64 arithmetic, so the full LSH
pipeline — signatures, band keys, candidate pairs, verified Jaccard —
is oracle-checkable end-to-end at 1 md5 per shingle instead of K.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..dedup import components, exact, minhash, simhash
from ..sources.testdata import fan_out, load_table
from . import register

# shared SQL fragments -----------------------------------------------------
# generated from the SAME constants (SEEDS, N_HASHES, BAND_ROWS, P31)
# the Spark implementation uses, so the LSH geometry can never drift

# portable 31-bit shingle hash: md5-60bit mod 2^31-1 (minhash.shingle_hash)
_HASH = (
    "CAST(CAST(CONCAT('0x', substr(md5(s), 1, 15)) AS UBIGINT) AS BIGINT) "
    f"% {minhash.P31}"
)

_SHINGLES = f"""
    SELECT doc_id, unnest(list_distinct(list_transform(
        CASE WHEN len(t) >= 3
             THEN list_transform(generate_series(1, len(t) - 2),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
             ELSE [text] END,
        s -> {_HASH}))) AS h
    FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)
"""

_SIG_COLS = ", ".join(
    f"min(({a} * h + {b}) % {minhash.P31}) AS m{k}"
    for k, (a, b) in enumerate(minhash.SEEDS)
)

_SIG = f"SELECT doc_id, {_SIG_COLS} FROM sh GROUP BY doc_id"

_BANDS = "\n    UNION ALL\n".join(
    "SELECT doc_id, {b} AS band_id, md5(concat_ws('|', {cols}))"
    " AS band_key FROM sig".format(
        b=b,
        cols=", ".join(
            f"m{b * minhash.BAND_ROWS + r}"
            for r in range(minhash.BAND_ROWS)
        ),
    )
    for b in range(minhash.N_HASHES // minhash.BAND_ROWS)
)


@register(
    "exact_dup_groups",
    oracle=r"""
    WITH all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents
    )
    SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
               AS fingerprint,
           count(*) AS n_copies,
           min(doc_id) AS canonical_doc_id
    FROM all_docs
    GROUP BY 1 ORDER BY 1
    """,
    tags=("dedup", "exact"),
)
def exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup demonstrated on a corpus with planted duplicates
    (the corpus unioned with an id-shifted copy of itself)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    )
    return exact.duplicate_groups(doubled)


# per-doc digest of the full K-column minhash signature: md5 of the
# '|'-joined int64 columns, top 60 bits as BIGINT — both engines render
# int64 identically, so the digest pins every signature value without
# widening the near_dup_pairs union to K columns (the standalone
# minhash_signatures row was folded here to free a driver slot)
_SIG_COL_LIST = ", ".join(f"m{k}" for k in range(minhash.N_HASHES))
_SIG_DIGEST = (
    "CAST(CAST(CONCAT('0x', substr(md5(concat_ws('|', "
    f"{_SIG_COL_LIST})), 1, 15)) AS UBIGINT) AS BIGINT)"
)


# the full LSH pipeline as reusable CTE text: shingles → signatures →
# band keys → candidate pairs → exact-Jaccard-verified pairs.  Shared
# by the batch row (near_dup_pairs) and the incremental row
# (near_dup_incremental), whose exactness contract is precisely "union
# of per-batch emissions ≡ this full-corpus recompute".
_PAIR_CTES = f"""sh AS ({_SHINGLES}),
    sig AS ({_SIG}),
    bands AS ({_BANDS}),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band_id = b.band_id
                    AND a.band_key = b.band_key
                    AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    common AS (
        SELECT c.doc_a, c.doc_b, count(*) AS n_common
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.doc_a
        JOIN sh sb ON sb.doc_id = c.doc_b AND sb.h = sa.h
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT doc_a, doc_b,
               round(n_common * 1.0 / (za.n + zb.n - n_common), 4)
                   AS jaccard
        FROM common
        JOIN sizes za ON za.doc_id = doc_a
        JOIN sizes zb ON zb.doc_id = doc_b
        WHERE n_common * 1.0 / (za.n + zb.n - n_common) >= 0.5
    )"""


@register(
    "near_dup_pairs",
    oracle=f"""
    WITH RECURSIVE {_PAIR_CTES},
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, label) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, r.label FROM reach r JOIN edges e ON e.dst = r.node
    )
    SELECT 'pair' AS part, doc_a, doc_b, CAST(jaccard AS DOUBLE) AS jaccard
    FROM pairs
    UNION ALL
    SELECT 'cluster' AS part, node AS doc_a, min(label) AS doc_b,
           CAST(NULL AS DOUBLE) AS jaccard
    FROM reach GROUP BY node
    UNION ALL
    SELECT 'sig' AS part, doc_id AS doc_a, {_SIG_DIGEST} AS doc_b,
           CAST(NULL AS DOUBLE) AS jaccard
    FROM sig
    ORDER BY part, doc_a, doc_b
    """,
    tags=("dedup", "minhash", "lsh", "connected-components"),
    bench=True,
)
def near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup PAIRS (banded LSH + exact Jaccard verify) plus their
    transitive CLUSTER closure (`dedup/components.py` min-label
    propagation with pointer jumping; oracle replays it as a recursive
    label-reachability CTE).  Cluster rows: doc_a = member,
    doc_b = cluster id (min doc id of the component — the survivor
    under keep-smallest dedup).  Sig rows (folded from the former
    standalone minhash_signatures registry row): doc_a = doc_id,
    doc_b = a 60-bit md5 digest of the full K-column signature, so
    every signature value stays driver-hash-checked without its own
    slot."""
    # materialized once, consumed twice (pair part + the CC loop's
    # edge seed).  localCheckpoint, NOT .persist(): persist registers
    # the plan in the CacheManager forever (a leak across the session
    # — bench queries after this one pay for its blocks), while
    # checkpoint blocks are freed by the ContextCleaner once the
    # returned frame is garbage-collected.
    # fan_out: shingling + minhashing is CPU-bound row-local map
    # work; see sources/testdata.fan_out (no-op on production layouts)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    # ONE shingling pass serves both the LSH pipeline and the sig part
    hs = minhash.doc_shingle_arrays(docs).localCheckpoint(eager=False)
    # ONE signature pass serves both band-join sides AND the sig-digest
    # part (r13): un-checkpointed, each side of the band self-join and
    # the digest re-ran the 16 array_min(transform) congruences over
    # every doc's shingle array — 3× the signature work (measured
    # ~1.8 → ~1.5 s warm at sf0.1)
    sig = minhash.signatures_from_arrays(hs).localCheckpoint(eager=False)
    pairs = minhash.near_duplicates(hashed=hs, sig=sig).localCheckpoint(
        eager=False
    )
    clusters = components.duplicate_clusters(
        pairs.select("doc_a", "doc_b")
    )
    pair_part = pairs.select(
        F.lit("pair").alias("part"), "doc_a", "doc_b", "jaccard"
    )
    cluster_part = clusters.select(
        F.lit("cluster").alias("part"),
        F.col("doc_id").alias("doc_a"),
        F.col("cluster_id").alias("doc_b"),
        F.lit(None).cast("double").alias("jaccard"),
    )
    # row-local signatures from the checkpointed arrays (r13): the
    # former exploded→groupBy pass cost a Generate + two
    # HashAggregates + an Exchange, and ran TWICE (once here, once
    # inside candidate_pairs) — array_min(transform(...)) computes the
    # identical min-congruence per doc with zero shuffles, and the
    # checkpointed `sig` above shares that one pass with the band join
    digest = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    *[F.col(f"m{k}") for k in range(minhash.N_HASHES)],
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    sig_part = sig.select(
        F.lit("sig").alias("part"),
        F.col("doc_id").alias("doc_a"),
        digest.alias("doc_b"),
        F.lit(None).cast("double").alias("jaccard"),
    )
    return pair_part.unionByName(cluster_part).unionByName(
        sig_part
    ).orderBy("part", "doc_a", "doc_b")


@register(
    "near_dup_incremental",
    oracle=f"""
    WITH {_PAIR_CTES}
    SELECT doc_a, doc_b, CAST(jaccard AS DOUBLE) AS jaccard,
           'b' || CAST(greatest(doc_a % 3, doc_b % 3) AS VARCHAR)
               AS ingest_batch
    FROM pairs
    ORDER BY doc_a, doc_b
    """,
    tags=("dedup", "incremental", "lsh", "exactly-once"),
)
def near_dup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `BandedDupIndex` incremental exactness contract, driver-
    checked: ingest the corpus as THREE deterministic batches
    (doc_id % 3) through the persistent MinHash index
    (`dedup/incremental.NearDupIndex` over a throwaway lakehouse),
    then read back the unioned per-batch pair log.  The oracle is the
    full-corpus recompute (the SAME pair CTEs the batch row replays),
    so hash equality PROVES union-of-batches ≡ batch path — every
    qualifying pair emitted exactly once.  The `ingest_batch` column
    additionally pins WHICH batch emitted each pair: the engine
    attributes a pair to the batch where its LATER item arrived, which
    for the %3 split is greatest(doc_a % 3, doc_b % 3) — replayed
    verbatim in the oracle, so attribution (not just the union) is
    hash-checked."""
    from ..dedup.incremental import BATCH_COL, NearDupIndex
    from ..sources.lakehouse import temp_lakehouse

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    with temp_lakehouse(prefix="umdl_neardup_incr_") as lake:
        idx = NearDupIndex(lake)
        for k in (0, 1, 2):
            idx.ingest_and_log(
                spark,
                docs.filter(F.col("doc_id") % 3 == k),
                batch_id=f"b{k}",
            )
        # eager checkpoint pins the (tiny, |pairs|-bounded) result into
        # executor blocks so the throwaway lakehouse can be deleted
        # before the frame is consumed — the builder leaves no files
        out = (
            idx.pairs(spark)
            .select(
                "doc_a",
                "doc_b",
                "jaccard",
                F.col(BATCH_COL).cast("string").alias("ingest_batch"),
            )
            .localCheckpoint(eager=True)
        )
    return out.orderBy("doc_a", "doc_b")


@register(
    "simhash_candidates",
    oracle=simhash.SIMHASH_ORACLE,  # md5-60bit hash is engine-portable
    tags=("dedup", "simhash"),
    bench=True,
)
def simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash dedup map (keep-one-per-cluster): band-blocked,
    Hamming-verified, min-neighbor canonical ids.  |docs|-bounded
    output — the pair list is quadratic in duplicate-family size and
    only ever exists as a row-local filtered join intermediate."""
    # fan_out: the 60-bit vote aggregation's map side is CPU-bound
    return simhash.dedup_map(fan_out(load_table(spark, sf_dir, "documents")))
