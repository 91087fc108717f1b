"""Contracts behind the round-7 driver rows (jsonl_corrupt_lane,
audio_features, lakehouse_roundtrip) that the oracle-parity hash alone
doesn't pin.  Parity itself runs in test_oracle_parity (the rows enter
the registry parametrize automatically)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from urban_mobility_data_lakehouse_spark.queries.audio_suite import (
    FREQS,
    N_CLASSES,
    ensure_audio_corpus,
)
from urban_mobility_data_lakehouse_spark.queries.jsonl_suite import (
    ensure_jsonl_corpus,
)

SF_DIR = "/root/testdata/sf0.001"


def test_tone_classes_have_distinct_fingerprints(spark):
    """The fp part's soundness rests on this: Spark groups clips by
    SPECTRAL fingerprint, the oracle by payload bytes — the two
    partitions coincide iff the 13 tone classes map to 13 DISTINCT
    fingerprints (same-class clips are byte-identical, so same-
    fingerprint is automatic).  Pin it directly on one clip per class.
    """
    from urban_mobility_data_lakehouse_spark.multimodal.audiofeats import (
        audio_fingerprint,
    )
    from urban_mobility_data_lakehouse_spark.queries.audio_suite import (
        FRAME_LEN,
        HOP,
        _tone_payload,
    )

    media = spark.createDataFrame(
        [(c, bytearray(_tone_payload(FREQS[c]))) for c in range(N_CLASSES)],
        "media_id long, payload binary",
    )
    fps = {
        r["fingerprint"]
        for r in audio_fingerprint(
            media, frame_len=FRAME_LEN, hop=HOP
        ).collect()
    }
    assert len(fps) == N_CLASSES


def test_audio_fixture_deterministic_and_idempotent():
    p1 = ensure_audio_corpus(SF_DIR)
    mtime = os.path.getmtime(p1)
    p2 = ensure_audio_corpus(SF_DIR)  # second call: no rewrite
    assert p1 == p2 and os.path.getmtime(p2) == mtime
    import pyarrow.parquet as pq

    tbl = pq.read_table(p1)
    ids = tbl.column("media_id").to_pylist()
    payloads = tbl.column("payload").to_pylist()
    # same class => byte-identical payload (the fp-part contract)
    by_class: dict[int, bytes] = {}
    for i, pl in zip(ids, payloads):
        assert by_class.setdefault(i % N_CLASSES, pl) == pl


def test_jsonl_fixture_corruption_plan(spark):
    """Quarantine counts follow the seeded plan: doc_id % 23 in {5, 11}
    are unparseable, everything else round-trips exactly."""
    import pyarrow.parquet as pq

    from urban_mobility_data_lakehouse_spark.queries.jsonl_suite import (
        _DOC_SCHEMA,
    )
    from urban_mobility_data_lakehouse_spark.sources.jsonl import (
        read_jsonl,
        split_corrupt,
    )

    doc_ids = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id"]
    ).column("doc_id").to_pylist()
    want_bad = sum(1 for d in doc_ids if d % 23 in (5, 11))
    path = ensure_jsonl_corpus(SF_DIR)
    clean, quarantine = split_corrupt(
        read_jsonl(spark, path, schema=_DOC_SCHEMA)
    )
    assert quarantine.count() == want_bad
    assert clean.count() == len(doc_ids) - want_bad
    # clean rows round-trip the source table's values exactly
    src = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    good = src.filter(~(F.col("doc_id") % 23).isin(5, 11))
    assert (
        clean.select("doc_id", "text", "lang", "source", "n_chars")
        .exceptAll(good.select("doc_id", "text", "lang", "source",
                               "n_chars"))
        .count()
        == 0
    )


def test_lakehouse_roundtrip_rerun_stable(spark):
    """The builder rebuilds a throwaway warehouse per call — two calls
    must produce identical rows (retry/parallel-shard safety)."""
    from urban_mobility_data_lakehouse_spark.queries.lakehouse_suite import (
        lakehouse_roundtrip,
    )

    from urban_mobility_data_lakehouse_spark.queries.lakehouse_suite import (
        _G2_ID_OFFSET,
        _G2_N_OFFSET,
    )

    r1 = lakehouse_roundtrip(spark, SF_DIR).collect()
    r2 = lakehouse_roundtrip(spark, SF_DIR).collect()
    assert r1 == r2 and len(r1) > 0
    # the UPDATE hit exactly the id%7==3 stratum and nothing else;
    # the post-widen generation 2 (flag='g2', shifted ids) is exempt
    # from the earlier DML and carries beyond-int32 n values
    src = {
        r["id"]: r["v"]
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select(F.col("event_id").alias("id"), F.col("value").alias("v"))
        .collect()
    }
    # r10: the row is a labeled dml+mv union — the mv part must equal
    # a per-group recompute of the dml part (the incremental refresh's
    # from-scratch twin, here checked engine-side)
    dml = [r for r in r1 if r["part"] == "dml"]
    mv = {r["p"]: (r["v2"], r["n"]) for r in r1 if r["part"] == "mv"}
    assert set(r["part"] for r in r1) == {
        "dml", "mv", "cdc", "man", "ckpt", "adv",
    }
    # r12: the advisor part — exactly one 'pre' recommendation (the
    # deliberately fragmented partition, a live dml group) and a
    # 'post' row pinning the post-remediation recommendation count 0
    adv = [r for r in r1 if r["part"] == "adv"]
    pre = [r for r in adv if r["flag"] == "pre"]
    post = [r for r in adv if r["flag"] == "post"]
    assert len(pre) == 1 and len(post) == 1
    assert post[0]["n"] == 0
    assert pre[0]["p"] in {r["p"] for r in dml}
    # r11: the ckpt part (checkpoint-seeded cold read) must agree with
    # the man part (log-blind manifest replay) row-for-row modulo the
    # label — two independent reconstructions of the same final state
    man_set = {
        (r["id"], r["p"], r["v2"], r["n"])
        for r in r1
        if r["part"] == "man"
    }
    ckpt_set = {
        (r["id"], r["p"], r["v2"], r["n"])
        for r in r1
        if r["part"] == "ckpt"
    }
    assert man_set == ckpt_set and man_set
    # cdc conservation: the pipe's inserts minus deletes must equal
    # the live table the dml part reads
    cdc = {r["p"]: r["n"] for r in r1 if r["part"] == "cdc"}
    assert cdc["insert"] - cdc["delete"] == len(dml)
    # r11: the man part (log-blind manifest replay) must equal a
    # per-group recompute of the dml part — same engine-side twin the
    # mv part gets; id carries sum(n) so the widened column is pinned
    man = {
        r["p"]: (r["id"], r["v2"], r["n"])
        for r in r1
        if r["part"] == "man"
    }
    man_groups: dict[str, list] = {}
    for row in dml:
        man_groups.setdefault(row["p"], []).append(row)
    assert set(man) == set(man_groups)
    for g, rows_g in man_groups.items():
        sn, total, n = man[g]
        assert n == len(rows_g)
        assert sn == sum(r["n"] for r in rows_g)
        want = sum(r["v2"] for r in rows_g)
        assert abs(total - want) < 1e-6 * max(1.0, abs(want))
    by_group: dict[str, list[float]] = {}
    for row in dml:
        by_group.setdefault(row["p"], []).append(row["v2"])
    assert set(mv) == set(by_group)
    for g, vals in by_group.items():
        total, n = mv[g]
        assert n == len(vals)
        assert abs(total - sum(vals)) < 1e-6 * max(1.0, abs(total))
    saw_g2 = False
    for row in dml:
        if row["flag"] == "g2":
            saw_g2 = True
            base = row["id"] - _G2_ID_OFFSET
            assert base % 13 == 0
            assert row["v2"] == src[base] * 3
            assert row["n"] == base + _G2_N_OFFSET > 2**31
            continue
        assert row["id"] % 11 != 0  # deleted stratum is gone
        want = (
            src[row["id"]] * 2 + 1
            if row["id"] % 7 == 3
            else src[row["id"]]
        )
        assert row["v2"] == want and row["flag"] is None
        assert row["n"] == row["id"]  # widened read of the int32 files
    assert saw_g2


def test_bm25_time_travel_part_is_not_vacuous(spark):
    """The 'tt' part's value rests on generation 0 being a genuinely
    different corpus snapshot: if the evens-only ranking coincided
    with the full-corpus ranking on the fixture, the time-travel hash
    would prove nothing.  Pin that the two top-20 lists differ (odd
    doc_ids can only appear in the latest generation)."""
    from urban_mobility_data_lakehouse_spark.queries import (
        REGISTRY,
        _load_all,
    )

    _load_all()
    df = REGISTRY["bm25_search"].builder(spark, SF_DIR)
    rows = df.collect()
    tt = [(r["doc_id"], r["score"]) for r in rows if r["part"] == "tt"]
    idx = [(r["doc_id"], r["score"]) for r in rows if r["part"] == "index"]
    assert tt and idx and tt != idx
    assert all(d % 2 == 0 for d, _ in tt)  # gen 0 froze the evens
    assert any(d % 2 == 1 for d, _ in idx)  # gen 1 added the odds


def test_lm_bands_are_non_degenerate_on_fixture(spark):
    """The lm parts hash exact integer sums, so a silently degenerate
    band column (every doc 'mid') would still hash-match — pin that
    the fixture corpus populates all three bands for BOTH orders, so
    the integer cross-multiplied thresholds keep doing work."""
    from urban_mobility_data_lakehouse_spark.queries import (
        REGISTRY,
        _load_all,
    )

    _load_all()
    df = REGISTRY["text_pairs_suite"].builder(spark, SF_DIR)
    rows = df.filter(F.col("part").isin("lmuni", "lmbi")).collect()
    for part in ("lmuni", "lmbi"):
        bands = {r["token"] for r in rows if r["part"] == part}
        assert bands == {"low", "mid", "high"}, (part, bands)
