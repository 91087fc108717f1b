"""Persistent IVF index: result parity with the in-memory knn_ivf,
partition-pruned probes, frozen-quantizer adds, and OPTIMIZE
restoring the clustered layout.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from urban_mobility_data_lakehouse_spark.similarity.ivf import knn_ivf
from urban_mobility_data_lakehouse_spark.similarity.persistent_ivf import (
    PersistentIVF,
)
from urban_mobility_data_lakehouse_spark.sources.lakehouse import Lakehouse
from urban_mobility_data_lakehouse_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )


def _mk_index(tmp_path, **kw) -> PersistentIVF:
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("gold")
    return PersistentIVF(lake, **kw)


def _rows(df):
    return [
        (r["query_id"], r["neighbor_id"], r["cosine_sim"], r["rank"])
        for r in df.collect()
    ]


def test_query_matches_in_memory_knn_ivf(spark, embeddings, tmp_path):
    idx = _mk_index(tmp_path)
    idx.build(spark, embeddings)
    queries = embeddings.filter(F.col("vec_id") < 10)
    got = _rows(idx.query(spark, queries, k=3))
    expect = _rows(knn_ivf(embeddings, n_queries=10, k=3))
    assert got == expect


def _scanned_cells(out) -> set[int]:
    """cell= partition directories the planned query would read.

    `inputFiles()` reflects partition pruning, so this asserts the
    SEMANTIC property (n_probe of n_cells directories scanned) without
    depending on how the optimizer renders the filter in the plan
    string (IN vs INSET, cast-wrapped or unwrapped — both vary with
    session history)."""
    cells = set()
    for f in out.inputFiles():
        for part in f.split("/"):
            if part.startswith("cell="):
                cells.add(int(part.split("=", 1)[1]))
    return cells


def test_query_scans_only_probed_cells(spark, embeddings, tmp_path):
    """The probe-cell filter must prune at the DIRECTORY level —
    n_probe of n_cells partition dirs planned, never the full index."""
    idx = _mk_index(tmp_path)
    idx.build(spark, embeddings)
    one_query = embeddings.filter(F.col("vec_id") == 0)
    out = idx.query(spark, one_query, k=3)
    touched = _scanned_cells(out)
    assert touched, "no cell= partition dirs in the planned scan"
    assert len(touched) == idx.n_probe, touched
    # and the full (unfiltered) index really is wider than the probe
    full = idx.lake.read(spark, idx.schema, idx.name)
    assert len(_scanned_cells(full)) == idx.n_cells


def test_add_assigns_against_frozen_centroids_then_optimize(
    spark, embeddings, tmp_path
):
    half_a = embeddings.filter(F.col("vec_id") % 2 == 0)
    half_b = embeddings.filter(F.col("vec_id") % 2 == 1)

    idx = _mk_index(tmp_path, name="grow")
    idx.build(spark, half_a)
    cents_before = idx.centroids(spark)
    idx.add(spark, half_b)
    assert idx.centroids(spark) == cents_before  # add never retrains

    # a full-corpus index trained on the SAME sample half gives the
    # reference answers for the grown index
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    ref = _mk_index(ref_dir, name="refidx")
    ref.build(spark, half_a)
    ref.add(spark, half_b)

    queries = embeddings.filter(F.col("vec_id") < 6)
    before = _rows(idx.query(spark, queries, k=3))
    assert before == _rows(ref.query(spark, queries, k=3))
    # grown results include appended (odd-id) vectors as neighbors
    assert any(n % 2 == 1 for _, n, _, _ in before)

    stats = idx.optimize(spark)
    assert stats["files_after"] <= stats["files_before"]
    # OPTIMIZE changes layout, never results
    assert _rows(idx.query(spark, queries, k=3)) == before
    # and probe pruning applies to the compacted layout: the planned
    # scan touches only probed cell= directories
    one = embeddings.filter(F.col("vec_id") == 0)
    touched = _scanned_cells(idx.query(spark, one, k=3))
    assert 0 < len(touched) <= idx.n_probe


def test_frozen_centroids_split_ingest_converges_to_batch(
    spark, embeddings, tmp_path, sf_dir
):
    """build(evens, centroids=frozen) + add(odds) + OPTIMIZE must give
    the BATCH answer: with the quantizer frozen externally (FAISS
    train-on-sample semantics), assignment is row-local and
    deterministic, so how the corpus was split across ingest batches
    cannot show in query results.  This is the contract the
    embedding_near_dups 'serve' driver part hash-checks against the
    injected-centroid DuckDB oracle."""
    from urban_mobility_data_lakehouse_spark.similarity.ivf import (
        train_centroids_from_parquet,
    )

    cents = train_centroids_from_parquet(sf_dir, n_cells=16)
    idx = _mk_index(tmp_path, name="frozen")
    idx.build(
        spark, embeddings.filter(F.col("vec_id") % 2 == 0), centroids=cents
    )
    assert idx.centroids(spark) == cents  # stored verbatim, not retrained
    idx.add(spark, embeddings.filter(F.col("vec_id") % 2 == 1))
    idx.optimize(spark)

    queries = embeddings.filter(F.col("vec_id") < 10)
    got = _rows(idx.query(spark, queries, k=3))
    expect = _rows(knn_ivf(embeddings, n_queries=10, k=3, centroids=cents))
    assert got == expect


def test_streaming_ingest_merges_exactly_once(
    spark, embeddings, tmp_path, sf_dir
):
    """Micro-batched streaming ingest converges to the batch answer;
    a restart from the same checkpoint reprocesses nothing; and a
    hypothetically replayed batch is idempotent (merge by vec_id, not
    append — append would double-count on crash-replay)."""
    from urban_mobility_data_lakehouse_spark.similarity.ivf import (
        assign_cells,
        train_centroids_from_parquet,
    )

    cents = train_centroids_from_parquet(sf_dir, n_cells=16)
    seed = embeddings.filter(F.col("vec_id") % 3 == 0)
    rest = embeddings.filter(F.col("vec_id") % 3 != 0)
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    for k in (1, 2):
        rest.filter(F.col("vec_id") % 3 == k).coalesce(1).write.parquet(
            str(stream_dir / f"slice{k}")
        )

    idx = _mk_index(tmp_path, name="stream_idx")
    idx.build(spark, seed, centroids=cents)

    def _stream():
        return (
            spark.readStream.schema(embeddings.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(stream_dir) + "/slice*")
        )

    idx.streaming_ingest(
        spark, _stream(), str(tmp_path / "ckpt")
    ).awaitTermination(180)

    queries = embeddings.filter(F.col("vec_id") < 10)
    got = _rows(idx.query(spark, queries, k=3))
    expect = _rows(knn_ivf(embeddings, n_queries=10, k=3, centroids=cents))
    assert got == expect

    # restart from the same checkpoint: nothing new processed
    v_before = idx.lake.snapshots("gold", idx.name)[-1]["version"]
    idx.streaming_ingest(
        spark, _stream(), str(tmp_path / "ckpt")
    ).awaitTermination(120)
    assert idx.lake.snapshots("gold", idx.name)[-1]["version"] == v_before

    # manual replay of an already-ingested batch: merge rewrites the
    # same rows to the same values — query results cannot move
    s1 = spark.read.parquet(str(stream_dir / "slice1"))
    idx.lake.merge_into(
        spark, "gold", idx.name, assign_cells(s1, cents),
        key="vec_id", partition_col="cell",
    )
    assert _rows(idx.query(spark, queries, k=3)) == got


def _pick_mover(spark, embeddings, cents):
    """(mover_id, donor_id): two vectors assigned to different cells."""
    from urban_mobility_data_lakehouse_spark.similarity.ivf import (
        assign_cells,
    )

    rows = (
        assign_cells(embeddings.filter(F.col("vec_id") < 50), cents)
        .select("vec_id", "cell")
        .collect()
    )
    mover = rows[0]
    donor = next(r for r in rows if r["cell"] != mover["cell"])
    return mover["vec_id"], donor["vec_id"]


def _modified_corpus(embeddings, mover_id, donor_id):
    """The corpus with mover's embedding replaced by donor's (a
    changed embedding that MOVES cells)."""
    donor_row = embeddings.filter(F.col("vec_id") == donor_id).collect()[0]
    lit_emb = F.array(
        *[F.lit(float(x)) for x in donor_row["embedding"]]
    ).cast("array<float>")
    return embeddings.withColumn(
        "embedding",
        F.when(F.col("vec_id") == mover_id, lit_emb).otherwise(
            F.col("embedding")
        ),
    )


def test_replace_existing_handles_cell_moves(
    spark, embeddings, tmp_path, sf_dir
):
    """add(replace_existing=True) is a true re-add: a changed
    embedding that moves cells leaves NO stale row in the old cell,
    and the index answers queries identically to a fresh build over
    the modified corpus."""
    from urban_mobility_data_lakehouse_spark.similarity.ivf import (
        train_centroids_from_parquet,
    )

    cents = train_centroids_from_parquet(sf_dir, n_cells=16)
    mover, donor = _pick_mover(spark, embeddings, cents)
    modified = _modified_corpus(embeddings, mover, donor)

    idx = _mk_index(tmp_path, name="readd")
    idx.build(spark, embeddings, centroids=cents)
    idx.add(
        spark,
        modified.filter(F.col("vec_id") == mover),
        replace_existing=True,
    )
    # no duplicate vec_id anywhere in the index
    n = (
        idx.lake.read(spark, "gold", idx.name)
        .filter(F.col("vec_id") == mover)
        .count()
    )
    assert n == 1
    queries = modified.filter(F.col("vec_id") < 10)
    got = _rows(idx.query(spark, queries, k=3))
    fresh = _mk_index(tmp_path / "fresh", name="fresh")
    fresh.build(spark, modified, centroids=cents)
    assert got == _rows(fresh.query(spark, queries, k=3))


def test_streaming_reassign_moved_leaves_no_stale_row(
    spark, embeddings, tmp_path, sf_dir
):
    """streaming_ingest(reassign_moved=True): a re-delivered vector
    whose changed embedding moves cells is deleted from its old cell
    before the merge, so the merged index equals a fresh build over
    the modified corpus (the documented gap the default merge-only
    sink keeps for append-mostly streams)."""
    from urban_mobility_data_lakehouse_spark.similarity.ivf import (
        train_centroids_from_parquet,
    )

    cents = train_centroids_from_parquet(sf_dir, n_cells=16)
    mover, donor = _pick_mover(spark, embeddings, cents)
    modified = _modified_corpus(embeddings, mover, donor)

    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    modified.filter(F.col("vec_id") == mover).coalesce(1).write.parquet(
        str(stream_dir / "redeliver")
    )

    idx = _mk_index(tmp_path, name="moved")
    idx.build(spark, embeddings, centroids=cents)
    stream = (
        spark.readStream.schema(embeddings.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir) + "/redeliver")
    )
    idx.streaming_ingest(
        spark, stream, str(tmp_path / "ckpt"), reassign_moved=True
    ).awaitTermination(180)

    n = (
        idx.lake.read(spark, "gold", idx.name)
        .filter(F.col("vec_id") == mover)
        .count()
    )
    assert n == 1
    queries = modified.filter(F.col("vec_id") < 10)
    fresh = _mk_index(tmp_path / "fresh", name="fresh")
    fresh.build(spark, modified, centroids=cents)
    assert _rows(idx.query(spark, queries, k=3)) == _rows(
        fresh.query(spark, queries, k=3)
    )


def test_serving_geometry_memoized_per_generation(
    spark, embeddings, tmp_path
):
    """centroids() costs ONE lakehouse read per index generation, not
    one per query call: repeated queries hit the version-keyed cache,
    and a rebuild (new centroids commit) invalidates it."""
    idx = _mk_index(tmp_path, name="memo")
    idx.build(spark, embeddings)

    reads = []
    orig_read = idx.lake.read

    def counting_read(spark_, schema, name, **kw):
        reads.append(name)
        return orig_read(spark_, schema, name, **kw)

    idx.lake.read = counting_read
    try:
        geom_table = f"{idx.name}_centroids"
        c1 = idx.centroids(spark)
        queries = embeddings.filter(F.col("vec_id") < 10)
        first = _rows(idx.query(spark, queries, k=3))
        second = _rows(idx.query(spark, queries, k=3))
        assert first == second
        assert reads.count(geom_table) == 1  # build() primed nothing;
        # the first centroids() loaded, both query() calls hit cache
        assert idx.centroids(spark) == c1
        assert reads.count(geom_table) == 1
        # a rebuild commits new geometry → cache invalidates
        idx.build(spark, embeddings)
        idx.centroids(spark)
        assert reads.count(geom_table) == 2
    finally:
        idx.lake.read = orig_read


def test_moved_probe_prunes_by_bloom(spark, embeddings, tmp_path, sf_dir):
    """The `_moved_ids` probe reads through read_where(vec_id IN …):
    with the Bloom index build() registers, a one-id probe plans a
    strict subset of the index files instead of the corpus-sized
    scan."""
    idx = _mk_index(tmp_path, name="bloomprobe")
    idx.build(spark, embeddings)
    assert "vec_id" in idx.lake.bloom_index("gold", idx.name)
    full = idx.lake.read(spark, "gold", idx.name)
    probe = idx.lake.read_where(
        spark, "gold", idx.name, [("vec_id", "in", [0])]
    )
    n_full = len(full.inputFiles())
    n_probe = len(probe.inputFiles())
    assert n_probe < n_full, (n_probe, n_full)
    assert probe.count() == 1


@pytest.mark.parametrize("seed", [0, 1])
def test_ivf_random_mutation_tape(
    spark, embeddings, tmp_path, sf_dir, seed
):
    """Model-based tape over the vector-index mutation surface: ANY
    random interleaving of add-new / replace-with-changed-embedding
    (cell moves included) / delete must leave the index answering
    queries identically to a fresh build of the modeled corpus, with
    every vec_id stored exactly once."""
    import random

    from urban_mobility_data_lakehouse_spark.similarity.ivf import (
        train_centroids_from_parquet,
    )

    rng = random.Random(20260816 + seed)
    cents = train_centroids_from_parquet(sf_dir, n_cells=16)
    pool = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in embeddings.orderBy("vec_id").limit(60).collect()
    ]
    model = dict(pool[:40])
    donors = [e for _, e in pool[40:]]

    def frame(ids):
        return spark.createDataFrame(
            [(i, model[i]) for i in ids],
            "vec_id long, embedding array<float>",
        )

    idx = _mk_index(tmp_path / "tape", name="tape")
    idx.build(spark, frame(sorted(model)), centroids=cents)
    next_id = max(model) + 1_000
    for step in range(5):
        op = rng.choice(["add", "replace", "delete"])
        if op == "add":
            model[next_id] = rng.choice(donors)
            idx.add(spark, frame([next_id]))
            next_id += 1
        elif op == "replace" and model:
            # a changed embedding that may move cells
            target = rng.choice(sorted(model))
            model[target] = rng.choice(donors)
            idx.add(spark, frame([target]), replace_existing=True)
        elif op == "delete" and model:
            victims = rng.sample(sorted(model), k=min(2, len(model)))
            for v in victims:
                del model[v]
            idx.delete_vecs(spark, victims)

    # every surviving vec_id stored exactly once
    counts = (
        idx.lake.read(spark, "gold", idx.name)
        .groupBy("vec_id").count().collect()
    )
    assert {int(r["vec_id"]) for r in counts} == set(model)
    assert all(r["count"] == 1 for r in counts)

    fresh = _mk_index(tmp_path / "fresh", name="fresh")
    fresh.build(spark, frame(sorted(model)), centroids=cents)
    queries = frame(sorted(model)[:8])
    assert _rows(idx.query(spark, queries, k=3)) == _rows(
        fresh.query(spark, queries, k=3)
    )


def test_mover_plan_is_deterministic_and_cross_cell(sf_dir):
    """`_mover_plan` (the driver-gate mover part's precondition):
    pyarrow-only, memoized-deterministic, movers in the seed slice and
    outside the query window, every donor in a different cell — so the
    re-delivery is a GUARANTEED cross-cell move on both the Spark and
    the oracle side."""
    from urban_mobility_data_lakehouse_spark.queries.similarity import (
        _mover_plan,
    )
    from urban_mobility_data_lakehouse_spark.similarity.ivf import (
        query_probes_from_parquet,
        train_centroids_from_parquet,
    )

    plan = _mover_plan(sf_dir)
    assert plan == _mover_plan(sf_dir)  # memo + determinism
    assert len(plan) == 4
    cents = train_centroids_from_parquet(sf_dir, n_cells=16)
    movers = [m for m, _, _ in plan]
    donors = sorted({d for _, d, _ in plan})
    # assignment twin: rank-1 probe == cell, reusing the bit-identical
    # driver-side fold (probe sets are (distance, cell)-tie-broken)
    cells = {
        vid: probe[0]
        for vid, _, probe in query_probes_from_parquet(
            sf_dir, cents, n_queries=10_000, n_probe=1
        )
        if vid in set(movers) | set(donors)
    }
    for m, d, c in plan:
        assert m % 3 == 0 and m >= 10  # seed slice, outside queries
        assert cells[d] == c  # expected cell IS the donor's cell
        assert cells[m] != c  # and it differs — a genuine move
