"""Persistent IVF: the ANN index as a lakehouse table, probed through
partition pruning.

`ivf.knn_ivf` builds its index per call — right for a benchmark query,
wrong for a serving path.  Production vector search materializes the
assignment once and lets STORAGE LAYOUT do the probe pruning: this
module stores `(vec_id, emb, cell)` as a lakehouse table partitioned
by `cell`, so scoring a query against its `n_probe` nearest cells
reads ONLY those cells' directories (directory-level pruning — the
scan plan's `inputFiles()` shrinks to n_probe/n_cells of the index).
This realizes the note in `ivf.py`: "in a real deployment `cell`
becomes a partition/bucket column at ingest".

Lifecycle mirrors a Delta-backed vector store:

  build(corpus)   train (driver-sized deterministic sample) → assign
                  (broadcast centroids, shuffle-free map) → commit
                  partitioned by cell; centroids land in a companion
                  table so every later reader/writer shares the frozen
                  quantizer.
  add(batch)      assign the batch against the FROZEN centroids and
                  append — the streaming-ingest fast path; appended
                  files span cells, so probes read them un-pruned
                  until…
  optimize()      `compact(partition_col="cell")` re-clusters
                  everything back into one right-sized file per cell
                  (the OPTIMIZE-after-streaming ritual), restoring
                  full probe pruning.  All three are ordinary
                  versioned commits: the index is time-travelable and
                  crash-safe like any other table.
  query(vectors)  rank cells per query row-locally, collect the
                  (tiny) union of probed cell ids, scan just those
                  partitions, exact cosine re-rank inside them —
                  identical math to `knn_ivf`, so results match the
                  in-memory path bit-for-bit when built from the same
                  corpus.

Scale: train is bounded (2048-row Arrow sample); assign is a
broadcast-join map with no shuffle; query cost is
n_probe/n_cells × |index| scan + a top-k window over scored
candidates.  The collected probe-cell union is ≤ n_cells ints —
driver-bounded regardless of corpus size.  Query batches are assumed
serving-sized (broadcast); for bulk query sets run the batch
`knn_ivf` shape instead.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.lakehouse import Lakehouse
from .knn import cosine
from .ivf import (
    assign_cells,
    centroid_table,
    train_centroids,
    with_ranked_cells,
)


class PersistentIVF:
    """IVF index persisted as `{schema}.{name}` (+ `…_centroids`)."""

    def __init__(
        self,
        lake: Lakehouse,
        schema: str = "gold",
        name: str = "ivf_index",
        n_cells: int = 16,
        n_probe: int = 4,
        seed: int = 42,
    ):
        self.lake = lake
        self.schema = schema
        self.name = name
        self.n_cells = n_cells
        self.n_probe = n_probe
        self.seed = seed
        self._geom_cache: dict[str, tuple[int, object]] = {}

    def _memo_geometry(self, table: str, loader):
        """Serving-path geometry cache keyed on the geometry table's
        CURRENT commit version (the twin-trainer (mtime,size) idiom
        applied to the lakehouse): a query loop pays one table read
        per index GENERATION instead of one per call, and a rebuild
        (new centroids commit) invalidates automatically.  The version
        probe is a log-file read, not a Spark job.

        `loader` receives the PROBED version and must read pinned to
        it — an unpinned read could cache data from a commit that
        landed between the probe and the read under the pre-commit
        version key, serving stale-keyed geometry until the next
        generation bump."""
        snaps = self.lake.snapshots(self.schema, table)
        if not snaps:
            # keep the pre-memo misuse signal: a descriptive
            # FileNotFoundError naming the table, not a bare
            # IndexError off snapshots()[-1]
            raise FileNotFoundError(
                f"{self.schema}.{table} has no commits — call build() "
                "before querying the index"
            )
        v = snaps[-1]["version"]
        hit = self._geom_cache.get(table)
        if hit is not None and hit[0] == v:
            return hit[1]
        val = loader(v)
        self._geom_cache[table] = (v, val)
        return val

    # -- lifecycle ---------------------------------------------------------

    def build(
        self,
        spark: SparkSession,
        embeddings: DataFrame,
        centroids: list[list[float]] | None = None,
    ) -> None:
        """Train on `embeddings` and store the full assignment,
        partitioned by cell (one commit per table).

        `centroids` freezes the quantizer externally (FAISS semantics:
        train on a sample, then build/add against the frozen geometry)
        — the path a bulk backfill split across build()+add() batches
        needs so every batch shares one quantizer regardless of which
        rows each batch holds."""
        if centroids is None:
            centroids = train_centroids(
                embeddings, n_cells=self.n_cells, seed=self.seed
            )
        assigned = assign_cells(embeddings, centroids)
        # per-file Bloom index on vec_id BEFORE the first write so
        # every index file carries a filter: point lookups (the
        # `_moved_ids` probe, delete audits) prune to the files that
        # can hold the ids instead of scanning the corpus-sized index
        import os as _os

        _os.makedirs(
            self.lake._table_dir(self.schema, self.name), exist_ok=True
        )
        self.lake.add_bloom_index(self.schema, self.name, "vec_id")
        self.lake.overwrite_partitions(
            assigned.repartition(F.col("cell")),
            self.schema,
            self.name,
            partition_col="cell",
        )
        self.lake.overwrite(
            centroid_table(spark, centroids),
            self.schema,
            f"{self.name}_centroids",
        )

    def centroids(self, spark: SparkSession) -> list[list[float]]:
        def _load(v):
            rows = (
                self.lake.read(
                    spark, self.schema, f"{self.name}_centroids",
                    version=v,
                )
                .orderBy("cell")
                .collect()
            )
            return [list(r["centroid"]) for r in rows]

        return self._memo_geometry(f"{self.name}_centroids", _load)

    def add(
        self,
        spark: SparkSession,
        embeddings: DataFrame,
        replace_existing: bool = False,
    ) -> None:
        """Append a batch assigned against the frozen quantizer (no
        retrain — FAISS add() semantics).  Appended files are not yet
        cell-clustered; run `optimize()` to restore probe pruning.

        With the default ``replace_existing=False`` the batch must be
        genuinely NEW vec_ids (a re-added id would coexist with its
        old row).  ``replace_existing=True`` makes it a true re-add:
        any existing rows with the incoming vec_ids — including ones
        whose changed embedding moves them to a different cell — are
        deleted first (deletion-vector commit, O(replaced rows)), so
        the index never holds a vec_id twice."""
        if replace_existing:
            # ids from the INPUT frame — collecting them off the
            # assigned frame would run the broadcast-centroid
            # assignment lineage twice (once for the collect, again
            # for the append)
            ids = [
                int(r[0])
                for r in embeddings.select("vec_id")
                .distinct()
                .collect()
            ]
            self.delete_vecs(spark, ids)
        assigned = assign_cells(embeddings, self.centroids(spark))
        self.lake.append(assigned, self.schema, self.name)

    def delete_vecs(
        self, spark: SparkSession, vec_ids: list[int]
    ) -> bool:
        """Remove vectors from the index (retention / GDPR erasure,
        and the primitive re-adds with changed embeddings compose
        with).  Deletion-vector (merge-on-read) commit through the
        PRUNED path: the position-finding scan routes through
        `read_where(vec_id IN …)`, so with the Bloom index `build`
        registers it opens only the files that can hold the ids —
        O(matching files) scan + O(deleted rows) write; readers
        anti-join the positions out until `optimize()` materializes
        the deletes.  Returns True iff any row matched."""
        return self.lake.delete_where(
            spark, self.schema, self.name,
            predicates=[("vec_id", "in", sorted(int(i) for i in vec_ids))],
            mode="merge_on_read",
        )

    def _moved_ids(
        self, spark: SparkSession, assigned: DataFrame
    ) -> list[int]:
        """vec_ids of incoming rows that already exist in the index in
        a DIFFERENT cell — the re-delivered-with-changed-embedding
        case the plain merge cannot fix (it only rewrites partitions
        present in the batch, so the old cell's stale row would
        survive).  Batch-bounded: the incoming (vec_id, cell) pairs
        collect (≤ batch size) and the index side reads through
        `read_where(vec_id IN …)` — the per-file Bloom index `build`
        registers prunes that probe to the files that can hold the
        batch's ids, so a serving-sized micro-batch never scans the
        corpus-sized index."""
        inc = {
            int(r["vec_id"]): int(r["new_cell"])
            for r in assigned.select(
                "vec_id", F.col("cell").cast("int").alias("new_cell")
            ).collect()
        }
        cand = self.lake.read_where(
            spark, self.schema, self.name,
            [("vec_id", "in", sorted(inc))],
        ).select("vec_id", F.col("cell").cast("int").alias("old_cell"))
        return sorted(
            {
                int(r["vec_id"])
                for r in cand.collect()
                if r["old_cell"] != inc[int(r["vec_id"])]
            }
        )

    def optimize(self, spark: SparkSession) -> dict:
        """Re-cluster the index into one file per cell partition."""
        return self.lake.compact(
            spark, self.schema, self.name, partition_col="cell"
        )

    def streaming_ingest(
        self,
        spark: SparkSession,
        stream_embeddings: DataFrame,
        checkpoint_dir: str,
        reassign_moved: bool = False,
    ):
        """Maintain the index from an embedding STREAM: each
        micro-batch assigns against the FROZEN quantizer and MERGEs by
        vec_id through `foreachBatch` (the Structured-Streaming-to-
        lakehouse bridge every sink here uses).  Exactly-once by
        idempotence — the PersistentBM25 contract: assignment is
        deterministic, so a crash-replayed micro-batch rewrites the
        same (vec_id, emb, cell) rows to the same values, where plain
        `add()` APPENDS and would double-count on replay.

        ``reassign_moved=True`` handles streams that may re-deliver a
        vector with a CHANGED embedding that moves cells: the merge
        alone only rewrites partitions present in the batch, so the
        stale row in the OLD cell would survive and the vec_id would
        answer queries twice — with the flag, each batch first deletes
        its cross-cell movers (`_moved_ids` → `delete_vecs`, a
        deletion-vector commit) and then merges.  Still idempotent
        under crash-replay: a replayed batch finds no movers (already
        deleted) and rewrites the same rows.  The default False keeps
        the per-batch cost at one merge for append-mostly streams —
        enforce upstream that re-deliveries don't change embeddings,
        or run with the flag.  AvailableNow trigger (drain-and-stop);
        run `optimize()` afterwards to restore one file per cell."""

        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            if not batch_df.isEmpty():
                assigned = assign_cells(
                    batch_df, self.centroids(spark)
                )
                if reassign_moved:
                    moved = self._moved_ids(spark, assigned)
                    if moved:
                        self.delete_vecs(spark, moved)
                self.lake.merge_into(
                    spark, self.schema, self.name, assigned,
                    key="vec_id", partition_col="cell",
                )

        return (
            stream_embeddings.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    # -- search ------------------------------------------------------------

    def query(
        self, spark: SparkSession, queries: DataFrame, k: int = 3
    ) -> DataFrame:
        """Top-k cosine neighbors for each (vec_id, embedding) query
        row.  Scans only the union of the queries' probed cells.
        Returns (query_id, neighbor_id, cosine_sim, rank) — the
        `knn_ivf` output shape."""
        centroids = self.centroids(spark)
        q = with_ranked_cells(queries, centroids, self.n_probe).select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("emb_q"),
            "probe",
        )
        probe_cells = sorted(
            r[0]
            for r in q.select(F.explode("probe").alias("c"))
            .distinct()
            .collect()
        )
        # directory-level pruning: only the probed cell= subdirs are
        # listed/planned (inputFiles() shrinks to n_probe/n_cells of
        # the index) — not a post-scan row filter
        index = self.lake.read(
            spark,
            self.schema,
            self.name,
            partition_values=[str(c) for c in probe_cells],
        )
        scored = index.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("emb").alias("emb_b"),
            F.col("cell").cast("int").alias("cell"),
        ).join(
            F.broadcast(q),
            F.array_contains(F.col("probe"), F.col("cell"))
            & (F.col("query_id") != F.col("neighbor_id")),
        ).select(
            "query_id",
            "neighbor_id",
            cosine(F.col("emb_q"), F.col("emb_b")).alias("cos"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id",
                "neighbor_id",
                F.round("cos", 4).alias("cosine_sim"),
                F.col("rank").cast("long").alias("rank"),
            )
            .orderBy("query_id", "rank")
        )


class PersistentIVFPQ:
    """IVFADC: the FAISS production composition — IVF cells for probe
    pruning × product-quantized codes for storage — as lakehouse
    tables.

    The index stores `(vec_id, cell, codes array<int>)` partitioned by
    cell and NOTHING else: at 64 float32 dims → 16 int codes this is
    the representation that makes a 100 TB embedding corpus fit the
    index tier.  Companion tables hold the frozen coarse quantizer
    (`…_centroids`) and the PQ codebooks (`…_codebooks`, one row per
    (j, c) codeword), so every later `add()` and `query()` shares
    bit-identical geometry.

    query() = rank probe cells per query (row-local) → scan ONLY the
    probed cell partitions (directory pruning, as `PersistentIVF`) →
    ADC against the codes (broadcast codebook, row-local fold) →
    per-query shortlist → optional EXACT re-rank against a full-vector
    source (the original corpus table — FAISS's refine stage; without
    it results are ADC-ordered).
    """

    def __init__(
        self,
        lake: Lakehouse,
        schema: str = "gold",
        name: str = "ivfpq_index",
        n_cells: int = 16,
        n_probe: int = 4,
        seed: int = 42,
    ):
        from . import pq as _pq

        self.lake = lake
        self.schema = schema
        self.name = name
        self.n_cells = n_cells
        self.n_probe = n_probe
        self.seed = seed
        self._pq = _pq
        self._geom_cache: dict[str, tuple[int, object]] = {}

    _memo_geometry = PersistentIVF._memo_geometry

    # -- lifecycle ---------------------------------------------------------

    def _encode(self, embeddings, centroids, books) -> DataFrame:
        # cell assignment and PQ encoding are both row-local — ONE
        # projection over the corpus, no join between the two
        assigned = assign_cells(embeddings, centroids).select(
            "vec_id", F.col("emb").alias("embedding"), "cell"
        )
        return self._pq.encode_pq(assigned, books, keep_cols=("cell",))

    def build(
        self,
        spark: SparkSession,
        embeddings: DataFrame,
        centroids: list[list[float]] | None = None,
        codebooks: list[list[list[float]]] | None = None,
    ) -> None:
        """Train (unless frozen quantizers are passed — the
        `PersistentIVF.build(centroids=...)` contract, FAISS
        train-on-sample semantics) and store codes + geometry."""
        pq = self._pq
        if centroids is None:
            centroids = train_centroids(
                embeddings, n_cells=self.n_cells, seed=self.seed
            )
        books = (
            codebooks
            if codebooks is not None
            else pq.train_pq(embeddings, seed=self.seed)
        )
        # vec_id Bloom index before the first write (see
        # PersistentIVF.build) — prunes the `_moved_ids` probe
        import os as _os

        _os.makedirs(
            self.lake._table_dir(self.schema, self.name), exist_ok=True
        )
        self.lake.add_bloom_index(self.schema, self.name, "vec_id")
        self.lake.overwrite_partitions(
            self._encode(embeddings, centroids, books).repartition(
                F.col("cell")
            ),
            self.schema,
            self.name,
            partition_col="cell",
        )
        self.lake.overwrite(
            centroid_table(spark, centroids),
            self.schema,
            f"{self.name}_centroids",
        )
        from ..sources.localrel import values_df

        self.lake.overwrite(
            values_df(
                spark,
                [
                    (j, c, [float(v) for v in cw])
                    for j, book in enumerate(books)
                    for c, cw in enumerate(book)
                ],
                "j int, c int, cw array<double>",
            ),
            self.schema,
            f"{self.name}_codebooks",
        )

    def centroids(self, spark: SparkSession) -> list[list[float]]:
        def _load(v):
            rows = (
                self.lake.read(
                    spark, self.schema, f"{self.name}_centroids",
                    version=v,
                )
                .orderBy("cell")
                .collect()
            )
            return [list(r["centroid"]) for r in rows]

        return self._memo_geometry(f"{self.name}_centroids", _load)

    def codebooks(self, spark: SparkSession) -> list[list[list[float]]]:
        def _load(v):
            rows = (
                self.lake.read(
                    spark, self.schema, f"{self.name}_codebooks",
                    version=v,
                )
                .orderBy("j", "c")
                .collect()
            )
            books: dict[int, list] = {}
            for r in rows:
                books.setdefault(r["j"], []).append(list(r["cw"]))
            return [books[j] for j in sorted(books)]

        return self._memo_geometry(f"{self.name}_codebooks", _load)

    def add(
        self,
        spark: SparkSession,
        embeddings: DataFrame,
        replace_existing: bool = False,
    ) -> None:
        """Assign + encode a batch against the FROZEN quantizers and
        append (FAISS add semantics; run optimize() to re-cluster).
        ``replace_existing=True`` deletes any existing rows with the
        incoming vec_ids first (deletion-vector commit) — the true
        re-add path for changed embeddings, including cell moves."""
        if replace_existing:
            # ids from the INPUT frame — collecting off the encoded
            # frame would pay the PQ encode (the expensive Arrow fold)
            # twice
            ids = [
                int(r[0])
                for r in embeddings.select("vec_id")
                .distinct()
                .collect()
            ]
            self.delete_vecs(spark, ids)
        encoded = self._encode(
            embeddings, self.centroids(spark), self.codebooks(spark)
        )
        self.lake.append(encoded, self.schema, self.name)

    # identical bodies over self.lake/self.schema/self.name — shared
    # with PersistentIVF the way _memo_geometry is, so a fix to the
    # Bloom-pruned probe or the id normalization can never drift
    # between the two index classes
    delete_vecs = PersistentIVF.delete_vecs
    _moved_ids = PersistentIVF._moved_ids

    def optimize(self, spark: SparkSession) -> dict:
        return self.lake.compact(
            spark, self.schema, self.name, partition_col="cell"
        )

    def streaming_ingest(
        self,
        spark: SparkSession,
        stream_embeddings: DataFrame,
        checkpoint_dir: str,
        reassign_moved: bool = False,
    ):
        """Streaming maintenance with the `PersistentIVF` contract:
        assign + PQ-encode each micro-batch against the frozen
        quantizers, MERGE by vec_id (idempotent under crash-replay,
        unlike append-based `add()`), AvailableNow drain.
        ``reassign_moved=True`` deletes each batch's cross-cell movers
        before merging (see `PersistentIVF.streaming_ingest`)."""

        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            if not batch_df.isEmpty():
                encoded = self._encode(
                    batch_df,
                    self.centroids(spark),
                    self.codebooks(spark),
                )
                if reassign_moved:
                    moved = self._moved_ids(spark, encoded)
                    if moved:
                        self.delete_vecs(spark, moved)
                self.lake.merge_into(
                    spark, self.schema, self.name, encoded,
                    key="vec_id", partition_col="cell",
                )

        return (
            stream_embeddings.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    # -- search ------------------------------------------------------------

    def query(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int = 3,
        shortlist: int | None = None,
        rerank_source: DataFrame | None = None,
    ) -> DataFrame:
        """Top-k per (vec_id, embedding) query row.

        With `rerank_source` (a (vec_id, embedding) relation — usually
        the original corpus table): ADC shortlist → exact squared-L2
        re-rank, output (query_id, neighbor_id, l2_dist, rank).
        Without: pure ADC ordering, output (query_id, neighbor_id,
        adc_dist, rank).
        """
        pq = self._pq
        shortlist = shortlist or pq.SHORTLIST
        centroids = self.centroids(spark)
        books = self.codebooks(spark)
        m = len(books)
        ksub = len(books[0])
        dsub = len(books[0][0])

        q = with_ranked_cells(queries, centroids, self.n_probe).select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("emb_q"),
            "probe",
        )
        probe_cells = sorted(
            r[0]
            for r in q.select(F.explode("probe").alias("c"))
            .distinct()
            .collect()
        )
        index = self.lake.read(
            spark,
            self.schema,
            self.name,
            partition_values=[str(c) for c in probe_cells],
        ).select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("cell").cast("int").alias("cell"),
            "codes",
        )
        eq = F.col("emb_q")
        adc = F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.lit(0.0),
            lambda acc, j: acc
            + pq._sub_l2(
                F.slice(eq, j * dsub + 1, dsub),
                F.col("cbs")[j * ksub + F.col("codes")[j]],
            ),
        )
        scored = (
            index.join(
                F.broadcast(pq._flat_codebook_row(spark, books))
            )
            .join(
                F.broadcast(q),
                F.array_contains(F.col("probe"), F.col("cell"))
                & (F.col("query_id") != F.col("neighbor_id")),
            )
            .select("query_id", "neighbor_id", adc.alias("adc"))
        )
        w_adc = Window.partitionBy("query_id").orderBy(
            F.col("adc").asc(), F.col("neighbor_id").asc()
        )
        if rerank_source is None:
            return (
                scored.withColumn("rank", F.row_number().over(w_adc))
                .filter(F.col("rank") <= k)
                .select(
                    "query_id",
                    "neighbor_id",
                    F.round("adc", 4).alias("adc_dist"),
                    F.col("rank").cast("long").alias("rank"),
                )
                .orderBy("query_id", "rank")
            )
        short = (
            scored.withColumn("srank", F.row_number().over(w_adc))
            .filter(F.col("srank") <= shortlist)
            .select("query_id", "neighbor_id")
        )
        from .knn import _as_double

        full = rerank_source.select(
            F.col("vec_id").alias("neighbor_id"),
            _as_double(F.col("embedding")).alias("emb_b"),
        )
        rer = (
            full.join(F.broadcast(short), "neighbor_id")
            .join(
                F.broadcast(q.select("query_id", "emb_q")), "query_id"
            )
            .select(
                "query_id",
                "neighbor_id",
                pq._sub_l2(F.col("emb_q"), F.col("emb_b")).alias("l2"),
            )
        )
        w_l2 = Window.partitionBy("query_id").orderBy(
            F.col("l2").asc(), F.col("neighbor_id").asc()
        )
        return (
            rer.withColumn("rank", F.row_number().over(w_l2))
            .filter(F.col("rank") <= k)
            .select(
                "query_id",
                "neighbor_id",
                F.round("l2", 4).alias("l2_dist"),
                F.col("rank").cast("long").alias("rank"),
            )
            .orderBy("query_id", "rank")
        )
