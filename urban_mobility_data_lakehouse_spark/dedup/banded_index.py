"""Generic incremental near-duplicate index engine.

One engine, four modalities: the text (MinHash), image (pHash), audio
(Haitsma–Kalker fingerprint), and embedding (hyperplane-LSH)
incremental indexes all share the same sign → band-probe → verify →
idempotent-commit skeleton; this class owns that skeleton once and the
modality adapters supply only the three hooks that differ:

    _sign(batch)            row-local signing of the NEW batch only:
                            (id_col, *state columns persisted per item)
    _band(signed, id_alias) banding for the LSH probe:
                            (id_alias, band, key) — the equi-join key
    _verify(joined)         exact verification + output shaping; sees
                            (idx_a, idx_b, <state>_a..., <state>_b...)

The shared engine guarantees, identically for every modality:

* **Batch-proportional cost.** Only the new batch is signed; the probe
  equi-joins the batch's bands against index ∪ batch (AQE broadcasts
  the batch side when small → the index is scanned, never shuffled).
* **Exactness.** Ingesting batches B₁…Bₖ in any split and unioning the
  returned pair frames yields EXACTLY the full-corpus recompute —
  every qualifying pair emitted once, by the batch where its LATER
  item arrived (probe side = new items only, so settled old-old pairs
  can never re-emit).  A re-ingested item REPLACES its indexed copy
  before probing (otherwise a crash-retry would pair every batch item
  with its own stale twin).
* **Idempotent commits.** Index rows AND the emitted pairs are both
  written as partition overwrites keyed by batch id — replaying a
  batch rewrites its own slices instead of appending duplicates, so
  any crash-retry converges (exactly-once under `foreachBatch`).

Reference scope note: the reference engine has no dedup surface at all
(beyond-reference, per BASELINE.json); the incremental shape mirrors
its daily partition-upsert pattern (mobility_ingestion_pipeline.py's
day loop) applied to the dedup problem.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.lakehouse import Lakehouse

BATCH_COL = "ingest_batch"


class BandedDupIndex:
    """Persistent banded near-dup index over a Lakehouse table.

    Subclasses set `id_col` / `pair_prefix` and implement the three
    modality hooks (`_sign`, `_band`, `_verify`).
    """

    #: name of the item-id column produced by `_sign`
    id_col: str = "doc_id"
    #: emitted pair columns are f"{pair_prefix}_a" / f"{pair_prefix}_b"
    pair_prefix: str = "doc"

    def __init__(
        self,
        lake: Lakehouse,
        schema: str = "gold",
        name: str = "dup_index",
    ):
        self.lake = lake
        self.schema = schema
        self.name = name

    # -- modality hooks ------------------------------------------------

    def _sign(self, batch: DataFrame) -> DataFrame:
        """(id_col, *state) for the batch — must be row-local."""
        raise NotImplementedError

    def _band(self, signed: DataFrame, id_alias: str) -> DataFrame:
        """(id_alias, band, key) rows for the LSH probe equi-join."""
        raise NotImplementedError

    def _verify(self, joined: DataFrame) -> DataFrame:
        """Exact verify + output columns.  `joined` carries the pair
        ids plus every state column twice, suffixed `_a` (lower id)
        and `_b` (higher id)."""
        raise NotImplementedError

    # -- index state ---------------------------------------------------

    def _existing(self, spark: SparkSession) -> DataFrame | None:
        try:
            return self.lake.read(spark, self.schema, self.name)
        except FileNotFoundError:
            return None  # first batch bootstraps the table

    def state(self, spark: SparkSession) -> DataFrame:
        """The index as (id, *state, ingest_batch) — versioned and
        time-travelable like any lakehouse table."""
        df = self._existing(spark)
        if df is None:
            raise FileNotFoundError(
                f"{self.schema}.{self.name}: no batches ingested yet"
            )
        return df

    # -- ingest ----------------------------------------------------------

    def ingest(
        self,
        spark: SparkSession,
        batch: DataFrame,
        batch_id: str,
    ) -> DataFrame:
        """Detect near-dups of `batch` against the corpus-so-far plus
        the batch itself, then commit the batch's state as a partition
        overwrite keyed by batch id.  Returns the verified pair frame
        (exactly the rows the full-corpus batch path would emit for
        these pairs); its scan set is frozen BEFORE the commit, so
        collecting it after ingest() returns does not double-read."""
        # localCheckpoint: GC-cleaned, unlike a CacheManager entry
        new = self._sign(batch).localCheckpoint(eager=False)
        state_cols = [c for c in new.columns if c != self.id_col]
        existing = self._existing(spark)
        if existing is None:
            corpus = new.select(self.id_col, *state_cols)
        else:
            # a re-ingested item REPLACES its indexed copy
            corpus = new.select(self.id_col, *state_cols).unionByName(
                existing.select(self.id_col, *state_cols).join(
                    new.select(self.id_col), self.id_col, "left_anti"
                )
            )

        ida = f"{self.pair_prefix}_a"
        idb = f"{self.pair_prefix}_b"
        probe = self._band(new, "probe_id")
        target = self._band(corpus, "target_id")
        cand = (
            probe.join(target, ["band", "key"])
            .filter(F.col("probe_id") != F.col("target_id"))
            .select(
                F.least("probe_id", "target_id").alias(ida),
                F.greatest("probe_id", "target_id").alias(idb),
            )
            .distinct()
        )

        a = corpus.select(
            F.col(self.id_col).alias(ida),
            *[F.col(c).alias(f"{c}_a") for c in state_cols],
        )
        b = corpus.select(
            F.col(self.id_col).alias(idb),
            *[F.col(c).alias(f"{c}_b") for c in state_cols],
        )
        pairs = self._verify(cand.join(a, ida).join(b, idb)).orderBy(
            ida, idb
        )

        self.lake.overwrite_partitions(
            new.withColumn(BATCH_COL, F.lit(str(batch_id))),
            self.schema,
            self.name,
            partition_col=BATCH_COL,
        )
        return pairs

    # -- persisted pair log + streaming ingest -------------------------

    def ingest_and_log(
        self, spark: SparkSession, batch: DataFrame, batch_id: str
    ) -> None:
        """`ingest`, then persist the emitted pairs to a companion
        `<name>_pairs` table — ALSO partitioned by batch id, so a
        replayed batch rewrites its own pair slice instead of
        appending duplicates.  Index commit and pair commit are two
        idempotent writes keyed by the same batch id: any crash-retry
        converges."""
        pairs = self.ingest(spark, batch, batch_id)
        self.lake.overwrite_partitions(
            pairs.withColumn(BATCH_COL, F.lit(str(batch_id))),
            self.schema,
            f"{self.name}_pairs",
            partition_col=BATCH_COL,
        )

    def pairs(self, spark: SparkSession) -> DataFrame:
        """Every near-dup pair ever emitted (plus ingest_batch) — by
        the exactness contract, equal to a full-corpus recompute over
        everything ingested."""
        return self.lake.read(spark, self.schema, f"{self.name}_pairs")

    def streaming_ingest(
        self,
        spark: SparkSession,
        stream: DataFrame,
        checkpoint_dir: str,
    ):
        """Deduplicate a STREAM against all history: each micro-batch
        becomes one index batch (`foreachBatch`, the standard
        Structured-Streaming-to-lakehouse bridge).  Exactly-once
        composition: the checkpoint makes batch ids stable across
        restarts and both writes are idempotent per batch id — a
        replayed micro-batch overwrites its own partitions.  Detected
        pairs are PERSISTED to the `<name>_pairs` table per batch
        (`ingest_and_log`) — never silently dropped.  Returns the
        started query (AvailableNow trigger: drain-and-stop, the
        daily-ingest shape)."""

        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            self.ingest_and_log(spark, batch_df, batch_id=f"mb{batch_id}")

        return (
            stream.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
