"""Mergeable HLL distinct-count sketches as first-class table columns.

The 100 TB pattern: COUNT(DISTINCT user) over a month of raw events is
a full rescan + giant shuffle every time someone asks.  Instead, each
ingest batch reduces its slice to one Apache DataSketches HllSketch
binary per (day, dimension) group — Spark's `hll_sketch_agg` is a real
declarative aggregate, so the reduction happens map-side before any
shuffle — and the sketch TABLE (thousands of rows, not billions) is
what rollups read.  Any later question ("distinct users per
event_type across an arbitrary day range") is `hll_union_agg` +
`hll_sketch_estimate` over the sketch rows: seconds, no raw-data scan,
and the union lattice is associative/commutative so incremental daily
builds give byte-for-byte the same register state as a one-shot build.

The reference's only distinct-count surface is exact/approx
COUNT(DISTINCT) inside queries (SURVEY.md §2 A3,
notebooks/1_sprint3_schema_reprototyping.ipynb cell 53's orphan
checks); persistable, mergeable sketch columns are the beyond-reference
scale path (same engine family as Delta Lake + DataSketches rollups).

Estimates carry HLL's standard error (~1.04/sqrt(2^lg_k): ~1.6% at
lg_k=12); tests pin a 5% envelope against exact counts AND exact
equality between incremental and one-shot sketch estimates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from ..sources.lakehouse import Lakehouse

#: DataSketches lgConfigK — 2^12 registers, ~1.6% relative standard error.
DEFAULT_LG_K = 12


def daily_user_sketches(
    events: DataFrame, lg_k: int = DEFAULT_LG_K
) -> DataFrame:
    """Reduce raw events to one HLL sketch per (day, event_type).

    Output: (day, event_type, users_hll BINARY, n_events) — the compact
    rollup row an ingest batch commits instead of re-exposing raw user
    ids.  `hll_sketch_agg` partial-aggregates map-side, so the shuffle
    carries sketches (≤ ~2.5 KiB each at lg_k=12), never user ids.
    """
    return events.groupBy(
        F.to_date("ts").cast("string").alias("day"),
        "event_type",
    ).agg(
        F.hll_sketch_agg(F.col("user_id"), F.lit(lg_k)).alias("users_hll"),
        F.count(F.lit(1)).alias("n_events"),
    )


def estimate_distinct(
    sketches: DataFrame,
    by: tuple[str, ...] = ("event_type",),
    sketch_col: str = "users_hll",
) -> DataFrame:
    """Roll sketch rows up to `by` and estimate distinct counts.

    Pure sketch arithmetic: `hll_union_agg` merges register states,
    `hll_sketch_estimate` reads the estimate — no raw-data scan, and
    dropping a grouping column is just a coarser union (the estimates
    stay consistent because the union lattice is idempotent: a user
    counted in two days is one user after the merge).
    """
    grouped = (
        sketches.groupBy(*by) if by else sketches.groupBy(F.lit(1).alias("_g"))
    )
    out = grouped.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col))
        ).alias("approx_distinct"),
        F.sum("n_events").alias("n_events"),
    )
    if not by:
        out = out.drop("_g")
    return out.orderBy(*by) if by else out


class SketchRollup:
    """Lakehouse-persisted sketch table with day-partitioned builds.

    `build_day` commits one day's sketch rows as an idempotent
    partition overwrite (re-running an ingest day replaces exactly that
    day's sketches — the same upsert contract as the fact table it
    summarizes), so the sketch table inherits time travel, CDC, and
    concurrent disjoint-day writers from the lakehouse for free.
    """

    def __init__(
        self,
        lake: Lakehouse,
        schema: str = "gold",
        name: str = "daily_user_sketches",
        lg_k: int = DEFAULT_LG_K,
    ) -> None:
        self.lake = lake
        self.schema = schema
        self.name = name
        self.lg_k = lg_k
        lake.create_schemas(schema)

    def build_day(self, spark: SparkSession, events: DataFrame, day: str) -> None:
        """Sketch ONE day's events and upsert its partition."""
        rows = daily_user_sketches(
            events.filter(F.to_date("ts") == F.lit(day)), self.lg_k
        )
        self.lake.overwrite_partitions(
            rows, self.schema, self.name, partition_col="day"
        )

    def build_all(self, spark: SparkSession, events: DataFrame) -> None:
        """One-shot build over every day present in `events`."""
        self.lake.overwrite_partitions(
            daily_user_sketches(events, self.lg_k),
            self.schema,
            self.name,
            partition_col="day",
        )

    def estimate(
        self, spark: SparkSession, by: tuple[str, ...] = ("event_type",)
    ) -> DataFrame:
        """Distinct-user estimates rolled up from the persisted table."""
        return estimate_distinct(
            self.lake.read(spark, self.schema, self.name), by=by
        )

    def ingest_stream(self, events_stream: DataFrame, checkpoint_dir: str):
        """Maintain the sketch table from a stream, exactly-once.

        Each micro-batch reduces to its own sketch FRAGMENT rows and
        appends them — no read-modify-write, no state store.  That is
        sound because HLL registers are a max-lattice: the union of
        per-fragment sketches has byte-identical register state to a
        one-shot sketch of all the data, so `estimate` over fragments
        equals the batch answer EXACTLY (locked by test).  Appends are
        deduplicated at the table by (stream_source, batch_id) — the
        `stream_to_table` exactly-once contract — so replays after
        checkpoint loss add nothing.
        """
        from ..streaming.daily import stream_to_table

        return stream_to_table(
            events_stream,
            self.lake,
            self.schema,
            self.name,
            checkpoint_dir,
            stream_id=f"sketch:{self.schema}.{self.name}",
            transform=lambda bdf: daily_user_sketches(bdf, self.lg_k),
        )


# -- Count-min sketch: mergeable frequency counters -------------------------
#
# The frequency twin of the HLL story above: "how often does this
# token / user / URL appear?" over 100 TB without keeping a counter per
# key.  A CMS is depth×width integer counters; every occurrence
# increments one counter per row (pos = hash_r(key) % width), and the
# estimate for a key is the MIN over rows of its counters —
# an overestimate by at most εN (ε ≈ e/width) with probability
# 1-δ (δ ≈ e^-depth) (Cormode & Muthukrishnan 2005).
#
# Spark-first representation: the sketch is a SPARSE RELATION
# (group…, r, pos, cnt) with ≤ depth×width rows per group — built by
# ONE explode + groupBy-count (map-side combined), merged by
# groupBy-SUM (exact integer arithmetic: incremental builds equal
# one-shot builds row-for-row, the same lattice property the HLL tests
# pin), and probed by a broadcast join.  Hash positions use the
# portable md5-31bit idiom, so the whole pipeline is engine-portable.

CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_pos(key: Column, r: int, width: int) -> Column:
    """Row-r counter position for a key: portable md5-31bit % width
    (bit-compatible with `cms_pos_py`)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{r}:"), key.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return (h % width).cast("int")


def cms_pos_py(value, r: int, width: int) -> int:
    import hashlib

    return (
        int(hashlib.md5(f"{r}:{value}".encode()).hexdigest()[:15], 16)
        % width
    )


def cms_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: tuple[str, ...] = (),
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Reduce `df` to a sparse CMS per group: (group…, r, pos, cnt).

    One explode (each occurrence → depth (r, pos) pairs) + one counted
    groupBy; the shuffle carries ≤ depth×width counter rows per group
    no matter how many input rows contributed.  NULL keys are skipped
    (count them separately if they matter).
    """
    key = F.col(key_col)
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"), _cms_pos(key, r, width).alias("pos")
            )
            for r in range(depth)
        ]
    )
    return (
        df.filter(key.isNotNull())
        .select(*group_cols, F.explode(pairs).alias("rp"))
        .groupBy(*group_cols, F.col("rp.r").alias("r"),
                 F.col("rp.pos").alias("pos"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(
    *sketches: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Union sketch relations and re-sum counters — exact integer
    merge, so incremental per-batch sketches equal a one-shot build."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "r", "pos").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    group_cols: tuple[str, ...] = (),
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Estimated count per (group…, key): min over rows of the probed
    counters.  `keys` is the candidate relation (CMS answers point
    queries; candidates come from the domain — e.g. a vocab top-k, a
    watchlist, the current batch's distinct keys).  A (r, pos) the
    sketch never touched means 0 hits in that row → estimate 0.
    """
    key = F.col(key_col)
    probes = keys.filter(key.isNotNull()).select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cms_pos(key, r, width).alias("pos"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rp"),
    ).select(key_col, F.col("rp.r").alias("r"), F.col("rp.pos").alias("pos"))
    joined = probes.join(
        sketch, on=[*group_cols, "r", "pos"], how="left"
    ) if not group_cols else probes.crossJoin(
        sketch.select(*group_cols).distinct()
    ).join(sketch, on=[*group_cols, "r", "pos"], how="left")
    return (
        joined.groupBy(*group_cols, key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
        .orderBy(*group_cols, key_col)
    )


def heavy_hitters(
    sketch: DataFrame,
    candidates: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Candidate keys whose estimated count ≥ threshold.  CMS never
    underestimates, so NO true heavy hitter is missed (one-sided
    error: light keys can sneak in, ≥-threshold keys cannot escape)."""
    return cms_estimate(
        sketch, candidates, key_col, depth=depth, width=width
    ).filter(F.col("est") >= threshold)


class CMSTable:
    """Lakehouse-persisted CMS maintained from batches or a stream.

    The stored table is a pile of per-batch counter FRAGMENTS
    (r, pos, cnt): appends never read-modify-write, and because the
    merge is plain integer addition (`cms_merge`), summing fragments
    at query time equals a one-shot sketch of all the data exactly —
    the counter-lattice twin of the HLL register-lattice argument
    above.  Streaming ingest goes through the exactly-once
    `stream_to_table` sink, so replays after checkpoint loss add no
    counts.
    """

    def __init__(
        self,
        lake: Lakehouse,
        key_col: str,
        schema: str = "gold",
        name: str = "cms_counts",
        depth: int = CMS_DEPTH,
        width: int = CMS_WIDTH,
    ) -> None:
        self.lake = lake
        self.key_col = key_col
        self.schema = schema
        self.name = name
        self.depth = depth
        self.width = width
        lake.create_schemas(schema)

    def _fragment(self, df: DataFrame) -> DataFrame:
        return cms_sketch(
            df, self.key_col, depth=self.depth, width=self.width
        )

    def build(self, spark: SparkSession, df: DataFrame) -> None:
        self.lake.overwrite(self._fragment(df), self.schema, self.name)

    def ingest_batch(self, df: DataFrame) -> None:
        """Append one batch's counter fragment (idempotence is the
        caller's concern here; streams get it from the sink)."""
        self.lake.append(self._fragment(df), self.schema, self.name)

    def ingest_stream(self, stream: DataFrame, checkpoint_dir: str):
        from ..streaming.daily import stream_to_table

        return stream_to_table(
            stream,
            self.lake,
            self.schema,
            self.name,
            checkpoint_dir,
            stream_id=f"cms:{self.schema}.{self.name}",
            transform=self._fragment,
        )

    def sketch(self, spark: SparkSession) -> DataFrame:
        """Fragments merged to one counter per (r, pos)."""
        return cms_merge(self.lake.read(spark, self.schema, self.name))

    def estimate(self, spark: SparkSession, keys: DataFrame) -> DataFrame:
        return cms_estimate(
            self.sketch(spark),
            keys,
            self.key_col,
            depth=self.depth,
            width=self.width,
        )


# -- Mergeable histograms: quantiles without a global sort ------------------
#
# The third sketch of the family (HLL = distinct, CMS = frequency,
# histogram = quantiles/distribution).  `approx_percentile` answers a
# one-shot query; a persisted histogram RELATION (group…, bin, cnt)
# answers every later quantile/CDF question by integer addition —
# mergeable across batches/days exactly like the CMS counters, so
# incremental builds equal one-shot builds row-for-row.
#
# Binning is INTEGER division (`value div bin_width`) on an
# integer-quantized value (tokens, cents, milliseconds — quantize
# first; that is what production metric pipelines store anyway).  The
# estimate error is bounded by bin_width by construction, and because
# every step is exact integer arithmetic the whole pipeline —
# build, merge, cumulative quantile walk — replays bit-for-bit in any
# engine (DuckDB-oracle-checkable, unlike log-binned DDSketch whose
# floor(log(v)) bucket edges are 1-ulp-fragile across engines).

def hist_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    bin_width: int = 10,
) -> DataFrame:
    """(group…, bin, cnt) with bin = value div bin_width (floor
    division, exact).  NULLs are skipped; negative values land in
    negative bins (floor semantics)."""
    v = F.col(value_col)
    bin_ = F.floor(v / F.lit(bin_width)).cast("long")
    return (
        df.filter(v.isNotNull())
        .groupBy(*group_cols, bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(
    *hists: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    return out.groupBy(*group_cols, "bin").agg(F.sum("cnt").alias("cnt"))


def hist_quantile(
    hist: DataFrame,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    group_cols: tuple[str, ...] = (),
    bin_width: int = 10,
) -> DataFrame:
    """Quantile estimates from the histogram: for each q, the upper
    edge of the first bin whose cumulative count reaches ceil(q·N) —
    a deterministic integer rule (no interpolation, no floats except
    the q literal), off from the exact quantile by < bin_width.

    Output (group…, q, est) with est = (bin + 1) * bin_width - 1
    (the largest value the winning bin can hold).

    ceil(q·N) is computed as EXACT integer arithmetic — q is converted
    to a fraction and the rank is (num·N + den − 1) div den — because
    the float route is engine-fragile: double 0.9·500 is
    450.00000000000006, whose ceil is 451, while decimal engines (and
    mathematics) say 450.
    """
    from fractions import Fraction

    w = (
        Window.partitionBy(*group_cols)
        if group_cols
        else Window.partitionBy(F.lit(1))
    )
    cum = hist.select(
        *group_cols,
        "bin",
        F.sum("cnt").over(w.orderBy("bin")).alias("cum"),
        F.sum("cnt").over(w).alias("total"),
    )
    frames = []
    for q in qs:
        frac = Fraction(q).limit_denominator(1_000_000)
        need = F.expr(
            f"({frac.numerator} * total + {frac.denominator - 1}) "
            f"div {frac.denominator}"
        )
        frames.append(
            cum.filter(F.col("cum") >= need)
            .groupBy(*group_cols, "total")
            .agg(F.min("bin").alias("bin"))
            .select(
                *group_cols,
                F.lit(q).alias("q"),
                ((F.col("bin") + 1) * bin_width - 1).alias("est"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy(*group_cols, "q")
