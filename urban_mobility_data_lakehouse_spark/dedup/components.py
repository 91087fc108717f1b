"""Connected components over a pair graph — duplicate-cluster closure.

Near-dup detection (minhash/simhash) emits PAIRS; production dedup
needs CLUSTERS: if A~B and B~C, exactly one of {A,B,C} survives, so the
pairs must be closed transitively.  The reference has no graph step at
all; a one-hop canonical-id map (simhash.dedup_map) under-merges
chained duplicates.

Algorithm: deterministic min-label propagation with pointer jumping —
the classic PRAM/MapReduce connected-components scheme (the same family
as Kiveris et al.'s small-star/large-star):

  1. every node starts labeled with itself;
  2. each round, a node takes the min of its own and its neighbors'
     labels (one shuffle on the edge key);
  3. then labels point-jump: label ← label(label) (one self-join),
     halving chain lengths so convergence is O(log diameter) rounds,
     not O(diameter);
  4. stop when a round changes nothing.

Every step is a DataFrame join/groupBy — per-round cost is O(|E|)
shuffled work with no per-node neighbor materialization (no
collect_list), so a 100-billion-edge graph is just more partitions.
The iteration count is a driver-side loop with a scalar convergence
check per round (bounded `.count()`, the standard iterative-algorithm
shape).

Lineage MUST be truncated every round (eager `localCheckpoint`): the
pointer-jump self-join references the round's frame twice, so without
truncation the logical plan DOUBLES per round and Catalyst re-analysis
goes exponential (measured: round 4 alone costs 86 s on 256 edges;
with per-round checkpoints every round is a flat ~0.5 s).  On a real
cluster substitute reliable checkpointing (`spark.sparkContext.
setCheckpointDir` + `checkpoint()`) for fault tolerance across a
long-running job — the GraphFrames convention.

Truncating the PLAN is not enough: `Dataset.localCheckpoint` copies
the origin plan's ESTIMATED statistics onto the checkpointed leaf, so
round N's leaf sizeInBytes is round N-1's join-product estimate —
the estimates compound multiplicatively round over round into
BigIntegers of millions of bits, and Catalyst's size-only stats visitor
ends up doing Toom-Cook bignum multiplication on the driver (measured:
round 8 costs 14 s, round 9 costs 112 s, on 150 edges).  `_reset_stats`
rebuilds the frame from the checkpointed internal RDD, whose leaf gets
the constant default size estimate — rounds stay flat.

The final label of every node is the MINIMUM node id of its component
(min-propagation invariant) — a deterministic, join-backable canonical
representative.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _checkpointed(df: DataFrame) -> DataFrame:
    """Mark `df` for checkpoint and return a frame whose plan AND
    stats are fresh.  localCheckpoint alone truncates the plan but
    carries the origin's estimated stats onto the new leaf — fatal in
    a loop (see module docstring).  Lazy (eager=False): the caller's
    next action materializes the blocks, so each round costs ONE job,
    not a checkpoint job plus an action.  Falls back to the plain
    checkpoint if the internal rebuild API ever moves."""
    cp = df.localCheckpoint(eager=False)
    try:
        jdf = cp._jdf
        spark = df.sparkSession
        fresh = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return DataFrame(fresh, spark)
    except Exception:
        return cp


def _jump(labels: DataFrame) -> DataFrame:
    """label ← label(label); labels are always node ids, so the
    lookup self-join is total."""
    return (
        labels.alias("x")
        .join(
            labels.select(
                F.col("node").alias("label"),
                F.col("label").alias("label2"),
            ),
            "label",
        )
        .select("node", F.col("label2").alias("label"))
    )


def _driver_components_rows(pairs, node_type, spark) -> DataFrame:
    """Union-find over a collected (bounded!) edge list — identical
    output contract to the distributed loop: component = min node id.
    Path-compressed, rank-free (depth is irrelevant at these sizes);
    deterministic regardless of edge order because the final label is
    the component MINIMUM, not the union order's root.  Self-loops are
    skipped entirely (a node appearing only as (x, x) is absent), and
    duplicate/directed pairs are harmless — matching the distributed
    loop's undirect+dedup+deloop preprocessing without paying for it."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # compress
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict = {}
    for node in list(parent):
        r = find(node)
        m = comp_min.get(r)
        if m is None or node < m:
            comp_min[r] = node
    out = [(n, comp_min[find(n)]) for n in parent]
    from pyspark.sql.types import StructField, StructType

    from ..sources.localrel import values_df

    schema = StructType(
        [StructField("node", node_type), StructField("component", node_type)]
    )
    # values_df: the |dup-population|-bounded result feeds a union that
    # would otherwise drag a 32-slice Python-RDD scan into every
    # consumer's stage (sources/localrel.py; falls back to
    # createDataFrame past 50k rows)
    return values_df(spark, out, schema)


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """(node, component) for every node appearing in `edges`;
    `component` is the min node id of the connected component.
    Raises if `max_iter` rounds don't converge (each round is one
    neighbor-min step + two pointer jumps, so that needs a component
    diameter beyond ~4^max_iter).

    Hybrid execution: the duplicate-pair graph is normally MUCH
    smaller than the corpus (bounded by the duplicate population), so
    when the raw pair count is ≤ `driver_threshold` the closure runs
    as driver-side union-find on the collected pairs — ONE limit+
    collect job total (no undirect/distinct/count jobs; union-find is
    symmetric and duplicate-tolerant), bit-identical output (same
    min-of-component labels; locked by test).  Above the threshold —
    or with `driver_threshold=0` — the O(log diameter) distributed
    loop runs; that is the 100 TB path.

    The FIRST gate deliberately counts RAW pairs (duplicates and
    directed twins included), NOT unique undirected edges: a pre-gate
    `distinct()` would cost a full shuffle of the edge list on every
    call just to sometimes pick the cheaper path, which inverts the
    shortcut's whole point.  The gate's CHOICE is deterministic —
    `limit(n+1)` returns min(n+1, total) rows, and only that SIZE
    decides the path; row content/order varies run-to-run but feeds a
    union-find whose output is order-independent (min-of-component).

    A duplicate-heavy edge list whose UNIQUE edges would fit the
    driver gets a SECOND gate: when raw pairs exceed the threshold,
    the distributed path must materialize the distinct undirected
    edge frame anyway (its loop input), so one extra bounded
    limit+collect over that already-checkpointed frame decides — at
    ≤ 2·threshold directed-distinct rows the closure still runs as
    driver union-find (e.g. a crawl batch re-emitting the same few
    pairs millions of times).  Cost on the genuinely-large path: one
    bounded collect over a frame the loop needed regardless.  Output
    is bit-identical on every path (locked by test_components.py's
    equivalence tests); callers that need a pinned PLAN pass
    `driver_threshold` far from their edge count (or 0)."""
    e_raw = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if driver_threshold:
        # small-graph shortcut: ONE limit+collect job decides the path
        # AND feeds the union-find — no checkpoint/distinct/count jobs
        # spent on a graph that fits the driver.  Union-find is
        # symmetric and idempotent, so raw (possibly duplicated,
        # directed) pairs need no undirection/dedup first.
        sample = e_raw.limit(driver_threshold + 1).collect()
        if len(sample) <= driver_threshold:
            return _driver_components_rows(
                [(r["a"], r["b"]) for r in sample],
                e_raw.schema["a"].dataType,
                e_raw.sparkSession,
            )
    e = _checkpointed(
        e_raw.unionByName(
            e_raw.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    if driver_threshold:
        # second gate (duplicate-heavy lists): `e` holds each unique
        # undirected edge twice (both directions), so ≤ 2·threshold
        # rows means the unique edges fit the driver — and `e` is
        # already checkpointed for the loop, making this collect
        # bounded and cheap on either outcome.
        dedup_sample = e.limit(2 * driver_threshold + 1).collect()
        if len(dedup_sample) <= 2 * driver_threshold:
            return _driver_components_rows(
                [(r["a"], r["b"]) for r in dedup_sample],
                e_raw.schema["a"].dataType,
                e_raw.sparkSession,
            )
    # no checkpoint needed: a two-node plan over the checkpointed edges
    labels = (
        e.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iter):
        nbr_min = (
            e.join(
                labels.select(
                    F.col("node").alias("b"),
                    F.col("label").alias("nbr_label"),
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nbr_label").alias("nbr_min"))
            .select(F.col("a").alias("node"), "nbr_min")
        )
        stepped = labels.join(nbr_min, "node", "left").select(
            "node",
            F.least(
                F.col("label"), F.coalesce("nbr_min", F.col("label"))
            ).alias("label"),
        )
        # two jumps per round: one extra self-join inside the same job
        # is far cheaper than an extra round's full cycle
        jumped = _checkpointed(_jump(_jump(stepped)))
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = jumped
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components: no fixpoint in {max_iter} rounds "
        "(component diameter beyond ~4^max_iter?)"
    )


def duplicate_clusters(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """(doc_id, cluster_id) for every doc in a near-dup pair; the
    cluster id is the min doc id of the transitive closure — the doc
    to KEEP under keep-smallest-id dedup.  Singletons (docs in no
    pair) are absent: downstream keeps them unconditionally, so the
    map stays bounded by the duplicate population, not the corpus."""
    return connected_components(pairs, src, dst).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def dedup_corpus(
    documents: DataFrame, id_col: str = "doc_id", threshold: float = 0.5
) -> DataFrame:
    """Keep-one-per-cluster corpus filter — the end-to-end shape a
    training-data pipeline runs: MinHash/LSH pair detection →
    transitive cluster closure → drop every member except the cluster
    minimum.  Output = the input minus non-canonical near-duplicates;
    singletons pass through untouched (they never enter the pair
    graph, so the graph work is bounded by the duplicate population)."""
    from . import minhash

    pairs = minhash.near_duplicates(documents, threshold)
    losers = (
        duplicate_clusters(pairs)
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .select(F.col("doc_id").alias(id_col))
    )
    return documents.join(losers, [id_col], "left_anti")
