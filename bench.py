#!/usr/bin/env python3
"""Headline benchmark: runs the bench-flagged registry queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Timing = full query wall time including the collect of the (small)
result — the reference's notebook timings measure the same thing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from urban_mobility_data_lakehouse_spark.queries import bench_queries
from urban_mobility_data_lakehouse_spark.session import get_spark


# Pinned result cardinalities per scale factor: a bench that silently
# times a wrong-rowcount query would hide a correctness break behind a
# throughput number.  Mismatches are reported in the JSON (and stderr),
# not fatal — the oracle gate owns correctness; this is a tripwire.
EXPECTED_ROWS: dict[float, dict[str, int]] = {
    0.01: {  # the fast-smoke dir (SPARK_GRAFT_SF_DIR=.../sf0.01)
        "ann_suite": 81,
        "asof_join_clicks": 2006,
        "bucketed_fact_join": 5,
        "doc_profile": 500,
        "gravity_gaps": 625,
        "hourly_demand": 720,
        "knn_ivf": 30,
        "near_dup_pairs": 572,
        "pricing_summary": 6,
        "roleplay_nations": 625,
        "running_totals": 10000,
        "sales_by_nation": 25,
        "salted_agg": 5,
        "sessionize_events": 9549,
        "silver_batch_audit": 1,
        "simhash_candidates": 186,
        "typical_day_clusters": 144,
    },
    0.1: {
        "ann_suite": 90,
        "asof_join_clicks": 19863,
        "bucketed_fact_join": 5,
        "doc_profile": 5000,
        "gravity_gaps": 625,
        "hourly_demand": 720,
        "knn_ivf": 30,
        "near_dup_pairs": 5733,
        "pricing_summary": 6,
        "roleplay_nations": 625,
        "running_totals": 100000,
        "sales_by_nation": 25,
        "salted_agg": 5,
        "sessionize_events": 95465,
        "silver_batch_audit": 1,
        "simhash_candidates": 2508,
        "typical_day_clusters": 144,
    },
}


def _total_busy_jiffies() -> int:
    """System-wide busy jiffies from /proc/stat (everything but
    idle+iowait)."""
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    return sum(vals) - vals[3] - vals[4]


def _tree_busy_jiffies() -> int:
    """utime+stime jiffies of THIS process and every live descendant
    (the Spark JVM and its Python/Arrow workers).  Subtracting the
    tree's delta from the system's delta isolates AMBIENT load — the
    1-min load_avg cannot: a 32-thread bench inflates it all by
    itself, so gating on load_avg flags a quiet box as contaminated
    the moment the bench works hard (observed: 32/34 reps flagged
    with zero external load).

    cutime/cstime are INCLUDED for tree members: a Python/Arrow worker
    reaped mid-rep moves its lifetime CPU into its parent's child
    counters — without them that work would vanish from the tree delta
    and reappear as phantom 'ambient' load, falsely flagging the rep.
    (A live child is counted once via its own entry — its parent's
    child counters only absorb it at reap time, so deltas never
    double-count.)"""
    procs: dict[int, tuple[int, int]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                s = f.read()
        except OSError:
            continue
        rest = s[s.rindex(")") + 2:].split()
        procs[int(d)] = (
            int(rest[1]),
            int(rest[11]) + int(rest[12])      # utime + stime
            + int(rest[13]) + int(rest[14]),   # cutime + cstime
        )
    kids: dict[int, list[int]] = {}
    for pid, (ppid, _) in procs.items():
        kids.setdefault(ppid, []).append(pid)
    total, stack, seen = 0, [os.getpid()], set()
    while stack:
        p = stack.pop()
        if p in seen or p not in procs:
            continue
        seen.add(p)
        total += procs[p][1]
        stack.extend(kids.get(p, ()))
    return total


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    # Ambient-load guard: a bench started while residual JVMs/test
    # shards still burn CPU produces a noise-contaminated artifact
    # (round 8: start load_avg 3.97 inflated the total ~10% with zero
    # plan changes).  Wait (bounded) for the box to go quiet; if it
    # never does, run anyway but FLAG the artifact so a contaminated
    # number can't silently become the round's canonical record.
    max_load = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "1.5"))
    quiet_budget = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_SECS", "90"))
    waited = 0.0
    while os.getloadavg()[0] > max_load and waited < quiet_budget:
        print(
            f"# waiting for quiet box: load_avg {os.getloadavg()[0]:.2f} "
            f"> {max_load} ({waited:.0f}/{quiet_budget:.0f}s)",
            file=sys.stderr,
        )
        time.sleep(5.0)
        waited += 5.0
    load_avg_start = os.getloadavg()
    contaminated = load_avg_start[0] > max_load
    if contaminated:
        print(
            f"# WARNING contaminated run: start load_avg "
            f"{load_avg_start[0]:.2f} > {max_load} after {waited:.0f}s wait "
            f"— timings include ambient load, do not compare across rounds",
            file=sys.stderr,
        )
    spark = get_spark(app_name="umdl-bench")
    spark.sparkContext.setLogLevel("ERROR")

    specs = bench_queries()
    # warm the RUNTIME (codegen pipeline, shuffle + broadcast machinery,
    # Python/Arrow worker pool, parquet footer cache) so per-query
    # numbers measure the query, not session bootstrap — no query's
    # actual data or results are precomputed here
    from pyspark.sql import functions as F

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    (
        spark.range(10_000)
        .join(F.broadcast(spark.range(100)), "id")
        .groupBy((F.col("id") % 7).alias("k"))
        .count()
        .collect()
    )
    spark.range(64).mapInPandas(
        lambda batches: batches, schema="id long"
    ).collect()
    # window-function and higher-order-function interpreter/JIT paths
    # (several headline queries are window+HOF-shaped; first use costs
    # multiple seconds of JVM warmup that belongs to the runtime, not
    # the query)
    from pyspark.sql import Window

    w = Window.partitionBy(F.col("id") % 3).orderBy("id")
    (
        spark.range(1000)
        .withColumn("rn", F.row_number().over(w))
        .filter("rn <= 2")
        .collect()
    )
    spark.range(1000).select(
        F.aggregate(
            F.zip_with(
                F.array(F.col("id") * 1.0, F.lit(2.0)),
                F.array(F.lit(1.0), F.lit(3.0)),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("d"),
        F.transform(
            F.array_sort(
                F.transform(
                    F.sequence(F.lit(0), F.lit(3)),
                    lambda i: F.struct(
                        (F.col("id") % 7 * i).cast("double").alias("_d"),
                        i.cast("int").alias("cell"),
                    ),
                )
            ),
            lambda s: s["cell"],
        ).alias("p"),
    ).collect()
    # DECIMAL aggregation path (BigDecimal accumulation classes + the
    # decimal codegen templates — pricing/roleplay/silver all pay this
    # on first use otherwise)
    spark.range(100_000).selectExpr(
        "sum(cast(id as decimal(25,6))) as s",
        "avg(cast(id as decimal(25,6))) as a",
    ).collect()
    # portable-hash expression stack (md5 → hex substring → conv) and
    # the array set-ops the dedup verifiers run row-locally
    spark.range(10_000).selectExpr(
        "conv(substring(md5(cast(id as string)), 1, 15), 16, 10) as h",
        "size(array_intersect(array(id, id+1), array(id+1, id+2))) as i",
        "array_distinct(split(concat_ws(' ', 'a', cast(id as string)), ' ')) as d",
    ).collect()
    # broadcast nested-loop join with an array-membership condition
    # feeding a HOF fold (the knn/ann probe shape)
    probe = spark.range(4).selectExpr(
        "id as cell", "array(cast(id as double), 1.0d) as c"
    )
    (
        spark.range(500)
        .selectExpr("id", "id % 4 as cell_q", "array(1.0d, cast(id as double)) as v")
        .join(
            F.broadcast(probe),
            F.expr("array_contains(array(cell_q, cell_q + 1), cell)"),
        )
        .selectExpr(
            "aggregate(zip_with(v, c, (x, y) -> x * y), 0.0d, (a, x) -> a + x) as dot"
        )
        .collect()
    )
    # localCheckpoint machinery (block manager + ContextCleaner paths
    # that the dedup/simhash pipelines hit on their first materialize)
    spark.range(1000).localCheckpoint(eager=False).count()
    for table in ("lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{table}.parquet").limit(10).collect()
    # bucketed LAYOUT build: the write-time shuffle happens once, ever
    # (attach_or_save_bucketed re-registers surviving files on later
    # sessions).  On a fresh machine that one-time CTAS would otherwise
    # land inside bucketed_fact_join's timing — the benched operator is
    # the zero-exchange join, not the table build, exactly as the
    # query's own docstring frames it.
    from urban_mobility_data_lakehouse_spark.queries.functions_suite import (
        prepare,
    )

    t0 = time.perf_counter()
    prepare(spark, sf_dir)
    # reported separately (not inside any query's timing, not in the
    # total): cross-framework comparisons must grant the baseline the
    # same pre-built layout, or add this back — see SCALE.md
    layout_build_sec = round(time.perf_counter() - t0, 3)

    expected = EXPECTED_ROWS.get(sf, {})
    specs_items = sorted(specs.items())
    timings: dict[str, float] = {}
    timings_mean: dict[str, float] = {}
    timings_cold: dict[str, float] = {}
    row_mismatches: dict[str, str] = {}
    total = 0.0
    total_mean = 0.0
    # min over reps — the same noise-robust estimator scale_curve.py
    # uses (this sandbox shows transient host-contention bursts; the
    # minimum approximates the uncontended run).  Disclosed in the
    # JSON via "reps"; mean and the rep-1 (cold: later reps benefit
    # from warmed caches) walls are ALSO emitted so cross-round totals
    # compare like-for-like under any estimator.  Set
    # SPARK_GRAFT_BENCH_REPS=1 for single-shot; values < 1 are clamped.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    # Per-REP contamination gating (round 9's start-gate was not
    # enough: the box loaded up AFTER the gate passed and inflated the
    # canonical number +15% mid-run).  Each rep measures AMBIENT load
    # — system-wide busy CPU from /proc/stat MINUS this process
    # tree's own busy CPU, divided by the rep wall — because the
    # 1-min load_avg counts the bench's own 32 threads and flags a
    # quiet box the moment the bench works hard.  A rep whose ambient
    # load exceeds the threshold (cores of EXTERNAL work running
    # concurrently) is CONTAMINATED and, while the global retry budget
    # lasts, is re-run after a short bounded quiet-wait.  The reported
    # min is taken over CLEAN reps when any exist, so ambient load can
    # only ever make the artifact *flagged*, never silently slower.
    # `contaminated_reps` counts dirty reps; `queries_dirty` names
    # queries whose min had to fall back to contaminated walls.
    retry_budget = int(os.environ.get("SPARK_GRAFT_BENCH_RETRIES", "12"))
    # per-query cap ON TOP of the global budget: one noisy stretch
    # early in the run can no longer starve later queries of retries
    retry_cap_q = int(
        os.environ.get("SPARK_GRAFT_BENCH_RETRIES_PER_QUERY", "4")
    )
    rep_quiet_budget = float(
        os.environ.get("SPARK_GRAFT_BENCH_REP_QUIET_SECS", "30")
    )
    hz = os.sysconf("SC_CLK_TCK")
    queries_load: dict[str, float] = {}
    queries_ambient: dict[str, float] = {}
    queries_min_clean: dict[str, float | None] = {}
    queries_min_any: dict[str, float] = {}
    queries_dirty: list[str] = []
    contaminated_reps = 0
    for name, spec in specs_items:
        walls: list[float] = []
        clean_walls: list[float] = []
        rep_ambients: list[float] = []
        rows = []
        queries_load[name] = round(os.getloadavg()[0], 2)

        def run_rep():
            b0, o0 = _total_busy_jiffies(), _tree_busy_jiffies()
            t0 = time.perf_counter()
            r = spec.builder(spark, sf_dir).collect()
            wall = time.perf_counter() - t0
            ambient = (
                (_total_busy_jiffies() - b0)
                - (_tree_busy_jiffies() - o0)
            ) / (hz * max(wall, 1e-3))
            return round(wall, 3), r, round(max(0.0, ambient), 2)

        for _ in range(reps):
            wall, rows, amb = run_rep()
            walls.append(wall)
            rep_ambients.append(amb)
            if amb <= max_load:
                clean_walls.append(wall)
            else:
                contaminated_reps += 1
        # retry dirty reps (shared budget) until we have a full clean
        # set — each retry first waits (bounded) for the box to quiet,
        # gating on the AMBIENT estimate sampled over a short window
        # (load_avg would deterministically see the bench's own
        # just-finished rep and burn the whole wait budget on a quiet
        # box)
        def _ambient_now(window: float = 1.5) -> float:
            b0, o0 = _total_busy_jiffies(), _tree_busy_jiffies()
            time.sleep(window)
            return max(
                0.0,
                (
                    (_total_busy_jiffies() - b0)
                    - (_tree_busy_jiffies() - o0)
                )
                / (hz * window),
            )

        retries_q = 0
        while (
            len(clean_walls) < reps
            and retry_budget > 0
            and retries_q < retry_cap_q
        ):
            waited_r = 0.0
            while waited_r < rep_quiet_budget:
                waited_r += 1.5
                if _ambient_now() <= max_load:
                    break
            retry_budget -= 1
            retries_q += 1
            wall, rows, amb = run_rep()
            walls.append(wall)
            rep_ambients.append(amb)
            if amb <= max_load:
                clean_walls.append(wall)
            else:
                contaminated_reps += 1
                print(
                    f"# retry of {name} still contaminated "
                    f"(ambient {amb:.2f} cores > {max_load})",
                    file=sys.stderr,
                )
        queries_ambient[name] = round(max(rep_ambients), 2)
        if not clean_walls:
            queries_dirty.append(name)
        best = min(clean_walls) if clean_walls else min(walls)
        timings[name] = best
        # self-describing minimums: the canonical `queries` value is
        # min-over-CLEAN (falling back to min-over-all only when no
        # clean rep exists — those queries are named in queries_dirty
        # with their ambient load in queries_ambient).  Emitting both
        # floors makes a budget-exhausted artifact carry its own error
        # bar instead of needing the stderr log to interpret.
        queries_min_clean[name] = (
            min(clean_walls) if clean_walls else None
        )
        queries_min_any[name] = min(walls)
        # mean/cold over the first `reps` walls — the estimator prior
        # rounds used, kept comparable regardless of retries
        timings_mean[name] = round(sum(walls[:reps]) / min(len(walls), reps), 3)
        timings_cold[name] = walls[0]
        total += best
        total_mean += timings_mean[name]
        print(f"# {name}: {best:.3f}s ({len(rows)} rows)", file=sys.stderr)
        want = expected.get(name)
        if want is not None and len(rows) != want:
            row_mismatches[name] = f"got {len(rows)}, expected {want}"
            print(
                f"# WARNING {name}: rowcount {len(rows)} != pinned {want}",
                file=sys.stderr,
            )

    print(
        json.dumps(
            {
                "metric": "bench_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "reps": reps,  # per-query wall = min over this many runs
                # matched estimators for cross-round comparison: mean
                # over reps, and the rep-1 wall (the COLD run — later
                # reps benefit from warmed OS/parquet caches)
                "queries_mean": timings_mean,
                "queries_cold": timings_cold,
                "total_mean": round(total_mean, 3),
                "sf": sf,
                # environment pinning: separates sandbox load from plan
                # regressions when triaging round-over-round deltas.
                # `contaminated` trips when the box never went quiet
                # (start load_avg > threshold after the bounded wait);
                # `queries_load` is the 1-min load_avg at each query's
                # start so per-query drift can be attributed.
                "load_avg": [round(x, 2) for x in load_avg_start],
                "load_avg_end": [round(x, 2) for x in os.getloadavg()],
                "contaminated": contaminated or bool(queries_dirty),
                "load_threshold": max_load,
                "quiet_wait_sec": round(waited, 1),
                # 1-min load_avg at each query's start (r9 field, kept
                # for cross-round comparison — includes SELF-load)
                "queries_load": queries_load,
                # max per-rep AMBIENT load (cores of external work:
                # /proc/stat busy minus this process tree's busy, per
                # rep wall); the gating signal — reps above the
                # threshold were re-run (bounded global retry budget)
                # and the min is over clean reps whenever any exist
                "queries_ambient": queries_ambient,
                "contaminated_reps": contaminated_reps,
                # queries whose reported min had to fall back to
                # contaminated walls (retry budget exhausted) — a
                # non-empty list means the canonical number is NOT
                # clean and must not be compared across rounds
                "queries_dirty": queries_dirty,
                "retry_budget_left": retry_budget,
                # both floors per query: the canonical min-over-clean
                # (null for dirty queries) and the unconditional
                # min-over-all-reps, so a budget-exhausted artifact is
                # self-describing without the stderr log
                "queries_min_clean": queries_min_clean,
                "queries_min_any": queries_min_any,
                # how much of the canonical total comes from DISCARDING
                # faster-but-contaminated walls (min_clean − min_any
                # over clean queries): the gating conservatism error
                # bar.  Dirty queries contribute 0 here — their
                # uncertainty is one-sided and carried by
                # queries_ambient instead.
                "dirty_min_inflation_sec": round(
                    sum(
                        (c - queries_min_any[q])
                        for q, c in queries_min_clean.items()
                        if c is not None
                    ),
                    3,
                ),
                "row_mismatches": row_mismatches,
                # one-time bucketed-layout DDL, paid in warmup (0.0x if
                # attached from a previous session's surviving files)
                "layout_build_sec": layout_build_sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
