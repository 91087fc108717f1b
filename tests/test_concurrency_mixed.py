"""Randomized mixed-operation concurrency schedules for the lakehouse.

`test_concurrency.py` pins the pairwise conflict matrix (append vs
overwrite vs full-table ops); this file stresses the part the matview /
changefeed layers now depend on — commit-log LINEARITY under an
arbitrary interleaving of {merge_into (CoW + MoR), delete_where (CoW +
deletion vectors), update_where (CoW + MoR), append, compact} from
concurrent writers.  The interleaving also exercises additive-dir
supersession: CoW rewrites racing appends must neither resurrect
appended rows nor lose them.

The schedule is seeded-random, but every writer owns a disjoint key
range and upserts values derived only from (key, its own op counter),
so the FINAL table content is order-independent no matter how commits
interleave or how often optimistic retries fire.  That lets the test
assert exact content equality against a per-writer model while leaving
the schedule itself adversarially random.

Invariants checked after the storm:
  * fsck ok — dense versions, no dangling files/stats/DVs,
  * final content == the order-independent model,
  * version-0 time travel still reads the original snapshot,
  * history length == 1 + number of successful commits (no phantom or
    lost commits under retry).
"""

from __future__ import annotations

import random
import time
from concurrent.futures import ThreadPoolExecutor

import pyspark.sql.functions as F

from urban_mobility_data_lakehouse_spark.sources.lakehouse import (
    ConcurrentWriteError,
    Lakehouse,
)

N_WRITERS = 4
OPS_PER_WRITER = 5
KEYS_PER_WRITER = 6  # ids [w*100, w*100+5]; ids w*100+50.. are appends


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, value double, partition_date date"
    )


def _base_rows(day):
    import datetime

    d = datetime.date.fromisoformat(day)
    return [
        (w * 100 + i, 0.0, d)
        for w in range(N_WRITERS)
        for i in range(KEYS_PER_WRITER)
    ]


def _retry(fn, attempts: int = 40):
    # every writer hammers the SAME partition, and partition overwrites
    # now conflict with concurrent appends too (ConcurrentAppend rule),
    # so contention is by design much higher than production disjoint
    # writers — retry hard before calling starvation a failure
    for i in range(attempts):
        try:
            return fn()
        except ConcurrentWriteError:
            time.sleep(0.02 * min(i + 1, 10))
    raise AssertionError("op never committed after retries")


def test_random_mixed_op_schedule_linear_history(spark, tmp_path):
    rng = random.Random(20260814)
    lake = Lakehouse(str(tmp_path / "lake"))
    lake.create_schemas("silver")
    day = "2024-03-01"
    import datetime

    d = datetime.date.fromisoformat(day)
    lake.overwrite_partitions(
        _df(spark, _base_rows(day)), "silver", "fact",
        partition_col="partition_date",
    )

    # per-writer op tapes, drawn up-front (INCLUDING each delete's
    # CoW/MoR mode) so worker threads never touch the shared rng —
    # random.Random is not thread-safe and per-thread draws would make
    # the schedule irreproducible
    def _draw_op():
        op = rng.choice(["merge_cow", "merge_mor", "delete", "append",
                         "compact", "update"])
        mode = (
            rng.choice(["copy_on_write", "merge_on_read"])
            if op in ("delete", "update")
            else None
        )
        return op, mode

    tapes = {
        w: [_draw_op() for _ in range(OPS_PER_WRITER)]
        for w in range(N_WRITERS)
    }
    commits = {w: 0 for w in range(N_WRITERS)}

    def run_writer(w):
        merged = 0
        appended = 0
        for step, (op, rw_mode) in enumerate(tapes[w]):
            if op in ("merge_cow", "merge_mor"):
                merged += 1
                val = float(w * 1000 + merged)
                upd = _df(
                    spark,
                    [(w * 100 + i, val, d) for i in range(3)],
                )
                _retry(lambda: lake.merge_into(
                    spark, "silver", "fact", upd, key="event_id",
                    partition_col="partition_date",
                    mode=("merge_on_read" if op == "merge_mor"
                          else "copy_on_write"),
                ))
                commits[w] += 1
            elif op == "delete":
                # idempotent: always the same per-writer victim key —
                # a SECOND delete of it matches nothing and commits
                # nothing (delete_where returns False), so commits are
                # counted from the return value, not per call
                victim = w * 100 + KEYS_PER_WRITER - 1
                committed = _retry(lambda: lake.delete_where(
                    spark, "silver", "fact",
                    F.col("event_id") == victim,
                    partition_col="partition_date",
                    mode=rw_mode,
                ))
                commits[w] += bool(committed)
            elif op == "update":
                # SET over the writer's own keys 1-2 (never deleted, so
                # it always matches and always commits — counted from
                # the return value anyway, like delete)
                committed = _retry(lambda: lake.update_where(
                    spark, "silver", "fact",
                    F.col("event_id").isin(w * 100 + 1, w * 100 + 2),
                    {"value": F.col("value") + 10000.0},
                    partition_col="partition_date",
                    mode=rw_mode,
                ))
                commits[w] += bool(committed)
            elif op == "append":
                appended += 1
                row = [(w * 100 + 50 + appended, -1.0, d)]
                _retry(lambda: lake.append(
                    _df(spark, row), "silver", "fact"
                ))
                commits[w] += 1
            else:  # compact: content-neutral but ALWAYS a commit (the
                # rewrite lands in a new version even when layout is
                # already one file/partition) — a before/after snapshot
                # count here would race with other writers' commits
                _retry(lambda: lake.compact(
                    spark, "silver", "fact",
                    partition_col="partition_date",
                ))
                commits[w] += 1

    with ThreadPoolExecutor(max_workers=N_WRITERS) as ex:
        list(ex.map(run_writer, range(N_WRITERS)))

    # --- invariant 1: structural integrity + dense versions ---------
    audit = lake.fsck("silver", "fact")
    assert audit["ok"], audit["errors"]

    # --- invariant 2: exact order-independent content ---------------
    # writers own disjoint key ranges, so the final table equals each
    # writer's tape replayed SEQUENTIALLY against its own keys,
    # regardless of how the commits interleaved
    expected = {}
    for (eid, val, _) in _base_rows(day):
        expected[eid] = val
    for w in range(N_WRITERS):
        merged = appended = 0
        for op, _mode in tapes[w]:
            if op in ("merge_cow", "merge_mor"):
                merged += 1
                for i in range(3):
                    expected[w * 100 + i] = float(w * 1000 + merged)
            elif op == "delete":
                expected.pop(w * 100 + KEYS_PER_WRITER - 1, None)
            elif op == "update":
                for k in (w * 100 + 1, w * 100 + 2):
                    expected[k] += 10000.0
            elif op == "append":
                appended += 1
                expected[w * 100 + 50 + appended] = -1.0
    got = {
        r["event_id"]: r["value"]
        for r in lake.read(spark, "silver", "fact").collect()
    }
    assert got == expected

    # --- invariant 3: time travel to v0 is intact -------------------
    v0 = lake.read(spark, "silver", "fact", version=0)
    assert {r["event_id"]: r["value"] for r in v0.collect()} == {
        eid: val for (eid, val, _) in _base_rows(day)
    }

    # --- invariant 4: no phantom / lost commits ---------------------
    n_commits = sum(commits.values())
    assert len(lake.snapshots("silver", "fact")) == 1 + n_commits
