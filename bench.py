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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="umdl-bench")
    spark.sparkContext.setLogLevel("ERROR")

    specs = bench_queries()
    # warm the JVM (codegen, shuffle machinery, parquet footer cache) so
    # per-query numbers measure the query, not session bootstrap
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for table in ("lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{table}.parquet").limit(10).collect()

    specs_items = sorted(specs.items())
    timings: dict[str, float] = {}
    total = 0.0
    for name, spec in specs_items:
        t0 = time.perf_counter()
        rows = spec.builder(spark, sf_dir).collect()
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"# {name}: {dt:.3f}s ({len(rows)} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "bench_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
