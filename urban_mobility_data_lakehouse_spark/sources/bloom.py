"""Per-file Bloom-filter indexes for lakehouse point lookups.

Delta Lake's Bloom filter index (delta-io/delta PROTOCOL.md, `CREATE
BLOOMFILTER INDEX`) rebuilt for the plain-parquet lakehouse: min/max
stats (`skipping.py`) prune range predicates, but an equality probe on
a HIGH-CARDINALITY column — "find this user id / order key / content
hash" — almost never falls outside a file's [min, max] when values are
uniformly distributed.  A per-file Bloom filter answers "is this value
possibly in this file?" with a bounded false-positive rate, so the
needle query schedules the 1-2 files that might match instead of all
of them.

Mechanics:

- *Config* is a table-sidecar (`_bloom_index.json`, the CHECK
  constraints pattern): ``{col: {"m": bits, "k": probes}}``.  Indexed
  columns should be string/integer typed — hashing canonicalizes
  through ``CAST(col AS STRING)``.
- *Build* happens inside the commit, as one bounded Spark job per
  indexed column over the freshly written files: hash every value to
  its k probe positions, `explode` + `collect_set` per file (output ≤ m
  ints per file, regardless of row count), then pack to a hex bitset on
  the driver and record it in the commit entry's per-file stats — the
  Delta add-action shape.  At 1000 executors this is a map + one
  partial-aggregated shuffle of positions, nothing driver-sized until
  the ≤ m-int sets arrive.
- *Probe* is driver-side pure Python: the SAME md5-based positions
  (`hashlib.md5` == Spark's `md5(CAST(col AS STRING))` on UTF-8 bytes)
  tested against the stored bitset.  `=` prunes when ANY probe bit is
  clear; `in` prunes when every candidate value prunes.  NULL never
  enters the filter and every supported predicate is null-rejecting,
  so NULL-semantics stay exact.
- Pruning remains ADVISORY: `read_where` always re-applies the real
  predicate, so a hash collision costs I/O, never correctness — the
  same contract as min/max skipping.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

DEFAULT_M = 4096  # bits per file per column (512 bytes → 1 KiB hex)
DEFAULT_K = 3  # probe hashes


def bloom_positions_py(value, m: int, k: int) -> list[int]:
    """Probe positions for a literal — pure Python, bit-compatible with
    `bloom_positions_col`: md5 over UTF-8 of ``f"{i}:{value}"``, first
    15 hex digits as a 60-bit int, mod m."""
    return [
        int(hashlib.md5(f"{i}:{value}".encode()).hexdigest()[:15], 16) % m
        for i in range(k)
    ]


def bloom_positions_col(col: Column, m: int, k: int) -> Column:
    """array<int> of the k probe positions for a column value (Spark
    twin of `bloom_positions_py`; NULL values yield NULL and are
    filtered out by the build)."""
    s = col.cast("string")
    return F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{i}:"), s)), 1, 15
                    ),
                    16,
                    10,
                ).cast("long")
                % m
            ).cast("int")
            for i in range(k)
        ]
    )


def pack_bits(positions: list[int], m: int) -> str:
    """Sorted distinct bit positions → hex bitset string (m/8 bytes)."""
    bits = bytearray(m // 8)
    for p in positions:
        bits[p // 8] |= 1 << (p % 8)
    return bits.hex()


def might_contain(hexbits: str, positions: list[int]) -> bool:
    bits = bytes.fromhex(hexbits)
    return all(bits[p // 8] & (1 << (p % 8)) for p in positions)


def build_file_blooms(
    spark, data_dir: str, config: dict[str, dict]
) -> dict[str, dict[str, str]]:
    """{relative file path: {col: hex bitset}} for every parquet file
    under `data_dir`, one bounded Spark job per indexed column."""
    import os

    out: dict[str, dict[str, str]] = {}
    df = spark.read.parquet(data_dir)
    present = set(df.columns)
    base = os.path.abspath(data_dir)
    for col, cfg in config.items():
        if col not in present:
            continue  # schema evolution: unindexed file → no pruning
        m, k = int(cfg.get("m", DEFAULT_M)), int(cfg.get("k", DEFAULT_K))
        rows = (
            df.filter(F.col(col).isNotNull())
            .select(
                F.col("_metadata.file_path").alias("__f"),
                F.explode(
                    bloom_positions_col(F.col(col), m, k)
                ).alias("__p"),
            )
            .groupBy("__f")
            .agg(F.collect_set("__p").alias("__ps"))
            .collect()
        )
        for r in rows:
            fpath = r["__f"]
            # Spark reports a URI: file:/p, file:///p, or hdfs://host/p
            if "://" in fpath:
                fpath = "/" + fpath.split("://", 1)[1].split("/", 1)[1]
            elif fpath.startswith("file:"):
                fpath = fpath[len("file:"):]
            rel = os.path.relpath(fpath, base)
            out.setdefault(rel, {})[col] = pack_bits(r["__ps"], m)
    return out


def bloom_survives(
    file_entry: dict, predicates, config: dict[str, dict]
) -> bool:
    """True unless a stored Bloom filter PROVES no row matches an
    equality/IN predicate.  Missing filter for a column ⇒ survive."""
    blooms = file_entry.get("bloom")
    if not blooms:
        return True
    for col, op, value in predicates:
        if op not in ("=", "==", "in") or col not in blooms:
            continue
        cfg = config.get(col)
        if cfg is None:
            continue
        m, k = int(cfg.get("m", DEFAULT_M)), int(cfg.get("k", DEFAULT_K))
        values = value if op == "in" else [value]
        if not values:
            return False
        if not any(
            might_contain(blooms[col], bloom_positions_py(v, m, k))
            for v in values
        ):
            return False
    return True
