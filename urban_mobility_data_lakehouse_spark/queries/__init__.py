"""The oracle-checked query registry (driver contract).

Each QuerySpec pairs a Spark builder `(spark, sf_dir) -> DataFrame` with
the equivalent ANSI/DuckDB oracle SQL (or None for non-SQL-expressible
operators, which get a weaker rows-only check).  `__spark_entry__.py`
exposes this registry to the verification driver.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# The verification driver runs spark-vs-oracle at this scale factor;
# data-dependent oracle generators (e.g. knn_ivf's trained centroids)
# are resolved against it when the driver asks for oracle_sql().
DRIVER_SF_DIR = os.environ.get(
    "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    # str = static SQL; callable = sf_dir -> SQL, for oracles whose
    # constants are derived from the data (generated at ask-time so the
    # same generator serves every scale factor)
    oracle: str | Callable[[str], str] | None
    tags: tuple[str, ...] = ()
    bench: bool = False  # include in bench.py headline set

    def oracle_for(self, sf_dir: str) -> str | None:
        if callable(self.oracle):
            return self.oracle(sf_dir)
        return self.oracle


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | Callable[[str], str] | None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable:
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name, fn, oracle, tags, bench)
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.builder for name, spec in REGISTRY.items()}


def all_oracles(sf_dir: str = DRIVER_SF_DIR) -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle_for(sf_dir)
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }


def bench_queries() -> dict[str, QuerySpec]:
    _load_all()
    return {n: s for n, s in REGISTRY.items() if s.bench}


_loaded = False


def _load_all() -> None:
    """Import every query module so registration side-effects run.

    Registration order IS the driver's check order (the verification
    driver checks the first 50 registered queries), so the LLM-pipeline
    suites (dedup / similarity / temporal) register right after core —
    never let them fall outside the checked window.  The registry is
    kept at ≤50 total so every query gets a driver correctness row.
    """
    global _loaded
    if _loaded:
        return
    from . import core  # noqa: F401
    from . import dedup  # noqa: F401
    from . import similarity  # noqa: F401
    from . import temporal_suite  # noqa: F401
    from . import domain  # noqa: F401
    from . import text  # noqa: F401
    from . import functions_suite  # noqa: F401
    from . import multimodal_suite  # noqa: F401
    from . import jsonl_suite  # noqa: F401
    from . import audio_suite  # noqa: F401
    from . import lakehouse_suite  # noqa: F401
    from . import url_suite  # noqa: F401
    _loaded = True
    n = len(REGISTRY)
    assert n <= 50, f"registry has {n} queries; driver checks only 50"
