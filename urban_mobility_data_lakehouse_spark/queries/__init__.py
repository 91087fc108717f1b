"""The oracle-checked query registry (driver contract).

Each QuerySpec pairs a Spark builder `(spark, sf_dir) -> DataFrame` with
the equivalent ANSI/DuckDB oracle SQL (or None for non-SQL-expressible
operators, which get a weaker rows-only check).  `__spark_entry__.py`
exposes this registry to the verification driver.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = ()
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
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


def all_oracles() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle
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
    _loaded = True
    n = len(REGISTRY)
    assert n <= 50, f"registry has {n} queries; driver checks only 50"
