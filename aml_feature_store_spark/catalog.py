"""Registry of the engine's public queries + their DuckDB oracle SQL.

Every operator from SURVEY.md §2 that the engine claims as done gets a
``@register("name", oracle=...)`` entry here; ``__spark_entry__.py``
exposes them to the driver. Column names are aliased identically on both
sides (the driver's compare sorts columns by name before hashing).

Queries with no SQL-expressible oracle (stateful streaming, iterative
algorithms) register with ``oracle=None`` → driver records rows-only.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


QUERIES: dict[str, RegisteredQuery] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = RegisteredQuery(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}


_loaded = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (import side effects)."""
    global _loaded
    if _loaded:
        return
    from . import queries as _q  # noqa: F401  (package of @register modules)

    _loaded = True
