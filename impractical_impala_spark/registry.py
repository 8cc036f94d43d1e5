"""Central query registry: name -> (spark builder, duckdb oracle SQL).

This is the single source of truth behind ``__spark_entry__.queries()`` /
``oracle_sql()`` and behind the local parity tests. Every operator the
engine claims (SURVEY.md §2 inventory + the training-data extension
surface) registers here; oracle is ``None`` only for genuinely
non-SQL-expressible kernels (driver then records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB ANSI SQL over the pre-registered views
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, build: Callable[[SparkSession, str], DataFrame],
             oracle: str | None, doc: str = "") -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query name {name!r}")
    _REGISTRY[name] = Query(name, build, oracle, doc)


def all_queries() -> dict[str, Query]:
    _load()
    return dict(_REGISTRY)


_LOADED = False


def _load() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from . import queries as _q  # noqa: F401  (registers on import)
    _LOADED = True
