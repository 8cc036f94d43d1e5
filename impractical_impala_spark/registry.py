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


def oracle_sql_of(name: str) -> str:
    """Public accessor for a registered query's oracle SQL, for
    composed oracles that splice another query's SQL in as a CTE
    (e.g. ann_recall_audit over ann_cosine_topk + ann_lsh_bucketed).
    Deliberately does NOT trigger the full package load: it is called
    at module-import time by the composing module, whose dependency
    must already be registered above it in the same module (or an
    earlier-imported one) — a clear error beats a silent import cycle."""
    q = _REGISTRY.get(name)
    if q is None or q.oracle is None:
        raise KeyError(
            f"oracle_sql_of({name!r}): not registered (yet) or has no "
            "oracle; composed oracles must import after their parts")
    return q.oracle


def registered_names() -> list[str]:
    """Registration (insertion) order of everything registered SO FAR.

    Deliberately does NOT trigger the full package load: the computed
    driver window (``window.computed_window``) calls this at the END of
    ``queries/__init__``'s own import, when every query module has
    already registered — the same late-binding contract as
    ``oracle_sql_of``."""
    return list(_REGISTRY)


_WINDOW_FIRST: list[str] = []


def set_window_order(names: list[str]) -> None:
    """Pin ``names`` to the FRONT of ``all_queries()`` in the given
    order. The correctness driver checks the first 50 registered
    queries each round; this is the explicit rotation control so each
    round's window covers exactly the queries that most need a fresh
    driver CORRECTNESS row (never-checked or changed-this-round),
    without reshuffling module code. Unknown names raise at import time
    (typos must not silently shrink the window)."""
    global _WINDOW_FIRST
    _WINDOW_FIRST = list(names)
    if len(set(_WINDOW_FIRST)) != len(_WINDOW_FIRST):
        raise ValueError("duplicate names in window order")


def all_queries() -> dict[str, Query]:
    _load()
    missing = [n for n in _WINDOW_FIRST if n not in _REGISTRY]
    if missing:
        raise ValueError(f"window order names not registered: {missing}")
    first = {n: _REGISTRY[n] for n in _WINDOW_FIRST}
    return {**first, **{n: q for n, q in _REGISTRY.items() if n not in first}}


_LOADED = False


def _load() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from . import queries as _q  # noqa: F401  (registers on import)
    _LOADED = True
