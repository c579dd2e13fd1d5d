"""Query registry: name → (Spark callable, optional DuckDB oracle SQL)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: Optional[str]  # ANSI SQL for DuckDB; None → rows-only check
    #: Non-degeneracy floor: the minimum row count the query must produce
    #: at the SMALLEST test tier (sf0.001) — row counts are monotone in
    #: sf, so the floor holds at every larger tier too. Default 1: a
    #: silently-empty join can never pass as a vacuous green. Queries
    #: whose correct sf0.001 answer IS empty declare min_rows=0
    #: explicitly at their registration site.
    min_rows: int = 1


REGISTRY: Dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str] = None, min_rows: int = 1):
    """Decorator: add a query to the registry.

    Column names in the Spark result and the oracle SQL MUST match — the
    driver sorts columns by name before value-hashing.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, min_rows=min_rows)
        return fn

    return deco
