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


REGISTRY: Dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str] = None):
    """Decorator: add a query to the registry.

    Column names in the Spark result and the oracle SQL MUST match — the
    driver sorts columns by name before value-hashing.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle)
        return fn

    return deco
