"""Local stand-in for the driver's DuckDB-oracle compare.

Runs a registry query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and an
order-insensitive value multiset (columns sorted by name, doubles rounded to
absorb the last ulp)."""

from __future__ import annotations

import math
from decimal import Decimal
from typing import Optional

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon(v):
    """Type-faithful canonical form.

    Floats carry an ``f:`` tag so an integral float64 (``27615.0``) does NOT
    canonicalize equal to a long (``27615``) — the driver's value hash
    distinguishes them (the round-2 HUGEINT→float64 oracle bug slipped past
    the untagged ``%.9g`` form while hashing red on the driver). The ``%.9g``
    still absorbs last-ulp double noise; Decimals join the float family so a
    DECIMAL-typed oracle column still matches a Spark double."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"f:{v:.9g}"
    if isinstance(v, Decimal):
        return f"f:{float(v):.9g}"
    return str(v)


def canonical_multiset(df: pd.DataFrame) -> list[str]:
    cols = sorted(df.columns)
    rows = ["|".join(_canon(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def compare(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> Optional[str]:
    """None if they match, else a diagnostic string."""
    if len(spark_df) != len(oracle_df):
        return f"row count {len(spark_df)} != {len(oracle_df)}"
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        return f"columns {sorted(spark_df.columns)} != {sorted(oracle_df.columns)}"
    a, b = canonical_multiset(spark_df), canonical_multiset(oracle_df)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return f"values differ; first diffs: {diffs}"
    return None
