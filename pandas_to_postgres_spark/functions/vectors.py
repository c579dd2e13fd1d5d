"""Vector expression helpers over ``array<float>`` columns (SURVEY.md §2.8 F6).

All JVM-side (``aggregate``/``zip_with`` run inside codegen) — no Python UDF in
the hot path. Used by the similarity-search and embedding-dedup operators.

At 100 TB: these expressions are per-row and embarrassingly parallel; the
scaling question lives in the *pairing* strategy (crossJoin vs LSH bucketing),
handled in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns, as double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm_expr(a: Column) -> Column:
    """Euclidean norm of an array<numeric> column, as double."""
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns, as double.

    Matches DuckDB's ``list_cosine_similarity`` for oracle checks.
    """
    return dot_expr(a, b) / (l2_norm_expr(a) * l2_norm_expr(b))
