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


def morton_key_expr(a, b, bits: int = 16):
    """Z-order (Morton) interleaving of two non-negative integer columns:
    bit i of ``a`` lands at position 2i+1 and bit i of ``b`` at 2i, so
    sorting by the key clusters rows that are close in BOTH dimensions —
    the multi-dimensional layout trick behind lakehouse Z-ordering. Feed
    it to ``sinks/files.write_sorted`` and parquet min/max stats prune
    range scans on EITHER column, not just the leading sort key.

    The 2*bits OR-terms fold into ONE expression tree (a single codegen
    body — unlike k separate columns, which would compile k bodies).
    Columns must be in [0, 2^bits); values are masked to ``bits`` bits so
    out-of-range inputs degrade to collisions, never to errors. For the
    clustering to benefit BOTH columns, pre-scale them to comparable bit
    widths (rank/bucket first if ranges are lopsided): the wider
    dimension's high bits otherwise dominate every file split and the
    narrow dimension degenerates to unclustered."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    key = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftleft(
            F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        bbit = F.shiftleft(
            F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        key = key.bitwiseOR(abit).bitwiseOR(bbit)
    return key
