"""Deterministic floating-point aggregation helpers.

Double sums are order-dependent (IEEE addition is not associative), and
Spark's partial-agg partition order differs from any other engine's — so
``round(sum(double), 2)`` can flip a cent when the exact sum sits on a
rounding boundary. For oracle-checked (and generally reproducible) results,
money-style sums go through DECIMAL(18,6): the per-row double expression is
deterministic, the cast to decimal is deterministic, and decimal addition is
exact and order-independent. The rounded result is cast back to double.

The DuckDB mirror of ``dsum(x, 2)`` is::

    CAST(round(sum(CAST(x AS DECIMAL(18,6))), 2) AS DOUBLE)

and of ``davg(x, 4)``::

    round(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4)

At 100 TB this matters beyond testing: decimal partial aggregation is still
map-side combinable, and the result does not depend on partition count or
AQE coalescing decisions — reruns and scale changes produce identical
bytes, which downstream dedup/incremental logic can rely on.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(c: Column, scale: int = 2) -> Column:
    """Order-independent rounded sum of a double expression, as double."""
    return F.round(F.sum(c.cast("decimal(18,6)")), scale).cast("double")


def davg(c: Column, scale: int = 4) -> Column:
    """Order-independent rounded mean of a double expression, as double.

    Exact decimal sum → one double division by the count → round.
    """
    return F.round(
        F.sum(c.cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)), scale
    )


def dsum_sql(expr: str, scale: int = 2) -> str:
    """DuckDB SQL mirror of :func:`dsum`."""
    return f"CAST(round(sum(CAST({expr} AS DECIMAL(18,6))), {scale}) AS DOUBLE)"


def davg_sql(expr: str, scale: int = 4) -> str:
    """DuckDB SQL mirror of :func:`davg`."""
    return (
        f"round(CAST(sum(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) / count(*), {scale})"
    )


def grid_round(c: Column, digits: int) -> Column:
    """Cross-engine deterministic rounding: floor(x*10^d + 0.5)/10^d on
    the double itself. Spark's round()/bround() decide half-way ties on
    the double's DECIMAL REPR while DuckDB rounds the binary value, so
    they can disagree on repr-half boundaries; this rule ties both
    engines to the same binary comparison. The DuckDB mirror is the
    literally identical expression: ``floor(x * 1e{d} + 0.5) / 1e{d}``.
    """
    p = float(10**digits)
    return F.floor(c * F.lit(p) + F.lit(0.5)) / F.lit(p)
