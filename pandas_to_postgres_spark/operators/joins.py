"""Join operators Spark lacks natively (SURVEY.md §2.3 J6/J7).

as-of join (J7): Spark SQL has no ASOF JOIN; the naive formulation
(range-join + per-key max) explodes into a broadcast-nested-loop or an
O(n*m) shuffle. The construction here is the union+last-value window trick:
union both sides tagged, sort within each key by (ts, side), and carry the
most recent right-side value forward with ``last(..., ignorenulls=True)``.

Scale: ONE shuffle on the key column, no pair explosion — at 100 TB this is
the difference between a linear pass and an infeasible join. Skewed keys can
be salted upstream; AQE skew handling applies to the single shuffle.

range join (J6): expressed as a non-equi join; when one side is small (bin
tables, calendars) we broadcast it so Catalyst picks BroadcastNestedLoopJoin
instead of a cartesian shuffle.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: Sequence[str],
    right_on: Optional[str] = None,
    right_by: Optional[str] = None,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: Optional[float] = None,
) -> DataFrame:
    """For each left row, attach the nearest right row within the same
    ``by`` key — ``direction='backward'`` (default): latest right with
    ``right.right_on <= left.on`` (inclusive, matching DuckDB's
    ``ASOF JOIN ... ON l.ts >= r.ts``); ``direction='forward'``: earliest
    right with ``right.right_on >= left.on``. Left rows with no match keep
    NULLs (left-outer semantics).

    ``tolerance`` (seconds for timestamp keys, plain difference for numeric
    keys) nulls out matches farther than the bound — pandas
    ``merge_asof(tolerance=...)`` semantics: the left row survives, the
    joined values become NULL.

    Returns all left columns plus ``{c}{suffix}`` for each of ``value_cols``.

    Scale: single shuffle on the ``by`` key (the union sorts once per
    partition); no join node at all — the window's running ``last`` carries
    right values forward (or backward) within each key. At 100 TB this
    beats the naive range-join formulation (which explodes to a
    per-left-row scan of the right side) and never materializes pairs.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    right_on = right_on or on
    right_by = right_by or by

    left_struct_type = left.schema
    l_tagged = left.select(
        F.col(by).alias("__k"),
        F.col(on).alias("__t"),
        F.lit(1).alias("__is_l"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
        F.lit(None).cast(right.schema[right_on].dataType).alias("__rt"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}")
            for c in value_cols
        ],
    )
    r_tagged = right.select(
        F.col(right_by).alias("__k"),
        F.col(right_on).alias("__t"),
        F.lit(0).alias("__is_l"),
        F.lit(None).cast(_struct_ddl(left_struct_type)).alias("__row"),
        F.col(right_on).alias("__rt"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )

    # right rows sort before left rows at equal ts → inclusive semantics in
    # both directions; desc time order turns the running `last` into
    # "earliest following" for direction='forward'
    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(t_order, F.col("__is_l").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        "__is_l",
        "__row",
        F.col("__t"),
        F.last(F.col("__rt"), ignorenulls=True).over(w).alias("__mt"),
        *[
            F.last(F.col(f"__v_{c}"), ignorenulls=True).over(w).alias(f"__v_{c}")
            for c in value_cols
        ],
    )
    if tolerance is not None:
        on_type = left.schema[on].dataType.simpleString()
        if on_type.startswith("timestamp"):
            # timestampdiff accepts TIMESTAMP and TIMESTAMP_NTZ alike
            # (unix_micros does not — parquet `isAdjustedToUTC=false`
            # columns arrive as NTZ and would fail analysis)
            gap = F.expr("timestampdiff(MICROSECOND, __mt, __t)").cast(
                "double"
            ) / 1e6
        else:
            gap = (F.col("__t") - F.col("__mt")).cast("double")
        within = F.abs(gap) <= F.lit(float(tolerance))
        filled = filled.select(
            "__is_l",
            "__row",
            *[
                F.when(within, F.col(f"__v_{c}")).alias(f"__v_{c}")
                for c in value_cols
            ],
        )
    out = filled.filter(F.col("__is_l") == 1).select(
        *[F.col(f"__row.{c}").alias(c) for c in left.columns],
        *[F.col(f"__v_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out


def _struct_ddl(schema) -> str:
    """DDL string for casting a NULL literal to a struct of ``schema``."""
    inner = ",".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    return f"struct<{inner}>"


def range_join(
    left: DataFrame,
    right: DataFrame,
    condition: Column,
    broadcast_right: bool = True,
    how: str = "inner",
) -> DataFrame:
    """Theta/range join. With a small right side (bin tables, calendars),
    broadcasting turns the cartesian shuffle into a map-side
    BroadcastNestedLoopJoin — the only sane physical plan at scale for
    non-equi conditions."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=condition, how=how)


def interval_overlap_pairs(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    unit: str = "hour",
) -> DataFrame:
    """All (a-row, b-row) pairs whose time intervals overlap
    (``a_start <= b_end AND b_start <= a_end``), WITHOUT the cartesian
    product a direct theta-join costs: each interval explodes into the
    ``unit`` buckets it covers, the join is an equi-join on the bucket,
    the exact predicate filters bucket collisions, and ``distinct``
    removes multi-bucket duplicates.

    Candidate pairs scale with temporal co-locality (pairs per bucket),
    not |A| x |B|; pick ``unit`` close to the typical interval length —
    too coarse and buckets over-collide, too fine and long intervals
    explode into many rows. Column names must be disjoint between the
    two sides (Spark resolves names case-insensitively), and input rows
    must be distinct (the multi-bucket dedup is a ``distinct`` over the
    output columns, so two fully-identical input rows collapse to one
    pair — carry a unique id column if multiplicity matters).

    Inverted intervals (start > end, e.g. clock skew) are handled with
    full recall: buckets span least(start,end)..greatest(start,end) —
    ``sequence`` with a positive step would otherwise throw — while the
    exact predicate keeps the original columns. If the predicate holds,
    the value spans always intersect (min_a <= a_start <= b_end <= max_b
    and min_b <= b_start <= a_end <= max_a), so bucketing on spans never
    loses a qualifying pair."""
    step = f"interval 1 {unit}"

    def bucketed(df: DataFrame, start: str, end: str) -> DataFrame:
        seq = (
            f"sequence(date_trunc('{unit}', least({start}, {end})), "
            f"date_trunc('{unit}', greatest({start}, {end})), {step})"
        )
        return df.withColumn("__bkt", F.explode(F.expr(seq)))

    out_cols = a.columns + b.columns
    return (
        bucketed(a, a_start, a_end)
        .join(bucketed(b, b_start, b_end), "__bkt")
        .filter(
            (F.col(a_start) <= F.col(b_end)) & (F.col(b_start) <= F.col(a_end))
        )
        .select(*out_cols)
        .distinct()
    )
