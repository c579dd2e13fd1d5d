"""Skew mitigation utilities (SURVEY.md §7 hard part #4).

AQE's skew-join handling covers sort-merge joins automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py). These helpers
cover the cases AQE does not: skewed AGGREGATION keys and skewed
broadcast-ineligible joins.

- salted_agg: two-phase aggregation — phase 1 groups on (key, salt) so a hot
  key's rows spread over S reducers; phase 2 merges the S partials. Works
  for any algebraic aggregate (sum/count/min/max; avg = sum+count merged).
- salt_join: replicate the SMALL side S times (one copy per salt value) and
  salt the big side uniformly — a hot key on the big side spreads over S
  partitions instead of melting one reducer.

Both are deterministic: the salt is ``pmod(xxhash64(monotonically_
increasing_id... NO — salt must not depend on row identity across retries.
``pmod(xxhash64(<all grouping-irrelevant stable cols>)...`` is still
content-stable; simplest safe choice is hashing the key's own row content.
Here we hash a caller-chosen stable column (default: the key itself plus a
uniform spread from ``rand`` would be nondeterministic — rejected).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_expr(stable_cols: Sequence[str], buckets: int) -> Column:
    """Deterministic salt in [0, buckets) from stable row content."""
    return F.pmod(F.xxhash64(*stable_cols), F.lit(buckets)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_cols: Sequence[str],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {"sum", "count", "min", "max"}. ``salt_cols`` are stable non-key columns
    whose hash spreads a hot key's rows (e.g. the fact's line number).

    Phase 1 reduces each (key, salt) bucket map-side+reduce-side; phase 2
    merges ≤ ``buckets`` rows per key — the hot key's cost is now spread
    over ``buckets`` reducers.
    """
    fn1 = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    fn2 = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    salted = df.withColumn("__salt", _salt_expr(salt_cols, buckets))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[fn1[fn](col).alias(out) for out, (col, fn) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[fn2[fn](out).alias(out) for out, (_, fn) in aggs.items()]
    )


def salt_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_cols: Sequence[str],
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side deterministically, replicate
    the small side once per salt value, join on (key, salt).

    Use when the small side is too big to broadcast and the big side has hot
    keys. Cost: small side ×``buckets`` (still far below the big side);
    benefit: a hot key occupies ``buckets`` reducers instead of one.
    """
    salted_big = big.withColumn("__salt_b", _salt_expr(salt_cols, buckets))
    salts = F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))).alias("__salt_s")
    replicated_small = small.select("*", salts)
    out = salted_big.join(
        replicated_small,
        (F.col(big_key) == F.col(small_key)) & (F.col("__salt_b") == F.col("__salt_s")),
        how,
    )
    return out.drop("__salt_b", "__salt_s")
