"""Change-data-capture operators: upsert (SCD1) and SCD2 history merge.

Spark has no MERGE INTO without a transactional table format (Delta /
Iceberg); v1 emulates it with the canonical anti-join + union + flag
construction — the batch CDC shapes every warehouse load runs:

- **upsert** (SCD1): updates overwrite matching keys, history discarded.
- **scd2_apply**: updates close out the current version (valid_to set,
  is_current=false) and append a new open version — full history kept.

Scale: both are one anti/semi-join shuffle on the key plus a union (no
shuffle). The rewritten-table output is the partition-overwrite pattern:
at 100 TB you partition the dimension by key range and overwrite only
partitions containing changed keys, not the whole table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(
    current: DataFrame, updates: DataFrame, key: str, strict: bool = True
) -> DataFrame:
    """SCD1 merge: updates replace matching current rows, others pass
    through, new keys append. Schemas must match.

    Precondition: ``updates`` carries each key at most once — real
    ``MERGE INTO`` raises on multiple matches; a duplicate key here would
    survive as two conflicting current rows. ``strict=True`` (default)
    enforces it with one extra pass over the updates batch — the small
    delta side, so the check is cheap even when ``current`` is 100 TB.
    Pass ``strict=False`` for pre-deduplicated feeds."""
    if strict:
        dup = (
            updates.groupBy(key).count().filter(F.col("count") > 1).limit(1).collect()
        )
        if dup:
            raise ValueError(
                f"upsert: updates batch carries key {dup[0][key]!r} more than once"
            )
    return current.join(updates, key, "left_anti").unionByName(updates)


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    effective_ts: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    flag_col: str = "is_current",
) -> DataFrame:
    """SCD2 merge: keep full history. ``current`` must already carry
    (from_col, to_col, flag_col); ``updates`` carries the business columns
    only. Changed keys get their OPEN version closed at ``effective_ts``
    and a new open version appended; already-closed history rows of a
    changed key pass through untouched (closing them again would corrupt
    their valid_to — a repeated apply must leave prior history bytes
    unchanged, asserted in tests/test_operators.py).
    """
    changed = updates.select(key)
    # rows of unchanged keys: every version passes through untouched
    untouched_keys = current.join(changed, key, "left_anti")
    # changed keys: only the open version closes; closed history passes
    history = current.filter(~F.col(flag_col)).join(changed, key, "left_semi")
    closed = (
        current.filter(F.col(flag_col))
        .join(changed, key, "left_semi")
        .withColumn(to_col, F.lit(effective_ts).cast("timestamp"))
        .withColumn(flag_col, F.lit(False))
    )
    opened = (
        updates.withColumn(from_col, F.lit(effective_ts).cast("timestamp"))
        .withColumn(to_col, F.lit(None).cast("timestamp"))
        .withColumn(flag_col, F.lit(True))
    )
    return (
        untouched_keys.unionByName(history).unionByName(closed).unionByName(opened)
    )
