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


def upsert(current: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """SCD1 merge: updates replace matching current rows, others pass
    through, new keys append. Schemas must match."""
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
    only. Changed keys get their open version closed at ``effective_ts``
    and a new open version appended.
    """
    changed = updates.select(key)
    untouched = current.join(changed, key, "left_anti")
    closed = (
        current.join(changed, key, "left_semi")
        .withColumn(to_col, F.lit(effective_ts).cast("timestamp"))
        .withColumn(flag_col, F.lit(False))
    )
    opened = (
        updates.withColumn(from_col, F.lit(effective_ts).cast("timestamp"))
        .withColumn(to_col, F.lit(None).cast("timestamp"))
        .withColumn(flag_col, F.lit(True))
    )
    return untouched.unionByName(closed).unionByName(opened)
