"""Bucketed tables: pre-shuffled storage for co-located, exchange-free joins.

The 100 TB lever the parquet-directory sinks can't give: a fact table
bucketed by its join key is ALREADY hash-partitioned on disk, so a join (or
groupBy) on that key needs no Exchange at read time — the single biggest
shuffle in a star-schema pipeline disappears from every downstream run.
Write once (one shuffle), join forever shuffle-free. Both sides must agree
on bucket count + key; `sortBy` inside buckets additionally removes the
sort from sort-merge joins.

The reference has no analog (it bulk-loads into Postgres and lets the DB
index; `/root/reference/pandas_to_postgres/_base_copy.py:67-114` rebuilds
PK/FK indexes post-load) — bucketing is the Spark-native counterpart of
"make the next read fast".

Spark specifics: bucketing requires the session catalog (``saveAsTable``,
not ``save``), and shuffle-free reads require
``spark.sql.sources.bucketing.enabled`` (default true). AQE respects
bucketing: it will not insert an Exchange when output partitioning already
satisfies the join's distribution.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Write ``df`` as a bucketed (and optionally per-bucket-sorted)
    catalog table.

    Sizing rule at scale: num_buckets ~= table_size / target_file_size
    (128-512 MB per bucket file per partition); both join sides MUST use
    the same count, so pick it from the larger table and reuse.
    """
    writer = df.write.format(format).mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a catalog table (bucketed metadata comes from the catalog)."""
    return spark.table(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on the same key/count — produces a plan
    with NO Exchange on either side (verified in tests): each task zips
    bucket i of the left with bucket i of the right."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)


def drop_table(spark: SparkSession, table: str) -> None:
    """Drop a catalog table (test/lifecycle hygiene)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
