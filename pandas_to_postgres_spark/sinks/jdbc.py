"""JDBC writer tier (SURVEY.md §2.1 S8-tier-a, S9).

The correctness tier of the reference's Postgres sink: Spark's built-in JDBC
writer with ``truncate`` + ``overwrite`` reproduces the reference's
TRUNCATE-then-load full-refresh semantics
(`/root/reference/pandas_to_postgres/_base_copy.py:116-121`) without any
custom code. The COPY fast path lives in postgres_copy.py.

Scale notes: ``numPartitions`` bounds concurrent connections against the
database (the DB, not Spark, is the bottleneck — 1000 executors opening
1000 connections is an outage, not a speedup); ``batchsize`` is the
executemany batch (the reference's csv_chunksize analog,
`_base_copy.py:18`). ``repartition(numPartitions)`` rather than coalesce so
the write parallelism is decoupled from upstream partitioning.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    truncate: bool = True,
    batchsize: int = 10_000,
    num_partitions: Optional[int] = None,
    user: Optional[str] = None,
    password: Optional[str] = None,
    driver: str = "org.postgresql.Driver",
    **options: str,
) -> None:
    """Write ``df`` to a JDBC table with full-refresh semantics.

    ``mode="overwrite"`` + ``truncate=True`` → TRUNCATE (not DROP) then
    append, preserving the external schema as the authority — the
    reference's contract (schema reflected, never created:
    `/root/reference/pandas_to_postgres/hdf_to_postgres.py:94-96`).
    """
    if num_partitions is not None:
        df = df.repartition(num_partitions)
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("truncate", str(truncate).lower())
        .option("batchsize", str(batchsize))
        .option("driver", driver)
    )
    if user is not None:
        writer = writer.option("user", user)
    if password is not None:
        writer = writer.option("password", password)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.mode(mode).save()
