"""In-memory DataFrame source (SURVEY.md §2.1 S1).

The reference wraps an already-loaded pandas DataFrame
(`/root/reference/pandas_to_postgres/copy_df.py:11-32`). In Spark this is
``spark.createDataFrame`` with Arrow acceleration; chunking
(``csv_chunksize``) maps to output partitioning.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def from_pandas(
    spark: SparkSession,
    pdf: pd.DataFrame,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """pandas DataFrame → Spark DataFrame (Arrow-accelerated).

    ``num_partitions`` plays the role of the reference's ``csv_chunksize``
    (`copy_df.py:16`): it bounds per-task memory downstream. Empty input is
    valid and yields an empty DataFrame with the inferred schema — matching
    the reference's "empty input produces one empty chunk" semantics
    (`/root/reference/pandas_to_postgres/utilities.py:107-108`).
    """
    df = spark.createDataFrame(pdf)
    if num_partitions is not None:
        df = df.repartition(num_partitions)
    return df
