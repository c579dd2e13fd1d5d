"""CSV / JSON / ORC file sources.

The reference reads HDF5, Parquet, and in-memory DataFrames
(`/root/reference/pandas_to_postgres/copy_hdf.py`, `copy_parquet.py`,
`copy_df.py`); CSV exists there only as the *wire format* toward Postgres
(`utilities.py:76-92`). A Spark engine gets file sources natively — these
wrappers pin down the options that matter for correctness and scale:

- **Explicit schema by default.** Schema inference reads the data once
  before the real scan (2x I/O at 100 TB) and silently widens types.
  Callers pass a DDL string or StructType; `infer=True` is an explicit
  opt-in for exploration.
- **NULL convention.** ``nullValue ''`` on CSV matches the COPY convention
  the reference's sink used (empty field → SQL NULL, `utilities.py:90`) —
  so a CSV produced by :mod:`..sinks.files.write_csv` round-trips
  null-preserving.
- **Malformed rows.** ``mode=PERMISSIVE`` (default) nulls bad fields,
  ``DROPMALFORMED`` skips bad rows, ``FAILFAST`` aborts — surfaced as a
  parameter because at 100 TB of scraped data the policy choice is a real
  pipeline decision, not a default to inherit silently.

All three formats scan partition-parallel (one task per file split; JSON and
CSV split on newlines, so even single huge files parallelize unless
compressed with a non-splittable codec like gzip).
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SchemaLike = Union[str, T.StructType]


def load_csv(
    spark: SparkSession,
    path: str,
    schema: Optional[SchemaLike] = None,
    header: bool = True,
    infer: bool = False,
    sep: str = ",",
    parse_mode: str = "PERMISSIVE",
) -> DataFrame:
    """CSV scan with explicit schema (or opt-in inference)."""
    if schema is None and not infer:
        raise ValueError("pass a schema, or infer=True to opt into inference")
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", sep)
        .option("nullValue", "")
        .option("mode", parse_mode)
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def load_json(
    spark: SparkSession,
    path: str,
    schema: Optional[SchemaLike] = None,
    infer: bool = False,
    parse_mode: str = "PERMISSIVE",
) -> DataFrame:
    """JSON-lines scan with explicit schema (or opt-in inference)."""
    if schema is None and not infer:
        raise ValueError("pass a schema, or infer=True to opt into inference")
    reader = spark.read.option("mode", parse_mode)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def load_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (self-describing columnar — schema comes from the footer,
    same pushdown/pruning properties as parquet)."""
    return spark.read.orc(path)
