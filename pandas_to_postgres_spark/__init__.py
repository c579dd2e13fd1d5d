"""pandas_to_postgres_spark — a PySpark-native engine with the capabilities of
cid-harvard/pandas-to-postgres, re-expressed Spark-first.

The reference (`/root/reference/pandas_to_postgres/__init__.py:1-11`) exports a
bulk-load ETL surface: DataFrameCopy / HDFTableCopy / ParquetCopy / orchestration
helpers.  Here the same capabilities are built on the Spark DataFrame API:

- sources:   Parquet (native scan), HDF5 (distributed range scan), in-memory pandas
- sinks:     JDBC writer tier + Postgres COPY fast path with constraint hooks
- functions: target-schema normalization (the reference's ``cast_pandas``),
             vector/text expression helpers
- operators: joins the reference lacked (as-of, range), dedup (exact, MinHash-LSH,
             SimHash, n-gram Jaccard, embedding cosine), similarity search,
             multimodal column plumbing
- plans:     the oracle-checked query library exposed via ``__spark_entry__.py``
- streaming: Structured Streaming re-casts of the event aggregations

Everything is a thin, tested combinator over built-in Spark primitives; no custom
Catalyst rules are required (SURVEY.md §4).
"""

from pandas_to_postgres_spark.session import get_spark
from pandas_to_postgres_spark.sources.parquet import load_table, TABLES
from pandas_to_postgres_spark.sources.dataframe import from_pandas
from pandas_to_postgres_spark.functions.normalize import (
    cast_to_target_schema,
    apply_formatters,
)

# reference-compatible API (`/root/reference/pandas_to_postgres/__init__.py:1-11`)
from pandas_to_postgres_spark.compat import (
    DataFrameCopy,
    HDFTableCopy,
    SmallHDFTableCopy,
    BigHDFTableCopy,
    ParquetCopy,
    hdf_to_postgres,
    create_hdf_table_objects,
    get_logger,
    copy_worker,
    create_file_object,
    df_generator,
    cast_pandas,
)
from pandas_to_postgres_spark.sources.hdf import hdf_metadata
from pandas_to_postgres_spark.sinks.jdbc import write_jdbc
from pandas_to_postgres_spark.sinks.postgres_copy import (
    TargetTable,
    ForeignKey,
    copy_to_postgres,
)

__all__ = [
    "get_spark",
    "load_table",
    "TABLES",
    "from_pandas",
    "cast_to_target_schema",
    "apply_formatters",
    "DataFrameCopy",
    "HDFTableCopy",
    "SmallHDFTableCopy",
    "BigHDFTableCopy",
    "ParquetCopy",
    "hdf_to_postgres",
    "create_hdf_table_objects",
    "copy_worker",
    "create_file_object",
    "df_generator",
    "cast_pandas",
    "hdf_metadata",
    "get_logger",
    "write_jdbc",
    "TargetTable",
    "ForeignKey",
    "copy_to_postgres",
]

__version__ = "0.1.0"
