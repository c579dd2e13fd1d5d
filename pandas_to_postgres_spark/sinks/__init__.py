from pandas_to_postgres_spark.sinks.files import (
    compact_dataset,
    write_csv,
    write_json,
    write_parquet_partitioned,
)
from pandas_to_postgres_spark.sinks.jdbc import write_jdbc
from pandas_to_postgres_spark.sinks.postgres_copy import (
    ForeignKey,
    TargetTable,
    copy_to_postgres,
)

__all__ = [
    "write_jdbc",
    "TargetTable",
    "ForeignKey",
    "copy_to_postgres",
    "write_parquet_partitioned",
    "write_csv",
    "write_json",
    "compact_dataset",
]
