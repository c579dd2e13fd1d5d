from pandas_to_postgres_spark.sinks.jdbc import write_jdbc
from pandas_to_postgres_spark.sinks.postgres_copy import (
    TargetTable,
    ForeignKey,
    copy_to_postgres,
)

__all__ = ["write_jdbc", "TargetTable", "ForeignKey", "copy_to_postgres"]
