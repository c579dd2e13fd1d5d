from pandas_to_postgres_spark.sources.parquet import load_table, TABLES
from pandas_to_postgres_spark.sources.dataframe import from_pandas

__all__ = ["load_table", "TABLES", "from_pandas"]
