from pandas_to_postgres_spark.sources.dataframe import from_pandas
from pandas_to_postgres_spark.sources.files import load_csv, load_json, load_orc
from pandas_to_postgres_spark.sources.parquet import TABLES, load_table

__all__ = [
    "load_table",
    "TABLES",
    "from_pandas",
    "load_csv",
    "load_json",
    "load_orc",
]
