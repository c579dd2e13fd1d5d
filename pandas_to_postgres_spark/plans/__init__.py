"""Oracle-checked query library.

Every operator row of SURVEY.md §2 gets a named query here: a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible) the
equivalent DuckDB oracle SQL. ``__spark_entry__.py`` re-exports the registry.
"""

from pandas_to_postgres_spark.plans.registry import REGISTRY, register, QuerySpec

# importing the modules populates REGISTRY
from pandas_to_postgres_spark.plans import relational  # noqa: F401,E402
from pandas_to_postgres_spark.plans import llm  # noqa: F401,E402
from pandas_to_postgres_spark.plans import streaming_q  # noqa: F401,E402

__all__ = ["REGISTRY", "register", "QuerySpec"]
