from pandas_to_postgres_spark.functions.normalize import (
    cast_to_target_schema,
    apply_formatters,
)
from pandas_to_postgres_spark.functions.vectors import (
    dot_expr,
    l2_norm_expr,
    cosine_expr,
)

__all__ = [
    "cast_to_target_schema",
    "apply_formatters",
    "dot_expr",
    "l2_norm_expr",
    "cosine_expr",
]
