from pandas_to_postgres_spark.operators.cdc import scd2_apply, upsert
from pandas_to_postgres_spark.operators.dedup import (
    dedup_exact,
    dedup_incremental,
    minhash_near_duplicates,
    simhash_near_duplicates,
)
from pandas_to_postgres_spark.operators.joins import asof_join, range_join
from pandas_to_postgres_spark.operators.provenance import (
    provenance_summary,
    with_provenance,
)
from pandas_to_postgres_spark.operators.similarity import (
    merge_topk,
    topk_cosine_bruteforce,
    topk_cosine_lsh,
)

__all__ = [
    "asof_join",
    "range_join",
    "upsert",
    "scd2_apply",
    "dedup_exact",
    "dedup_incremental",
    "minhash_near_duplicates",
    "simhash_near_duplicates",
    "with_provenance",
    "provenance_summary",
    "merge_topk",
    "topk_cosine_bruteforce",
    "topk_cosine_lsh",
]
