"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is executed to completion (count() forces a full materialization
without driver-side collect of wide rows). Timings are wall-clock per query;
"value" is the total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pandas_to_postgres_spark.plans import REGISTRY  # noqa: E402
from pandas_to_postgres_spark.session import get_spark  # noqa: E402

#: headline queries: the flagship agg, a fact-fact join, a window rank, the
#: as-of join, and the LLM-pipeline operators (dedup exact + LSH, similarity,
#: text stats) — the mix a 100 TB training-data pipeline actually runs.
HEADLINE = (
    "pricing_summary",
    "join_order_revenue",
    "join_broadcast_rollup",
    "window_topn_orders",
    "asof_join_events",
    "dedup_exact",
    "minhash_neardup",
    "simsearch_topk",
    "text_stats",
    "topk_lineitems",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers with a trivial action (not timed)
    REGISTRY["count_star"].fn(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = REGISTRY[name].fn
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
