"""Round-10 stream-tier profiling (guide §1): break one AvailableNow drain
of windowed_event_counts into its fixed-cost parts — schema probe, query
start→first-batch, per-batch execution, termination — so optimization
targets the measured component, not a guess.

Usage: python scripts/profile_stream_r10.py [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_to_postgres_spark.session import get_spark  # noqa: E402


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_stream_r10")
    spark.sparkContext.setLogLevel("ERROR")
    path = f"{sf_dir}/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    # component 1: the per-call schema probe
    for i in range(runs):
        t0 = time.perf_counter()
        spark.read.parquet(path).schema
        print(f"schema_probe[{i}]: {time.perf_counter() - t0:.3f}s")

    from pandas_to_postgres_spark.streaming.events import (
        _windowed_agg,
        windowed_event_counts,
    )

    # component 2: full drain, with progress introspection
    for i in range(runs):
        t0 = time.perf_counter()
        agg = _windowed_agg(spark, sf_dir)
        t_plan = time.perf_counter()
        import uuid

        table = f"prof_stream_{uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.format("memory")
            .queryName(table)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        t_start = time.perf_counter()
        q.awaitTermination()
        t_done = time.perf_counter()
        spark.table(table).count()
        t_read = time.perf_counter()
        prog = q.recentProgress
        batches = [
            (
                p["batchId"],
                p["numInputRows"],
                p["durationMs"],
            )
            for p in prog
        ]
        print(
            f"drain[{i}]: total={t_read - t0:.3f}s  build_plan={t_plan - t0:.3f}"
            f"  start={t_start - t_plan:.3f}  drain={t_done - t_start:.3f}"
            f"  sink_read={t_read - t_done:.3f}  batches={batches}"
        )

    # component 3: the bench-identical call, warm
    for i in range(runs):
        t0 = time.perf_counter()
        windowed_event_counts(spark, sf_dir).count()
        print(f"bench_call[{i}]: {time.perf_counter() - t0:.3f}s")


if __name__ == "__main__":
    main()
