"""Scaling measurement: sf0.1 vs a deterministically constructed 8x copy.

Builds an 8x dataset by key-shifted unions of sf0.1 (copy i shifts every
join/identity key by i * 10**9, so joins stay consistent and each copy's
keyspace is disjoint; dimension tables nation/region stay single — their
keys are not shifted anywhere). Documents get a per-copy suffix so the 8x
near-dup corpus is 8-wide groups: a HARDER pair workload than uniform
growth. Then runs a query list twice on each tier (warm-vs-warm: the
second run isolates data scaling from codegen/JIT) and prints one JSON
line {query: {"sf01": s, "x8": s, "ratio": r}}.

Usage: python scripts/scale8x.py [--copies N] [--tables t1,t2] [query ...]
(default: 8 copies, all tables, the SCALE.md set). --copies 64 with
--tables documents builds the 64x near-dup tier (round-5 instruction:
measure the superlinear-looking rows another octave up). Datasets land
under .scale{N}x/ (gitignored); reused if present.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pandas_to_postgres_spark.plans import REGISTRY  # noqa: E402
from pandas_to_postgres_spark.session import get_spark  # noqa: E402
from pandas_to_postgres_spark.sources.parquet import load_table  # noqa: E402

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIFT = 10**9
COPIES = 8


def scale_dir(copies: int) -> str:
    return os.path.join(_REPO, f".scale{copies}x")

#: key columns shifted per copy, by table (dimension keys referenced from
#: nation/region are NOT shifted so the single dim copy still joins).
KEYS = {
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "orders": ("o_orderkey", "o_custkey"),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}

DEFAULT_QUERIES = [
    "pricing_summary",
    "join_order_revenue",
    "window_topn_orders",
    "asof_join_events",
    "dedup_exact",
    "minhash_neardup",
    "span_dedup_docs",
    "tfidf_top_terms",
    "source_cap_docs",
    "q21_waiting_suppliers",
]


def build_scaled(spark, copies: int = COPIES, tables=None) -> str:
    """Build (or reuse) the N-copy key-shifted dataset; returns its dir.
    ``tables`` restricts which fact tables are scaled (dims always copy
    through) — the 64x near-dup tier only needs documents."""
    xdir = scale_dir(copies)
    os.makedirs(xdir, exist_ok=True)
    for table in ("region", "nation"):
        if os.path.isdir(f"{xdir}/{table}.parquet"):
            continue
        load_table(spark, SF01, table).write.mode("overwrite").parquet(
            f"{xdir}/{table}.parquet"
        )
    for table, keys in KEYS.items():
        if tables is not None and table not in tables:
            continue
        if os.path.isdir(f"{xdir}/{table}.parquet"):
            continue  # per-table reuse: later runs can ADD tables
        base = load_table(spark, SF01, table)
        parts = []
        for i in range(copies):
            c = base
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * SHIFT))
            if table == "documents" and "text" in c.columns:
                # distinct suffix per copy -> N-wide near-dup groups
                c = c.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" copytag{i}"))
                )
            parts.append(c)
        out = parts[0]
        for c in parts[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{xdir}/{table}.parquet")
    return xdir


def timed(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    return time.perf_counter() - t0


def main() -> None:
    args = sys.argv[1:]
    copies, tables = COPIES, None
    queries = []
    i = 0
    while i < len(args):
        if args[i] == "--copies":
            copies = int(args[i + 1])
            i += 2
        elif args[i] == "--tables":
            tables = set(args[i + 1].split(","))
            i += 2
        else:
            queries.append(args[i])
            i += 1
    queries = queries or DEFAULT_QUERIES
    spark = get_spark()
    xdir = build_scaled(spark, copies, tables)
    xkey = f"x{copies}"
    out = {}
    for name in queries:
        fn = REGISTRY[name].fn
        timed(fn, spark, SF01)          # warm codegen/JIT for this shape
        s01 = timed(fn, spark, SF01)
        timed(fn, spark, xdir)
        sx = timed(fn, spark, xdir)
        out[name] = {
            "sf01": round(s01, 3),
            xkey: round(sx, 3),
            "ratio": round(sx / s01, 2) if s01 > 0 else None,
        }
        print(f"# {name}: {s01:.3f}s -> {sx:.3f}s ({sx / s01:.2f}x)", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
