"""Relational query surface (SURVEY.md §2.2–§2.8): filters, joins J1–J8,
aggregations A1–A6, windows W1–W3, sorts/top-k, set ops U1–U2, scalar
functions F1–F6. Every query has a DuckDB oracle.

Conventions (driver contract):
- every computed column is aliased identically in Spark and SQL;
- double aggregates are rounded (2–5 digits) so FP summation order can't
  flip the value hash;
- computed integer columns are cast to BIGINT on both sides (DuckDB counts/
  ranks are BIGINT; Spark's are int);
- timestamps leave the plan as formatted strings or plain dates.

Scale notes are per-query docstrings; the common themes: filters/projections
push to the parquet scan, small dims broadcast, fact-fact joins shuffle on
the join key once, aggs are partial+final (map-side combine) by Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pandas_to_postgres_spark.functions.agg import davg, davg_sql, dsum, dsum_sql
from pandas_to_postgres_spark.operators.joins import asof_join, range_join
from pandas_to_postgres_spark.operators.skew import salt_join, salted_agg
from pandas_to_postgres_spark.plans.registry import register
from pandas_to_postgres_spark.sources.parquet import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------- A2 / P4

@register(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')}                                        AS sum_qty,
           {dsum_sql('l_extendedprice')}                                   AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)')}                AS sum_disc_price,
           {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}  AS sum_charge,
           {davg_sql('l_quantity')}                                        AS avg_qty,
           {davg_sql('l_extendedprice')}                                   AS avg_price,
           {davg_sql('l_discount')}                                        AS avg_disc,
           count(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (flagship). Scan → pushed filter → hash agg.

    Scale: the filter reaches the parquet scan (PushedFilters); the groupBy
    key has tiny cardinality so partial aggregation collapses each partition
    to a few rows before the single shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount > 0.05
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: predicate + projection, both pushed to the scan (ReadSchema shows
    only 6 columns; PushedFilters shows the range + gt predicates)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00"))
            & (F.col("l_discount") > 0.05)
        )
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    )


# ------------------------------------------------------------------- joins

@register(
    "join_broadcast_rollup",
    oracle=f"""
    SELECT r_name, n_name,
           count(*) AS n_customers,
           {dsum_sql('c_acctbal')} AS acctbal_total
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_broadcast_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: dims are explicitly broadcast — no shuffle of the customer fact;
    the only shuffle is the final small agg."""
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum(F.col("c_acctbal")).alias("acctbal_total"),
        )
    )


@register(
    "join_order_revenue",
    oracle=f"""
    SELECT o_orderkey, o_orderpriority,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           count(*) AS n_items
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_orderpriority
    """,
)
def join_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: fact-fact equi-join → sort-merge/shuffled-hash on the order key.

    r10 (guide §2.3 "aggregate before you shuffle"): the measures touch
    only lineitem columns and the grouping key contains the join key, so
    lineitem folds to one (l_orderkey, decimal partial sum, count) row per
    key BELOW its exchange — the big side shuffles ~4x fewer, far narrower
    rows, and the post-join aggregate sums bounded per-key partials
    instead of raw items. Exactness: decimal partial sums re-sum exactly
    (associative, no overflow headroom lost at decimal(28,6) → (38,6)),
    counts re-sum as bigint, and duplicate o_orderkey rows (if any)
    multiply partials exactly as they multiplied raw rows, so the final
    grouped values are bit-identical to the unfolded plan's.

    Scale: both sides still shuffle ONCE on o_orderkey/l_orderkey; the
    final agg reuses the join partitioning (no third shuffle — the
    partitioning on the key subset satisfies the grouped distribution;
    check .explain)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # partial fold below the shuffle: raw decimal sum (dsum's rounding is
    # applied ONCE, over the re-summed total, exactly like the flat plan)
    li_pre = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            ).alias("__rev"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    return (
        o.join(li_pre, o.o_orderkey == li_pre.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.round(F.sum("__rev"), 2).cast("double").alias("revenue"),
            F.sum("__n").alias("n_items"),
        )
    )


@register(
    "join_left_counts",
    oracle="""
    SELECT o_orderkey, count(l_orderkey) AS n_items
    FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey
    """,
)
def join_left_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left outer — orders with zero lineitems keep count 0."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("n_items"))
    )


@register(
    "join_semi_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_semi_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: left-semi — customers having at least one order. The semi join
    never materializes order columns (narrow shuffle)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti_parts",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
    """,
    # correct sf0.001 answer is EMPTY — declare it so the
    # non-degeneracy floor doesn't flag it
    min_rows=0,
)
def join_anti_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: left-anti — parts never shipped."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return p.join(li, p.p_partkey == li.l_partkey, "left_anti").select(
        "p_partkey", "p_name"
    )


@register(
    "range_join_bins",
    oracle=f"""
    WITH bins(lo, hi, bucket) AS (
        VALUES (0.0, 50.0, 'low'), (50.0, 100.0, 'mid'),
               (100.0, 200.0, 'high'), (200.0, 1e9, 'huge'))
    SELECT bucket, count(*) AS n_events, {dsum_sql('value')} AS total_value
    FROM events e JOIN bins b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY bucket
    """,
)
def range_join_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: theta/range join against a tiny bin table — broadcast nested loop
    (the bin side is broadcast; the events scan never shuffles)."""
    e = _t(spark, sf_dir, "events")
    bins = spark.createDataFrame(
        [(0.0, 50.0, "low"), (50.0, 100.0, "mid"), (100.0, 200.0, "high"), (200.0, 1e9, "huge")],
        "lo double, hi double, bucket string",
    )
    joined = range_join(
        e, bins, (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    )
    return joined.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value")).alias("total_value"),
    )


@register(
    "asof_join_events",
    oracle="""
    SELECT p.event_id, p.user_id,
           round(p.value, 2) AS purchase_value,
           round(c.value, 2) AS last_click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: as-of join — for each purchase, the latest prior click's value
    per user. Validated against DuckDB's native ASOF JOIN.

    Scale: single shuffle on user_id (union+window construction), no pair
    explosion — see operators/joins.py."""
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    clicks = e.filter(F.col("event_type") == "click")
    joined = asof_join(
        purchases, clicks, on="ts", by="user_id", value_cols=["value"], suffix="_click"
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("purchase_value"),
        F.round("value_click", 2).alias("last_click_value"),
    )


# -------------------------------------------------------------------- aggs

@register("count_star", oracle="SELECT count(*) AS n_rows FROM lineitem")
def count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — the one aggregation the reference itself performs (running row
    count, `/root/reference/pandas_to_postgres/copy_hdf.py:103`)."""
    return _t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


@register(
    "distinct_counts",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT l_partkey) AS n_part,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: exact distinct aggregation (Catalyst expands to a two-stage
    distinct-then-count plan)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "rollup_acctbal",
    oracle=f"""
    SELECT r_name, n_name, count(*) AS n, {dsum_sql('c_acctbal')} AS total
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def rollup_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: ROLLUP grouping sets (region → nation → grand total)."""
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("c_acctbal")).alias("total"))
    )


@register(
    "cube_orders",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           {dsum_sql('o_totalprice')} AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4b: CUBE grouping sets — all 4 combinations of (status, priority)."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice")).alias("total")
    )


@register(
    "conditional_agg",
    oracle=f"""
    SELECT o_orderpriority,
           {dsum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END")} AS f_total,
           count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS o_count,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: filtered/conditional aggregation via CASE inside agg."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        dsum(
            F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(0.0)
        ).alias("f_total"),
        F.count(F.when(F.col("o_orderstatus") == "O", F.lit(1))).alias("o_count"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "collect_set_segments",
    oracle="""
    SELECT n_name,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def collect_set_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: collect_set, sorted+joined to a string so the hash is
    order-insensitive on both engines."""
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("c_mktsegment"))).alias("segments")
        )
    )


# ----------------------------------------------------------------- windows

@register(
    "window_topn_orders",
    oracle="""
    SELECT * FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (
                    PARTITION BY c_mktsegment
                    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        FROM orders JOIN customer ON o_custkey = c_custkey)
    WHERE rn <= 3
    """,
)
def window_topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: per-group top-N by window rank with a deterministic tie-break."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_mktsegment",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_lag_events",
    oracle="""
    SELECT event_id, user_id,
           round(value - lag(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id), 2) AS delta
    FROM events
    """,
)
def window_lag_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: analytic lag over event time per user (first row → NULL delta)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
    FROM events
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: frame-spec running aggregate (identical accumulation order on
    both engines → stable under rounding)."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


@register(
    "session_windows",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sess AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked)
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n
    FROM sess GROUP BY user_id, sid
    """,
)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4/§2.9: gap-based session windows (30 min inactivity) per user via
    ``session_window`` — the oracle derives the identical sessions with the
    gaps-and-islands construction. In streaming this same expression pairs
    with ``withWatermark`` for state expiry."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n",
        )
    )


# ------------------------------------------------------------ sort / top-k

@register(
    "topk_lineitems",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 10
    """,
)
def topk_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: Catalyst rewrites orderBy+limit to TakeOrderedAndProject —
    a per-partition heap + driver merge, never a full sort at scale."""
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .limit(10)
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment filter → 3-way join → per-order revenue →
    top-10. Scale: customer filter prunes before the join; orders⋈lineitem
    shuffles once on the order key; top-10 is TakeOrdered, never a full
    sort."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_volume",
    oracle=f"""
    SELECT n_name, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join with the local-supplier condition
    (customer and supplier share a nation). Dims broadcast; the fact chain
    shuffles on its join keys only."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "percentiles_price",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3b: exact interpolated percentiles — Spark ``percentile`` and
    DuckDB ``quantile_cont`` share the linear-interpolation definition."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90"),
    )


@register("approx_distinct_parts")  # rows-only: HLL estimates are engine-specific
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3c: approx_count_distinct (HyperLogLog++) — the sketch tier for
    100 TB cardinalities. Estimates are deterministic per engine but not
    across engines → rows-only check (exact distincts are oracle-checked in
    distinct_counts)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("approx_supps"),
    )


# ----------------------------------------------------------------- set ops

@register(
    "union_slices",
    oracle=f"""
    SELECT slice, count(*) AS n, {dsum_sql('o_totalprice')} AS total
    FROM (
        SELECT 'f_slice' AS slice, o_totalprice FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT 'o_slice' AS slice, o_totalprice FROM orders WHERE o_orderstatus = 'O'
        UNION ALL
        SELECT 'p_slice' AS slice, o_totalprice FROM orders WHERE o_orderstatus = 'P')
    GROUP BY slice
    """,
)
def union_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — the reference's many-sources→one-table routing
    (`/root/reference/pandas_to_postgres/utilities.py:36-38`,
    `copy_hdf.py:98-120`) re-expressed as unionByName over per-source scans."""
    o = _t(spark, sf_dir, "orders")
    slices = [
        o.filter(F.col("o_orderstatus") == s).select(
            F.lit(name).alias("slice"), "o_totalprice"
        )
        for s, name in (("F", "f_slice"), ("O", "o_slice"), ("P", "p_slice"))
    ]
    unioned = slices[0]
    for s in slices[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy("slice").agg(
        F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice")).alias("total")
    )


@register(
    "intersect_custkeys",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def intersect_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2a: INTERSECT (distinct) — customers with both F and O orders."""
    o = _t(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    op = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.intersect(op)


@register(
    "except_custkeys",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2b: EXCEPT (distinct) — customers with F orders but no P orders."""
    o = _t(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    p = o.filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("custkey"))
    return f.subtract(p)


# ---------------------------------------------------------- scalar functions

@register(
    "string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                 AS brand_u,
           substring(p_name, 1, 8)        AS name_prefix,
           CAST(length(p_name) AS BIGINT) AS name_len,
           concat_ws('|', p_brand, p_type) AS brand_type,
           round(p_retailprice * 1.1, 2)  AS marked_up
    FROM part
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 (strings/math): substring/upper/length/concat_ws/round."""
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("marked_up"),
    )


@register(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)  AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           strftime(o_orderdate, '%Y-%m')     AS order_ym,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
               AS days_since_epoch_start
    FROM orders
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 (dates): year/month/format/datediff."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
    )


@register(
    "json_extract_events",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_total,
           round(CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
                 / count(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS k_avg
    FROM events GROUP BY event_type
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: JSON extraction from the props string column (get_json_object),
    aggregated per event type.

    The round-1/round-2 hash mismatch on this query was NOT floating-point
    nondeterminism (an earlier docstring here blamed partial-agg merge
    order — retracted: values were verified bit-identical between Spark
    and DuckDB). Root cause: DuckDB types ``sum(BIGINT)`` as HUGEINT and
    converts HUGEINT to float64 in pandas, so the oracle emitted ``N.0``
    where Spark emitted long ``N``. Fix: CAST the *outer* sum to BIGINT
    in the oracle SQL. k_avg stays exact-integer-sum / non-null-count so
    one double division is deterministic on any engine."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("k_total"),
        F.round(F.sum(k).cast("double") / F.count(k), 4).alias("k_avg"),
    )


@register(
    "json_corrupt_audit",
    oracle="""
    WITH feed AS (
      SELECT event_type,
             CASE WHEN event_id % 7 = 0
                  THEN '{"k": ' || substr(props, 1, 3)
                  ELSE props END AS props
      FROM events),
    parsed AS (
      SELECT event_type,
             CASE WHEN json_valid(props) THEN 0 ELSE 1 END AS corrupt,
             CASE WHEN json_valid(props)
                  THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                  END AS k
      FROM feed)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(corrupt) AS BIGINT) AS n_corrupt,
           CAST(sum(k) AS BIGINT) AS k_sum_valid
    FROM parsed GROUP BY event_type
    """,
)
def json_corrupt_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input robustness audit — the dirty-feed reality every
    ingest pipeline meets: a deterministic 1-in-7 slice of the JSON
    props column is corrupted (truncated mid-object), parsed with
    ``from_json`` under PERMISSIVE semantics (corrupt rows yield a NULL
    struct instead of failing the job), and the per-type report carries
    the corruption count alongside the aggregate over the valid rows —
    the shape of a data-quality gate that quarantines bad records
    without losing the batch.

    Exactness: corruption selection is integer modulo; valid-row k sums
    are BIGINT; the oracle mirrors the NULL-struct rule with
    ``json_valid``. Scale: one map-only parse projection + one
    map-side-combined aggregate — the audit costs a scan, never a
    second pass.
    """
    e = _t(spark, sf_dir, "events")
    feed = e.select(
        "event_type",
        F.when(
            F.col("event_id") % 7 == 0,
            F.concat(F.lit('{"k": '), F.substring("props", 1, 3)),
        )
        .otherwise(F.col("props"))
        .alias("props"),
    )
    # PERMISSIVE from_json yields a struct with NULL fields (never a NULL
    # struct) for malformed input; every well-formed props in this feed
    # carries k (asserted against the data), so k-NULL ⇔ corrupt — which
    # is also the only oracle-expressible form: DuckDB's json_extract
    # ERRORS on malformed JSON, so the oracle must gate on json_valid
    parsed = feed.select(
        "event_type",
        F.from_json("props", "k BIGINT").alias("j"),
    ).select(
        "event_type",
        F.when(F.col("j.k").isNull(), 1).otherwise(0).alias("corrupt"),
        F.col("j.k").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("corrupt").cast("bigint").alias("n_corrupt"),
        F.sum("k").cast("bigint").alias("k_sum_valid"),
    )


@register(
    "array_ops_embeddings",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           round(sqrt((SELECT sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
                       FROM range(1, 65) t(i))), 4) AS l2_norm
    FROM embeddings e
    """,
)
def array_ops_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: array ops over array<float> — size, element access, aggregate
    (L2 norm), all JVM-side expressions."""
    from pandas_to_postgres_spark.functions.vectors import l2_norm_expr

    e = _t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(l2_norm_expr(F.col("embedding")), 4).alias("l2_norm"),
    )


@register(
    "json_struct_parse",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
    FROM events
    """,
)
def json_struct_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5b: schema-full JSON parsing with from_json → typed struct (the
    scale path: parse once into columns, not per-access get_json_object)."""
    e = _t(spark, sf_dir, "events")
    parsed = e.select(
        "event_id", F.from_json("props", "k LONG").alias("p")
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k_val"),
        (F.col("p.k") % 10).alias("k_mod"),
    )


@register(
    "like_filter",
    oracle="""
    SELECT p_partkey, p_name, p_type FROM part
    WHERE p_type LIKE '%PROMO%' AND p_name NOT LIKE '%green%'
    """,
)
def like_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4b: LIKE / NOT LIKE predicates (pushed to the scan as
    StringContains where possible)."""
    p = _t(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("%PROMO%") & ~F.col("p_name").like("%green%")
    ).select("p_partkey", "p_name", "p_type")


@register(
    "sql_interface_revenue",
    oracle=f"""
    SELECT n_name, count(*) AS n_orders, {dsum_sql('o_totalprice')} AS total
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def sql_interface_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's second entry point: plain Spark SQL over registered
    views — identical Catalyst plan to the DataFrame API."""
    for t in ("orders", "customer", "nation"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(
        """SELECT n_name, count(*) AS n_orders,
                  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
           FROM v_orders
           JOIN v_customer ON o_custkey = c_custkey
           JOIN v_nation   ON c_nationkey = n_nationkey
           GROUP BY n_name"""
    )


@register(
    "cast_nullable",
    oracle="""
    SELECT o_orderkey,
           CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
           CAST(CASE WHEN o_orderstatus = 'P' THEN NULL
                     ELSE o_totalprice > 150 END AS BIGINT) AS flag
    FROM orders
    """,
)
def cast_nullable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2 — the reference's `cast_pandas` semantic obligation
    (`/root/reference/pandas_to_postgres/utilities.py:119-167`): NULLs
    survive int and bool columns end-to-end. Spark primitives are natively
    nullable, so the query is the whole implementation."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.floor("o_totalprice").cast("long").alias("price_floor"),
        F.when(F.col("o_orderstatus") == "P", F.lit(None).cast("boolean"))
        .otherwise(F.col("o_totalprice") > 150)
        .cast("long")
        .alias("flag"),
    )


@register(
    "normalize_target_schema",
    oracle="""
    SELECT CAST(l_orderkey AS BIGINT)   AS l_orderkey,
           CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CAST(l_quantity AS DOUBLE)   AS l_quantity,
           l_returnflag
    FROM lineitem
    """,
)
def normalize_target_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/F1: project+cast onto an external target schema — the Spark
    re-expression of the reference's `cast_pandas` + COPY column-list
    projection (`/root/reference/pandas_to_postgres/_base_copy.py:140-143`)."""
    from pyspark.sql import types as T

    from pandas_to_postgres_spark.functions.normalize import cast_to_target_schema

    target = T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_linenumber", T.LongType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
        ]
    )
    return cast_to_target_schema(_t(spark, sf_dir, "lineitem"), target)


# ------------------------------------------------- correlated subqueries

def _register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        _t(spark, sf_dir, n).createOrReplaceTempView(n)


@register(
    "exists_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    GROUP BY o_orderpriority
    """,
)
def exists_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS, submitted as SQL so Catalyst's
    subquery decorrelation rewrites it (RewritePredicateSubquery → left
    semi join on l_orderkey).

    Scale: the decorrelated plan is one semi-join shuffle on the order key
    with the quantity filter pushed below it — same shape we'd hand-write,
    derived automatically. Verify with .explain(): no per-row subquery."""
    _register_views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        GROUP BY o_orderpriority
        """
    )


@register(
    "scalar_subquery_brand_price",
    oracle="""
    SELECT p.p_partkey, round(p.p_retailprice, 2) AS retail
    FROM part p
    WHERE p.p_retailprice > (SELECT 1.02 * avg(p2.p_retailprice)
                             FROM part p2 WHERE p2.p_brand = p.p_brand)
    """,
    # correct sf0.001 answer is EMPTY — declare it so the
    # non-degeneracy floor doesn't flag it
    min_rows=0,
)
def scalar_subquery_brand_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (price vs 1.02x the
    per-brand average), decorrelated by Catalyst into an aggregate joined
    back on p_brand.

    Scale: one partial+final agg over part (tiny per-brand row) broadcast
    back against the scan — no per-row re-aggregation."""
    _register_views(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT p.p_partkey, round(p.p_retailprice, 2) AS retail
        FROM part p
        WHERE p.p_retailprice > (SELECT 1.02 * avg(p2.p_retailprice)
                                 FROM part p2 WHERE p2.p_brand = p.p_brand)
        """
    )


@register(
    "q6_revenue_delta",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + global agg — the canonical predicate-pushdown
    showcase. All four predicates reach the parquet scan (PushedFilters:
    shipdate min/max prune whole row groups via statistics); the agg is a
    single partial+final sum, shuffling one row per partition."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "having_big_orders",
    oracle=f"""
    SELECT c.c_name, o.o_orderkey, {dsum_sql('l.l_quantity')} AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_name, o.o_orderkey
    HAVING sum(l.l_quantity) > 150
    """,
)
def having_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: join fan-in + groupBy + HAVING.

    Scale: lineitem→orders join shuffles on the order key; the customer dim
    broadcasts; HAVING is a post-agg filter so it never touches the fact
    scan, but the agg itself is partial+final (map-side combine collapses
    each order's lines before the shuffle)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "o_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11 AND p.p_size BETWEEN 1 AND 5)
       OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20 AND p.p_size BETWEEN 1 AND 10)
       OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30 AND p.p_size BETWEEN 1 AND 15)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate across both join sides.

    Scale: Catalyst extracts the common sub-predicates it can push to each
    scan (brand/size reach the part scan; quantity bounds reach lineitem as
    an OR-range) and evaluates the full disjunction post-join; part
    broadcasts. The point of the shape: disjunctions don't break pushdown
    entirely — the per-side residuals still prune."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 11) & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 20) & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 30) & F.col("p_size").between(1, 15))
    )
    return j.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


@register(
    "q22_idle_customers",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           count(*) AS n_cust,
           round(sum(c.c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c.c_mktsegment
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: high-balance customers with NO recent order —
    uncorrelated scalar subquery (global positive-balance average) +
    correlated NOT EXISTS anti-join + group-agg, submitted as SQL.

    Scale: the scalar subquery computes once and folds into the filter as
    a literal-ish broadcast; NOT EXISTS decorrelates to a left-anti join
    shuffling on custkey. Nothing is per-row."""
    _register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c.c_mktsegment AS segment,
               count(*) AS n_cust,
               round(sum(c.c_acctbal), 2) AS total_bal
        FROM customer c
        WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY c.c_mktsegment
        """
    )


# ------------------------------------------------- more TPC-H query shapes

@register(
    "q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    """,
    # correct sf0.001 answer is EMPTY — declare it so the
    # non-degeneracy floor doesn't flag it
    min_rows=0,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by ship
    year. The nation dim joins twice under different roles (supplier-side
    and customer-side).

    Scale: both nation copies broadcast; the disjunctive nation-pair filter
    lands on broadcast-join outputs, pruning before the fact-fact
    lineitem-orders shuffle. Year extraction is a codegen'd expression on
    the agg key, not a pre-shuffle projection blowup."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("sn_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n2, F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           round(
             CAST(sum(CASE WHEN n1.n_name = 'NATION_3'
                           THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                           ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE),
             6) AS mkt_share
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    JOIN region ON n2.n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3 suppliers' share of PROMO-part revenue sold
    to AMERICA customers, by order year — 8-table join + conditional ratio
    aggregate.

    Scale: part/supplier/nation/region all broadcast (p_type filter prunes
    part before broadcast); the only shuffles are the lineitem-orders join
    and the final tiny per-year agg. The ratio uses exact decimal sums so
    the result is partition-order independent."""
    li = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(_t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
        )
    )
    r = F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dec = vol.cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("sn_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n2, F.col("c_nationkey") == F.col("cn_key"))
        .join(r, F.col("cn_region") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", dec).otherwise(zero))
                .cast("double")
                / F.sum(dec).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           round(c_acctbal, 2) AS acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top 20 customers by revenue lost to returned items
    in a half-year window.

    Scale: both the date filter (orders) and returnflag filter (lineitem)
    push to the parquet scans; nation broadcasts; orderBy+limit compiles to
    TakeOrderedAndProject (per-partition top-20, no global sort). The
    custkey tiebreak makes the limit boundary deterministic."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(
            "c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"), "n_name"
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT round(
             100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                              THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                              ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE),
             6) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percent of one month's revenue from PROMO parts —
    global conditional ratio aggregate over a broadcast join.

    Scale: the one-month filter pushes to the lineitem scan (at 100 TB with
    date-partitioned storage it becomes partition pruning); part broadcasts;
    the global agg collapses map-side to one row per partition."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00"))
    )
    p = F.broadcast(_t(spark, sf_dir, "part"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dec = vol.cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    return li.join(p, li.l_partkey == p.p_partkey).agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", dec).otherwise(zero)).cast(
                "double"
            )
            / F.sum(dec).cast("double"),
            6,
        ).alias("promo_pct")
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY supplier_no
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue —
    derived aggregate reused twice (per-supplier revenue AND its global
    max), expressed with an unpartitioned window max instead of a self-join
    on the CTE.

    Scale: the revenue agg shuffles on suppkey once; the window max runs
    over supplier-cardinality rows (tiny post-agg), avoiding a second scan
    of the CTE that the SQL formulation implies. Exact-decimal rounding
    makes the max comparison stable across partitionings."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00"))
    )
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    mx = Window.partitionBy()
    return (
        rev.withColumn("__mx", F.max("total_revenue").over(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "grouping_sets_orders",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2)::DOUBLE AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 (explicit GROUPING SETS, beyond rollup/cube): two independent
    one-column groupings plus the grand total in a single pass.

    Scale: Catalyst expands grouping sets with an Expand node — one scan,
    one shuffle carrying (key, grouping_id) — instead of three scans
    unioned. The decimal sum keeps the totals partition-order independent."""
    _register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
                 AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


@register(
    "asof_forward_events",
    oracle="""
    SELECT p.event_id, p.user_id,
           (SELECT round(arg_min(c.value, c.ts), 2)
            FROM events c
            WHERE c.event_type = 'click'
              AND c.user_id = p.user_id
              AND c.ts >= p.ts
              AND c.ts <= p.ts + INTERVAL 1 HOUR) AS next_click_value
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
)
def asof_forward_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 (forward + tolerance): for each purchase, the EARLIEST click of
    the same user at-or-after the purchase, but only within 1 hour —
    clicks farther out are no match (NULL). DuckDB has no forward ASOF
    JOIN, so the oracle is a correlated arg_min subquery.

    Scale: same single-shuffle union+window construction as backward as-of
    (operators/joins.asof_join, direction='forward'); the tolerance is a
    post-window filter, not a join condition, so the plan is unchanged."""
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    clicks = e.filter(F.col("event_type") == "click")
    joined = asof_join(
        purchases,
        clicks,
        on="ts",
        by="user_id",
        value_cols=["value"],
        suffix="_next",
        direction="forward",
        tolerance=3600.0,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round("value_next", 2).alias("next_click_value"),
    )


@register(
    "pivot_returnflag",
    oracle=f"""
    SELECT l_linestatus,
           {dsum_sql("CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE NULL END")} AS qty_A,
           {dsum_sql("CASE WHEN l_returnflag = 'N' THEN l_quantity ELSE NULL END")} AS qty_N,
           {dsum_sql("CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE NULL END")} AS qty_R
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: quantity totals per linestatus spread across returnflag
    columns — ``groupBy().pivot(col, values).agg()``.

    Scale: the explicit value list matters — without it Spark runs an extra
    distinct job to discover pivot values (a full scan + shuffle before the
    real query). With it, the pivot compiles to conditional aggregates: one
    scan, one shuffle, same as a CASE-WHEN rollup."""
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(dsum(F.col("l_quantity")))
    )
    return out.select(
        "l_linestatus",
        F.col("A").alias("qty_A"),
        F.col("N").alias("qty_N"),
        F.col("R").alias("qty_R"),
    )


@register(
    "rank_distributions",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def rank_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 (distribution ranks): ntile quartiles, percent_rank and cume_dist
    per market segment — the statistical window family beyond row_number.

    Scale: one shuffle on the partition key; the c_custkey tiebreak makes
    every rank deterministic (percent_rank over ties is engine-dependent
    otherwise)."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "trailing_window_revenue",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                 OVER (PARTITION BY o_custkey
                       ORDER BY epoch(o_orderdate)
                       RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW),
               2) AS DOUBLE) AS trailing_30d
    FROM orders
    """,
)
def trailing_window_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 (time-range frame): per customer, each order's trailing-30-day
    order total — ``rangeBetween`` over epoch seconds, the event-time frame
    ``rowsBetween`` cannot express (rows vs time distance).

    Scale: one shuffle on o_custkey; the range frame is evaluated with a
    sliding aggregate over the sorted partition, O(n) per key. Ties on the
    sort key (same-day orders) are summed together by RANGE semantics in
    both engines — deterministic without a tiebreak."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2592000, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w), 2)
        .cast("double")
        .alias("trailing_30d"),
    )


@register(
    "hypertable_rollup",
    oracle=f"""
    SELECT day, hr, count(*) AS n, {dsum_sql('value')} AS total_value
    FROM (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                 strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hr,
                 value
          FROM events)
    GROUP BY GROUPING SETS ((day, hr), (day))
    """,
)
def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: hourly AND daily event
    aggregates materialized in ONE pass via grouping sets over two
    time-bucket granularities (the batch shape of a TimescaleDB continuous
    aggregate / rollup cascade).

    Scale: one scan + one Expand (x2) + one shuffle — vs two scans and two
    shuffles for separate hourly/daily jobs. At 100 TB the coarser levels
    are nearly free because Expand rows carrying the same (day) key combine
    map-side."""
    _register_views(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT day, hr, count(*) AS n,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
                 AS total_value
        FROM (SELECT date_format(date_trunc('DAY', ts), 'yyyy-MM-dd') AS day,
                     date_format(date_trunc('HOUR', ts), 'yyyy-MM-dd HH') AS hr,
                     value
              FROM events)
        GROUP BY GROUPING SETS ((day, hr), (day))
        """
    )


@register(
    "kmv_distinct_parts",
    oracle="""
    WITH mins AS (
      SELECT DISTINCT
             CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM lineitem ORDER BY h LIMIT 256
    )
    SELECT round(CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
                      ELSE 255.0 * 1152921504606846976.0 / CAST(max(h) AS DOUBLE)
                 END, 2) AS est_distinct
    FROM mins
    """,
)
def kmv_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch, k=256 — a
    deterministic, mergeable cardinality estimate that is bit-reproducible
    ACROSS ENGINES (md5-based hash, unlike HLL whose estimate is
    implementation-specific — cf. the rows-only `approx_distinct_parts`).

    Scale: the k smallest hashes per partition are found locally
    (TakeOrderedAndProject), only k values per partition move to the
    driver-side merge — O(k) memory however many billion rows scanned. The
    sketch union (min-merge of two KMV sets) makes it incrementally
    maintainable across ingest batches."""
    li = _t(spark, sf_dir, "lineitem")
    k = 256
    h = F.conv(
        F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    mins = li.select(h.alias("h")).distinct().orderBy("h").limit(k)
    return mins.agg(
        F.round(
            F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")).otherwise(
                F.lit(float(k - 1))
                * F.lit(1152921504606846976.0)
                / F.max("h").cast("double")
            ),
            2,
        ).alias("est_distinct")
    )


@register(
    "unpivot_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, round(val, 2) AS val
    FROM (
      SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val
      FROM lineitem WHERE l_orderkey < 100
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
      FROM lineitem WHERE l_orderkey < 100
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
      FROM lineitem WHERE l_orderkey < 100
    )
    """,
)
def unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide measure columns → long (measure, value) rows via
    ``DataFrame.unpivot`` (the inverse of pivot_returnflag).

    Scale: unpivot is a flatMap-style projection — rows x measures output,
    no shuffle; the id columns repeat per measure so project only what the
    long format needs."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "v",
    ).select(
        "l_orderkey", "l_linenumber", "measure", F.round("v", 2).alias("val")
    )


@register(
    "scd2_customer_updates",
    oracle="""
    WITH cur AS (
      SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal,
             TIMESTAMP '2020-01-01 00:00:00' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to,
             TRUE AS is_current
      FROM customer
    ),
    upd AS (
      SELECT c_custkey, c_name, round(c_acctbal + 100.0, 2) AS acctbal
      FROM customer WHERE c_custkey % 10 = 0
    )
    SELECT * FROM (
      SELECT c.* FROM cur c
      WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.c_custkey = c.c_custkey)
      UNION ALL
      SELECT c.c_custkey, c.c_name, c.acctbal, c.valid_from,
             TIMESTAMP '2024-06-01 00:00:00', FALSE
      FROM cur c
      WHERE EXISTS (SELECT 1 FROM upd u WHERE u.c_custkey = c.c_custkey)
      UNION ALL
      SELECT u.c_custkey, u.c_name, u.acctbal,
             TIMESTAMP '2024-06-01 00:00:00', CAST(NULL AS TIMESTAMP), TRUE
      FROM upd u
    )
    """,
)
def scd2_customer_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC / SCD2 merge emulation (no MERGE INTO without a transactional
    table format): an update batch (10% of customers with changed balances)
    closes out current dimension versions and appends new open versions —
    anti-join + semi-join + union, full history kept
    (operators/cdc.scd2_apply).

    Scale: one key-shuffle for the semi/anti pair, union is shuffle-free;
    with a key-partitioned dimension only changed partitions rewrite."""
    from pandas_to_postgres_spark.operators.cdc import scd2_apply

    c = _t(spark, sf_dir, "customer")
    cur = c.select(
        "c_custkey",
        "c_name",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit("2020-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    upd = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_name",
        F.round(F.col("c_acctbal") + 100.0, 2).alias("acctbal"),
    )
    return scd2_apply(cur, upd, key="c_custkey", effective_ts="2024-06-01 00:00:00")


@register(
    "q13_order_distribution",
    oracle="""
    SELECT n_orders, count(*) AS n_custs
    FROM (SELECT c_custkey, count(o_orderkey) AS n_orders
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
    GROUP BY n_orders
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution — aggregate of an
    aggregate, with LEFT JOIN keeping zero-order customers in the histogram.

    Scale: first agg shuffles on custkey (reusing the join partitioning —
    one exchange for join+agg), second agg shuffles the tiny histogram.
    The left join means no customer is lost: COUNT(o_orderkey) counts
    non-null matches only."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_custs"))


@register(
    "funnel_conversion",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS step_view,
           CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                    THEN 1 ELSE 0 END) AS BIGINT) AS step_click,
           CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                     AND t_purchase > t_click THEN 1 ELSE 0 END)
                AS BIGINT) AS step_purchase
    FROM per_user
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: users progressing view → click → purchase IN ORDER
    (each step's first occurrence must follow the previous step's). One
    conditional-min aggregation per user, then one global rollup — the
    event-analytics pattern sessionization feeds.

    Scale: a single shuffle on user_id; the per-step min() is map-side
    combinable, so the funnel costs the same as a count regardless of
    events per user. NULL-safe by construction: a missing step's min is
    NULL and the > comparison fails, dropping the user from later steps."""
    e = _t(spark, sf_dir, "events")

    def first_ts(t):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    per_user = e.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    stepped = F.col("t_view").isNotNull()
    clicked = stepped & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(stepped.cast("long")).alias("step_view"),
        F.sum(clicked.cast("long")).alias("step_click"),
        F.sum(purchased.cast("long")).alias("step_purchase"),
    )


# -------------------------------------------- Spark 4 SQL surface additions

@register(
    "lateral_topk_orders",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice
             FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey
             LIMIT 2) t
    WHERE c.c_acctbal > 9000
    """,
)
def lateral_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery with ORDER BY + LIMIT: each qualifying
    customer's top-2 orders by value — the per-row-top-k idiom SQL users
    reach for before they know window functions.

    Scale: Spark does NOT execute the subquery per row — the plan rewrites
    to a join plus a rank window with WindowGroupLimit pushdown (asserted
    in tests/test_plans.py), i.e. exactly the plan you'd hand-write, and
    the per-group limit prunes BEFORE the full sort. The deterministic
    (price, orderkey) tie-break makes the 2-row cut engine-stable."""
    _register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice
                 FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey
                 LIMIT 2) t
        WHERE c.c_acctbal > 9000
        """
    )


@register(
    "recursive_calendar_fill",
    oracle=f"""
    WITH RECURSIVE months(m) AS (
        SELECT TIMESTAMP '1995-01-01 00:00:00'
        UNION ALL
        SELECT m + INTERVAL 1 MONTH FROM months
        WHERE m < TIMESTAMP '2001-08-01 00:00:00'),
    agg AS (
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
               count(*) AS n_orders,
               {dsum_sql('o_totalprice')} AS revenue
        FROM orders GROUP BY 1)
    SELECT strftime(months.m, '%Y-%m') AS month,
           CAST(coalesce(agg.n_orders, 0) AS BIGINT) AS n_orders,
           coalesce(agg.revenue, 0.0) AS revenue
    FROM months LEFT JOIN agg ON strftime(months.m, '%Y-%m') = agg.month
    """,
)
def recursive_calendar_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (new in Spark 4): generate a dense month spine and
    left-join sparse monthly order aggregates onto it — the gap-filled
    time series every reporting pipeline needs (a month with zero orders
    must appear as 0, which a plain GROUP BY can never produce).

    Scale: the recursion generates the 80-row spine driver-side-cheap
    (UNION ALL recursion, bounded); the fact aggregates once (partial+
    final); the spine side of the join broadcasts. DuckDB replays the
    identical recursion."""
    _register_views(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        WITH RECURSIVE months(m) AS (
            SELECT TIMESTAMP '1995-01-01 00:00:00'
            UNION ALL
            SELECT m + INTERVAL 1 MONTH FROM months
            WHERE m < TIMESTAMP '2001-08-01 00:00:00'),
        agg AS (
            SELECT date_format(o_orderdate, 'yyyy-MM') AS month,
                   count(*) AS n_orders,
                   {dsum_sql('o_totalprice')} AS revenue
            FROM orders GROUP BY 1)
        SELECT date_format(months.m, 'yyyy-MM') AS month,
               CAST(coalesce(agg.n_orders, 0) AS BIGINT) AS n_orders,
               coalesce(agg.revenue, 0.0) AS revenue
        FROM months LEFT JOIN agg ON date_format(months.m, 'yyyy-MM') = agg.month
        """
    )


@register(
    "bucketed_colocated_join",
    min_rows=5,
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 at warehouse scale: the SHUFFLE-FREE form of the fact×fact
    equi-join. Both sides are written as BUCKETED managed tables (8
    buckets, hashed and sorted on the join key, one file per bucket —
    Spark-native bucketing, no Hive metastore needed); the SortMergeJoin
    between co-bucketed tables needs NO Exchange on either side: each
    task reads bucket i of orders and bucket i of lineitem straight off
    disk. A per-bucket LOCAL Sort remains below the join (Spark 3+ does
    not propagate bucket sort order to the scan unless the legacy
    `bucketedTableScan.outputOrdering` conf is set) — that sort is
    CPU-local and spill-safe over one bucket, not a network move.
    `tests/test_plans.py` asserts zero Exchange below the join and that
    both scans are `Bucketed: true`.

    This is THE pre-paid-join pattern for 100 TB: a fact table that will
    be joined on the same key repeatedly (orders×lineitem every night)
    amortizes ONE bucketed write into shuffle-free joins forever after —
    on a 1000-executor cluster the nightly join moves zero bytes over
    the network instead of re-exchanging 100 TB per run. (The post-join
    groupBy on o_orderpriority still shuffles — a few hundred tiny
    aggregate rows, not the fact tables.) Re-derives the reference's
    'load once, query forever' table contract on Spark's layout layer.

    The write here is part of the query only so the driver exercises the
    full path at every tier; a deployment writes the buckets once. Table
    names are tier-tagged so sf0.001/sf0.01 runs never collide;
    mode('overwrite') keeps reruns idempotent."""
    import hashlib
    import os
    import shutil
    from urllib.parse import urlparse

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    ot, lt = f"bkt_orders_{tag}", f"bkt_lineitem_{tag}"
    # self-heal: a previous PROCESS's in-memory catalog is gone but its
    # warehouse directories persist — "overwrite" would then die with
    # LOCATION_ALREADY_EXISTS on the create path. Drop both layers.
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for name in (ot, lt):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        leftover = os.path.join(wh, name)
        if wh and os.path.isdir(leftover):
            shutil.rmtree(leftover, ignore_errors=True)
    # repartition on the bucket key first: ONE file per bucket, which is
    # what lets the scan TRUST the sortBy order — multi-file buckets
    # force a (local) re-Sort below the join
    (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .repartition(8, F.col("o_orderkey"))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(ot)
    )
    (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey")
        .repartition(8, F.col("l_orderkey"))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(lt)
    )
    o = spark.table(ot)
    li = spark.table(lt)
    # MERGE hint: at test tiers the orders side fits a broadcast, which
    # would bypass bucketing entirely — but the pattern being exercised
    # is the 100 TB fact×fact case where NEITHER side broadcasts. With
    # both sides co-bucketed and co-sorted, SortMergeJoin needs no
    # Exchange and no Sort (plan-asserted in tests/test_plans.py).
    j = o.hint("merge").join(li, o.o_orderkey == li.l_orderkey)
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.countDistinct("o_orderkey").cast("bigint").alias("n_orders"),
    )


@register(
    "salted_skew_agg",
    min_rows=3,
    oracle="""
    SELECT l_returnflag,
           sum(l_quantity) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_lines,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 under key skew: the two-phase SALTED aggregation
    (`operators/skew.salted_agg`) driven end-to-end. Grouping the whole
    fact by `l_returnflag` is the canonical skewed-agg shape — 3 keys
    over every lineitem row, so a naive groupBy funnels ~N/3 rows into
    each of 3 reducers no matter how many executors exist. Salting
    spreads each hot key over 16 deterministic buckets (salt =
    xxhash64 of the row's stable identity cols — content-stable across
    task retries, never rand()): phase 1 reduces (key, salt) with full
    map-side combine, phase 2 merges the <=16 partial rows per key.
    At 100 TB the hot key's reduce cost drops 16x while phase 2 merges
    48 rows total. AQE cannot rescue a skewed AGGREGATION (its skew
    handling is join-only) — this operator is the cover for that gap.

    Aggregates chosen to be merge-order-exact in BOTH engines: sums of
    integer-valued doubles (l_quantity), a count, and min/max — so the
    salted two-phase result is bit-identical to the plain GROUP BY
    oracle regardless of partial ordering (fractional double sums
    would need functions/agg.dsum's decimal accumulation instead)."""
    li = _t(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={
            "sum_qty": ("l_quantity", "sum"),
            "n_lines": ("l_quantity", "count"),
            "min_price": ("l_extendedprice", "min"),
            "max_price": ("l_extendedprice", "max"),
        },
        salt_cols=["l_orderkey", "l_linenumber"],
        buckets=16,
    )
    return out.withColumn("n_lines", F.col("n_lines").cast("bigint"))


@register(
    "salted_skew_join",
    min_rows=12,
    oracle="""
    SELECT strftime(o.o_orderdate, '%Y-%m') AS order_month,
           CAST(count(*) AS BIGINT) AS n_lines,
           sum(l.l_quantity) AS sum_qty
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY strftime(o.o_orderdate, '%Y-%m')
    """,
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 under key skew when the small side CANNOT broadcast: the
    salted replicate-join (`operators/skew.salt_join`) end-to-end. The
    big side (lineitem) gets a deterministic content-hash salt in
    [0,16); the small side (urgent orders) is replicated once per salt
    value via one explode — 16x a side that is still orders of
    magnitude below the fact — and the join key becomes (orderkey,
    salt), so a hot orderkey's lineitem rows land on 16 reducers
    instead of one. This is the mitigation tier between broadcast
    (small side fits memory) and AQE skew-split (kicks in only at
    sort-merge time on observed partition sizes; a salted plan is
    deterministic and works for any join the optimizer picks).

    The filter on o_orderpriority is pushed to the orders scan BEFORE
    replication, so the 16x cost applies to the pruned side only.
    Post-join rollup to order months keeps driver output
    timeline-bounded (~80 rows). Oracle = the unsalted join: salting
    is semantics-preserving by construction."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("ok"), "o_orderdate")
    )
    joined = salt_join(
        li,
        urgent,
        big_key="l_orderkey",
        small_key="ok",
        salt_cols=["l_orderkey", "l_linenumber"],
        buckets=16,
    )
    return (
        joined.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum("l_quantity").alias("sum_qty"),
        )
    )
