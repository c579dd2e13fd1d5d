"""Deterministic sampling operators for training-data pipelines.

`DataFrame.sampleBy` is deterministic only for a fixed partitioning — a
repartition or a different cluster layout changes the kept set. At 100 TB,
reproducibility across reruns/engines matters more than statistical
pedigree, so the production-grade sampler is CONTENT-keyed: keep a row iff
a hash of its key falls under the stratum's threshold. Same input row →
same decision, on any engine, any partitioning, forever.

The hash is md5 (not xxhash64) precisely so the decision is portable SQL —
every engine (DuckDB, Postgres, Spark) computes the identical digest, which
makes the sampler oracle-checkable end-to-end.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hex_threshold(fraction: float) -> str:
    """First-8-hex-chars threshold for `keep iff hex8(md5) < threshold`.

    Fixed-length lowercase hex compares lexicographically == numerically,
    so the filter is a plain string comparison on both engines. fraction
    >= 1 returns 'g' (> every hex char) == keep-all.
    """
    if fraction >= 1.0:
        return "g"
    if fraction <= 0.0:
        return "0" * 8
    return format(int(fraction * 16**8), "08x")


def hash_sample_predicate(key: Column, fraction: float) -> Column:
    """Boolean keep-predicate: md5-hash of the (stringified) key under the
    fraction threshold."""
    return F.substring(F.md5(key.cast("string")), 1, 8) < F.lit(
        _hex_threshold(fraction)
    )


def stratified_sample_deterministic(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum downsampling, content-keyed and engine-reproducible.

    Rows whose stratum is missing from ``fractions`` are kept with
    ``default_fraction``. Scale: a narrow filter over the scan — no
    shuffle, no state, trivially parallel; the kept set is stable under
    repartitioning (unlike sampleBy), so incremental re-runs of a 100 TB
    shard never flip membership.
    """
    hex8 = F.substring(F.md5(F.col(key_col).cast("string")), 1, 8)
    thr: Column = F.lit(_hex_threshold(default_fraction))
    for stratum, frac in fractions.items():
        thr = F.when(
            F.col(stratum_col) == stratum, F.lit(_hex_threshold(frac))
        ).otherwise(thr)
    return df.filter(hex8 < thr)


def budget_prefix_select(
    df: DataFrame,
    cost_col: str,
    budget: int,
    order_col: str,
    tie_col: str,
    num_buckets: int = 20,
) -> DataFrame:
    """Greedy budgeted selection: walk rows in (``order_col`` DESC,
    ``tie_col`` ASC) order and keep the prefix whose running ``cost_col``
    total stays ≤ ``budget`` — the canonical "best quality docs until the
    token budget is spent" curation step.

    Scale shape — a GLOBAL ordered prefix sum without a global sort:
    ``order_col`` must be bounded in [0, 1] (a score); rows bucket by
    ``floor(score * num_buckets)``, which is monotone in the score, so
    (bucket DESC, score DESC, tie ASC) equals the global order. Each
    bucket prefix-sums independently (one bounded sort per bucket); the
    cross-bucket offset comes from a ``num_buckets``-row aggregate whose
    own window is over that tiny frame only, broadcast back. The only
    single-partition sort in the plan is over ≤ ``num_buckets`` rows —
    constant, not corpus-sized (same construction as the sharded
    ``pack_sequences``). Costs are summed as integers → the running total
    is exact and engine-reproducible.
    """
    b = F.least(
        F.floor(F.col(order_col) * num_buckets), F.lit(num_buckets - 1)
    ).cast("long")
    d = df.withColumn("__b", b)
    w_in = (
        Window.partitionBy("__b")
        .orderBy(F.col(order_col).desc(), F.col(tie_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("__within", F.sum(cost_col).over(w_in))
    totals = d.groupBy("__b").agg(F.sum(cost_col).alias("__tot"))
    w_b = Window.orderBy(F.col("__b").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "__b", F.coalesce(F.sum("__tot").over(w_b), F.lit(0)).alias("__off")
    )
    return (
        d.join(F.broadcast(offsets), "__b")
        .withColumn("cum_cost", F.col("__off") + F.col("__within"))
        .filter(F.col("cum_cost") <= budget)
        .drop("__b", "__within", "__off")
    )


def mix_fractions(
    df: DataFrame,
    stratum_col: str,
    weights: Mapping[str, float],
    default_weight: float = 1.0,
) -> DataFrame:
    """Per-stratum keep-fractions that resample ``df`` toward the target
    mixture ∝ ``weights`` while keeping as much data as possible.

    The bottleneck stratum (smallest count/weight ratio) is kept whole;
    every other stratum downsamples to weight-proportional size:
    ``frac_s = min(1, w_s * min_r(n_r / w_r) / n_s)``. Returns a tiny
    (stratum, frac) frame to broadcast-join onto the corpus.

    Scale: one aggregate over the corpus (counts per stratum — map-side
    combined), then arithmetic on a ≤ |strata| row frame. All doubles are
    computed with the same IEEE operation order an oracle SQL would use,
    so the fractions — and therefore the sampled membership — reproduce
    bit-exactly on any engine.
    """
    counts = df.groupBy(stratum_col).agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    wdf = df.sparkSession.createDataFrame(
        [(s, float(w)) for s, w in weights.items()],
        f"{stratum_col} string, w double",
    )
    j = counts.join(F.broadcast(wdf), stratum_col, "left").select(
        stratum_col, "n", F.coalesce("w", F.lit(float(default_weight))).alias("t")
    )
    m = j.agg(F.min(F.col("n") / F.col("t")).alias("tmin"))
    return j.crossJoin(F.broadcast(m)).select(
        stratum_col,
        F.least(F.lit(1.0), F.col("t") * F.col("tmin") / F.col("n")).alias("frac"),
    )


def resample_to_mix(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    weights: Mapping[str, float],
    default_weight: float = 1.0,
    salt: str = "mix:",
) -> DataFrame:
    """Deterministically resample ``df`` so strata sizes match the target
    mixture from :func:`mix_fractions`: md5-uniform of the salted key
    under the stratum's fraction — content-keyed, so membership survives
    repartitioning, retries, and engine swaps (oracle-checkable)."""
    fr = mix_fractions(df, stratum_col, weights, default_weight)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("double")
        / F.lit(1152921504606846976.0)
    )
    return df.join(F.broadcast(fr), stratum_col).filter(u < F.col("frac"))


def sample_sql(
    key_col: str, stratum_col: str, fractions: Mapping[str, float], default_fraction: float = 0.0
) -> str:
    """The matching ANSI-SQL keep-predicate (DuckDB/Postgres oracle)."""
    cases = " ".join(
        f"WHEN {stratum_col} = '{s}' THEN '{_hex_threshold(f)}'"
        for s, f in fractions.items()
    )
    return (
        f"substring(md5(CAST({key_col} AS VARCHAR)), 1, 8) < "
        f"(CASE {cases} ELSE '{_hex_threshold(default_fraction)}' END)"
    )


def deterministic_shuffle_positions(
    df: DataFrame, key_col: str, salt: str = "shuf:"
) -> DataFrame:
    """Assign every row a deterministic GLOBAL shuffle position (1..N) —
    the training-order shuffle of a corpus, reproducible on any engine:
    position = rank in (md5(salt || key), key) order.

    Scale shape — a global rank WITHOUT a global sort: rows bucket by the
    hash's first two hex chars (256 contiguous ranges of the md5 order,
    ~uniform by construction); each bucket row_numbers independently, and
    cross-bucket offsets come from a 256-row count aggregate broadcast
    back. Same offsets trick as :func:`budget_prefix_select`; the only
    single-partition window is over the 256-row totals frame.
    """
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    d = df.withColumn("__h", h).withColumn(
        "__b", F.conv(F.substring("__h", 1, 2), 16, 10).cast("long")
    )
    w_in = Window.partitionBy("__b").orderBy("__h", key_col)
    d = d.withColumn("__rn", F.row_number().over(w_in))
    totals = d.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    w_b = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__b", F.coalesce(F.sum("__n").over(w_b), F.lit(0)).alias("__off")
    )
    return (
        d.join(F.broadcast(offsets), "__b")
        .withColumn("position", F.col("__off") + F.col("__rn"))
        .drop("__h", "__b", "__rn", "__off")
    )


def top_n_per_group(
    df: DataFrame,
    group_cols: list[str] | tuple[str, ...],
    order_cols: list[Column] | tuple[Column, ...],
    n: int,
    salt_col: str | None = None,
    num_salts: int = 16,
) -> DataFrame:
    """Keep the top ``n`` rows of each group under ``order_cols`` — the
    per-domain document cap (RefinedWeb/CC-style "at most N pages per
    host") and every other bounded-per-key selection.

    Scale shape — the naive single window shuffles EVERY row of a group
    into one task, and web-domain groups are exactly the skewed kind
    (one host can be 1e8 pages). Two stages instead: rows first shuffle on
    (group, salt) where salt = xxhash64(tie-break) % num_salts — bounded
    ~1/num_salts of any hot group per task — and each salted slice keeps
    its local top n. At most n*num_salts survivors per group reach the
    second, exact window. Any true global top-n row is also top-n within
    its salt slice, so the two-stage result is identical to the single
    window (property-tested), while the heavy shuffle is skew-free by
    construction. ``order_cols`` must be a total order (include a
    tie-break key) for a deterministic cut.
    """
    tie = salt_col or group_cols[0]
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(tie).cast("string")), F.lit(num_salts))
    )
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy(*order_cols)
    pruned = (
        salted.withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= n)
        .drop("__rn1", "__salt")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        pruned.withColumn("cap_rank", F.row_number().over(w2))
        .filter(F.col("cap_rank") <= n)
    )
