"""Bloom-filter runtime prefilter for semi-joins.

The 100 TB problem: a semi-join `fact WHERE key IN (SELECT key FROM dim)`
shuffles the ENTIRE fact table on the join key before any dim row gets a
say — at scale that shuffle is the job. Engines solve it with runtime
filters (Spark's own InjectRuntimeFilter does this for some shapes): build
a compact bitset over the dim keys, broadcast it, and drop non-matching
fact rows AT THE SCAN, so the expensive exchange only carries probable
matches. This module is the explicit, composable form of that pattern —
usable when the optimizer's automatic rule doesn't fire (disjunctive dim
predicates, pre-aggregated dims, non-equi derivations of the key) or when
the prefilter should be persisted and reused across jobs.

Exactness: a Bloom filter has false positives but NO false negatives, so
`bloom_semi_join` re-joins the surviving rows exactly — the bitmap only
prunes, never decides. The registered query's oracle is therefore the
plain SQL semi-join.

All hashing is JVM-side (`xxhash64` with the probe index mixed in as a
column, giving a hash family), the bitmap is a dense `array<long>` built
with word-granular `bit_or` partial aggregation, and the probe is a
higher-order fold over the hash indices — no Python in the data path.

Scale shape:
- build: map-side `bit_or` partials collapse each dim partition to at most
  ``num_bits/64`` word rows before ONE tiny shuffle (bounded by the bitmap
  size, NOT the dim row count); the dense-array assembly exchanges
  ≤ ``num_bits/64`` rows.
- probe: the 1-row bitmap frame broadcasts (BroadcastNestedLoopJoin over a
  single row — the same broadcast-data pattern as the k-means centroid
  matrix), fact partitioning untouched, membership test is a map-only
  JVM expression.
- the exact semi-join then runs over the PRUNED fact: with selectivity s
  and false-positive rate p, the shuffle carries s + (1-s)*p of the fact
  instead of all of it.

Sizing: for n dim keys and k hashes, FPR ≈ (1 - e^(-k*n/m))^k. The default
m = 2^20 bits (128 KiB) with k = 5 keeps FPR < 1e-4 up to ~50k keys; size
m ≈ 10 bits/key for ~1% at larger n. The bitmap is 1 row however large the
dim is — only m grows, never the row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _key_family(dtype: str) -> str:
    """'long' for integer-valued families (including scale-0 decimals),
    'string' for everything else."""
    base = dtype.lower()
    if base in ("tinyint", "smallint", "int", "integer", "bigint", "long"):
        return "long"
    if base.startswith("decimal") and base.rstrip(")").endswith(",0"):
        return "long"
    return "string"


def _canon_key(col: Column, dtype: str) -> Column:
    """Hash-stable canonical form: xxhash64 output depends on the input
    TYPE, so both sides of a probe must hash the same type. Integer-valued
    families (incl. decimal(p,0)) widen to long; everything else hashes as
    string. Build and probe MUST land in the same family —
    :func:`bloom_semi_join` enforces this, because a silent family
    mismatch would hash the two sides differently and the prefilter would
    drop TRUE members (an unrecoverable false negative)."""
    return col.cast(_key_family(dtype))


def _positions(key: Column, num_bits: int, num_hashes: int) -> Column:
    """array<long> of ``num_hashes`` bit positions for one key."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.pmod(F.xxhash64(key, i), F.lit(num_bits)),
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Build the bitset over ``df[key_col]``: a ONE-row frame with column
    ``bloom_bits: array<long>`` of length ``num_bits / 64`` (dense, word
    ``w`` at index ``w``), ready to broadcast or to persist as parquet and
    reuse across jobs (rebuild whenever num_bits/num_hashes change — the
    bit layout is part of the filter's identity, like the MinHash band-hash
    scheme note in operators/dedup.py).
    """
    if num_bits % 64 != 0:
        raise ValueError("num_bits must be a multiple of 64")
    n_words = num_bits // 64
    dtype = dict(df.dtypes)[key_col]
    key = _canon_key(F.col(key_col), dtype)
    pos = df.select(
        F.explode(_positions(key, num_bits, num_hashes)).alias("p")
    )
    words = pos.select(
        F.call_function("shiftright", F.col("p"), F.lit(6)).alias("w"),
        F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            F.col("p").bitwiseAND(F.lit(63)).cast("int"),
        ).alias("b"),
    )
    present = words.groupBy("w").agg(F.bit_or("b").alias("bits"))
    # densify: absent words are 0. range(n_words) is tiny; the join and the
    # final single-row assembly exchange at most n_words rows.
    spark = df.sparkSession
    dense = (
        spark.range(n_words)
        .select(F.col("id").alias("w"))
        .join(present, "w", "left")
        .select("w", F.coalesce("bits", F.lit(0).cast("long")).alias("bits"))
    )
    return dense.agg(
        F.array_sort(F.collect_list(F.struct("w", "bits"))).alias("wb")
    ).select(F.transform("wb", lambda s: s["bits"]).alias("bloom_bits"))


def bloom_might_contain(
    key: Column, bits_col: Column, num_bits: int, num_hashes: int
) -> Column:
    """JVM-only membership test: true iff every probe bit is set. False
    positives possible (rate set by sizing), false negatives never."""
    def _isset(i: Column) -> Column:
        p = F.pmod(F.xxhash64(key, i), F.lit(num_bits))
        word = F.element_at(
            bits_col,
            (F.call_function("shiftright", p, F.lit(6)) + F.lit(1)).cast("int"),
        )
        bit = F.call_function(
            "shiftright", word, p.bitwiseAND(F.lit(63)).cast("int")
        )
        return bit.bitwiseAND(F.lit(1).cast("long")) == 1

    return F.aggregate(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        F.lit(True),
        lambda acc, i: acc & _isset(i),
    )


def bloom_prefilter(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Keep only rows whose key might be in the filter. Map-only over
    ``df``: the 1-row ``bloom`` frame broadcasts; ``df``'s partitioning is
    untouched (no exchange on the probe side — plan-asserted in
    tests/test_plans.py)."""
    dtype = dict(df.dtypes)[key_col]
    key = _canon_key(F.col(key_col), dtype)
    probed = df.crossJoin(F.broadcast(bloom))
    return probed.filter(
        bloom_might_contain(key, F.col("bloom_bits"), num_bits, num_hashes)
    ).drop("bloom_bits")


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """EXACT semi-join with a Bloom prefilter: build the bitset over the
    dim keys, prune the fact map-side, then run the real semi-join over
    the survivors to clear false positives. Result rows == plain
    ``fact SEMI JOIN dim`` (property-tested), but the semi-join's shuffle
    carries only the pruned fraction of the fact.

    The canonical key cast is applied to BOTH sides before hashing, so an
    int fact key probes a bigint (or decimal(p,0)) dim key correctly.
    Mixed FAMILIES — a long fact key against a fractional-decimal or
    string dim key — are rejected loudly: they would hash differently on
    the two sides and the prefilter would silently drop true matches.
    """
    fact_family = _key_family(dict(fact.dtypes)[fact_key])
    dim_family = _key_family(dict(dim.dtypes)[dim_key])
    if fact_family != dim_family:
        raise TypeError(
            f"bloom_semi_join key families differ: {fact_key} hashes as "
            f"{fact_family}, {dim_key} as {dim_family} — cast one side so "
            "both land in the same family, or the prefilter will drop "
            "true matches"
        )
    dim_keys = dim.select(dim_key)
    bloom = bloom_build(dim_keys, dim_key, num_bits, num_hashes)
    pruned = bloom_prefilter(fact, fact_key, bloom, num_bits, num_hashes)
    return pruned.join(
        dim_keys,
        pruned[fact_key] == dim_keys[dim_key],
        "left_semi",
    )
