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

from pyspark.sql import Column, DataFrame
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
