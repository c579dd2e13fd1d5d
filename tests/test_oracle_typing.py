"""Regression guards for the round-2 HUGEINT oracle bug class.

DuckDB types ``sum(BIGINT)`` as HUGEINT and converts HUGEINT to float64 in
``.df()``, so an oracle with a bare integer sum emits ``N.0`` where Spark
emits long ``N`` — the driver's value hash then records a red row even when
the values are bit-identical (CORRECTNESS_r02: text_stats, train_test_split,
json_extract_events). Two guards:

1. every registered oracle must produce zero HUGEINT-typed columns, and
2. the local compare must FLAG an integral float64 against an int64
   (``tests/oracle_harness._canon`` previously collapsed both to ``27615``).

Neither needs a SparkSession — the scan is DuckDB-only, so it stays fast.
"""

import duckdb
import pandas as pd
import pytest

from pandas_to_postgres_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare, duck_con

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)


@pytest.fixture(scope="module")
def duck():
    con = duck_con(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_has_no_hugeint_columns(duck, name):
    rel = duck.sql(REGISTRY[name].oracle)
    huge = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper()
    ]
    assert not huge, (
        f"{name}: HUGEINT-typed oracle columns {huge} — DuckDB converts "
        "HUGEINT to float64 in pandas, which hash-mismatches Spark longs. "
        "Wrap the OUTER sum() in CAST(... AS BIGINT)."
    )


def test_compare_flags_integral_float_vs_int():
    got = pd.DataFrame({"k_total": pd.array([27615], dtype="int64")})
    want = pd.DataFrame({"k_total": pd.array([27615.0], dtype="float64")})
    assert compare(got, want) is not None, (
        "int64 27615 vs float64 27615.0 must NOT compare equal — this is "
        "exactly the mismatch the driver's value hash reports"
    )


def test_compare_still_equates_matching_doubles():
    got = pd.DataFrame({"v": pd.array([1.5, 2.25], dtype="float64")})
    want = pd.DataFrame({"v": pd.array([1.5, 2.25], dtype="float64")})
    assert compare(got, want) is None


def test_bare_bigint_sum_reproduces_driver_mismatch():
    """End-to-end shape of the bug: a bare ``sum(BIGINT)`` through DuckDB's
    pandas conversion vs the long column Spark would produce."""
    con = duckdb.connect()
    bare = con.sql("SELECT sum(CAST(42 AS BIGINT)) AS s").df()
    assert str(bare["s"].dtype) == "float64"  # the DuckDB artifact itself
    spark_like = pd.DataFrame({"s": pd.array([42], dtype="int64")})
    assert compare(spark_like, bare) is not None
    fixed = con.sql("SELECT CAST(sum(CAST(42 AS BIGINT)) AS BIGINT) AS s").df()
    assert compare(spark_like, fixed) is None
    con.close()
