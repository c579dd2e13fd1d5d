"""Skew utilities and file-sink tests."""

import shutil

import pytest
from pyspark.sql import functions as F

from pandas_to_postgres_spark.operators.skew import salt_join, salted_agg
from pandas_to_postgres_spark.sinks.files import (
    write_csv,
    write_json,
    write_parquet_partitioned,
)

TMP = "/root/repo/.tmp_test_out"


@pytest.fixture(autouse=True)
def _clean_tmp():
    yield
    shutil.rmtree(TMP, ignore_errors=True)


class TestSkew:
    def _skewed(self, spark):
        # one hot key (90% of rows) + a uniform tail
        hot = spark.range(900).select(
            F.lit("hot").alias("k"), F.col("id").alias("v")
        )
        tail = spark.range(100).select(
            F.concat(F.lit("k"), F.col("id") % 10).alias("k"), F.col("id").alias("v")
        )
        return hot.unionByName(tail)

    def test_salted_agg_matches_plain(self, spark):
        df = self._skewed(spark)
        plain = {
            (r.k): (r.n, r.s, r.mn, r.mx)
            for r in df.groupBy("k")
            .agg(
                F.count("v").alias("n"), F.sum("v").alias("s"),
                F.min("v").alias("mn"), F.max("v").alias("mx"),
            )
            .collect()
        }
        salted = {
            (r.k): (r.n, r.s, r.mn, r.mx)
            for r in salted_agg(
                df,
                keys=["k"],
                aggs={"n": ("v", "count"), "s": ("v", "sum"),
                      "mn": ("v", "min"), "mx": ("v", "max")},
                salt_cols=["v"],
                buckets=8,
            ).collect()
        }
        assert salted == plain

    def test_salt_join_matches_plain(self, spark):
        big = self._skewed(spark)
        small = spark.createDataFrame(
            [("hot", "H"), ("k1", "A"), ("k5", "B")], "sk string, label string"
        )
        plain = sorted(
            (r.k, r.v, r.label)
            for r in big.join(small, big.k == small.sk).select("k", "v", "label").collect()
        )
        salted = sorted(
            (r.k, r.v, r.label)
            for r in salt_join(big, small, "k", "sk", salt_cols=["v"], buckets=8)
            .select("k", "v", "label")
            .collect()
        )
        assert salted == plain
        assert len(salted) == 900 + 10 + 10  # hot + k1 tail + k5 tail


class TestFileSinks:
    def test_parquet_partitioned_roundtrip_and_pruning(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b")], "id long, part string"
        )
        write_parquet_partitioned(df, f"{TMP}/pq", ["part"], max_records_per_file=1)
        back = spark.read.parquet(f"{TMP}/pq")
        assert back.count() == 3
        # partition pruning: filter on the partition column reads one dir
        pruned = back.filter(F.col("part") == "a")
        assert pruned.count() == 2
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan or pruned.count() == 2

    def test_csv_null_convention(self, spark):
        df = spark.createDataFrame([(1, None), (2, "x")], "id long, s string")
        write_csv(df, f"{TMP}/csv", num_partitions=1)
        back = spark.read.option("header", "true").csv(f"{TMP}/csv")
        vals = {r.id: r.s for r in back.collect()}
        assert vals == {"1": None, "2": "x"}

    def test_json_roundtrip(self, spark):
        df = spark.createDataFrame([(1, [1.0, 2.0])], "id long, v array<double>")
        write_json(df, f"{TMP}/json")
        back = spark.read.json(f"{TMP}/json")
        assert back.collect()[0].v == [1.0, 2.0]
