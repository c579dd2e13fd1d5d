"""Plan-linter tests: each anti-pattern is planted, the linter must flag
it; each good plan must come back clean of errors."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pandas_to_postgres_spark.plans import PRIORITY
from pandas_to_postgres_spark.plans.lint import assert_scalable, lint_plan


def codes(df, severity=None):
    fs = lint_plan(df)
    return {f.code for f in fs if severity is None or f.severity == severity}


class TestPlanLint:
    def _two(self, spark):
        a = spark.range(100).withColumnRenamed("id", "a")
        b = spark.range(100).withColumnRenamed("id", "b")
        return a, b

    def test_cartesian_flagged(self, spark):
        a, b = self._two(spark)
        df = a.crossJoin(b).filter(F.col("a") * 2 < F.col("b"))
        assert "cartesian" in codes(df) or "bnlj" in codes(df)

    def test_row_python_udf_flagged(self, spark):
        bad = F.udf(lambda x: x + 1, "bigint")
        df = spark.range(10).select(bad("id").alias("v"))
        assert "python_udf" in codes(df, "error")
        with pytest.raises(AssertionError):
            assert_scalable(df)

    def test_global_window_flagged_single_partition(self, spark):
        w = Window.orderBy("id")  # no partitionBy -> SinglePartition
        df = spark.range(100).withColumn("rn", F.row_number().over(w))
        assert "single_partition" in codes(df, "warn")

    def test_global_sort_flagged_but_topk_clean(self, spark):
        df = spark.range(1000).orderBy(F.col("id").desc())
        assert "global_sort" in codes(df, "warn")
        topk = spark.range(1000).orderBy(F.col("id").desc()).limit(5)
        assert "global_sort" not in codes(topk)

    def test_good_plans_have_no_errors(self, spark):
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        agg = (
            li.filter(F.col("l_quantity") > 10)
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert codes(agg, "error") == set()
        assert_scalable(agg)  # must not raise

    def test_checkpoint_economics_allowlist_clean(self):
        """r11 (VERDICT r10 item 9): every localCheckpoint call site in
        the package must be adjudicated in CHECKPOINT_ALLOWLIST
        (metadata-sized, broadcast-replanned consumers, or lineage-sever
        before a temp-dir delete). A new fact-sized checkpoint measured
        SLOWER twice in r10 — this gate forces the measurement before the
        merge."""
        import os

        from pandas_to_postgres_spark.plans.lint import lint_checkpoints

        pkg = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "pandas_to_postgres_spark",
        )
        assert lint_checkpoints(pkg) == []

    def test_checkpoint_lint_catches_new_sites(self, tmp_path):
        import os
        import shutil

        from pandas_to_postgres_spark.plans.lint import lint_checkpoints

        pkg = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "pandas_to_postgres_spark",
        )
        # plant a copy with one extra call site: must be flagged UNLISTED
        clone = tmp_path / "pandas_to_postgres_spark"
        shutil.copytree(pkg, clone)
        (clone / "planted.py").write_text(
            "def sneaky(df):\n    return df.localCheckpoint(eager=False)\n"
        )
        out = lint_checkpoints(str(clone))
        assert any("UNLISTED" in v and "sneaky" in v for v in out)

    def test_registry_headliners_pass_the_gate(self, spark):
        # the linter's gate must agree with the hand-written plan tests on
        # the bench headliners (BNLJ/arrow infos allowed, no errors)
        from pandas_to_postgres_spark.plans import REGISTRY

        for name in ("pricing_summary", "join_order_revenue", "topk_lineitems"):
            assert_scalable(REGISTRY[name].fn(spark, "/root/testdata/sf0.001"))


#: intentional Python-runtime coverage queries: the X5 UDTF slot IS the
#: row-Python table function tier, so its BatchEvalPythonUDTF node is the
#: point of the query, not a hot-path defect.
_GATE_ALLOW = {
    "udtf_sentences": ("python_udf",),
}


@pytest.mark.parametrize("name", sorted(set(PRIORITY)))
def test_driver_window_passes_scale_gate(spark, name):
    """Every query in the driver-checked 50-slot window must clear the
    physical-plan scale lint (no cartesian products, no row-Python in the
    hot path) — the blanket form of the hand-written plan tests, so a new
    slot can't ship a scale anti-pattern unnoticed."""
    from pandas_to_postgres_spark.plans import REGISTRY

    df = REGISTRY[name].fn(spark, "/root/testdata/sf0.001")
    assert_scalable(df, allow=_GATE_ALLOW.get(name, ()))
