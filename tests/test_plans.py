"""Physical-plan regression tests: the scale claims in query docstrings
(pushdown reached the scan, dims broadcast, exactly-N shuffles, top-k is
TakeOrderedAndProject) asserted against the executed plan, so a refactor
that silently de-optimizes a query fails CI instead of surviving until a
100x scale-up exposes it.

Note: these run at sf0.001, where auto-broadcast catches more joins than a
100 TB run would — assertions are on invariants that hold at BOTH scales
(filter pushdown, explicit broadcasts, shuffle-count upper bounds).
"""

import re

import pytest

from pandas_to_postgres_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def plan_of(spark, name: str) -> str:
    return REGISTRY[name].fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()


def shuffles(plan: str) -> int:
    return len(re.findall(r"Exchange (hash|range)partitioning", plan))


class TestPushdown:
    def test_filter_project_pushes_predicates_and_prunes_columns(self, spark):
        plan = plan_of(spark, "filter_project")
        # the date range + discount predicates reach the parquet scan
        assert "PushedFilters: [IsNotNull" in plan
        assert "GreaterThanOrEqual(l_shipdate" in plan
        # column pruning: unused columns never appear anywhere in the plan
        assert "l_returnflag" not in plan and "l_tax" not in plan

    def test_pricing_summary_pushes_date_filter(self, spark):
        plan = plan_of(spark, "pricing_summary")
        assert "PushedFilters: [" in plan and "l_shipdate" in plan


class TestJoinStrategies:
    def test_broadcast_rollup_has_no_fact_shuffle(self, spark):
        plan = plan_of(spark, "join_broadcast_rollup")
        assert "BroadcastHashJoin" in plan
        # only the final agg exchanges; the customer fact is never shuffled
        assert shuffles(plan) <= 1

    def test_q8_single_shuffle(self, spark):
        assert shuffles(plan_of(spark, "q8_market_share")) <= 1

    def test_topk_is_take_ordered(self, spark):
        assert "TakeOrderedAndProject" in plan_of(spark, "topk_lineitems")

    def test_q10_topk_is_take_ordered(self, spark):
        assert "TakeOrderedAndProject" in plan_of(spark, "q10_returned_items")


class TestAggShapes:
    def test_pricing_summary_has_partial_agg(self, spark):
        # partial + final hash aggregate around exactly one exchange
        plan = plan_of(spark, "pricing_summary")
        assert plan.count("HashAggregate") >= 2
        assert shuffles(plan) == 1

    def test_grouping_sets_uses_expand_once(self, spark):
        plan = plan_of(spark, "grouping_sets_orders")
        assert "Expand" in plan
        assert shuffles(plan) == 1


class TestAsofShape:
    def test_asof_join_is_single_shuffle_no_join_node(self, spark):
        plan = plan_of(spark, "asof_join_events")
        # union+window construction: no join operator at all
        for op in (
            "SortMergeJoin",
            "BroadcastHashJoin",
            "BroadcastNestedLoopJoin",
            "ShuffledHashJoin",
            "CartesianProduct",
        ):
            assert op not in plan, f"asof plan regressed to a {op}"
        assert shuffles(plan) == 1

    def test_asof_forward_same_shape(self, spark):
        plan = plan_of(spark, "asof_forward_events")
        assert "SortMergeJoin" not in plan
        assert shuffles(plan) == 1


class TestMinhashShape:
    def test_signatures_are_map_only(self, spark):
        from pandas_to_postgres_spark.operators.dedup import minhash_signatures
        from pandas_to_postgres_spark.sources.parquet import load_table

        docs = load_table(spark, SF_SMOKE, "documents")
        plan = (
            minhash_signatures(docs, "text", "doc_id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert shuffles(plan) == 0, "signature computation must not shuffle"
