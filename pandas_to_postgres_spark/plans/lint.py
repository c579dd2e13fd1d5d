"""Physical-plan linter: flags the plan shapes that break at 100 TB.

`tests/test_plans.py` asserts these properties query-by-query; this module
is the reusable form — point it at ANY DataFrame before promoting a new
pipeline and it reports the scale anti-patterns the optimizer will not fix
for you:

- ``cartesian``        CartesianProduct — the pair space is |L| x |R|.
- ``bnlj``             BroadcastNestedLoopJoin — fine for 1-row/scalar
                       frames (the broadcast-data pattern used here),
                       quadratic work if the streamed side is big; flagged
                       as a warning for a human decision.
- ``python_udf``       BatchEvalPython — row-at-a-time Python in the hot
                       path (~10-100x slower than Arrow); ArrowEvalPython
                       (pandas UDFs) is reported as info, not a defect.
- ``single_partition`` Exchange SinglePartition — a global window/sort
                       collapsing the job to one task (the
                       ntile-without-bucketing mistake).
- ``global_sort``      range-partitioned Sort with no limit above it — a
                       full-data total sort; top-k should be
                       TakeOrderedAndProject, exports should use
                       ``write_sorted``'s bucketed form.
- ``dead_pushdown``    a parquet scan whose PushedFilters is empty while a
                       Filter sits above it — predicates not reaching the
                       scan (non-deterministic exprs, UDF-wrapped
                       comparisons, or a source that silently dropped its
                       pushdown — see sources/pg_datasource.py notes).

Severity: "error" = almost never right at scale; "warn" = needs a human
look; "info" = worth knowing. The linter reads the EXECUTED plan (post
AQE-replan where available), the same surface the plan tests assert.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Finding:
    severity: str  # "error" | "warn" | "info"
    code: str
    detail: str


def _plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def lint_plan(df: DataFrame) -> List[Finding]:
    """Lint a DataFrame's physical plan; returns findings, worst first."""
    plan = _plan_string(df)
    out: List[Finding] = []

    if "CartesianProduct" in plan:
        out.append(
            Finding(
                "error",
                "cartesian",
                "CartesianProduct: |L| x |R| pair space — add an equi-key "
                "(bucket, block, band) or broadcast a provably tiny side",
            )
        )
    if "BatchEvalPython" in plan:
        out.append(
            Finding(
                "error",
                "python_udf",
                "BatchEvalPython: row-at-a-time Python UDF in the hot path — "
                "use built-in expressions or an Arrow-batched pandas UDF",
            )
        )
    if "BroadcastNestedLoopJoin" in plan:
        out.append(
            Finding(
                "warn",
                "bnlj",
                "BroadcastNestedLoopJoin: quadratic unless the broadcast side "
                "is a 1-row/scalar frame (the broadcast-data pattern) — check "
                "the build side's cardinality",
            )
        )
    if "Exchange SinglePartition" in plan:
        out.append(
            Finding(
                "warn",
                "single_partition",
                "Exchange SinglePartition: a global window/sort/agg collapsed "
                "the job to one task — bucket by a monotone derived key and "
                "merge offsets (see operators/sampling.py patterns)",
            )
        )
    # a range-partitioned Sort that is NOT a TakeOrderedAndProject and has
    # no limit is a full-data total sort
    if re.search(r"Exchange rangepartitioning", plan) and not re.search(
        r"TakeOrderedAndProject|GlobalLimit", plan
    ):
        out.append(
            Finding(
                "warn",
                "global_sort",
                "range-partitioned Sort with no limit above it: full-data "
                "total sort — top-k wants TakeOrderedAndProject, sorted "
                "exports want write_sorted's range-bucketed form",
            )
        )
    # parquet scans with an empty pushdown while a Filter sits in the plan
    if re.search(r"PushedFilters:\s*\[\]", plan) and "Filter" in plan:
        out.append(
            Finding(
                "info",
                "dead_pushdown",
                "a parquet scan has PushedFilters: [] while the plan filters "
                "— if the predicate references scan columns, something "
                "(UDF wrapping, non-determinism) is blocking pushdown",
            )
        )
    if "ArrowEvalPython" in plan or "MapInPandas" in plan or "MapInArrow" in plan:
        out.append(
            Finding(
                "info",
                "arrow_python",
                "Arrow-batched Python stage present — expected for pandas-UDF "
                "operators; confirm it is not wrapping built-in-expressible "
                "logic",
            )
        )
    order = {"error": 0, "warn": 1, "info": 2}
    out.sort(key=lambda f: order[f.severity])
    return out


def assert_scalable(df: DataFrame, allow: tuple = ()) -> None:
    """Raise if the plan has error-severity findings not in ``allow`` —
    the CI-gate form (plan tests use targeted asserts; pipelines can call
    this one-liner before promotion)."""
    errors = [
        f for f in lint_plan(df) if f.severity == "error" and f.code not in allow
    ]
    if errors:
        raise AssertionError(
            "plan fails scale lint: "
            + "; ".join(f"[{f.code}] {f.detail}" for f in errors)
        )
