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


# --------------------------------------------------------------------------
# Checkpoint-economics lint (r11, VERDICT r10 item 9).
#
# r10 measured the same localCheckpoint fold helping or hurting depending
# on the frame it pinned: a checkpoint pays when the repeated frame is
# METADATA-sized (store ~free) or when its consumers are BROADCAST
# subtrees that replan instead of reusing the exchange (chi2); a
# checkpoint of a FACT-sized frame whose consumers share a plain exchange
# only adds its store cost (basket_lift_pairs / kcore_brands measured
# flat-to-15%-slower and were reverted; the corpus-sized dt0 in
# nb_source_classifier measured 5.26s vs ~3.6s). This lint freezes that
# adjudication: every `.localCheckpoint(` call site in the package must
# appear below with a one-line size-class justification. A new site that
# is not listed fails tests/test_lint.py — measure it both ways first
# (stash-based same-box A/B), then record it here with the numbers'
# location.

#: (file::enclosing_function) -> justification. Counts matter: a second
#: checkpoint added to a listed function must be re-adjudicated too.
CHECKPOINT_ALLOWLIST = {
    # iterative operators: per-round frames are node/edge-sized and each
    # round's consumer re-derives the WHOLE upstream lineage otherwise
    "pandas_to_postgres_spark/operators/cluster.py::connected_components": 3,
    "pandas_to_postgres_spark/operators/graph.py::pagerank": 3,
    "pandas_to_postgres_spark/operators/graph.py::kcore_peel": 3,
    "pandas_to_postgres_spark/operators/graph.py::bfs_hops": 4,
    # dedup tier: width-pinned prefix/band frames feeding self-joins whose
    # two sides replan (broadcast build side) — r6/r10 measurements
    "pandas_to_postgres_spark/operators/dedup.py::minhash_lsh_candidates": 1,
    "pandas_to_postgres_spark/operators/dedup.py::_ngram_jaccard_bitset": 1,
    "pandas_to_postgres_spark/operators/dedup.py::ngram_jaccard_prefix": 3,
    "pandas_to_postgres_spark/operators/dedup.py::simhash_hamming_pairs": 1,
    # metadata/vocab/model-sized frames with >=2 consumers (r10 §4/§8-§13)
    "pandas_to_postgres_spark/plans/analytics.py::triangle_count_brands": 1,
    "pandas_to_postgres_spark/plans/analytics.py::open_orders_concurrency": 1,
    "pandas_to_postgres_spark/plans/analytics.py::chi2_source_lang": 1,
    "pandas_to_postgres_spark/plans/analytics.py::nb_source_classifier": 1,
    "pandas_to_postgres_spark/plans/analytics.py::fellegi_sunter_em": 1,
    "pandas_to_postgres_spark/plans/analytics.py::mi_feature_ranking": 1,
    "pandas_to_postgres_spark/plans/analytics.py::two_pass_exact_median": 1,
    "pandas_to_postgres_spark/plans/analytics.py::two_pass_exact_quantiles": 2,
    "pandas_to_postgres_spark/plans/analytics.py::hll_union_sources": 2,
    "pandas_to_postgres_spark/plans/analytics.py::grouped_exact_median": 1,
    "pandas_to_postgres_spark/plans/llm.py::_bpe_merge_loop": 3,
    "pandas_to_postgres_spark/plans/llm.py::centroid_quality_filter": 2,
    "pandas_to_postgres_spark/plans/llm.py::kcenter_coreset": 2,
    "pandas_to_postgres_spark/plans/quality.py::knn_label_disagreement": 1,
    "pandas_to_postgres_spark/plans/quality.py::winnow_copy_pairs": 1,
    "pandas_to_postgres_spark/plans/retrieval.py::cms_token_audit": 1,
    "pandas_to_postgres_spark/plans/retrieval.py::neardup_group_summary": 1,
    "pandas_to_postgres_spark/plans/retrieval.py::dsir_select_docs": 1,
    # streaming: drained-sink or partials frames that must sever lineage
    # from a temp dir being deleted, or are consumed twice per batch
    "pandas_to_postgres_spark/streaming/events.py::windowed_event_counts_foreachbatch": 1,
    "pandas_to_postgres_spark/streaming/events.py::windowed_bin_psi": 1,
    "pandas_to_postgres_spark/streaming/neardup.py::stream_neardup_against_corpus": 1,
    # DML verbs: the updates/keys frame feeds 3 consumers (agg, probe,
    # rewrite) and is batch-sized by contract (merge_snapshot switched
    # to persist()+unpersist in r11 — materializes inside the stats
    # aggregate's job instead of a construction-time checkpoint job)
    "pandas_to_postgres_spark/sources/manifest.py::delete_snapshot_rows": 1,
    "pandas_to_postgres_spark/sources/manifest.py::delete_snapshot_rows_dv": 1,
    "pandas_to_postgres_spark/sources/manifest.py::apply_changes_to_snapshot": 1,
}


def checkpoint_sites(package_root: str) -> dict:
    """Scan the package source for ``.localCheckpoint(`` call sites →
    {"file::enclosing_function": count} (ast-based, comments ignored)."""
    import ast
    import os

    found: dict = {}
    for dirpath, _, files in os.walk(package_root):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            p = os.path.join(dirpath, fn)
            tree = ast.parse(open(p).read())
            rel = os.path.relpath(p, os.path.dirname(package_root))
            stack: list = []
            sites: list = []

            class V(ast.NodeVisitor):
                def visit_FunctionDef(self, n):
                    stack.append(n.name)
                    self.generic_visit(n)
                    stack.pop()

                visit_AsyncFunctionDef = visit_FunctionDef

                def visit_Call(self, n):
                    f = n.func
                    if (
                        isinstance(f, ast.Attribute)
                        and f.attr == "localCheckpoint"
                    ):
                        sites.append(".".join(stack) or "<module>")
                    self.generic_visit(n)

            V().visit(tree)
            for s in sites:
                key = f"{rel}::{s}"
                found[key] = found.get(key, 0) + 1
    return found


def lint_checkpoints(package_root: str) -> List[str]:
    """Return violations of the checkpoint-economics allowlist: new or
    multiplied ``localCheckpoint`` sites (measure first!), and stale
    allowlist entries whose site no longer exists."""
    found = checkpoint_sites(package_root)
    out = []
    for key, n in sorted(found.items()):
        want = CHECKPOINT_ALLOWLIST.get(key)
        if want is None:
            out.append(
                f"UNLISTED checkpoint site {key} — measure it both ways "
                "(same-box A/B) and add it to CHECKPOINT_ALLOWLIST with "
                "a size-class justification"
            )
        elif n != want:
            out.append(
                f"checkpoint count changed at {key}: {n} != {want} — "
                "re-adjudicate and update CHECKPOINT_ALLOWLIST"
            )
    for key in sorted(CHECKPOINT_ALLOWLIST):
        if key not in found:
            out.append(f"STALE allowlist entry {key} (site removed)")
    return out
