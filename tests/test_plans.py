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

    def test_bucketed_join_has_no_exchange_below_join(self, spark):
        """bucketed_colocated_join: co-bucketed SortMergeJoin must read
        both fact tables straight off disk — zero Exchange anywhere below
        the join (the only shuffle in the whole plan is the tiny post-join
        groupBy), both scans bucketed. This is the pre-paid-join contract;
        a silent de-bucketing (e.g. a bucket-count mismatch after an edit)
        would re-exchange the fact tables and MUST fail here."""
        df = REGISTRY["bucketed_colocated_join"].fn(spark, SF_SMOKE)
        df.collect()  # AQE: materialize so the final plan is decided
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("Initial Plan")[0]
        assert "SortMergeJoin" in final
        assert final.count("Bucketed: true") >= 2
        # exactly one exchange: the post-join aggregate's — none below the join
        join_subtree = final[final.index("SortMergeJoin"):]
        assert "Exchange" not in join_subtree
        assert shuffles(final) == 1

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


class TestPackSequencesShape:
    def test_pack_window_is_sharded_not_per_lang(self, spark):
        plan = plan_of(spark, "pack_sequences")
        # the data-sized window must partition by (lang, __shard) — a plain
        # per-lang window serializes the dominant language at 100 TB
        assert re.search(r"hashpartitioning\(lang#\d+, __shard#\d+", plan), plan
        # cross-shard offsets join back as a broadcast (tiny per-shard totals)
        assert "BroadcastHashJoin" in plan

    def test_pack_matches_unsharded_window(self, spark):
        # sharded offsets + within-shard prefix == global per-lang prefix sum
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from pandas_to_postgres_spark.sources.parquet import load_table

        got = {
            (r.doc_id, r.lang): r.pack_id
            for r in REGISTRY["pack_sequences"].fn(spark, SF_SMOKE).collect()
        }
        d = load_table(spark, SF_SMOKE, "documents")
        w = (
            Window.partitionBy("lang")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        ref = {
            (r.doc_id, r.lang): r.pack_id
            for r in d.select(
                "doc_id",
                "lang",
                F.floor(
                    F.coalesce(F.sum("n_chars").over(w), F.lit(0)) / 4096.0
                ).cast("long").alias("pack_id"),
            ).collect()
        }
        assert got == ref


class TestNgramPrefixShape:
    def test_prefix_join_has_no_block_self_join_blowup(self, spark):
        plan = plan_of(spark, "ngram_jaccard_pairs")
        # candidate generation joins on the shingle key, never a cartesian
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_prefix_recall_matches_allpairs(self, spark):
        # prefix filtering must find EXACTLY the pairs the quadratic
        # all-pairs scan finds (recall bound is exact, not approximate)
        from pyspark.sql import functions as F

        from pandas_to_postgres_spark.operators.dedup import (
            ngram_jaccard_prefix,
            shingles_expr,
        )

        docs = [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy"),   # near-dup of 1
            (3, "entirely different words compose this one"),
            (4, "entirely different words compose this one too"),  # near-dup of 3
            (5, "quick brown"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            (r.id_a, r.id_b, r.jaccard)
            for r in ngram_jaccard_prefix(df, "text", "doc_id", 0.7).collect()
        }
        sh = df.select("doc_id", shingles_expr("text", 1).alias("tk"))
        a = sh.select(F.col("doc_id").alias("id_a"), F.col("tk").alias("ta"))
        b = sh.select(F.col("doc_id").alias("id_b"), F.col("tk").alias("tb"))
        ref = {
            (r.id_a, r.id_b, r.jaccard)
            for r in a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn(
                "jaccard",
                F.round(
                    F.size(F.array_intersect("ta", "tb")).cast("double")
                    / F.size(F.array_union("ta", "tb")).cast("double"),
                    4,
                ),
            )
            .filter(F.col("jaccard") >= 0.7)
            .select("id_a", "id_b", "jaccard")
            .collect()
        }
        assert got == ref and len(ref) == 2


class TestWindowQueryShapes:
    def test_text_metrics_is_map_only(self, spark):
        # the whole D3 per-row surface must run at scan speed: one scan,
        # zero shuffles, no Python
        plan = plan_of(spark, "text_metrics")
        assert shuffles(plan) == 0
        assert plan.count("Scan parquet") == 1
        assert "Python" not in plan  # no UDF fell into the hot path

    def test_string_date_funcs_is_map_only(self, spark):
        plan = plan_of(spark, "string_date_funcs")
        assert shuffles(plan) == 0
        assert plan.count("Scan parquet") == 1

    def test_ngram_prefix_reuses_materialized_tokenization(self, spark):
        # the tokenized table must come from the materialized checkpoint,
        # not a re-derivation from the raw text scan per reference (12
        # scans unmaterialized). localCheckpoint (not cache) so the
        # blocks are GC-released in long-lived sessions — the plan reads
        # the checkpoint RDD, so no parquet scan survives at all.
        plan = plan_of(spark, "ngram_jaccard_pairs")
        assert "ExistingRDD" in plan
        assert "Scan parquet" not in plan


class TestBudgetSelectShape:
    def test_data_window_is_bucketed_not_global(self, spark):
        plan = plan_of(spark, "budget_select")
        # the corpus-sized window partitions by the score bucket — the only
        # rangepartitioning (global sort) allowed is over the ≤20-row
        # bucket-totals frame, which Spark plans as SinglePartition
        assert re.search(r"hashpartitioning\(__b#\d+", plan), plan
        # offsets broadcast back onto the corpus
        assert "BroadcastHashJoin" in plan

    def test_matches_unbucketed_global_window(self, spark):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from pandas_to_postgres_spark.functions.text import quality_score_expr
        from pandas_to_postgres_spark.sources.parquet import load_table

        got = {
            r.doc_id: r.cum_chars
            for r in REGISTRY["budget_select"].fn(spark, SF_SMOKE).collect()
        }
        d = load_table(spark, SF_SMOKE, "documents").select(
            "doc_id", "n_chars", quality_score_expr(F.col("text")).alias("q")
        )
        w = (
            Window.orderBy(F.col("q").desc(), F.col("doc_id").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        ref = {
            r.doc_id: r.cum
            for r in d.select("doc_id", F.sum("n_chars").over(w).alias("cum"))
            .filter(F.col("cum") <= 60000)
            .collect()
        }
        assert got == ref


class TestMixSourcesProperties:
    def test_bottleneck_stratum_kept_whole_and_mixture_proportional(self, spark):
        from pyspark.sql import functions as F

        from pandas_to_postgres_spark.operators.sampling import mix_fractions
        from pandas_to_postgres_spark.sources.parquet import load_table

        d = load_table(spark, SF_SMOKE, "documents")
        weights = {f"src{i}": 2.0 for i in range(5)}
        fr = {r.source: r.frac for r in mix_fractions(d, "source", weights).collect()}
        counts = {
            r.source: r.n
            for r in d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        # the bottleneck source (max count/weight pressure) keeps frac 1.0
        ratio = {s: counts[s] / weights.get(s, 1.0) for s in counts}
        bottleneck = min(ratio, key=ratio.get)
        assert fr[bottleneck] == 1.0
        # expected kept sizes are weight-proportional: n_s * frac_s ≈ w_s * tmin
        tmin = ratio[bottleneck]
        for s in counts:
            assert abs(counts[s] * fr[s] - weights.get(s, 1.0) * tmin) < 1e-6


class TestCorpusShuffle:
    def test_positions_are_exactly_1_to_n(self, spark):
        from pyspark.sql import functions as F

        out = REGISTRY["corpus_shuffle"].fn(spark, SF_SMOKE)
        n = out.count()
        agg = out.agg(
            F.min("position").alias("lo"),
            F.max("position").alias("hi"),
            F.countDistinct("position").alias("d"),
        ).collect()[0]
        assert (agg.lo, agg.hi, agg.d) == (1, n, n)


class TestTfidfShape:
    def test_single_tf_aggregation_and_group_limit(self, spark):
        """df comes from a count window over the tf frame, not a self-join:
        exactly ONE (doc_id, tok) aggregation exchange may appear (the
        join formulation produced two identical, un-reused ones), and the
        top-5 rank filter must push down as WindowGroupLimit."""
        plan = plan_of(spark, "tfidf_top_terms")
        tf_exchanges = [
            l for l in plan.splitlines()
            if "Exchange hashpartitioning" in l and "doc_id" in l and "tok" in l
        ]
        assert len(tf_exchanges) == 1, tf_exchanges
        assert "WindowGroupLimit" in plan
        assert shuffles(plan) <= 3


class TestSpanDedupPlan:
    def test_span_text_excluded_from_dedup_exchange(self, spark):
        plan = plan_of(spark, "span_dedup_docs")
        win_exchanges = [
            l for l in plan.splitlines() if "Exchange hashpartitioning" in l and "__h" in l
        ]
        assert win_exchanges and all("seg#" not in l for l in win_exchanges)


class TestTpchFullShapes:
    """The adapted Q2/Q9/Q11/Q12/Q16/Q20/Q21 shapes (plans/tpch_full.py):
    every correlated subquery must decorrelate into joins — a plan with a
    per-row subquery execution would be a 100 TB disaster."""

    def test_q21_decorrelates_to_semi_and_anti(self, spark):
        plan = plan_of(spark, "q21_waiting_suppliers")
        assert "LeftSemi" in plan and "LeftAnti" in plan
        assert shuffles(plan) <= 3

    def test_q16_not_in_is_anti_join(self, spark):
        plan = plan_of(spark, "q16_supplier_variety")
        assert "LeftAnti" in plan
        assert shuffles(plan) <= 2  # distinct-agg + final agg at most

    def test_q20_in_chain_is_semi_join(self, spark):
        plan = plan_of(spark, "q20_excess_suppliers")
        assert "LeftSemi" in plan
        assert shuffles(plan) <= 2

    def test_q2_limit_is_take_ordered(self, spark):
        plan = plan_of(spark, "q2_min_cost_supplier")
        assert "TakeOrderedAndProject" in plan

    def test_q9_q12_single_shuffle(self, spark):
        assert shuffles(plan_of(spark, "q9_nation_profit")) <= 1
        assert shuffles(plan_of(spark, "q12_priority_lines")) <= 1


class TestSqlSurfaceShapes:
    def test_lateral_topk_rewrites_to_window_group_limit(self, spark):
        plan = plan_of(spark, "lateral_topk_orders")
        # NOT a per-row subquery: a join + rank window with the per-group
        # limit pushed below the sort
        assert "WindowGroupLimit" in plan
        assert "CartesianProduct" not in plan


class TestAnalyticsShapes:
    def test_fuzzy_join_blocks_are_equi_joins(self, spark):
        # multi-pass blocking must stay an equi-join on the block key —
        # a cartesian/BNLJ pair space would be the 100 TB killer
        plan = plan_of(spark, "fuzzy_join_parts")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # names are collapsed to distinct BEFORE pairing
        assert plan.count("HashAggregate") >= 2

    def test_winsorized_percentiles_broadcast_back(self, spark):
        plan = plan_of(spark, "winsorized_stats")
        assert "BroadcastHashJoin" in plan

    def test_unigram_scalar_total_is_broadcast_not_collect(self, spark):
        # the corpus-total scalar rides a broadcast nested-loop of a
        # 1-row aggregate — never a driver-side collect
        plan = plan_of(spark, "unigram_logprob")
        assert "BroadcastNestedLoopJoin" in plan

    def test_interpolation_shuffle_bound(self, spark):
        # dailies agg + spine agg + join + two user-keyed windows must all
        # ride user_id partitionings: a handful of exchanges, nothing global
        plan = plan_of(spark, "interpolate_events")
        assert shuffles(plan) <= 5
        assert "CartesianProduct" not in plan

    def test_cohort_firsts_join_shares_user_partitioning(self, spark):
        plan = plan_of(spark, "cohort_retention")
        assert shuffles(plan) <= 4

    def test_skew_profile_topk_is_take_ordered(self, spark):
        plan = plan_of(spark, "skew_profile")
        assert "TakeOrderedAndProject" in plan

    def test_dq_scan_checks_are_one_pass(self, spark):
        # the four conditional checks share ONE aggregate over one scan —
        # not four scans; only the FK anti-join reads the dim side
        plan = plan_of(spark, "dq_checks_orders")
        assert "LeftAnti" in plan

    def test_kmeans_assignment_never_shuffles_corpus(self, spark):
        from pandas_to_postgres_spark.operators.kmeans import assign_clusters
        from pandas_to_postgres_spark.sources.parquet import load_table

        e = load_table(spark, SF_SMOKE, "embeddings")
        cents = [[0.0] * 64, [1.0] * 64]
        plan = (
            assign_clusters(e, "embedding", cents)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # centroid matrix broadcasts; corpus partitioning untouched
        assert "BroadcastNestedLoopJoin" in plan
        assert shuffles(plan) == 0

    def test_interval_overlap_is_bucketed_equi_join_not_cartesian(self, spark):
        # the whole point of the operator: the non-equi overlap predicate
        # rides an hour-bucket EQUI-join, never a nested-loop pair space
        plan = plan_of(spark, "interval_overlap_join")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Generate explode" in plan

    def test_sessionize_windows_share_one_sort(self, spark):
        # the lag mark and the running session counter must ride ONE
        # (user, ts, event_id) sort + exchange, not two
        plan = plan_of(spark, "sessionize_events")
        assert plan.count("Sort [user_id") <= 2  # lag pass + sum pass, same key
        assert shuffles(plan) == 1


class TestQualityQueryShapes:
    def test_token_entropy_is_map_only_take_ordered(self, spark):
        # the entropy fold must stay a projection over the scan: no
        # explode, no shuffle — the only cluster op is the final top-50
        plan = plan_of(spark, "token_entropy_docs")
        assert shuffles(plan) == 0
        assert "TakeOrderedAndProject" in plan
        assert "Generate" not in plan  # no explode fell back in
        assert plan.count("Scan parquet") == 1

    def test_embedding_outliers_broadcasts_centroids_and_group_limits(self, spark):
        plan = plan_of(spark, "embedding_outliers")
        # centroid side broadcasts onto the corpus scan
        assert "BroadcastHashJoin" in plan
        # the top-5-per-label rank prunes BEFORE its exchange: a partial
        # WindowGroupLimit must sit below the final one
        assert plan.count("WindowGroupLimit") == 2
        # corpus-side shuffles: the (label, dim) centroid partial agg, the
        # label fold, and the group-limited rank exchange — nothing else
        assert shuffles(plan) <= 3

    def test_equidepth_edges_ride_a_broadcast(self, spark):
        # the 1-row edge array must broadcast onto the scan; binning is a
        # map-only higher-order filter and the rollup has <= 10 groups
        plan = plan_of(spark, "equidepth_histogram")
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
        assert "CartesianProduct" not in plan

    def test_event_transitions_single_user_shuffle(self, spark):
        # lag window shuffles on user_id once; the transition-count agg is
        # map-side combinable over a |event_type|^2 frame
        plan = plan_of(spark, "event_transitions")
        assert shuffles(plan) <= 3
        assert plan.count("Scan parquet") == 1

    def test_inverted_index_caps_postings_before_exchange(self, spark):
        # posting-list truncation must prune map-side: a partial
        # WindowGroupLimit below the exchange, and never an unbounded
        # collect of raw pairs through a shuffle
        plan = plan_of(spark, "inverted_index")
        assert plan.count("WindowGroupLimit") == 2
        assert shuffles(plan) <= 3

    def test_negative_pairs_is_capped_bucket_join_not_cartesian(self, spark):
        # the candidate pool caps at 50 per bucket BEFORE the join: pair
        # space stays anchors x 50, and the bucket key makes it an
        # equi-join, never a cartesian/BNLJ
        plan = plan_of(spark, "negative_pairs")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert plan.count("WindowGroupLimit") >= 2  # pool cap prunes map-side

    def test_chunk_overlap_is_map_only(self, spark):
        # strided chunking must stay a per-row generate over the scan
        plan = plan_of(spark, "chunk_overlap_docs")
        assert shuffles(plan) == 0
        assert "Generate" in plan
        assert plan.count("Scan parquet") == 1

    def test_weighted_reservoir_is_map_only_take_ordered(self, spark):
        # the ES key is a projection; the fixed-size sample must be
        # TakeOrderedAndProject, never a global sort
        plan = plan_of(spark, "weighted_reservoir")
        assert shuffles(plan) == 0
        assert "TakeOrderedAndProject" in plan


class TestRetrievalBatchShapes:
    def test_bm25_ranking_is_take_ordered_with_broadcast_stats(self, spark):
        # df + corpus stats ride broadcasts; ranking never global-sorts
        plan = plan_of(spark, "bm25_docs")
        assert "TakeOrderedAndProject" in plan
        assert "BroadcastExchange" in plan

    def test_skyline_has_no_self_join_or_single_partition_window(self, spark):
        # dominance must be the bucketed prefix-max scan, not the oracle's
        # quadratic NOT EXISTS; the only SinglePartition exchange allowed
        # is the tiny per-bucket-max frame feeding the broadcast
        plan = plan_of(spark, "skyline_parts")
        assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan

    def test_cms_cells_partial_aggregate_before_exchange(self, spark):
        # sketch cells must map-side combine: partial agg below the
        # (seed, bucket) exchange keeps the shuffle sketch-sized
        plan = plan_of(spark, "cms_token_audit")
        assert "partial_count" in plan or "HashAggregate" in plan
        assert "BroadcastExchange" in plan  # probe joins the 4096-cell sketch

    def test_zorder_interleave_is_codegen_projection(self, spark):
        # no UDF, no shuffle before the <=1024-group aggregate
        plan = plan_of(spark, "zorder_layout_lineitem")
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert shuffles(plan) <= 2  # bucket agg + single-row final agg

    def test_bigram_pairs_assembled_in_row(self, spark):
        # pair generation is Generate over an in-row transform — the plan
        # must NOT contain a join below the count aggregates
        plan = plan_of(spark, "bigram_condprob")
        assert "Generate explode" in plan
        below_join = plan.split("Join")[-1] if "Join" in plan else plan
        assert "Generate" in below_join  # the explode sits under any join

    def test_minhash_checked_mirrors_throughput_tier_shape(self, spark):
        # map-only signatures: scan -> project -> posexplode with no
        # exchange until the band bucket window
        plan = plan_of(spark, "minhash_lsh_checked")
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan


class TestContinuationBatchShapes:
    def test_kmv_sketches_are_take_ordered(self, spark):
        # per-partition local top-k, never a global sort of the hash space
        plan = plan_of(spark, "kmv_set_ops")
        assert "TakeOrderedAndProject" in plan
        assert "BroadcastExchange" in plan  # sketch membership probes

    def test_cusum_windows_share_one_sort(self, spark):
        # running sum + running min must ride the SAME (type, day) sort:
        # exactly one window exchange for the whole statistic
        plan = plan_of(spark, "cusum_changepoint_events")
        assert plan.count("Window") <= 2  # one Window node (+AQE echo)
        assert "BroadcastExchange" in plan  # per-type totals

    def test_golden_record_is_one_aggregate_no_joins(self, spark):
        # survivorship = union + single max_by aggregate; per-column
        # joins would show as Join nodes
        plan = plan_of(spark, "golden_record_customers")
        assert "Join" not in plan
        assert "max_by" in plan or "HashAggregate" in plan

    def test_join_size_estimate_shuffles_are_sketch_sized(self, spark):
        # cells aggregates partial-combine before their exchanges; the
        # inner product joins two 4096-row frames
        plan = plan_of(spark, "join_size_estimate")
        assert "partial_count" in plan or "HashAggregate" in plan
        assert "CartesianProduct" not in plan

    def test_vocab_drift_is_take_ordered_with_broadcast_totals(self, spark):
        plan = plan_of(spark, "vocab_drift_langs")
        assert "TakeOrderedAndProject" in plan
        assert "BroadcastExchange" in plan

    def test_weighted_median_window_runs_on_value_grid(self, spark):
        # the grid collapse (brand, price) aggregate must sit BELOW the
        # cumulative window: a partial agg exists under the Window sort
        plan = plan_of(spark, "weighted_median_price")
        assert "Window" in plan
        assert "partial_" in plan or "HashAggregate" in plan


class TestFinalBatchShapes:
    def test_sliding_distinct_window_runs_on_collapsed_grain(self, spark):
        # the range window must sit ABOVE the (user, day, type) distinct
        # aggregate — never over raw event rows
        plan = plan_of(spark, "sliding_distinct_types")
        assert "Window" in plan
        assert "HashAggregate" in plan

    def test_spearman_rank_windows_share_partitioning(self, spark):
        # two rank windows + moment agg; no cartesian anywhere
        plan = plan_of(spark, "spearman_value_hour")
        assert "CartesianProduct" not in plan
        assert "Window" in plan

    def test_diversified_topk_is_cap_then_take_ordered(self, spark):
        plan = plan_of(spark, "diversified_topk_docs")
        assert "TakeOrderedAndProject" in plan
        assert "WindowGroupLimit" in plan or "Window" in plan

    def test_trimmed_mean_single_brand_window_pass(self, spark):
        plan = plan_of(spark, "trimmed_mean_price")
        assert "Window" in plan
        assert "CartesianProduct" not in plan

    def test_mann_kendall_pairing_stays_on_day_grain(self, spark):
        # the self-join must consume the day-level aggregate, not events:
        # every join input comes from a HashAggregate subtree
        plan = plan_of(spark, "mann_kendall_trend")
        assert "HashAggregate" in plan
        assert "CartesianProduct" not in plan or "BroadcastNestedLoopJoin" in plan


class TestBloomShape:
    def test_probe_is_broadcast_no_fact_shuffle_and_jvm_only(self, spark):
        import pyspark.sql.functions as F

        from pandas_to_postgres_spark.operators.bloom import (
            bloom_build,
            bloom_prefilter,
        )

        orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        bloom = bloom_build(orders.select("o_orderkey"), "o_orderkey")
        pruned = bloom_prefilter(li, "l_orderkey", bloom)
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        # the 1-row bitmap broadcasts; the fact side must not exchange
        # before the membership filter — every hash shuffle in this plan
        # belongs to the bitmap build, whose row counts are bounded by
        # num_bits/64 (2048-16384 words), never by dim or fact size
        assert "BroadcastNestedLoopJoin" in plan
        assert shuffles(plan) <= 3
        # membership test is pure JVM expression work
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan

    def test_registered_query_passes_scale_gate(self, spark):
        from pandas_to_postgres_spark.plans.lint import assert_scalable

        df = REGISTRY["bloom_semi_lineitem"].fn(spark, SF_SMOKE)
        assert_scalable(df)


class TestDynamicPartitionPruning:
    def test_partitioned_fact_join_installs_runtime_partition_filter(
        self, spark, tmp_path
    ):
        # hive-partitioned layout + filtered dim join -> Spark installs a
        # dynamicpruning PartitionFilter on the fact scan: at 100 TB the
        # fact directories for non-matching partitions are never listed,
        # the partition-elimination twin of the bloom row prefilter
        import pyspark.sql.functions as F

        from pandas_to_postgres_spark.sinks.files import (
            write_parquet_partitioned,
        )

        orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        path = str(tmp_path / "orders_by_prio")
        write_parquet_partitioned(orders, path, ["o_orderpriority"])
        fact = spark.read.parquet(path)
        dim = spark.createDataFrame(
            [("1-URGENT", 1), ("2-HIGH", 2), ("5-LOW", 5)], ["prio", "tier"]
        ).filter(F.col("tier") == 1)
        joined = (
            fact.join(dim, fact.o_orderpriority == dim.prio)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan
        # and the result is the pruned partition only
        rows = joined.collect()
        assert [r["o_orderpriority"] for r in rows] == ["1-URGENT"]


class TestParallelismPinning:
    """Round-6 narrow-stage fixes (SCALE.md 'checkpoint-width trap'):
    CPU-heavy stages over byte-small inputs must carry an explicit-width
    repartition, or AQE's byte-based coalescing (and the frozen split
    count of localCheckpoint) serializes them onto 1-2 cores. These
    assert the pinning Exchange survives in the executed plan — a
    refactor that drops it re-creates a measured 2-5x wall regression.
    """

    def _roundrobin(self, plan: str) -> bool:
        return "Exchange RoundRobinPartitioning" in plan

    def test_decontaminate_gram_probe_is_widened(self, spark):
        assert self._roundrobin(plan_of(spark, "decontaminate_overlap"))

    def test_media_decode_mapinpandas_is_widened(self, spark):
        assert self._roundrobin(plan_of(spark, "multimodal_real_decode"))

    def _new_checkpoint_widths(self, spark, run):
        """Run ``run()`` and return partition counts of every NEW
        persistent RDD it registered (localCheckpoint blocks live in
        getPersistentRDDs), so the frozen widths are asserted directly —
        the repartitions sit BELOW the checkpoints and are invisible in
        the final executed plan."""
        jsc = spark.sparkContext._jsc
        def ids():
            out = {}
            it = jsc.getPersistentRDDs().entrySet().iterator()
            while it.hasNext():
                e = it.next()
                out[e.getKey()] = e.getValue().getNumPartitions()
            return out
        before = set(ids())
        run()
        after = ids()
        return [n for rid, n in after.items() if rid not in before]

    def test_winnow_checkpoint_width_is_pooled(self, spark):
        widths = self._new_checkpoint_widths(
            spark,
            lambda: REGISTRY["winnow_copy_pairs"].fn(spark, SF_SMOKE).count(),
        )
        assert widths, "expected the (doc, fp) frame to be checkpointed"
        floor = min(spark.sparkContext.defaultParallelism, 8)
        assert all(w >= floor for w in widths), widths

    def test_ngram_prefix_checkpoint_widths_are_pooled(self, spark):
        from pandas_to_postgres_spark.operators.dedup import (
            ngram_jaccard_prefix,
        )
        from pandas_to_postgres_spark.sources.parquet import load_table

        d = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
        widths = self._new_checkpoint_widths(
            spark,
            lambda: ngram_jaccard_prefix(d, "text", "doc_id", 0.8, 1).count(),
        )
        assert widths, "expected toks + pref checkpoints"
        floor = min(spark.sparkContext.defaultParallelism, 8)
        # the two compute-bearing checkpoints (token arrays + prefix frame,
        # the fan-out join's feeders) must stay pooled; the round-10
        # vocabulary-sized dfreq checkpoint (one row per distinct shingle)
        # is ALLOWED to be narrow — it only feeds metadata-sized jobs (the
        # collision-check aggregate and the <=512-row vocab index), never
        # the fan-out
        assert sum(w >= floor for w in widths) >= 2, widths

    def test_blocked_embedding_join_is_width_pinned(self, spark):
        # pinned by an explicit hashpartitioning on the block column
        plan = plan_of(spark, "embedding_neardup")
        assert re.search(r"Exchange hashpartitioning\(label", plan)


class TestIvfPartitionedLayout:
    def test_probed_lists_prune_at_the_scan(self, spark):
        """ivf_partitioned_search: the layout read must carry a static
        partition filter on the cluster column (label IN <probed set>) —
        unprobed inverted lists are never read off disk. A regression to
        a post-scan Filter would silently read the whole index."""
        plan = plan_of(spark, "ivf_partitioned_search")
        scan = [
            l for l in plan.split("\n")
            if "FileScan" in l and "ivf_layout_" in l
        ]
        assert scan, "expected a scan of the partitioned layout"
        assert "PartitionFilters: [label" in scan[0]
        assert "label" in scan[0].split("PartitionFilters")[1][:80]

    def test_layout_result_equals_in_memory_ivf(self, spark):
        """Same ranking rules, different physical path: the persisted
        layout must return byte-identical top-k to simsearch_ivf."""
        a = (
            REGISTRY["ivf_partitioned_search"].fn(spark, SF_SMOKE)
            .orderBy("qid", "rnk").collect()
        )
        b = (
            REGISTRY["simsearch_ivf"].fn(spark, SF_SMOKE)
            .orderBy("qid", "rnk").collect()
        )
        assert [tuple(r) for r in a] == [tuple(r) for r in b]


class TestRound8Shapes:
    """Plan asserts for the round-8 statistics tier: the histogram
    fold must COMBINE MAP-SIDE (partial + final HashAggregate around
    one exchange of O(features x bins) rows — the LightGBM layout), and
    MI's marginals must re-aggregate the joint frame rather than
    re-scan the data."""

    def test_gbdt_histogram_partial_agg_one_data_shuffle(self, spark):
        plan = plan_of(spark, "gbdt_split_histogram")
        # partial+final around the (feature, bin) exchange
        assert plan.count("HashAggregate") >= 2
        # one data-sized shuffle (the histogram); window/rank exchanges
        # operate on the ~40-row frame
        assert "Generate" in plan  # the 4-way feature fan-out is a
        # generator inheriting scan partitioning, not a union of scans
        assert plan.count("Scan parquet") == 1

    def test_mi_single_scan_and_mapside_combine(self, spark):
        plan = plan_of(spark, "mi_feature_ranking")
        assert plan.count("HashAggregate") >= 2
        # marginals come from the checkpointed joint frame: exactly one
        # parquet scan in the whole plan
        assert plan.count("Scan parquet") <= 1

    def test_psi_events_scan_is_column_pruned(self, spark):
        plan = plan_of(spark, "gbdt_split_histogram")
        # ReadSchema pruned to the needed columns only (binning inputs)
        import re

        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m, plan[:500]
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        assert cols <= {
            "l_quantity", "l_discount", "l_linenumber", "l_shipdate",
            "l_tax",
        }, cols


class TestSketchShapes:
    """The deterministic-sketch family's scale claims, plan-asserted:
    every sketch's data pass must COMBINE MAP-SIDE (partial + final
    HashAggregate) so the shuffle carries registers/counters, not
    rows."""

    def test_hll_register_fold_is_partial(self, spark):
        plan = plan_of(spark, "hll_distinct_users")
        assert plan.count("HashAggregate") >= 2
        assert plan.count("Scan parquet") <= 2  # sketch pass + exact twin

    def test_hll_sketch_leg_has_no_hash_value_exchange(self, spark):
        """The round-8 verdict's one `weak`: the sketch leg must reach
        groupBy(bucket) straight from the scan — no pre-bucketing
        distinct(), whose Exchange on the raw hash value is the exact
        full-cardinality shuffle HLL exists to avoid. With the fix the
        only wide exchange in the sketch leg partitions on `bucket`
        (<=1024 register rows per task after the partial max)."""
        plan = plan_of(spark, "hll_distinct_users")
        assert "hashpartitioning(hv" not in plan, plan
        assert "hashpartitioning(bucket" in plan

    def test_cms_counter_fold_is_partial(self, spark):
        plan = plan_of(spark, "cms_heavy_hitters")
        assert plan.count("HashAggregate") >= 2
        assert "Generate" in plan  # d-row fan-out is a generator
        assert "TakeOrderedAndProject" in plan  # exact top-10, no sort

    def test_kmv_uses_takeordered_not_sort(self, spark):
        plan = plan_of(spark, "kmv_theta_sketch")
        assert "TakeOrderedAndProject" in plan
        # round-9 plan upgrade: the distinct no longer exchanges every
        # distinct hash — a partition-local <=64-entry sorted-unique
        # fold (MapInPandas) runs first, so the distinct's exchange
        # moves at most 64 rows per input partition
        assert "MapInPandas" in plan
        # the k-smallest selection must not plan a standalone global
        # sort: every Sort line in the final plan belongs to a window /
        # SMJ subtree, and here there are none of either
        final = plan.split("Initial Plan")[0]
        assert "Sort [" not in final.replace(
            "TakeOrderedAndProject", ""
        ), final

    def test_median_within_bin_is_takeordered(self, spark):
        plan = plan_of(spark, "two_pass_exact_median")
        assert "TakeOrderedAndProject" in plan


class TestRound9Shapes:
    """Plan shapes of the round-9 additions: selection without global
    sorts, map-combined sketch folds, bounded sampling heaps."""

    def test_priority_sample_is_takeordered(self, spark):
        plan = plan_of(spark, "priority_sample_docs")
        assert "TakeOrderedAndProject" in plan
        # the candidate selection must not plan a standalone global sort
        # (the only Sort allowed is the 51-row window's)
        final = plan.split("Initial Plan")[0]
        assert final.count("Sort [") <= 1

    def test_quantiles_never_sort_more_than_a_fine_bin(self, spark):
        # the histogram passes run as earlier driver jobs; the RETURNED
        # frame is the final fine-bin rank + target join — its plan must
        # sort only within hash-partitioned fine bins, never a global
        # Exchange rangepartitioning (which would be an ORDER BY)
        plan = plan_of(spark, "two_pass_exact_quantiles")
        assert "Exchange rangepartitioning" not in plan
        assert "hashpartitioning(b#" in plan  # the fine-bin window
        assert "BroadcastHashJoin" in plan  # targets broadcast, 5 rows

    def test_ams_join_sketch_folds_map_side(self, spark):
        # r11: ONE query — the sketch derives from the exact leg's
        # per-key count frames (md5 once per DISTINCT key, sign bits
        # weighted by the key's count) and the median-of-means fold runs
        # in-plan over the two 1-row sketch frames. No explode(0..31)
        # Generate, no groupBy(j), no construction-time collect; scans
        # stay column-pruned to the join keys and each table is scanned
        # exactly once.
        plan = plan_of(spark, "ams_join_estimate")
        assert "Generate" not in plan  # the 32x row fan-out is gone
        # each leg pair shares one per-key groupBy subtree; the initial
        # plan prints it per consumer (2 tables x 2 consumers) and AQE
        # dedups the identical exchanges at runtime — what must NOT
        # appear is any scan beyond those four or a raw-row sketch scan
        assert plan.count("Scan parquet") <= 4
        assert plan.count("HashAggregate") >= 2  # map-combined partials
        assert "ReadSchema: struct<l_orderkey:bigint>" in plan  # pruned

    def test_cascade_is_one_pass(self, spark):
        plan = plan_of(spark, "filter_cascade_stats")
        assert plan.count("Scan parquet") == 1
        assert plan.count("HashAggregate") >= 2  # map-combined counters

    def test_grouped_median_no_per_group_sort(self, spark):
        """The returned frame's plan must rank only inside (group, bin)
        cells — a window partitioned on (g, b), never PARTITION BY g
        alone (which serializes the largest group) and never a global
        range exchange."""
        plan = plan_of(spark, "grouped_exact_median")
        assert "Exchange rangepartitioning" not in plan
        assert "hashpartitioning(g#" in plan and ", b#" in plan
        assert "BroadcastHashJoin" in plan  # 3-row target frame

    def test_hll_union_shuffles_registers_only(self, spark):
        plan = plan_of(spark, "hll_union_sources")
        # register fold combines map-side; exchange keys on (source, bucket)
        assert plan.count("HashAggregate") >= 2
        assert "hashpartitioning(source#" in plan

    def test_ivf_recall_audit_broadcasts_query_side(self, spark):
        plan = plan_of(spark, "ivf_recall_audit")
        assert "CartesianProduct" not in plan


class TestRound10Shapes:
    def test_stream_drain_frames_own_no_deleted_source(self, spark):
        """The streaming sketch queries drain their complete-mode state
        through a temp parquet dir that is DELETED before returning —
        the returned frame must be rebuilt source-independent
        (createDataFrame over the collected sketch rows), never a lazy
        read whose cached blocks could be evicted and recomputed from
        the deleted path (r9 What's-wrong #2)."""
        for name, tmp_tag in [
            ("stream_cms_topk", "stream_cms_"),
            ("stream_hll_distinct", "stream_hll_"),
        ]:
            plan = plan_of(spark, name)
            assert tmp_tag not in plan, f"{name} plan references its tmpdir"
            assert "/tmp/" not in plan, f"{name} plan reads a temp path"

    def test_clone_scan_reads_source_files_through_the_clone(self, spark):
        """Zero-copy proof at the scan level: the clone's read must pull
        the SOURCE table's data files (referenced by relative path) plus
        the clone's own post-clone append — both directories appear in
        the scan's input files (the plan string truncates file lists, so
        assert on inputFiles), and the aggregate combines map-side."""
        from pandas_to_postgres_spark.plans import REGISTRY
        from tests.conftest import SF_SMOKE

        df = REGISTRY["snapshot_clone_scan"].fn(spark, SF_SMOKE)
        files = df.inputFiles()
        assert any("clone_src_" in f for f in files)  # cloned references
        assert any("clone_dst_" in f for f in files)  # the clone's append
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("HashAggregate") >= 2  # partial + final

    def test_rewrite_audit_is_one_scan_with_partial_agg(self, spark):
        """The audit's data leg is ONE scan of the repacked snapshot with
        a map-combined scalar aggregate; shard bookkeeping is manifest
        metadata, never a data-sized plan node."""
        plan = plan_of(spark, "manifest_rewrite_audit")
        assert plan.count("Scan parquet") == 1
        assert plan.count("HashAggregate") >= 2

    def test_hll_union_rides_one_distinct_shingle_pass(self, spark):
        """r10: the sketch leg and both exact-distinct companions all
        derive from ONE checkpointed distinct-(source, shingle) frame —
        the returned plan must not re-derive the shingle explode or
        re-scan the raw table per leg (before: three corpus passes), and
        the exact legs are plain counts over the already-distinct frame
        (no countDistinct machinery, no Expand)."""
        plan = plan_of(spark, "hll_union_sources")
        assert "Generate" not in plan  # explode lives below the checkpoint
        assert "Scan parquet" not in plan  # no leg re-reads documents
        assert "Expand" not in plan  # no countDistinct expansion

    def test_chi2_counts_corpus_once(self, spark):
        """r10: the contingency-cell frame is checkpointed — margins,
        total, cells, and dims all read it instead of re-running the
        corpus groupBy (before: 10 scan nodes, one per broadcast leg,
        because broadcast subtrees replan instead of reusing the
        exchange)."""
        plan = plan_of(spark, "chi2_source_lang")
        assert "Scan parquet" not in plan  # the one corpus pass is below the checkpoint

    def test_open_orders_derives_intervals_once(self, spark):
        """r10: both boundary deltas explode from ONE pass over the
        interval aggregate and the timeline-bounded daily frame is
        checkpointed — the returned plan reads checkpoints only (before:
        16 scan nodes across the union branches and daily's two
        consumers), and the running sum stays the bucketed month-window
        pattern, never a global range exchange."""
        plan = plan_of(spark, "open_orders_concurrency")
        assert "Scan parquet" not in plan
        assert "hashpartitioning(month" in plan  # per-month running sum

    def test_cms_audit_tokenizes_once(self, spark):
        """r10: the sketch cells are Σ exact_n over the checkpointed
        vocab frame — the returned plan must not re-scan/re-tokenize the
        corpus for the cells leg (before: two corpus passes, md5 per
        occurrence; after: both legs read the checkpoint, md5 per
        DISTINCT term)."""
        plan = plan_of(spark, "cms_token_audit")
        assert "Scan parquet" not in plan  # corpus pass lives below the checkpoint
        assert plan.count("Scan ExistingRDD") == 2  # cells + probes legs

    def test_dsir_counts_fold_in_one_pass(self, spark):
        """r10: source and target bucket counts fold in ONE conditional
        aggregate over one tokenize pass (the before-plan ran the
        tokenize+bucket pipeline separately for src, tgt, and both
        consumers of the un-materialized counts frame: 5 Generates, 10
        scans). The returned plan keeps only the scoring pass's explode
        plus checkpoint reads."""
        plan = plan_of(spark, "dsir_select_docs")
        assert plan.count("Generate") == 1  # the scoring pass only
        assert plan.count("Scan parquet") == 1
        assert "TakeOrderedAndProject" in plan  # selection never global-sorts

    def test_nb_classifier_tokenizes_once(self, spark):
        """r10: dt / stats / t / vocab all derive from ONE per-(doc,
        source, tok) count frame — the corpus tokenize+explode subtree
        must appear exactly once in the plan (it ran four times before:
        dt, stats, t, v each re-derived it), and the only remaining
        documents scans are the cheap non-tokenizing legs (priors,
        corpus count, actual-source join)."""
        plan = plan_of(spark, "nb_source_classifier")
        assert plan.count("Generate explode") == 1
        assert plan.count("Scan parquet") <= 4

    def test_history_audit_returns_pure_metadata(self, spark):
        """The history metadata table never opens a data file: the
        returned frame is a driver-built local relation (Iceberg's
        inspection-table promise — O(manifest), not O(data))."""
        plan = plan_of(spark, "snapshot_history_audit")
        assert "Scan parquet" not in plan
        assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan
