"""Operator unit tests on micro-fixtures (FIXTURES.md §B): null-preserving
casts, missing columns, as-of join golden answers, dedup recall on planted
near-dups, similarity golden cosines, multimodal plumbing, orchestration."""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pandas_to_postgres_spark.functions.normalize import (
    apply_formatters,
    cast_to_target_schema,
)
from pandas_to_postgres_spark.operators.dedup import (
    dedup_exact,
    embedding_near_duplicates,
    minhash_near_duplicates,
    simhash_near_duplicates,
    span_dedup,
)
from pandas_to_postgres_spark.operators.joins import asof_join
from pandas_to_postgres_spark.operators.multimodal import (
    attach_fake_media,
    extract_features,
)
from pandas_to_postgres_spark.operators.similarity import (
    topk_cosine_bruteforce,
    topk_cosine_lsh,
)
from pandas_to_postgres_spark.orchestration import copy_tables, union_sources


class TestNormalize:
    """FIXTURES B.1/B.2 — the cast_pandas contract."""

    def test_nulls_survive_int_and_bool(self, spark):
        df = spark.createDataFrame(
            [(1, 1.0, True), (2, None, None), (3, 3.0, False)],
            "id long, v double, b boolean",
        )
        target = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("v", T.LongType()),
                T.StructField("b", T.BooleanType()),
            ]
        )
        out = cast_to_target_schema(df, target).orderBy("id").collect()
        assert [r.v for r in out] == [1, None, 3]
        assert [r.b for r in out] == [True, None, False]
        assert out[0].__fields__ == ["id", "v", "b"]

    def test_missing_column_warn_and_skip(self, spark):
        df = spark.createDataFrame([(1,)], "id long")
        target = T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("missing", T.StringType())]
        )
        out = cast_to_target_schema(df, target)
        assert out.columns == ["id"]

    def test_missing_column_strict_raises(self, spark):
        df = spark.createDataFrame([(1,)], "id long")
        target = T.StructType([T.StructField("nope", T.StringType())])
        with pytest.raises(ValueError):
            cast_to_target_schema(df, target, strict=True)

    def test_extra_columns_dropped_and_order_is_target(self, spark):
        df = spark.createDataFrame([(1, "x", 2.0)], "b long, extra string, a double")
        target = T.StructType(
            [T.StructField("a", T.DoubleType()), T.StructField("b", T.LongType())]
        )
        assert cast_to_target_schema(df, target).columns == ["a", "b"]

    def test_formatter_chain_order(self, spark):
        df = spark.createDataFrame([(1,)], "v long")
        out = apply_formatters(
            df,
            [
                lambda d: d.withColumn("v", F.col("v") + 1),
                lambda d: d.withColumn("v", F.col("v") * 10),
            ],
        ).collect()
        assert out[0].v == 20  # (1+1)*10 — order preserved


class TestAsofJoin:
    def test_golden(self, spark):
        ts = lambda s: datetime.datetime.fromisoformat(s)  # noqa: E731
        left = spark.createDataFrame(
            [(1, ts("2024-01-01 10:00:00"), "p1"), (1, ts("2024-01-01 12:00:00"), "p2"),
             (2, ts("2024-01-01 09:00:00"), "p3")],
            "k long, ts timestamp, tag string",
        )
        right = spark.createDataFrame(
            [(1, ts("2024-01-01 09:30:00"), 10.0), (1, ts("2024-01-01 11:00:00"), 20.0),
             (2, ts("2024-01-01 09:30:00"), 99.0)],
            "k long, ts timestamp, v double",
        )
        out = {r.tag: r.v_asof for r in asof_join(left, right, on="ts", by="k", value_cols=["v"]).collect()}
        # p1: latest right <= 10:00 is 09:30 → 10.0; p2: 11:00 → 20.0
        # p3: no right row at or before 09:00 → NULL (left-outer)
        assert out == {"p1": 10.0, "p2": 20.0, "p3": None}

    def test_inclusive_tie(self, spark):
        ts = datetime.datetime(2024, 1, 1, 10, 0, 0)
        left = spark.createDataFrame([(1, ts, "p")], "k long, ts timestamp, tag string")
        right = spark.createDataFrame([(1, ts, 7.0)], "k long, ts timestamp, v double")
        out = asof_join(left, right, on="ts", by="k", value_cols=["v"]).collect()
        assert out[0].v_asof == 7.0  # equal timestamps match (>= semantics)


class TestDedup:
    """FIXTURES B.5 — planted exact and near duplicates."""

    def _docs(self, spark):
        base = "the quick brown fox jumps over the lazy dog again and again today"
        rows = [
            (1, base),
            (2, base),  # exact dup of 1
            (3, base + " extended"),  # near dup of 1
            (4, "completely different content about spark query engines at scale"),
            (5, "yet another unrelated document with its own distinct words here"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_exact_keeps_min_id(self, spark):
        kept = {r.doc_id for r in dedup_exact(self._docs(spark), "text", "doc_id").collect()}
        assert kept == {1, 3, 4, 5}

    def test_minhash_recall_and_precision(self, spark):
        pairs = {
            (r.id_a, r.id_b)
            for r in minhash_near_duplicates(
                self._docs(spark), "text", "doc_id", jaccard_threshold=0.5
            ).collect()
        }
        assert (1, 2) in pairs  # exact dup found
        assert (1, 3) in pairs and (2, 3) in pairs  # near dups found
        assert not any({4, 5} & set(p) for p in pairs)  # no false positives

    def test_ngram_bitset_path_matches_array_path(self, spark):
        """r10: the small-vocabulary bitset verify (popcount of ANDed mask
        words, decided from the measured vocab) must return row-identical
        pairs — jaccard AND exact sizes — to the general array path. The
        fixture's word vocab is far under _BITSET_MAX_VOCAB so the default
        call takes the bitset leg; intern_tokens=False disables the gate
        and forces the array path on the same corpus."""
        from pandas_to_postgres_spark.operators.dedup import (
            _BITSET_MAX_VOCAB,
            ngram_jaccard_prefix,
        )

        d = self._docs(spark)
        vocab = (
            d.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("t"))
            .distinct()
            .count()
        )
        assert vocab <= _BITSET_MAX_VOCAB  # fixture really takes the fast leg
        fast = ngram_jaccard_prefix(
            d, "text", "doc_id", threshold=0.5, n=1, with_sizes=True
        )
        slow = ngram_jaccard_prefix(
            d, "text", "doc_id", threshold=0.5, n=1, with_sizes=True,
            intern_tokens=False,
        )
        assert fast.columns == slow.columns
        rows_fast = sorted(map(tuple, fast.collect()))
        rows_slow = sorted(map(tuple, slow.collect()))
        assert rows_fast == rows_slow
        assert rows_fast, "fixture must produce at least one verified pair"

    def test_ngram_bitset_scaled_fanout_matches_default(self, spark, monkeypatch):
        """r10: the scale-adaptive branch of the bitset leg (enumeration
        fan-out repartition) must be result-identical to the unscaled
        plan. Forced on the small fixture by shrinking the per-task
        enumeration target to 1."""
        from pandas_to_postgres_spark.operators import dedup as D

        d = self._docs(spark)
        base = sorted(
            map(
                tuple,
                D.ngram_jaccard_prefix(
                    d, "text", "doc_id", threshold=0.5, n=1, with_sizes=True
                ).collect(),
            )
        )
        monkeypatch.setattr(D, "_BITSET_ENUM_PER_TASK", 1)
        scaled = sorted(
            map(
                tuple,
                D.ngram_jaccard_prefix(
                    d, "text", "doc_id", threshold=0.5, n=1, with_sizes=True
                ).collect(),
            )
        )
        assert scaled == base
        assert base, "fixture must produce at least one verified pair"

    def test_minhash_md5_checked_recall(self, spark):
        """The replayable md5-basis tier finds the planted dups with the
        same recall as the xxhash64 throughput tier, and its corpus-level
        recall vs brute force is exact on the fixture (every true pair
        >= the micro threshold surfaces)."""
        from pandas_to_postgres_spark.operators.dedup import minhash_md5_pairs

        out = minhash_md5_pairs(self._docs(spark), "text", "doc_id").collect()
        pairs = {(r.id_a, r.id_b) for r in out}
        assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs
        assert not any({4, 5} & set(p) for p in pairs)
        exact = next(r for r in out if (r.id_a, r.id_b) == (1, 2))
        assert exact.jaccard_micro == 1000000  # identical docs -> J = 1

    def test_simhash_finds_exact_dups(self, spark):
        pairs = {
            (r.id_a, r.id_b)
            for r in simhash_near_duplicates(self._docs(spark), "text", "doc_id").collect()
        }
        assert (1, 2) in pairs
        assert not any({4, 5} & set(p) for p in pairs)

    def test_embedding_neardup_blocked(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 0.0], "a"), (2, [0.99, 0.1], "a"),
             (3, [0.0, 1.0], "a"), (4, [1.0, 0.0], "b")],
            "id long, v array<double>, blk string",
        )
        out = embedding_near_duplicates(df, "v", "id", threshold=0.95, block_col="blk").collect()
        assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]  # 3 dissimilar, 4 other block


class TestProration:
    def test_allocations_reconcile_to_the_cent(self, spark):
        """Largest-remainder invariant: per-order allocated cents sum to
        the order total EXACTLY, and each line's allocation differs from
        its unrounded proportional share by less than one cent."""
        from pyspark.sql import functions as F

        from pandas_to_postgres_spark.plans import REGISTRY

        out = REGISTRY["prorate_order_totals"].fn(spark, "/root/testdata/sf0.001")
        per_order = out.groupBy("l_orderkey").agg(
            F.sum("alloc_cents").alias("s")
        )
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        totals = orders.filter(F.col("o_orderkey") < 2000).select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("total_c"),
        )
        bad = (
            per_order.join(totals, "l_orderkey")
            .filter(F.col("s") != F.col("total_c"))
            .count()
        )
        assert bad == 0


class TestSpanDedup:
    """C4-style global span dedup with reassembly (operators/dedup.span_dedup)."""

    def test_later_doc_loses_shared_span(self, spark):
        # doc 2 repeats doc 1's first 3-token span, then has its own tail
        df = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "a b c x y z")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in span_dedup(df, "text", "doc_id", span_tokens=3).collect()}
        assert out[1].text_clean == "a b c d e f" and out[1].n_kept == 2
        assert out[2].text_clean == "x y z" and out[2].n_kept == 1

    def test_fully_duplicated_doc_drops_out(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "a b c d e f")],
            "doc_id long, text string",
        )
        out = {r.doc_id for r in span_dedup(df, "text", "doc_id", span_tokens=3).collect()}
        assert out == {1}

    def test_within_doc_duplicate_span_removed(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c a b c x y z")], "doc_id long, text string"
        )
        (r,) = span_dedup(df, "text", "doc_id", span_tokens=3).collect()
        assert r.text_clean == "a b c x y z" and r.n_kept == 2

    def test_reassembly_preserves_order_and_partial_tail(self, spark):
        # 7 tokens with span 3 -> tiles "a b c" / "d e f" / "g" (partial tail)
        df = spark.createDataFrame([(1, "a b c d e f g")], "doc_id long, text string")
        (r,) = span_dedup(df, "text", "doc_id", span_tokens=3).collect()
        assert r.text_clean == "a b c d e f g" and r.n_kept == 3

    def test_empty_doc_emits_nothing(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, "a b c")], "doc_id long, text string"
        )
        out = {r.doc_id for r in span_dedup(df, "text", "doc_id", span_tokens=3).collect()}
        assert out == {3}

    def test_span_text_not_in_dedup_shuffle(self, spark):
        """Scale assertion: the row_number window partitions on the sha2
        hash and its exchange carries (id, seg_idx, hash) only — the seg
        string column must be projected away before that shuffle."""
        df = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
        plan = span_dedup(df, "text", "doc_id", span_tokens=3)._jdf.queryExecution().executedPlan().toString()
        import re
        for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
            assert "seg#" not in m.group(1) or "__h" not in m.group(1)
        # the window's sort is on (__h); no Exchange output should list seg
        win_exchanges = [l for l in plan.splitlines() if "Exchange" in l and "__h" in l]
        assert win_exchanges, "expected a hash-partitioned exchange on __h"
        assert all("seg#" not in l for l in win_exchanges)


class TestSimilarity:
    """FIXTURES B.6 — hand-computable cosines on unit axes."""

    def _emb(self, spark):
        return spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]), (2, [1.0, 1.0, 0.0]),
             (3, [-1.0, 0.0, 0.0]), (4, [0.6, 0.8, 0.0])],
            "vec_id long, embedding array<double>",
        )

    def test_bruteforce_golden(self, spark):
        e = self._emb(spark)
        q = e.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("qid"), F.col("embedding")
        )
        out = topk_cosine_bruteforce(
            q, e, "qid", "vec_id", "embedding", "embedding", k=3
        ).collect()
        assert [r.vec_id for r in out] == [0, 2, 4]  # cos: 1.0, 0.70711, 0.6
        assert [r.cosine for r in out] == [1.0, 0.70711, 0.6]

    def test_ivf_full_probe_equals_bruteforce(self, spark):
        from pandas_to_postgres_spark.operators.similarity import topk_cosine_ivf

        e = self._emb(spark).withColumn(
            "blk", (F.col("vec_id") % 2).cast("int")
        )
        q = e.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("qid"), F.col("embedding")
        )
        exact = topk_cosine_bruteforce(q, e, "qid", "vec_id", "embedding", "embedding", k=3)
        ivf = topk_cosine_ivf(
            q, e, "qid", "vec_id", "embedding", "embedding",
            cluster_col="blk", k=3, nprobe=2,  # nprobe = all clusters → exact
        )
        assert [(r.vec_id, r.cosine) for r in ivf.collect()] == [
            (r.vec_id, r.cosine) for r in exact.collect()
        ]

    def test_lsh_is_subset_of_bruteforce_scores(self, spark):
        e = self._emb(spark)
        q = e.select(F.col("vec_id").alias("qid"), F.col("embedding"))
        out = topk_cosine_lsh(q, e, "qid", "vec_id", "embedding", "embedding",
                              k=2, num_planes=2, dim=3).collect()
        assert len(out) > 0
        for r in out:  # every (q, c) pair in a shared bucket has a true cosine
            assert -1.0001 <= r.cosine <= 1.0001


class TestMultimodal:
    def test_plumbing_end_to_end(self, spark):
        docs = spark.createDataFrame([(1, "hello world"), (2, "")], "doc_id long, text string")
        media = attach_fake_media(docs, "text", "doc_id")
        assert [f.name for f in media.schema["media_meta"].dataType.fields] == [
            "mime", "width", "height", "n_frames",
        ]
        feats = {r.doc_id: r for r in extract_features(media).collect()}
        assert feats[1].byte_len == 11
        assert feats[2].byte_len == 0
        assert len(feats[1].feature) == 8
        assert abs(sum(feats[1].feature) - 1.0) < 1e-6  # normalized histogram


class TestOrchestration:
    def test_union_and_copy_tables(self, spark):
        a = spark.createDataFrame([(1,)], "x long")
        b = spark.createDataFrame([(2,)], "x long")
        u = union_sources([a, b])
        assert u.count() == 2
        seen = {}
        copy_tables({"t": u}, lambda name, df: seen.__setitem__(name, df.count()))
        assert seen == {"t": 2}

    def test_copy_tables_parallel_and_errors(self, spark):
        a = spark.createDataFrame([(1,)], "x long")

        def sink(name, df):
            if name == "bad":
                raise RuntimeError("boom")

        with pytest.raises(RuntimeError, match="bad"):
            copy_tables({"ok": a, "bad": a}, sink, processes=2)


class TestChunkText:
    """Training-data chunking: width boundaries, empty docs, determinism."""

    def test_widths_and_indices(self, spark):
        from pandas_to_postgres_spark.functions.text import chunk_text

        df = spark.createDataFrame(
            [(1, "abcdefghij"), (2, "abc"), (3, ""), (4, "abcdefgh")],
            "doc_id long, text string",
        )
        out = {
            (r.doc_id, r.chunk_idx): r.chunk
            for r in chunk_text(df, "text", "doc_id", width=4).collect()
        }
        assert out[(1, 1)] == "abcd" and out[(1, 2)] == "efgh" and out[(1, 3)] == "ij"
        assert out[(2, 1)] == "abc"
        assert out[(3, 1)] == ""  # empty doc keeps exactly one (empty) chunk
        # exact multiple: no trailing empty chunk
        assert out[(4, 1)] == "abcd" and out[(4, 2)] == "efgh"
        assert (4, 3) not in out
        assert len(out) == 7

    def test_reassembly_roundtrip(self, spark):
        from pyspark.sql import functions as F

        from pandas_to_postgres_spark.functions.text import chunk_text

        df = spark.createDataFrame(
            [(i, "x" * i + "yz"[: i % 2]) for i in range(1, 20)],
            "doc_id long, text string",
        )
        back = (
            chunk_text(df, "text", "doc_id", width=7)
            .groupBy("doc_id")
            .agg(F.concat_ws("", F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))).getField("chunk")).alias("t2"))
        )
        joined = df.join(back, "doc_id").filter(F.col("text") != F.col("t2"))
        assert joined.count() == 0


class TestStreamingDedup:
    def test_planted_duplicates_removed(self, spark, tmp_path):
        import datetime

        from pandas_to_postgres_spark.streaming.events import streaming_dedup_events

        ts = datetime.datetime(2024, 1, 1, 10, 0, 0)
        rows = [
            (1, ts, 10, "click", 1.0, "{}"),
            (1, ts, 10, "click", 1.0, "{}"),  # exact duplicate delivery
            (2, ts, 11, "view", 2.0, "{}"),
            (2, datetime.datetime(2024, 1, 1, 10, 5), 11, "view", 2.0, "{}"),  # same id, later ts → kept
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
        out = streaming_dedup_events(spark, str(tmp_path))
        got = sorted((r.event_id, r.ts_s) for r in out.collect())
        assert got == [
            (1, "2024-01-01 10:00:00"),
            (2, "2024-01-01 10:00:00"),
            (2, "2024-01-01 10:05:00"),
        ]

    def test_jittered_duplicates_collapse_within_watermark(self, spark, tmp_path):
        import datetime

        from pandas_to_postgres_spark.streaming.events import (
            streaming_dedup_within_watermark,
        )

        ts = datetime.datetime(2024, 1, 1, 10, 0, 0)
        jit = datetime.datetime(2024, 1, 1, 10, 5, 0)  # retried id, new ts
        rows = [
            (1, ts, 10, "click", 1.0, "{}"),
            (1, jit, 10, "click", 1.0, "{}"),  # same id, jittered ts → dropped
            (2, ts, 11, "view", 2.0, "{}"),
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "events.parquet")
        )
        out = streaming_dedup_within_watermark(spark, str(tmp_path))
        # classic dropDuplicates([event_id, ts]) keeps BOTH copies of id 1
        # (different ts); WithinWatermark on event_id alone collapses them
        assert sorted(r.event_id for r in out.collect()) == [1, 2]


class TestMultimodalResizeFrames:
    def _media(self, spark):
        from pandas_to_postgres_spark.operators.multimodal import attach_fake_media

        df = spark.createDataFrame(
            [(1, "hello world this is a doc"), (2, "x")], "doc_id long, text string"
        )
        return attach_fake_media(df, text_col="text", id_col="doc_id")

    def test_resize_payload_size(self, spark):
        from pandas_to_postgres_spark.operators.multimodal import resize_media

        out = resize_media(self._media(spark), width=8, height=4).collect()
        assert all(len(r.payload) == 32 for r in out)
        assert all(r.media_meta.width == 8 and r.media_meta.height == 4 for r in out)

    def test_frame_sampling_indices(self, spark):
        from pandas_to_postgres_spark.operators.multimodal import sample_frames

        out = sample_frames(self._media(spark), every_n=10).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
        # doc 1: text len 25 → n_frames = 25 % 30 + 1 = 26 → indices 0,10,20
        assert sorted(by_doc[1]) == [0, 10, 20]
        # doc 2: len 1 → n_frames 2 → index 0 only
        assert sorted(by_doc[2]) == [0]
        assert all(len(r.frame_payload) > 0 for r in out if r.doc_id == 1)


class TestDeterministicSampling:
    def test_stable_under_repartition(self, spark):
        from pandas_to_postgres_spark.operators.sampling import (
            stratified_sample_deterministic,
        )

        df = spark.createDataFrame(
            [(i, "en" if i % 2 else "de") for i in range(1000)], "id long, lang string"
        )
        fr = {"en": 0.3, "de": 0.7}
        a = {r.id for r in stratified_sample_deterministic(df, "id", "lang", fr).collect()}
        b = {
            r.id
            for r in stratified_sample_deterministic(
                df.repartition(17), "id", "lang", fr
            ).collect()
        }
        assert a == b  # membership is content-keyed, not partition-keyed

    def test_fractions_approximate(self, spark):
        from pandas_to_postgres_spark.operators.sampling import (
            stratified_sample_deterministic,
        )

        df = spark.createDataFrame(
            [(i, "en") for i in range(4000)], "id long, lang string"
        )
        kept = stratified_sample_deterministic(df, "id", "lang", {"en": 0.25}).count()
        assert 0.2 < kept / 4000 < 0.3

    def test_default_fraction_drops(self, spark):
        from pandas_to_postgres_spark.operators.sampling import (
            stratified_sample_deterministic,
        )

        df = spark.createDataFrame([(1, "xx"), (2, "en")], "id long, lang string")
        out = stratified_sample_deterministic(df, "id", "lang", {"en": 1.0}).collect()
        assert [r.id for r in out] == [2]


class TestStreamingForeachBatchSink:
    def test_stream_drains_through_batch_writer(self, spark, tmp_path):
        import shutil

        from pandas_to_postgres_spark.streaming.sink import stream_to_batch_sink

        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        spark.createDataFrame(
            [(i, f"r{i}") for i in range(20)], "id long, s string"
        ).write.mode("overwrite").parquet(src)

        stream = spark.readStream.schema("id long, s string").parquet(src)

        def writer(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = stream_to_batch_sink(
            stream, writer, checkpoint_dir=ckpt, epoch_col="epoch"
        )
        q.awaitTermination()
        back = spark.read.parquet(out)
        assert back.count() == 20
        assert "epoch" in back.columns
        # batch ids stamped: a drain of one static dir is a single epoch
        assert back.select("epoch").distinct().count() == 1
        shutil.rmtree(out, ignore_errors=True)

    def test_restart_resumes_from_checkpoint(self, spark, tmp_path):
        from pandas_to_postgres_spark.streaming.sink import stream_to_batch_sink

        src = str(tmp_path / "src2")
        out = str(tmp_path / "out2")
        ckpt = str(tmp_path / "ckpt2")
        spark.createDataFrame([(1,)], "id long").write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema("id long").parquet(src)

        def writer(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        stream_to_batch_sink(stream, writer, checkpoint_dir=ckpt).awaitTermination()
        n1 = spark.read.parquet(out).count()
        # re-run with the same checkpoint: nothing new to process, no dup rows
        stream2 = spark.readStream.schema("id long").parquet(src)
        stream_to_batch_sink(stream2, writer, checkpoint_dir=ckpt).awaitTermination()
        assert spark.read.parquet(out).count() == n1 == 1


class TestProvenance:
    def test_stamps_survive_pipeline_and_name_files(self, spark, tmp_path):
        from pandas_to_postgres_spark.operators.provenance import (
            provenance_summary,
            with_provenance,
        )

        src = str(tmp_path / "multi")
        spark.range(100).selectExpr("id", "id % 3 AS k").repartition(4).write.mode(
            "overwrite"
        ).parquet(src)
        df = with_provenance(spark.read.parquet(src))
        # provenance survives a filter + repartition (travels as data)
        survived = df.filter("k != 1").repartition(8)
        rows = survived.collect()
        assert all(r._prov_file.endswith(".parquet") for r in rows)
        # offsets are within-partition counters: start at 0 per partition
        offs = {}
        for r in df.collect():
            offs.setdefault(r._prov_partition, []).append(r._prov_offset)
        for p, os_ in offs.items():
            assert sorted(os_) == list(range(len(os_)))
        # summary maps rows back to real files
        s = {r.source_file: r.n_rows for r in provenance_summary(survived).collect()}
        assert sum(s.values()) == survived.count()
        assert all(f.endswith(".parquet") for f in s)
        assert len(s) == 4

    def test_map_only_no_shuffle(self, spark, tmp_path):
        from pandas_to_postgres_spark.operators.provenance import with_provenance

        src = str(tmp_path / "single")
        spark.range(10).write.mode("overwrite").parquet(src)
        plan = (
            with_provenance(spark.read.parquet(src))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


class TestCdc:
    def test_upsert_scd1(self, spark):
        from pandas_to_postgres_spark.operators.cdc import upsert

        cur = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0)], "k long, name string, v double"
        )
        upd = spark.createDataFrame(
            [(2, "b2", 25.0), (3, "c", 30.0)], "k long, name string, v double"
        )
        out = {r.k: (r.name, r.v) for r in upsert(cur, upd, "k").collect()}
        assert out == {1: ("a", 10.0), 2: ("b2", 25.0), 3: ("c", 30.0)}

    def test_scd2_keeps_history(self, spark):
        from pyspark.sql import functions as F

        from pandas_to_postgres_spark.operators.cdc import scd2_apply

        cur = spark.createDataFrame(
            [(1, 10.0), (2, 20.0)], "k long, v double"
        ).select(
            "k", "v",
            F.lit("2020-01-01").cast("timestamp").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        upd = spark.createDataFrame([(2, 99.0)], "k long, v double")
        out = scd2_apply(cur, upd, "k", "2024-06-01").collect()
        rows = sorted(((r.k, r.v, r.is_current) for r in out))
        # key 1 untouched; key 2: closed old version + open new version
        assert rows == [(1, 10.0, True), (2, 20.0, False), (2, 99.0, True)]
        closed = [r for r in out if r.k == 2 and not r.is_current][0]
        assert closed.valid_to is not None

    def test_scd2_second_apply_leaves_closed_history_untouched(self, spark):
        # regression: a second apply on a key that already carries closed
        # versions must not re-stamp the old versions' valid_to
        from pyspark.sql import functions as F

        from pandas_to_postgres_spark.operators.cdc import scd2_apply

        cur = spark.createDataFrame(
            [(1, 10.0), (2, 20.0)], "k long, v double"
        ).select(
            "k", "v",
            F.lit("2020-01-01").cast("timestamp").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        step1 = scd2_apply(
            cur, spark.createDataFrame([(2, 99.0)], "k long, v double"),
            "k", "2024-06-01",
        )
        step2 = scd2_apply(
            step1, spark.createDataFrame([(2, 123.0)], "k long, v double"),
            "k", "2025-01-01",
        )
        out = step2.collect()
        hist = sorted(
            ((r.v, str(r.valid_to), r.is_current) for r in out if r.k == 2)
        )
        # first closed version keeps its ORIGINAL 2024 close timestamp
        assert hist == [
            (20.0, "2024-06-01 00:00:00", False),
            (99.0, "2025-01-01 00:00:00", False),
            (123.0, "None", True),
        ]
        # exactly one open row per key
        opens = [r for r in out if r.is_current]
        assert sorted(r.k for r in opens) == [1, 2]

    def test_upsert_raises_on_duplicate_update_keys(self, spark):
        import pytest

        from pandas_to_postgres_spark.operators.cdc import upsert

        cur = spark.createDataFrame([(1, "a")], "k long, name string")
        upd = spark.createDataFrame(
            [(2, "x"), (2, "y")], "k long, name string"
        )
        with pytest.raises(ValueError, match="more than once"):
            upsert(cur, upd, "k")
        # strict=False keeps the old pass-through behavior
        assert upsert(cur, upd, "k", strict=False).count() == 3

    def test_merge_topk_dedups_overlapping_shards(self, spark):
        from pandas_to_postgres_spark.operators.similarity import merge_topk

        shard = spark.createDataFrame(
            [(1, 10, 0.9), (1, 11, 0.8), (1, 12, 0.7)],
            "qid long, cid long, cosine double",
        )
        other = spark.createDataFrame(
            [(1, 10, 0.9), (1, 13, 0.6)], "qid long, cid long, cosine double"
        )
        out = merge_topk([shard, other], "qid", "cid", k=3).collect()
        got = sorted((r.cid, r.rank) for r in out)
        # duplicate (1,10) occupies ONE rank; 12 stays in the top-3
        assert got == [(10, 1), (11, 2), (12, 3)]


class TestConnectedComponents:
    def test_hand_graph_with_singleton(self, spark):
        from pandas_to_postgres_spark.operators.cluster import (
            connected_components,
            dedup_survivors,
        )

        # two chains {1-2-3}, {10-11}, singleton {99}
        edges = spark.createDataFrame(
            [(2, 1), (2, 3), (10, 11)], "id_a long, id_b long"
        )
        verts = spark.createDataFrame(
            [(1,), (2,), (3,), (10,), (11,), (99,)], "id long"
        )
        comps = connected_components(edges, verts)
        got = {(r.id, r.component) for r in comps.collect()}
        assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (99, 99)}
        keep = {r.keep_id for r in dedup_survivors(comps).collect()}
        assert keep == {1, 10, 99}

    def test_long_chain_needs_multiple_rounds(self, spark):
        from pandas_to_postgres_spark.operators.cluster import connected_components

        # a path 0-1-2-...-9: min label must propagate the full diameter
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(9)], "id_a long, id_b long"
        )
        verts = spark.createDataFrame([(i,) for i in range(10)], "id long")
        got = {(r.id, r.component) for r in connected_components(edges, verts).collect()}
        assert got == {(i, 0) for i in range(10)}

    def test_empty_edges_all_singletons(self, spark):
        """r10: the symmetrized edge list is localCheckpoint()ed once (so
        propagation rounds stop re-deriving the upstream pair join) — an
        EMPTY edge frame must checkpoint and converge to all-singletons."""
        from pandas_to_postgres_spark.operators.cluster import connected_components

        edges = spark.createDataFrame([], "id_a long, id_b long")
        verts = spark.createDataFrame([(7,), (8,)], "id long")
        got = {(r.id, r.component) for r in connected_components(edges, verts).collect()}
        assert got == {(7, 7), (8, 8)}

    def test_nonconvergence_raises(self, spark):
        import pytest

        from pandas_to_postgres_spark.operators.cluster import connected_components

        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(9)], "id_a long, id_b long"
        )
        verts = spark.createDataFrame([(i,) for i in range(10)], "id long")
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(edges, verts, max_iterations=2)


class TestTransformWithState:
    def test_map_state_counts_equal_batch_groupby(self, spark):
        pytest.importorskip(
            "google.protobuf",
            reason="transformWithStateInPandas' worker needs protobuf; "
            "absent in this container and installs are prohibited",
        )
        from pyspark.sql import functions as F

        from pandas_to_postgres_spark.sources.parquet import load_table
        from pandas_to_postgres_spark.streaming.stateful import (
            stateful_user_type_counts,
        )

        sf = "/root/testdata/sf0.001"
        got = stateful_user_type_counts(spark, sf)
        ref = (
            load_table(spark, sf, "events")
            .groupBy("user_id", "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert got.exceptAll(ref).count() == 0
        assert ref.exceptAll(got).count() == 0


class TestMinhashIncremental:
    def test_planted_batch_twin_found_and_matches_full_pipeline(self, spark):
        from pyspark.sql import functions as F

        from pandas_to_postgres_spark.operators.dedup import (
            minhash_near_duplicates,
            minhash_near_duplicates_incremental,
        )
        from pandas_to_postgres_spark.sources.parquet import load_table

        corpus = load_table(spark, "/root/testdata/sf0.001", "documents").select(
            "doc_id", "text"
        )
        batch = corpus.filter(F.col("doc_id") < 50).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.regexp_replace(F.col("text"), r"\s+\S+$", "").alias("text"),
        )
        inc = {
            (r.batch_id, r.corpus_id, r.jaccard)
            for r in minhash_near_duplicates_incremental(
                batch, corpus, "text", "doc_id"
            ).collect()
        }
        # every planted twin (doc, doc+1e6) surfaces
        planted = {p for p in inc if p[0] == p[1] + 1_000_000}
        assert len(planted) >= 45  # ≥90% of the 50 planted pairs (j≈0.97)
        # cross-check: the full self-pipeline on batch ∪ corpus finds the
        # same batch→corpus pairs (restricted to that id split)
        full = minhash_near_duplicates(corpus.unionByName(batch), "text", "doc_id")
        full_pairs = {
            (r.id_b, r.id_a, r.jaccard)
            for r in full.collect()
            if r.id_b >= 1_000_000 and r.id_a < 1_000_000
        }
        assert inc == full_pairs


class TestSemanticDedup:
    """operators/kmeans.py: deterministic Lloyd's + within-cluster near-dup."""

    def _emb(self, spark):
        from pandas_to_postgres_spark.sources.parquet import load_table

        return load_table(spark, "/root/testdata/sf0.001", "embeddings")

    def test_assignment_partitions_corpus_deterministically(self, spark):
        from pandas_to_postgres_spark.operators.kmeans import (
            assign_clusters,
            kmeans_fit,
        )

        e = self._emb(spark)
        cents = kmeans_fit(e, "embedding", "vec_id", k=4, iters=2)
        assert len(cents) == 4 and len(cents[0]) == 64
        a1 = assign_clusters(e, "embedding", cents).select("vec_id", "cluster")
        a2 = assign_clusters(e, "embedding", cents).select("vec_id", "cluster")
        rows1 = sorted(map(tuple, a1.collect()))
        rows2 = sorted(map(tuple, a2.collect()))
        assert rows1 == rows2
        # every row lands in exactly one valid cluster
        assert all(0 <= c < 4 for _, c in rows1)
        assert len(rows1) == e.count()

    def test_lloyd_iterations_do_not_increase_inertia(self, spark):
        import math

        from pandas_to_postgres_spark.operators.kmeans import (
            assign_clusters,
            kmeans_fit,
        )
        from pyspark.sql import functions as F

        e = self._emb(spark)

        def inertia(cents):
            assigned = assign_clusters(e, "embedding", cents)
            dist = None
            # recompute min squared distance via the same expression shape
            from pandas_to_postgres_spark.operators.kmeans import _sq_dist_to

            d = F.array_min(
                F.array(*[_sq_dist_to(F.col("embedding"), c) for c in cents])
            )
            return assigned.agg(F.sum(d)).collect()[0][0]

        i1 = inertia(kmeans_fit(e, "embedding", "vec_id", k=4, iters=1))
        i3 = inertia(kmeans_fit(e, "embedding", "vec_id", k=4, iters=3))
        # Lloyd's is monotone (decimal-mean rounding can wiggle the last ulp)
        assert i3 <= i1 * (1 + 1e-9)

    def test_pairs_verified_by_numpy_cosine(self, spark):
        import numpy as np

        from pandas_to_postgres_spark.operators.kmeans import (
            semantic_near_duplicates,
        )

        e = self._emb(spark)
        pairs = semantic_near_duplicates(
            e, "embedding", "vec_id", k=4, iters=2, threshold=0.3
        ).collect()
        assert pairs, "expected near-dup pairs at threshold 0.3"
        vecs = {r["vec_id"]: np.array(r["embedding"]) for r in e.collect()}
        for r in pairs[:50]:
            a, b = vecs[r["id_a"]], vecs[r["id_b"]]
            cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            assert abs(cos - r["cosine"]) < 1e-4
            assert cos >= 0.3 - 1e-6
            assert r["id_a"] < r["id_b"]


class TestHllShardMerge:
    def test_merge_equals_single_pass_and_tracks_exact(self, spark):
        from pyspark.sql import functions as F

        from pandas_to_postgres_spark.plans import REGISTRY
        from pandas_to_postgres_spark.sources.parquet import load_table

        sf = "/root/testdata/sf0.001"
        merged = {
            r["event_type"]: r["approx_users"]
            for r in REGISTRY["hll_shard_merge"].fn(spark, sf).collect()
        }
        ev = load_table(spark, sf, "events")
        single = {
            r["event_type"]: r["approx_users"]
            for r in ev.groupBy("event_type")
            .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("approx_users"))
            .collect()
        }
        # the sketch is deterministic and merge-associative: shard-merge
        # must EQUAL the single-pass estimate, not just approximate it
        assert merged == single
        exact = {
            r["event_type"]: r["n"]
            for r in ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        for et, est in merged.items():
            assert abs(est - exact[et]) <= 0.05 * exact[et] + 1


class TestPca:
    """fit/transform vs full-batch numpy PCA; whitening; determinism."""

    def _emb(self, spark):
        return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def test_matches_fullbatch_numpy(self, spark):
        import numpy as np

        from pandas_to_postgres_spark.operators.pca import fit_pca, transform_pca

        emb = self._emb(spark)
        model = fit_pca(emb, "embedding", k=4)
        rows = emb.orderBy("vec_id").select("vec_id", "embedding").collect()
        X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
        cov = np.cov(X, rowvar=False)
        evals, evecs = np.linalg.eigh(cov)
        order = np.argsort(evals)[::-1][:4]
        ref = evecs[:, order].T
        for i in range(4):
            j = int(np.argmax(np.abs(ref[i])))
            if ref[i, j] < 0:
                ref[i] = -ref[i]
        assert np.allclose(model.explained_var, evals[order], rtol=1e-6)
        assert np.allclose(model.components, ref, atol=1e-6)
        # projection matches numpy projection
        got = {
            r["vec_id"]: np.asarray(r["pc"])
            for r in transform_pca(emb, "embedding", model)
            .select("vec_id", "pc")
            .collect()
        }
        want = (X - model.mean) @ model.components.T
        for idx, r in enumerate(rows):
            assert np.allclose(got[r["vec_id"]], want[idx], atol=1e-8)

    def test_whitened_covariance_is_identity(self, spark):
        import numpy as np

        from pandas_to_postgres_spark.operators.pca import pca_fit_transform

        emb = self._emb(spark)
        pcs = pca_fit_transform(emb, "embedding", k=6, whiten=True)
        P = np.stack(
            [np.asarray(r["pc"]) for r in pcs.select("pc").collect()]
        )
        cov = np.cov(P, rowvar=False)
        assert np.allclose(cov, np.eye(6), atol=1e-6)

    def test_partition_count_invariance(self, spark):
        import numpy as np

        from pandas_to_postgres_spark.operators.pca import fit_pca

        emb = self._emb(spark)
        m3 = fit_pca(emb.repartition(3), "embedding", k=3)
        m11 = fit_pca(emb.repartition(11), "embedding", k=3)
        # moments are rounded before the eigensolve, so the fitted basis
        # must not wobble with partition count
        assert np.allclose(m3.components, m11.components, atol=1e-9)
        assert np.allclose(m3.explained_var, m11.explained_var, atol=1e-9)

    def test_passthrough_columns_and_k_clamp(self, spark):
        from pandas_to_postgres_spark.operators.pca import pca_fit_transform

        emb = self._emb(spark)
        out = pca_fit_transform(emb, "embedding", k=9999)
        assert set(out.columns) == {"vec_id", "embedding", "label", "pc"}
        row = out.select("pc").first()
        assert len(row["pc"]) == len(emb.select("embedding").first()[0])


class TestChunkOverlap:
    def test_overlap_invariant_and_degenerate_stride(self, spark):
        from pandas_to_postgres_spark.functions.text import (
            chunk_text,
            chunk_text_overlap,
        )

        df = spark.createDataFrame(
            [(1, "abcdefghijklmnopqrstuvwxyz"), (2, "short"), (3, "")],
            "id long, text string",
        )
        out = {
            (r["id"], r["chunk_idx"]): r["chunk"]
            for r in chunk_text_overlap(df, "text", "id", width=10, stride=6).collect()
        }
        # doc 1 (26 chars): n = ceil((26-10)/6)+1 = 4 windows at 1,7,13,19
        assert out[(1, 1)] == "abcdefghij"
        assert out[(1, 2)] == "ghijklmnop"
        assert out[(1, 3)] == "mnopqrstuv"
        assert out[(1, 4)] == "stuvwxyz"
        # consecutive windows share width - stride = 4 chars
        assert out[(1, 1)][-4:] == out[(1, 2)][:4]
        # short and empty docs yield exactly one chunk
        assert out[(2, 1)] == "short" and out[(3, 1)] == ""
        # stride == width degenerates to disjoint chunk_text
        a = sorted(
            (r["id"], r["chunk_idx"], r["chunk"])
            for r in chunk_text_overlap(df, "text", "id", width=10, stride=10).collect()
        )
        b = sorted(
            (r["id"], r["chunk_idx"], r["chunk"])
            for r in chunk_text(df, "text", "id", width=10).collect()
        )
        assert a == b

    def test_rejects_bad_params(self, spark):
        from pandas_to_postgres_spark.functions.text import chunk_text_overlap

        df = spark.createDataFrame([(1, "x")], "id long, text string")
        with pytest.raises(ValueError):
            chunk_text_overlap(df, "text", "id", width=10, stride=0)


class TestHeavyHitters:
    def test_exact_when_capacity_covers_universe(self, spark):
        from pandas_to_postgres_spark.operators.heavy_hitters import heavy_hitters

        df = spark.createDataFrame(
            [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2, "item string"
        )
        got = {r.item: r.est for r in heavy_hitters(df, "item", k=10).collect()}
        assert got == {"a": 5, "b": 3, "c": 2}

    def test_guarantees_in_approximate_regime(self, spark):
        from pandas_to_postgres_spark.operators.heavy_hitters import heavy_hitters

        # 1000 noise singletons + one item at 20% frequency, k=9:
        # threshold n/(k+1) = 1250/10 = 125 < 250 -> "hot" MUST survive,
        # and its estimate must be within n/(k+1) of the truth
        rows = [("hot",)] * 250 + [(f"noise{i}",) for i in range(1000)]
        df = spark.createDataFrame(rows, "item string").repartition(8)
        got = {r.item: r.est for r in heavy_hitters(df, "item", k=9).collect()}
        n = 1250
        assert "hot" in got
        assert 250 - n // 10 <= got["hot"] <= 250
        # every reported count is a lower bound
        assert all(v <= 250 for v in got.values())

    def test_rejects_bad_k(self, spark):
        from pandas_to_postgres_spark.operators.heavy_hitters import heavy_hitters

        df = spark.createDataFrame([("a",)], "item string")
        with pytest.raises(ValueError):
            heavy_hitters(df, "item", k=0)


class TestRealMediaCodecs:
    """operators/media_codecs — REAL decode for uncompressed formats."""

    def test_wav_roundtrip_and_features(self, spark):
        import numpy as np

        from pandas_to_postgres_spark.operators.media_codecs import (
            decode_wav,
            encode_wav,
            extract_features_real,
        )

        t = np.arange(8000) / 8000.0
        tone = 0.5 * np.sin(2 * np.pi * 440 * t)  # 1s of A440 at half scale
        payload = encode_wav(tone, rate=8000)
        samples, rate = decode_wav(payload)
        assert rate == 8000 and len(samples) == 8000
        assert np.allclose(samples, tone, atol=1e-3)  # 16-bit quantization
        df = spark.createDataFrame(
            [(1, bytearray(payload), "audio/wav")], "doc_id long, payload binary, mime string"
        )
        (row,) = extract_features_real(df).collect()
        dur, rms, zc = row.feature[0], row.feature[1], row.feature[2]
        assert dur == 1.0
        assert abs(rms - 0.5 / 2**0.5) < 1e-3  # sine RMS = A/sqrt(2)
        assert 0.05 < zc < 0.2  # 440 Hz at 8 kHz → ~0.11 crossings/sample

    def test_bmp_and_ppm_roundtrip(self, spark):
        import numpy as np

        from pandas_to_postgres_spark.operators.media_codecs import (
            decode_bmp,
            decode_ppm,
            encode_bmp,
            encode_ppm,
            extract_features_real,
        )

        rng = np.random.default_rng(7)
        rgb = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)  # odd width → row padding
        assert np.array_equal(decode_bmp(encode_bmp(rgb)), rgb)
        assert np.array_equal(decode_ppm(encode_ppm(rgb)), rgb)
        df = spark.createDataFrame(
            [
                (1, bytearray(encode_bmp(rgb)), "image/bmp"),
                (2, bytearray(encode_ppm(rgb)), "image/x-portable-pixmap"),
            ],
            "doc_id long, payload binary, mime string",
        )
        rows = {r.doc_id: r for r in extract_features_real(df).collect()}
        means = rgb.reshape(-1, 3).mean(axis=0)
        for i in (1, 2):
            assert rows[i].feature[0] == 5.0 and rows[i].feature[1] == 3.0
            assert all(
                abs(rows[i].feature[2 + c] - means[c]) < 1e-4 for c in range(3)
            )

    def test_png_real_decode_roundtrip_and_foreign_filters(self, spark):
        """PNG is now a REAL codec (stdlib zlib): our encoder round-trips
        through Spark, and the decoder unfilters all five PNG filter
        types so foreign PNGs decode too."""
        import struct
        import zlib

        import numpy as np

        from pandas_to_postgres_spark.operators.media_codecs import (
            decode_png,
            encode_png,
            extract_features_real,
        )

        rng = np.random.default_rng(11)
        rgb = rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(rgb)), rgb)
        df = spark.createDataFrame(
            [(1, bytearray(encode_png(rgb)), "image/png")],
            "doc_id long, payload binary, mime string",
        )
        (row,) = extract_features_real(df).collect()
        means = rgb.reshape(-1, 3).mean(axis=0)
        assert row.feature[0] == 6.0 and row.feature[1] == 4.0
        assert all(abs(row.feature[2 + c] - means[c]) < 1e-4 for c in range(3))
        # foreign PNG using Up-filtered scanlines (filter 2) decodes too
        h, w = rgb.shape[0], rgb.shape[1]
        prev = np.zeros(w * 3, dtype=np.int64)
        rows_ = []
        for y in range(h):
            cur = rgb[y].reshape(-1).astype(np.int64)
            rows_.append(b"\x02" + bytes(((cur - prev) % 256).astype(np.uint8)))
            prev = cur
        raw = b"".join(rows_)

        def chunk(tag, data):
            return (
                struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        assert np.array_equal(decode_png(png), rgb)

    def test_gzip_text_and_mulaw_real_decode(self, spark):
        """Two more genuinely compressed formats decode for real: gzip'd
        text (the .jsonl.gz corpus-shard case) and G.711 mu-law audio
        (8-bit logarithmic companding, max quantization error < 2%)."""
        import numpy as np

        from pandas_to_postgres_spark.operators.media_codecs import (
            decode_mulaw,
            encode_gzip_text,
            encode_mulaw,
            extract_features_real,
        )

        t = np.arange(1600) / 8000.0
        tone = 0.3 * np.sin(2 * np.pi * 200 * t)
        assert float(np.max(np.abs(decode_mulaw(encode_mulaw(tone)) - tone))) < 0.02
        df = spark.createDataFrame(
            [
                (1, bytearray(encode_gzip_text("alpha beta beta gamma")), "text/gzip"),
                (2, bytearray(encode_mulaw(tone)), "audio/basic"),
            ],
            "doc_id long, payload binary, mime string",
        )
        rows = {r.doc_id: r for r in extract_features_real(df).collect()}
        assert rows[1].feature[:3] == [21.0, 4.0, 3.0]  # chars, tokens, distinct
        assert abs(rows[2].feature[0] - 0.2) < 1e-9  # 1600 samples @ 8 kHz
        assert abs(rows[2].feature[1] - 0.3 / 2 ** 0.5) < 0.01  # sine RMS

    def test_jpeg_real_decode_roundtrip_and_spec_bitstream(self, spark):
        """Baseline JPEG decodes for REAL (pure-numpy Huffman + IDCT):
        (a) encoder→decoder round-trip beats 35 dB PSNR on a gradient;
        (b) a DC-only bitstream hand-assembled from T.81 (independent of
        our encoder) decodes to the hand-computed pixel value."""
        import struct

        import numpy as np

        from pandas_to_postgres_spark.operators.jpeg_codec import (
            HUFF_AC_LUMA,
            decode_jpeg,
            encode_jpeg,
        )
        from pandas_to_postgres_spark.operators.media_codecs import (
            extract_features_real,
        )

        yy, xx = np.mgrid[0:24, 0:17]
        rgb = np.stack(
            [(yy * 9) % 256, (xx * 13) % 256, ((yy + xx) * 5) % 256], axis=-1
        ).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(rgb))
        mse = float(np.mean((dec.astype(float) - rgb.astype(float)) ** 2))
        assert 10 * np.log10(255**2 / mse) > 35.0
        df = spark.createDataFrame(
            [(1, bytearray(encode_jpeg(rgb)), "image/jpeg")],
            "doc_id long, payload binary, mime string",
        )
        (row,) = extract_features_real(df).collect()
        assert row.feature[0] == 24.0 and row.feature[1] == 17.0

        # hand-assembled DC-only 8x8 grayscale: quant all 16s, DC diff 40
        # (luma DC category-6 code 1110 + bits 101000, EOB 1010) ->
        # every pixel = 40*16/8 + 128 = 208
        def seg(marker, body):
            return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

        dqt = seg(0xDB, bytes([0]) + bytes([16] * 64))
        sof = seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        dc_bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
        ac_bits = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
        dht = seg(0xC4, bytes([0x00] + dc_bits + list(range(12)))) + seg(
            0xC4, bytes([0x10] + ac_bits + HUFF_AC_LUMA[1])
        )
        sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        jpg = (
            b"\xff\xd8" + dqt + sof + dht + sos
            + bytes([0xEA, 0x2B]) + b"\xff\xd9"
        )
        assert (decode_jpeg(jpg) == 208).all()

    def test_jpeg_restart_markers_reset_dc_prediction(self, spark):
        """DRI/RSTn handling: a hand-assembled 2-MCU stream with a
        restart interval of 1 must re-align to the byte boundary, skip
        RST0, and RESET the DC predictor — block 2's DC is absolute, not
        differential (left block 208, right block 176 by spec
        arithmetic)."""
        import struct

        import numpy as np

        from pandas_to_postgres_spark.operators.jpeg_codec import (
            HUFF_AC_LUMA,
            HUFF_DC_LUMA,
            decode_jpeg,
        )

        def seg(marker, body):
            return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

        dqt = seg(0xDB, bytes([0]) + bytes([16] * 64))
        sof = seg(0xC0, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
        dht = seg(
            0xC4, bytes([0x00] + HUFF_DC_LUMA[0] + HUFF_DC_LUMA[1])
        ) + seg(0xC4, bytes([0x10] + HUFF_AC_LUMA[0] + HUFF_AC_LUMA[1]))
        dri = seg(0xDD, struct.pack(">H", 1))
        sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        data = bytes([0xEA, 0x2B]) + b"\xff\xd0" + bytes([0xD8, 0xAF])
        jpg = b"\xff\xd8" + dqt + sof + dri + dht + sos + data + b"\xff\xd9"
        out = decode_jpeg(jpg)
        assert (out[:, :8] == 208).all() and (out[:, 8:] == 176).all()

    def test_jpeg_420_mcu_decode_and_remaining_gates(self, spark):
        """The ubiquitous 4:2:0 layout decodes through the MCU-interleaved
        path: a hand-assembled DC-only 16x16 MCU (4 luma + Cb + Cr
        blocks, spec arithmetic only) yields the hand-computed flat
        color. Progressive JPEG and video remain honestly gated."""
        import struct

        import numpy as np
        import pytest as _pytest

        from pandas_to_postgres_spark.operators.jpeg_codec import (
            HUFF_AC_CHROMA,
            HUFF_AC_LUMA,
            HUFF_DC_CHROMA,
            HUFF_DC_LUMA,
            decode_jpeg,
        )
        from pandas_to_postgres_spark.operators.media_codecs import (
            extract_features_real,
        )

        def seg(marker, body):
            return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

        dqt = seg(0xDB, bytes([0]) + bytes([16] * 64))
        sof = seg(
            0xC0,
            struct.pack(">BHHB", 8, 16, 16, 3)
            + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
        )
        dht = (
            seg(0xC4, bytes([0x00] + HUFF_DC_LUMA[0] + HUFF_DC_LUMA[1]))
            + seg(0xC4, bytes([0x10] + HUFF_AC_LUMA[0] + HUFF_AC_LUMA[1]))
            + seg(0xC4, bytes([0x01] + HUFF_DC_CHROMA[0] + HUFF_DC_CHROMA[1]))
            + seg(0xC4, bytes([0x11] + HUFF_AC_CHROMA[0] + HUFF_AC_CHROMA[1]))
        )
        sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
        # Y1: DC diff 40 (cat-6 '1110'+101000) + EOB '1010'; Y2-4: DC 0
        # ('00') + EOB; Cb/Cr: chroma DC 0 ('00') + chroma EOB ('00')
        data = bytes([0xEA, 0x28, 0xA2, 0x8A, 0x00])
        jpg = b"\xff\xd8" + dqt + sof + dht + sos + data + b"\xff\xd9"
        out = decode_jpeg(jpg)
        assert out.shape == (16, 16, 3) and (out == 208).all()

        # arithmetic-coded JPEG (SOF9) stays gated (progressive now decodes)
        sof9 = seg(
            0xC9,
            struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]),
        )
        with _pytest.raises(NotImplementedError):
            decode_jpeg(b"\xff\xd8" + dqt + sof9 + b"\xff\xd9")

        # video remains dispatcher-gated
        from py4j.protocol import Py4JJavaError

        df = spark.createDataFrame(
            [(1, bytearray(b"\x00\x00\x00 ftypmp42"), "video/mp4")],
            "doc_id long, payload binary, mime string",
        )
        with pytest.raises((Py4JJavaError, Exception)) as ei:
            extract_features_real(df).collect()
        assert "no codec" in str(ei.value)

    def test_jpeg_progressive_matches_baseline_decode(self, spark):
        """Progressive encode→decode equals BASELINE decode of the same
        quantized coefficients pixel-for-pixel: the scan script delivers
        DC via successive approximation (Al=1 then refine) and all AC at
        full precision across two spectral bands, so any divergence in
        multi-scan assembly, spectral selection, or non-interleaved
        block order shows as a pixel diff."""
        import numpy as np

        from pandas_to_postgres_spark.operators.jpeg_codec import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        rng = np.random.RandomState(11)
        for shape in [(8, 8), (23, 17), (33, 29, 3)]:
            img = (rng.rand(*shape) * 255).astype(np.uint8)
            base = decode_jpeg(encode_jpeg(img))
            prog = decode_jpeg(encode_jpeg_progressive(img))
            assert np.array_equal(base, prog), shape

    def _pseg(self, marker, body):
        import struct

        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def _pjpg_gray_header(self, h, w, huff_segs):
        import struct

        dqt = self._pseg(0xDB, bytes([0]) + bytes([16] * 64))
        sof = self._pseg(
            0xC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
        )
        return b"\xff\xd8" + dqt + sof + huff_segs

    def test_jpeg_progressive_dc_successive_approximation(self):
        """Hand-assembled 8x8 grayscale, DC=9 delivered over TWO scans:
        first scan codes 9>>1 = 4 at Al=1 ('100' cat-3 + '100'), the
        refinement scan sends the low bit (1). Decoded flat patch =
        round(9*16/8) + 128 = 146 by spec arithmetic."""
        import numpy as np

        from pandas_to_postgres_spark.operators.jpeg_codec import (
            HUFF_DC_LUMA,
            BitWriter,
            build_encode_table,
            decode_jpeg,
        )

        dht = self._pseg(0xC4, bytes([0x00] + HUFF_DC_LUMA[0] + HUFF_DC_LUMA[1]))
        dc = build_encode_table(*HUFF_DC_LUMA)
        s1 = self._pseg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))  # Ah=0 Al=1
        w1 = BitWriter()
        ln, c = dc[3]
        w1.write_bits(c, ln)
        w1.write_bits(4, 3)  # +4
        w1.flush()
        s2 = self._pseg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))  # Ah=1 Al=0
        w2 = BitWriter()
        w2.write_bits(1, 1)  # refinement bit: 9 & 1
        w2.flush()
        jpg = (
            self._pjpg_gray_header(8, 8, dht)
            + s1 + bytes(w1.out) + s2 + bytes(w2.out) + b"\xff\xd9"
        )
        out = decode_jpeg(jpg)
        assert out.shape == (8, 8) and (out == 146).all()

    def test_jpeg_progressive_ac_refinement(self):
        """Hand-assembled AC successive approximation: first AC scan at
        Al=1 plants coefficient zz[1] = 2<<1 = 4; the refinement scan
        (Ah=1, Al=0) must (a) apply a correction bit turning 4 into 5
        and (b) materialize a NEW coefficient -1 at zz[3] — the two
        hard paths of T.81 G.1.2.3. Expected pixels computed by direct
        IDCT arithmetic on the final dequantized coefficients."""
        import numpy as np

        from pandas_to_postgres_spark.operators.jpeg_codec import (
            HUFF_AC_LUMA,
            HUFF_DC_LUMA,
            ZIGZAG,
            BitWriter,
            build_encode_table,
            decode_jpeg,
            idct2,
        )

        dht = self._pseg(
            0xC4, bytes([0x00] + HUFF_DC_LUMA[0] + HUFF_DC_LUMA[1])
        ) + self._pseg(0xC4, bytes([0x10] + HUFF_AC_LUMA[0] + HUFF_AC_LUMA[1]))
        dc = build_encode_table(*HUFF_DC_LUMA)
        ac = build_encode_table(*HUFF_AC_LUMA)

        # scan 1: DC first Al=0, DC=8 (cat-4, code 8)
        sdc = self._pseg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
        w = BitWriter()
        ln, c = dc[4]
        w.write_bits(c, ln)
        w.write_bits(8, 4)
        w.flush()
        dc_data = bytes(w.out)
        # scan 2: AC first Ss=1 Se=63 Al=1 — zz[1] arrives as +2 (<<1 = 4)
        sac1 = self._pseg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01]))
        w = BitWriter()
        ln, c = ac[0x02]  # run 0, size 2
        w.write_bits(c, ln)
        w.write_bits(2, 2)  # +2
        ln, c = ac[0x00]  # EOB
        w.write_bits(c, ln)
        w.flush()
        ac1_data = bytes(w.out)
        # scan 3: AC refine Ah=1 Al=0 — symbol (r=1,s=1), sign bit 0
        # (new value -1 at the 2nd zero-history slot, zz[3]), then the
        # correction bit 1 for zz[1] passed on the way (4 -> 5); EOB
        sac2 = self._pseg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10]))
        w = BitWriter()
        ln, c = ac[0x11]
        w.write_bits(c, ln)
        w.write_bits(0, 1)  # sign: negative
        w.write_bits(1, 1)  # correction bit for zz[1]
        ln, c = ac[0x00]
        w.write_bits(c, ln)
        w.flush()
        ac2_data = bytes(w.out)
        jpg = (
            self._pjpg_gray_header(8, 8, dht)
            + sdc + dc_data + sac1 + ac1_data + sac2 + ac2_data + b"\xff\xd9"
        )
        out = decode_jpeg(jpg)
        coeff = np.zeros((8, 8))
        coeff[ZIGZAG[0]] = 8 * 16
        coeff[ZIGZAG[1]] = 5 * 16
        coeff[ZIGZAG[3]] = -1 * 16
        want = np.clip(np.round(idct2(coeff) + 128.0), 0, 255).astype(np.uint8)
        assert np.array_equal(out, want)

    def test_jpeg_progressive_eob_run_spans_blocks(self):
        """An EOB run (EOBRUN=2 via symbol r=1 + one extra bit) coded in
        block 1 must also blank block 2 entirely — the cross-block state
        baseline JPEG doesn't have. Custom 2-bit Huffman table supplies
        the 0x10 EOBn symbol Annex K's baseline table lacks."""
        import numpy as np

        from pandas_to_postgres_spark.operators.jpeg_codec import (
            HUFF_DC_LUMA,
            ZIGZAG,
            BitWriter,
            build_decode_table,
            build_encode_table,
            decode_jpeg,
            idct2,
        )

        ac_bits = [0, 4] + [0] * 14
        ac_vals = [0x02, 0x10, 0x00, 0xF0]
        dht = self._pseg(
            0xC4, bytes([0x00] + HUFF_DC_LUMA[0] + HUFF_DC_LUMA[1])
        ) + self._pseg(0xC4, bytes([0x10] + ac_bits + ac_vals))
        dc = build_encode_table(*HUFF_DC_LUMA)
        ac = build_encode_table(ac_bits, ac_vals)

        sdc = self._pseg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
        w = BitWriter()
        for _ in range(2):  # two blocks, DC diff 0
            ln, c = dc[0]
            w.write_bits(c, ln)
        w.flush()
        dc_data = bytes(w.out)
        sac = self._pseg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
        w = BitWriter()
        ln, c = ac[0x02]  # block 1: zz[1] = +3
        w.write_bits(c, ln)
        w.write_bits(3, 2)
        ln, c = ac[0x10]  # EOBRUN: r=1 -> 2 + 1 extra bit 0 - 1 = ...
        w.write_bits(c, ln)
        w.write_bits(0, 1)  # EOBRUN = (1<<1) + 0 = 2: rest of blk1 + blk2
        w.flush()
        ac_data = bytes(w.out)
        jpg = (
            self._pjpg_gray_header(8, 16, dht)
            + sdc + dc_data + sac + ac_data + b"\xff\xd9"
        )
        out = decode_jpeg(jpg)
        coeff = np.zeros((8, 8))
        coeff[ZIGZAG[1]] = 3 * 16
        want0 = np.clip(np.round(idct2(coeff) + 128.0), 0, 255)
        assert np.array_equal(out[:, :8], want0.astype(np.uint8))
        assert (out[:, 8:] == 128).all()

    def test_jpeg_progressive_420_interleaved_dc(self):
        """Progressive + 4:2:0: the interleaved DC scan walks MCU order
        (4 luma blocks then Cb then Cr) with per-component predictor
        chains; AC never arrives, so the image is the pure DC preview.
        Y block 1 carries DC diff +40 -> 208; Y block 2 diff -40 returns
        the per-component predictor chain to 0, so the rest is 128
        (gray, since Cb=Cr=128 cancels the color conversion)."""
        import struct

        import numpy as np

        from pandas_to_postgres_spark.operators.jpeg_codec import (
            HUFF_DC_CHROMA,
            HUFF_DC_LUMA,
            BitWriter,
            build_encode_table,
            decode_jpeg,
        )

        dqt = self._pseg(0xDB, bytes([0]) + bytes([16] * 64))
        sof = self._pseg(
            0xC2,
            struct.pack(">BHHB", 8, 16, 16, 3)
            + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
        )
        dht = self._pseg(
            0xC4, bytes([0x00] + HUFF_DC_LUMA[0] + HUFF_DC_LUMA[1])
        ) + self._pseg(
            0xC4, bytes([0x01] + HUFF_DC_CHROMA[0] + HUFF_DC_CHROMA[1])
        )
        dcl = build_encode_table(*HUFF_DC_LUMA)
        dcc = build_encode_table(*HUFF_DC_CHROMA)
        sos = self._pseg(
            0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0, 0x00])
        )
        w = BitWriter()
        ln, c = dcl[6]  # Y1: diff +40 (cat 6)
        w.write_bits(c, ln)
        w.write_bits(40, 6)
        ln, c = dcl[6]  # Y2: diff -40 (cat 6, code -40 + 63 = 23)
        w.write_bits(c, ln)
        w.write_bits(23, 6)
        for _ in range(2):  # Y3-Y4: diff 0
            ln, c = dcl[0]
            w.write_bits(c, ln)
        for _ in range(2):  # Cb, Cr: diff 0
            ln, c = dcc[0]
            w.write_bits(c, ln)
        w.flush()
        jpg = b"\xff\xd8" + dqt + sof + dht + sos + bytes(w.out) + b"\xff\xd9"
        out = decode_jpeg(jpg)
        assert out.shape == (16, 16, 3)
        assert (out[:8, :8] == 208).all()
        assert (out[:8, 8:] == 128).all() and (out[8:, :] == 128).all()

    def test_avi_mjpeg_real_frame_sampling(self, spark):
        """Video frame sampling is REAL: a Motion-JPEG AVI (RIFF chunk
        walk, one standalone baseline JPEG per frame) round-trips
        through `sample_frames` — every 2nd frame's actual JPEG bytes
        come back out and decode to the encoded frame's pixels; the
        featurizer reports the true frame count. No ffmpeg anywhere."""
        import numpy as np

        from pandas_to_postgres_spark.operators.jpeg_codec import (
            decode_jpeg,
            encode_jpeg,
        )
        from pandas_to_postgres_spark.operators.media_codecs import (
            decode_avi_frames,
            encode_avi_mjpeg,
            extract_features_real,
        )
        from pandas_to_postgres_spark.operators.multimodal import sample_frames

        rng = np.random.RandomState(9)
        frames = [(rng.rand(16, 24, 3) * 255).astype(np.uint8) for _ in range(7)]
        avi = encode_avi_mjpeg(frames)
        assert len(decode_avi_frames(avi)) == 7

        media = spark.createDataFrame(
            [(1, bytearray(avi), {"n_frames": 7})],
            "doc_id long, payload binary, "
            "media_meta struct<n_frames:int>",
        )
        out = {
            r.frame_idx: bytes(r.frame_payload)
            for r in sample_frames(media, every_n=2).collect()
        }
        assert sorted(out) == [0, 2, 4, 6]
        for i, jpg in out.items():
            assert np.array_equal(
                decode_jpeg(jpg), decode_jpeg(encode_jpeg(frames[i]))
            )

        vdf = spark.createDataFrame(
            [(1, bytearray(avi), "video/avi")],
            "doc_id long, payload binary, mime string",
        )
        (row,) = extract_features_real(vdf).collect()
        assert row.feature[0] == 7.0  # true frame count
        assert row.feature[1] == 16.0 and row.feature[2] == 24.0

    def test_jpeg_16bit_dqt_and_multiscan_baseline(self):
        """Two formerly-gated variants: (a) a 16-bit (Pq=1) quant table —
        q=300 everywhere, DC=2 → flat round(2*300/8)+128 = 203; (b) a
        NON-interleaved multi-scan baseline color image (one scan per
        component, T.81 sequential multi-scan): Y DC diff 40, Cb=Cr=0 →
        uniform gray 208."""
        import struct

        import numpy as np

        from pandas_to_postgres_spark.operators.jpeg_codec import (
            HUFF_AC_LUMA,
            HUFF_DC_CHROMA,
            HUFF_DC_LUMA,
            BitWriter,
            build_encode_table,
            decode_jpeg,
        )

        dc = build_encode_table(*HUFF_DC_LUMA)
        dcc = build_encode_table(*HUFF_DC_CHROMA)
        ac = build_encode_table(*HUFF_AC_LUMA)

        # (a) 16-bit DQT, grayscale single-scan
        dqt16 = self._pseg(
            0xDB, bytes([0x10]) + b"".join(struct.pack(">H", 300) for _ in range(64))
        )
        sof = self._pseg(
            0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
        )
        dht = self._pseg(
            0xC4, bytes([0x00] + HUFF_DC_LUMA[0] + HUFF_DC_LUMA[1])
        ) + self._pseg(0xC4, bytes([0x10] + HUFF_AC_LUMA[0] + HUFF_AC_LUMA[1]))
        sos = self._pseg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        w = BitWriter()
        ln, c = dc[2]
        w.write_bits(c, ln)
        w.write_bits(2, 2)  # DC diff +2
        ln, c = ac[0x00]
        w.write_bits(c, ln)  # EOB
        w.flush()
        jpg = b"\xff\xd8" + dqt16 + sof + dht + sos + bytes(w.out) + b"\xff\xd9"
        assert (decode_jpeg(jpg) == 203).all()

        # (b) multi-scan baseline: 8x8 4:4:4 color, one scan per component
        dqt8 = self._pseg(0xDB, bytes([0]) + bytes([16] * 64))
        sof3 = self._pseg(
            0xC0,
            struct.pack(">BHHB", 8, 8, 8, 3)
            + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
        )
        dht3 = dht + self._pseg(
            0xC4, bytes([0x01] + HUFF_DC_CHROMA[0] + HUFF_DC_CHROMA[1])
        )
        parts = bytearray(b"\xff\xd8" + dqt8 + sof3 + dht3)
        for cid, diff_bits in ((1, (dc, 6, 40)), (2, (dcc, 0, None)), (3, (dcc, 0, None))):
            td = 0 if cid == 1 else 1
            parts += self._pseg(0xDA, bytes([1, cid, (td << 4) | 0, 0, 63, 0]))
            w = BitWriter()
            tbl, cat, bits = diff_bits
            ln, c = tbl[cat]
            w.write_bits(c, ln)
            if bits is not None:
                w.write_bits(bits, cat)
            ln, c = ac[0x00]
            w.write_bits(c, ln)  # EOB (AC table 0 for every scan)
            w.flush()
            parts += bytes(w.out)
        parts += b"\xff\xd9"
        out = decode_jpeg(bytes(parts))
        assert out.shape == (8, 8, 3) and (out == 208).all()

    def test_real_resize_nearest(self, spark):
        import numpy as np

        from pandas_to_postgres_spark.operators.media_codecs import (
            decode_bmp,
            encode_bmp,
            resize_rgb,
        )

        rgb = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
        small = resize_rgb(rgb, 3, 2)
        assert small.shape == (2, 3, 3)
        # nearest-neighbor: output pixel (r, c) = input (r*4//2, c*6//3)
        assert np.array_equal(small[0, 0], rgb[0, 0])
        assert np.array_equal(small[1, 2], rgb[2, 4])
        # decode -> resize -> encode survives a round-trip
        assert np.array_equal(decode_bmp(encode_bmp(small)), small)


class TestBloom:
    def _frames(self, spark):
        from tests.conftest import SF_SMOKE

        import pyspark.sql.functions as F

        orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        return li, orders

    def test_semi_join_is_exact(self, spark):
        from pandas_to_postgres_spark.operators.bloom import bloom_semi_join

        li, orders = self._frames(spark)
        got = bloom_semi_join(li, orders, "l_orderkey", "o_orderkey")
        want = li.join(
            orders.select("o_orderkey"),
            li.l_orderkey == orders.o_orderkey,
            "left_semi",
        )
        assert sorted(map(str, got.collect())) == sorted(map(str, want.collect()))

    def test_no_false_negatives_even_when_undersized(self, spark):
        # a deliberately tiny bitmap saturates: every true member must
        # still pass the prefilter (Bloom filters never drop members)
        from pandas_to_postgres_spark.operators.bloom import (
            bloom_build,
            bloom_prefilter,
        )

        li, orders = self._frames(spark)
        keys = orders.select("o_orderkey")
        bloom = bloom_build(keys, "o_orderkey", num_bits=256, num_hashes=3)
        pruned = bloom_prefilter(li, "l_orderkey", bloom, num_bits=256, num_hashes=3)
        true_members = li.join(keys, li.l_orderkey == keys.o_orderkey, "left_semi")
        assert pruned.count() >= true_members.count()
        missing = true_members.exceptAll(pruned)
        assert missing.count() == 0

    def test_prefilter_prunes_at_proper_sizing(self, spark):
        from pandas_to_postgres_spark.operators.bloom import (
            bloom_build,
            bloom_prefilter,
        )

        li, orders = self._frames(spark)
        bloom = bloom_build(orders.select("o_orderkey"), "o_orderkey")
        pruned_n = bloom_prefilter(li, "l_orderkey", bloom).count()
        total = li.count()
        true_n = li.join(
            orders.select("o_orderkey"),
            li.l_orderkey == orders.o_orderkey,
            "left_semi",
        ).count()
        # at 2^20 bits / 5 hashes the FP margin over the true members is
        # tiny; generously allow 1% of the fact
        assert pruned_n < total
        assert pruned_n - true_n <= total * 0.01

    def test_int_key_probes_bigint_filter(self, spark):
        # canonical key cast: int probe column vs bigint build column
        from pandas_to_postgres_spark.operators.bloom import bloom_semi_join

        import pyspark.sql.functions as F

        li, orders = self._frames(spark)
        li_int = li.withColumn("l_orderkey", F.col("l_orderkey").cast("int"))
        got = bloom_semi_join(li_int, orders, "l_orderkey", "o_orderkey").count()
        want = li.join(
            orders.select("o_orderkey"),
            li.l_orderkey == orders.o_orderkey,
            "left_semi",
        ).count()
        assert got == want


class TestPagerank:
    def _edges(self, spark):
        import pyspark.sql.functions as F

        rows = [
            ("a", "b", 2), ("a", "c", 1), ("b", "c", 3),
            ("c", "a", 1), ("d", "c", 5),
        ]
        return spark.createDataFrame(rows, ["src", "dst", "w"])

    def test_mass_conserved_without_dangling(self, spark):
        # every node has out-edges except none here ('d' has out, all of
        # a,b,c do) -> total rank stays 1 within rounding
        from pandas_to_postgres_spark.operators.graph import pagerank

        pr = pagerank(self._edges(spark), iterations=4)
        rows = {r["node"]: r["rank"] for r in pr.collect()}
        assert set(rows) == {"a", "b", "c", "d"}
        assert all(v > 0 for v in rows.values())
        # 'd' only contributes, never receives: floor rank (1-d)/N
        assert abs(rows["d"] - 0.15 / 4) < 1e-9
        # mass leaks only via rounding... but 'd' has out-edges and no
        # in-edges, so conservation holds each round
        assert abs(sum(rows.values()) - 1.0) < 1e-6

    def test_partitioning_invariant(self, spark):
        from pandas_to_postgres_spark.operators.graph import pagerank

        e = self._edges(spark)
        a = sorted(map(str, pagerank(e, iterations=3).collect()))
        b = sorted(map(str, pagerank(e.repartition(7), iterations=3).collect()))
        assert a == b

    def test_oracle_builder_matches_duckdb(self, spark):
        import duckdb

        from pandas_to_postgres_spark.operators.graph import (
            pagerank,
            pagerank_oracle_sql,
        )

        e = self._edges(spark)
        got = {r["node"]: r["rank"] for r in pagerank(e, iterations=4).collect()}
        con = duckdb.connect()
        con.sql(
            "CREATE TABLE el(src VARCHAR, dst VARCHAR, w BIGINT)"
        )
        con.executemany(
            "INSERT INTO el VALUES (?, ?, ?)",
            [("a", "b", 2), ("a", "c", 1), ("b", "c", 3), ("c", "a", 1), ("d", "c", 5)],
        )
        sql = pagerank_oracle_sql("SELECT src, dst, w FROM el", iterations=4)
        want = {r[0]: r[1] for r in con.sql(sql).fetchall()}
        con.close()
        assert got == want

    def test_registered_query_passes_scale_gate(self, spark):
        from tests.conftest import SF_SMOKE

        from pandas_to_postgres_spark.plans import REGISTRY
        from pandas_to_postgres_spark.plans.lint import assert_scalable

        assert_scalable(REGISTRY["pagerank_nations"].fn(spark, SF_SMOKE))


class TestProductQuantization:
    def _emb(self, spark):
        from tests.conftest import SF_SMOKE

        return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")

    def test_encode_matches_numpy_reference(self, spark):
        import hashlib

        import numpy as np

        from pandas_to_postgres_spark.operators.pq import pq_codebook, pq_encode

        e = self._emb(spark)
        book = pq_codebook(e, "vec_id", "embedding")
        got = {
            r["vec_id"]: list(r["pq_codes"])
            for r in pq_encode(e, "vec_id", "embedding", book).collect()
        }
        pdf = e.toPandas()
        V = np.stack(pdf["embedding"].values)
        ids = pdf["vec_id"].values
        keyed = sorted(
            zip(
                [hashlib.md5(str(i).encode()).hexdigest() for i in ids], ids, V
            ),
            key=lambda t: (t[0], t[1]),
        )
        seeds = np.stack([t[2] for t in keyed[:16]])
        m, sub = 8, 8
        for rid, v in zip(ids, V):
            want = []
            for mi in range(m):
                sv = v[mi * sub : (mi + 1) * sub]
                d = np.floor(
                    ((seeds[:, mi * sub : (mi + 1) * sub] - sv) ** 2).sum(axis=1)
                    * 1e9
                    + 0.5
                )
                want.append(int(np.argmin(d)))
            assert got[rid] == want, rid

    def test_codes_are_byte_range(self, spark):
        from pandas_to_postgres_spark.operators.pq import pq_codebook, pq_encode

        e = self._emb(spark)
        book = pq_codebook(e, "vec_id", "embedding")
        codes = pq_encode(e, "vec_id", "embedding", book)
        import pyspark.sql.functions as F

        bad = codes.filter(
            F.exists("pq_codes", lambda c: (c < 0) | (c >= 16))
        ).count()
        assert bad == 0

    def test_partitioning_invariant(self, spark):
        from pandas_to_postgres_spark.operators.pq import (
            pq_codebook,
            pq_encode,
            pq_search,
        )

        import pyspark.sql.functions as F

        e = self._emb(spark)
        q = e.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )

        def run(corpus):
            book = pq_codebook(corpus, "vec_id", "embedding")
            codes = pq_encode(corpus, "vec_id", "embedding", book)
            return sorted(
                map(str, pq_search(q, codes, book, "qid", "vec_id", "qvec").collect())
            )

        assert run(e) == run(e.repartition(13))

    def test_search_never_reads_vectors(self, spark):
        # the ADC scoring subtree reads pq_codes, not the embedding column:
        # corpus embeddings appear in the plan only under the encode stage
        from pandas_to_postgres_spark.operators.pq import (
            pq_codebook,
            pq_encode,
            pq_search,
        )

        import pyspark.sql.functions as F

        e = self._emb(spark)
        book = pq_codebook(e, "vec_id", "embedding")
        codes = pq_encode(e, "vec_id", "embedding", book).localCheckpoint(
            eager=True
        )  # materialized code table, as a real index would be
        q = e.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        out = pq_search(q, codes, book, "qid", "vec_id", "qvec")
        plan = out._jdf.queryExecution().executedPlan().toString()
        # corpus side of the search is the checkpointed codes scan; no
        # parquet scan of the embeddings table feeds the ADC cross join
        # (the query/book sides do read it — they are 5 rows and 1 row)
        assert plan.count("Scan ExistingRDD") >= 1
        assert "BatchEvalPython" not in plan


class TestBloomKeyFamilies:
    def test_mixed_key_families_are_rejected_loudly(self, spark):
        # a string dim key probed by a long fact key would hash on
        # different families and silently drop true matches — must raise
        import pytest as _pytest

        from pandas_to_postgres_spark.operators.bloom import bloom_semi_join

        fact = spark.createDataFrame([(1,), (2,)], "fk long")
        dim = spark.createDataFrame([("1",), ("2",)], "dk string")
        with _pytest.raises(TypeError, match="key families differ"):
            bloom_semi_join(fact, dim, "fk", "dk")

    def test_decimal_scale0_key_joins_long_fact(self, spark):
        import pyspark.sql.functions as F

        from pandas_to_postgres_spark.operators.bloom import bloom_semi_join

        fact = spark.createDataFrame([(1, "a"), (2, "b"), (5, "c")], "fk long, v string")
        dim = spark.createDataFrame([(1,), (5,)], "dk long").select(
            F.col("dk").cast("decimal(18,0)").alias("dk")
        )
        got = sorted(r["fk"] for r in bloom_semi_join(fact, dim, "fk", "dk").collect())
        assert got == [1, 5]


class TestPqPlantedDuplicates:
    def test_exact_duplicate_vectors_share_codes_and_rank_first(self, spark):
        # identical vectors quantize to identical codes, so a planted
        # duplicate must be its twin's nearest ADC neighbor (dist 0,
        # lowest-id tie-break) — recall guaranteed by construction,
        # robust to any testdata regeneration
        import pyspark.sql.functions as F

        from tests.conftest import SF_SMOKE

        from pandas_to_postgres_spark.operators.pq import (
            pq_codebook,
            pq_encode,
            pq_search,
        )

        e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        twins = e.filter(F.col("vec_id") < 3).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
        )
        corpus = e.unionByName(twins)
        book = pq_codebook(corpus, "vec_id", "embedding")
        codes = pq_encode(corpus, "vec_id", "embedding", book)
        qs = corpus.filter(F.col("vec_id") >= 1_000_000).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        out = pq_search(qs, codes, book, "qid", "vec_id", "qvec", k=2)
        by_q = {}
        for r in out.collect():
            by_q.setdefault(r["qid"], {})[r["rank"]] = (r["vec_id"], r["adc_dist"])
        for qid, ranks in by_q.items():
            # identical vectors share codes, so the ADC distance (the
            # quantization residual — nonzero) ties EXACTLY between the
            # original twin and the query's own corpus entry; the lower
            # id wins rank 1
            assert ranks[1][0] == qid - 1_000_000, (qid, ranks)
            assert ranks[2][0] == qid, (qid, ranks)
            assert ranks[1][1] == ranks[2][1]

    def test_trained_codebook_beats_sampled_on_planted_clusters(self, spark):
        """Lloyd-trained codebooks must beat the raw md5 sample on a corpus
        with genuine cluster structure: 16 well-separated per-subspace
        centers, 20 points each (deterministic numpy seed). The sampled
        book picks 16 arbitrary corpus points (some clusters doubly
        represented, some not at all); training converges codewords toward
        the true centers, so ADC recall@5 of exact-L2 ground truth rises.
        """
        import numpy as np
        import pyspark.sql.functions as F

        from pandas_to_postgres_spark.operators.pq import (
            pq_codebook,
            pq_codebook_trained,
            pq_encode,
            pq_search,
        )

        rng = np.random.RandomState(7)
        centers = rng.uniform(-10, 10, size=(16, 64))
        pts = np.repeat(centers, 20, axis=0) + rng.normal(
            0, 0.4, size=(320, 64)
        )
        corpus = spark.createDataFrame(
            [(int(i), [float(x) for x in row]) for i, row in enumerate(pts)],
            "vec_id long, embedding array<double>",
        ).cache()
        q = corpus.filter(F.col("vec_id") % 40 == 0).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        ids = np.arange(320)
        truth = {}
        for qid in range(0, 320, 40):
            d = ((pts - pts[qid]) ** 2).sum(axis=1)
            truth[qid] = set(ids[np.lexsort((ids, d))[:5]].tolist())

        def recall(book):
            codes = pq_encode(corpus, "vec_id", "embedding", book)
            out = pq_search(
                q, codes, book, "qid", "vec_id", "qvec"
            ).toPandas()
            hit = 0
            for qid, grp in out.groupby("qid"):
                hit += len(set(grp.vec_id) & truth[qid])
            return hit / (len(truth) * 5)

        r_sampled = recall(pq_codebook(corpus, "vec_id", "embedding"))
        r_trained = recall(
            pq_codebook_trained(corpus, "vec_id", "embedding", iters=2)
        )
        assert r_trained > r_sampled, (r_trained, r_sampled)

    def test_trained_codebook_deterministic(self, spark):
        """Training is partitioning-invariant: the book from a 1-partition
        corpus equals the book from a 13-partition corpus exactly (DECIMAL
        mean accumulation is order-free)."""
        from tests.conftest import SF_SMOKE

        from pandas_to_postgres_spark.operators.pq import pq_codebook_trained

        e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        b1 = pq_codebook_trained(
            e.coalesce(1), "vec_id", "embedding", iters=2
        ).collect()[0]["pq_book"]
        b13 = pq_codebook_trained(
            e.repartition(13), "vec_id", "embedding", iters=2
        ).collect()[0]["pq_book"]
        assert b1 == b13


class TestImagePhash:
    def test_dhash60_invariances(self):
        import numpy as np

        from pandas_to_postgres_spark.operators.multimodal import dhash60

        rng = np.random.RandomState(0)
        img = rng.rand(32, 32) * 200
        h = dhash60(img)
        assert 0 <= h < (1 << 60)
        # brightness shift preserves every gradient sign
        assert dhash60(img + 17.0) == h
        # mild contrast scaling too
        assert dhash60(img * 1.5) == h
        # structural change flips bits
        assert dhash60(img.T.copy()) != h

    def test_hamming_pairs_from_fp_pigeonhole(self, spark):
        from pandas_to_postgres_spark.operators.dedup import (
            hamming_pairs_from_fp,
        )

        base = 0b1010_1100_1111_0000_1010_1100_1111_0000_1010_1100_1111_0000_1010_1100_1111
        rows = [
            (1, base),
            (2, base ^ 0b101),          # hamming 2 -> pair
            (3, base ^ (1 << 59)),      # hamming 1 -> pair
            (4, base ^ 0xFFFF0000FFFF), # far -> no pair
        ]
        df = spark.createDataFrame(rows, "id long, fp long")
        got = {
            (r.id_a, r.id_b, r.hamming)
            for r in hamming_pairs_from_fp(df, "id", "fp").collect()
        }
        assert (1, 2, 2) in got and (1, 3, 1) in got
        assert not any(4 in (a, b) for a, b, _ in got)

    def test_image_phash_planted_profile(self, spark):
        """Every same-base pair found (pigeonhole recall), zero
        cross-base false positives at Hamming <= 3."""
        from pandas_to_postgres_spark.plans import REGISTRY

        rows = REGISTRY["image_phash_pairs"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect()
        got = {(r.id_a, r.id_b) for r in rows}
        docs = [i for i in range(0, 500, 5)]
        same = {
            (a, b)
            for i, a in enumerate(docs)
            for b in docs[i + 1:]
            if a % 20 == b % 20
        }
        assert got == same


class TestAudioSpectrogram:
    def test_planted_tone_bins(self, spark):
        """A doc whose louder tone is f1 = 200 + (doc_id%10)*100 Hz must
        put the dominant rFFT bin at round(f1 * 256 / 8000)."""
        from pandas_to_postgres_spark.plans import REGISTRY

        rows = {
            r.doc_id: r
            for r in REGISTRY["audio_spectrogram_features"]
            .fn(spark, "/root/testdata/sf0.001")
            .collect()
        }
        assert len(rows) >= 50
        for doc_id, r in rows.items():
            f1 = 200.0 + (doc_id % 10) * 100.0
            expected_bin = round(f1 * 256 / 8000)
            assert abs(r.dominant_bin - expected_bin) <= 1, (doc_id, f1, r)
            # the 0.3-amplitude second tone lives at >= 1200 Hz; with the
            # 0.6 tone at <= 1100 Hz the low band must dominate
            assert r.low_frac > r.high_frac
            # centroid sits between the two tones
            f2 = 1200.0 + (doc_id % 7) * 150.0
            assert f1 * 0.8 < r.centroid_hz < f2 * 1.2


class TestSnapshotTableStreamingSink:
    """Streaming-lakehouse ingest: each micro-batch lands as immutable
    part-e{epoch}-* files + one published snapshot version; batch readers
    time-travel a consistent table while the stream runs; compaction and
    expiry compose on top; epoch re-delivery is exactly-once."""

    def _drain(self, spark, src, table, ckpt):
        from pandas_to_postgres_spark.streaming.sink import (
            snapshot_table_writer,
            stream_to_batch_sink,
        )

        stream = spark.readStream.schema("id long, v long").parquet(src)
        q = stream_to_batch_sink(
            stream,
            snapshot_table_writer(table, ["id"]),
            checkpoint_dir=ckpt,
        )
        q.awaitTermination()

    def test_each_drain_publishes_a_version_and_readers_time_travel(
        self, spark, tmp_path
    ):
        from pandas_to_postgres_spark.sources.manifest import (
            compact_snapshot,
            expire_snapshots,
            read_snapshot,
            snapshot_versions,
        )

        src = str(tmp_path / "src")
        table = str(tmp_path / "snap_tbl")
        ckpt = str(tmp_path / "ckpt")
        spark.range(50).selectExpr("id", "id * 2 AS v").write.mode(
            "overwrite"
        ).parquet(src)
        self._drain(spark, src, table, ckpt)
        assert snapshot_versions(table) == [1]
        assert read_snapshot(spark, table).count() == 50

        # second arrival -> second epoch -> second snapshot; v1 frozen
        spark.range(50, 80).selectExpr("id", "id * 2 AS v").write.mode(
            "append"
        ).parquet(src)
        self._drain(spark, src, table, ckpt)
        assert snapshot_versions(table) == [1, 2]
        assert read_snapshot(spark, table, version=1).count() == 50
        assert read_snapshot(spark, table, version=2).count() == 80

        # maintenance composes: compact the epoch files, expire the rest
        man = compact_snapshot(spark, table)
        assert read_snapshot(spark, table, man["version"]).count() == 80
        res = expire_snapshots(table, keep_latest=1)
        assert 1 in res["expired_versions"]
        assert read_snapshot(spark, table).count() == 80

    def test_epoch_redelivery_is_exactly_once(self, spark, tmp_path):
        from pandas_to_postgres_spark.sources.manifest import (
            load_snapshot,
            read_snapshot,
        )
        from pandas_to_postgres_spark.streaming.sink import (
            snapshot_table_writer,
        )

        table = str(tmp_path / "snap_tbl2")
        w = snapshot_table_writer(table, ["id"])
        batch = spark.range(40).selectExpr("id", "id AS v")
        w(batch, 7)
        w(batch, 7)  # simulated re-delivery of the SAME epoch
        # the retry replaced its own files — no duplication, two versions
        assert read_snapshot(spark, table).count() == 40
        latest = load_snapshot(table)
        assert all(e["path"].startswith("part-e7-") for e in latest["files"])
