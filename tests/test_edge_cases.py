"""Edge-case hardening: empty inputs, single rows, null text — the
"empty input is valid" obligation (`/root/reference/pandas_to_postgres/
utilities.py:107-108`) extended to every custom operator."""

import pytest
from pyspark.sql import functions as F

from pandas_to_postgres_spark.operators.dedup import (
    dedup_exact,
    minhash_near_duplicates,
    ngram_jaccard_blocked,
    simhash_expr,
)
from pandas_to_postgres_spark.operators.joins import asof_join
from pandas_to_postgres_spark.operators.similarity import topk_cosine_bruteforce


@pytest.fixture
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


class TestEmptyInputs:
    def test_dedup_exact_empty(self, spark, empty_docs):
        assert dedup_exact(empty_docs, "text", "doc_id").count() == 0

    def test_minhash_empty(self, spark, empty_docs):
        assert minhash_near_duplicates(empty_docs, "text", "doc_id").count() == 0

    def test_ngram_jaccard_empty(self, spark):
        df = spark.createDataFrame([], "doc_id long, text string, lang string")
        assert ngram_jaccard_blocked(df, "text", "doc_id", ["lang"]).count() == 0

    def test_asof_empty_right(self, spark):
        import datetime

        ts = datetime.datetime(2024, 1, 1)
        left = spark.createDataFrame([(1, ts, "p")], "k long, ts timestamp, tag string")
        right = spark.createDataFrame([], "k long, ts timestamp, v double")
        out = asof_join(left, right, on="ts", by="k", value_cols=["v"]).collect()
        assert len(out) == 1 and out[0].v_asof is None

    def test_asof_empty_left(self, spark):
        import datetime

        ts = datetime.datetime(2024, 1, 1)
        left = spark.createDataFrame([], "k long, ts timestamp, tag string")
        right = spark.createDataFrame([(1, ts, 1.0)], "k long, ts timestamp, v double")
        assert asof_join(left, right, on="ts", by="k", value_cols=["v"]).count() == 0

    def test_topk_empty_corpus(self, spark):
        q = spark.createDataFrame([(0, [1.0, 0.0])], "qid long, v array<double>")
        c = spark.createDataFrame([], "cid long, v array<double>")
        assert topk_cosine_bruteforce(q, c, "qid", "cid", "v", "v", k=3).count() == 0


class TestDegenerateText:
    def test_single_token_doc_minhash(self, spark):
        # shorter than the shingle width → whole-text fallback shingle
        df = spark.createDataFrame(
            [(1, "hello"), (2, "hello"), (3, "goodbye")], "doc_id long, text string"
        )
        pairs = {
            (r.id_a, r.id_b)
            for r in minhash_near_duplicates(df, "text", "doc_id", jaccard_threshold=0.9).collect()
        }
        assert pairs == {(1, 2)}

    def test_empty_string_text(self, spark):
        df = spark.createDataFrame([(1, ""), (2, "")], "doc_id long, text string")
        # empty texts are exact duplicates of each other; must not crash
        out = dedup_exact(df, "text", "doc_id").collect()
        assert [r.doc_id for r in out] == [1]
        sims = df.select(simhash_expr("text").alias("s")).collect()
        assert sims[0].s == sims[1].s

    def test_whitespace_only_text(self, spark):
        df = spark.createDataFrame([(1, "   ")], "doc_id long, text string")
        n = minhash_near_duplicates(df, "text", "doc_id").count()
        assert n == 0  # single doc, no pairs, no crash


class TestRepeatedSpans:
    def test_short_docs_emit_no_grams(self, spark):
        from pandas_to_postgres_spark.operators.dedup import repeated_spans

        # docs shorter than n tokens must emit NOTHING (Spark's
        # sequence(1, 0) descends — the guard this asserts against)
        df = spark.createDataFrame(
            [(1, "too short"), (2, "too short"), (3, "")],
            "doc_id long, text string",
        )
        assert repeated_spans(df, "text", "doc_id", n=8).count() == 0

    def test_shared_span_found_once_per_doc(self, spark):
        from pandas_to_postgres_spark.operators.dedup import repeated_spans

        span = "one two three four five six seven eight"
        df = spark.createDataFrame(
            [
                (1, f"prefix {span} suffix"),
                (2, f"{span} {span}"),  # repeats internally: one vote only
                (3, "entirely different words with no common run here ok"),
            ],
            "doc_id long, text string",
        )
        out = repeated_spans(df, "text", "doc_id", n=8).collect()
        # at least the planted span; every surviving key has 2 doc votes
        assert any(r.n_docs == 2 and r.first_doc == 1 for r in out)
        assert all(r.n_docs <= 2 for r in out)
