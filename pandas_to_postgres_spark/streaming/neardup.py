"""Streaming near-duplicate detection: new documents stream in and are
LSH-matched against a STATIC corpus MinHash index — the online-ingest
shape of D2 (a training-data pipeline deduping each incoming crawl shard
against the already-curated corpus without re-pairing the corpus with
itself).

Design (§2.9 x §2.11): the corpus side is indexed ONCE as batch frames —
(band_idx, band_key, doc_id) banded signatures with the same
deterministic bucket cap as the batch operator, plus the hashed shingle
sets for verification — and cached; Structured Streaming's stream-static
join rules re-reference it per micro-batch with no stream state. Each
micro-batch of new documents computes its own signatures map-only
(`operators/dedup.md5_minhash_hashed_banded`, the md5 basis so the WHOLE
pipeline replays in DuckDB), equi-joins the static band index, dedupes
candidates within the batch, verifies exact Jaccard as an integer micro
ratio, and appends verified (new_id, corpus_id, jaccard_micro) rows to a
parquet sink via foreachBatch. Because every new document matches only
the static corpus (never other stream rows), the result is independent
of micro-batch boundaries — rerun-identical under any trigger schedule,
which is what makes the batch DuckDB oracle valid.

Scale: the corpus index is (band, key, id) rows — 8 rows per corpus doc,
persisted once; per micro-batch work is signatures (map-only) + one
bucket equi-join + a candidate-sized verify join. No stream state at
all, so the watermark question never arises; 100 TB of corpus index is
a bucketed table the stream joins against.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def stream_neardup_against_corpus(
    spark: SparkSession,
    sf_dir: str,
    jaccard_threshold_micro: int = 400000,
    max_bucket: int = 200,
) -> DataFrame:
    """Drain a stream of NEW documents (deterministic 60%-truncated twins
    of the corpus, ids + 1e6 — same planted construction as
    `dedup_threshold_pr`) against the static corpus LSH index; returns
    the verified (new_id, corpus_id, jaccard_micro) pairs as a batch
    DataFrame."""
    from pandas_to_postgres_spark.operators.dedup import (
        md5_minhash_hashed_banded,
    )
    from pandas_to_postgres_spark.sources.parquet import load_table

    corpus = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    c_hashed, c_banded = md5_minhash_hashed_banded(corpus, "text", "doc_id")
    wb = Window.partitionBy("band_idx", "band_key").orderBy("doc_id")
    c_index = (
        c_banded.withColumn("__bn", F.row_number().over(wb))
        .filter(F.col("__bn") <= max_bucket)
        .select(
            "band_idx", "band_key", F.col("doc_id").alias("corpus_id")
        )
        .cache()
    )
    c_ms = c_hashed.select(
        F.col("doc_id").alias("corpus_id"), F.col("__ms").alias("ms_c")
    )

    raw_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .load(f"{sf_dir}/documents.parque[t]")
        .select(
            (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
            F.expr(
                "substring(text, 1, CAST((n_chars * 6) DIV 10 AS INT))"
            ).alias("text"),
        )
    )

    base = tempfile.mkdtemp(prefix=f"stream_nd_{uuid.uuid4().hex[:8]}_")
    out, ckpt = f"{base}/out", f"{base}/ckpt"

    def process_batch(batch_df: DataFrame, _batch_id: int) -> None:
        b_hashed, b_banded = md5_minhash_hashed_banded(
            batch_df, "text", "doc_id"
        )
        cand = (
            b_banded.select(
                "band_idx", "band_key", F.col("doc_id").alias("new_id")
            )
            .join(c_index, ["band_idx", "band_key"])
            .select("new_id", "corpus_id")
            .distinct()
        )
        b_ms = b_hashed.select(
            F.col("doc_id").alias("new_id"), F.col("__ms").alias("ms_n")
        )
        inter = F.size(F.array_intersect("ms_n", "ms_c")).cast("bigint")
        uni = (
            F.size("ms_n").cast("bigint")
            + F.size("ms_c").cast("bigint")
            - inter
        )
        verified = (
            cand.join(b_ms, "new_id")
            .join(c_ms, "corpus_id")
            .withColumn("__i", inter)
            .withColumn("__u", uni)
            .filter(
                F.col("__i") * F.lit(1_000_000)
                >= F.lit(jaccard_threshold_micro) * F.col("__u")
            )
            .select(
                "new_id",
                "corpus_id",
                F.expr("CAST(__i * 1000000 AS BIGINT) DIV __u")
                .cast("bigint")
                .alias("jaccard_micro"),
            )
        )
        verified.write.mode("append").parquet(out)
        b_hashed.unpersist()

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = spark.read.parquet(out).localCheckpoint(eager=True)
    c_index.unpersist()
    c_hashed.unpersist()
    shutil.rmtree(base, ignore_errors=True)
    return result
