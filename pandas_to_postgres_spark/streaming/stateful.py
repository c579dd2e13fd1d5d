"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9) — per-user running aggregates with explicit state.

This is the escape hatch for streaming semantics the built-in windowed
aggregations can't express (custom session logic, decaying counters,
pattern detection). State is a per-key dict persisted by the state store;
the watermark/timeout policy bounds its lifetime.

100 TB notes: state is partitioned by the grouping key across the cluster;
an unbounded key domain needs a timeout (here GroupStateTimeout) or the
state store grows forever — the local test uses NoTimeout because the
key domain (user_id) is finite.
"""

from __future__ import annotations

import uuid
from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_to_postgres_spark.sources.parquet import normalize_event_ts
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
)


def _update_user_totals(
    key: Tuple[int],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, value-sum) per user across micro-batches and emit
    the updated running totals."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful operator over the events stream to completion and
    return the final per-user totals (one row per user per micro-batch that
    touched the user; with a single AvailableNow batch, exactly one row per
    user)."""
    path = f"{sf_dir}/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .load(f"{sf_dir}/events.parque[t]")
    )
    stream = normalize_event_ts(stream)

    updated = stream.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    table = f"stateful_totals_{uuid.uuid4().hex[:8]}"
    q = (
        updated.writeStream.format("memory")
        .queryName(table)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # keep only the last emission per user (idempotent under multi-batch runs)
    out = spark.table(table)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
