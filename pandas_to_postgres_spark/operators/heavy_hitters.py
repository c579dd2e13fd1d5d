"""Misra–Gries heavy hitters: mergeable frequent-items sketch.

When the item universe fits in memory (word vocabularies), exact counting
via groupBy is already map-side combined and cheap — use that. This
operator is for the regime where the universe is UNBOUNDED (all n-grams,
URLs, join keys at 100 TB): each partition summarizes its stream with a
capacity-k Misra–Gries table (Misra & Gries 1982; Agarwal et al.'s
mergeability result, PODS'12), so the shuffle carries at most
``partitions x k`` rows no matter how many distinct items exist — the
exact-groupBy alternative shuffles one partial row per distinct item per
partition, which at n-gram scale is the corpus again.

Guarantees (standard MG): every item with true frequency > n/(k+1)
appears in the merged summary, and each reported count is a LOWER bound
undercounting by at most n/(k+1). When k >= distinct(universe) the
decrement step never fires and the sketch degenerates to EXACT counting —
which is what lets the registered query be oracle-checked against exact
SQL counts while pytest exercises the approximate regime on planted
skew.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("item", T.StringType()),
        T.StructField("cnt", T.LongType()),
    ]
)


def _mg_partition(k: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for item in pdf["item"]:
                if item is None:
                    continue
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    # decrement-all step; drop zeros
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "cnt": list(counters.values())}
            )

    return run


def heavy_hitters(df: DataFrame, item_col: Column | str, k: int = 64) -> DataFrame:
    """Merged Misra–Gries summary of ``item_col``: (item, est) with est a
    lower-bound count undercounting by at most n/(k+1); items with true
    frequency above that threshold are guaranteed present.

    Shape: per-partition MG tables (map-only, capacity k) → ONE shuffle
    of ≤ partitions x k summary rows → sum-merge. Summing partial MG
    counts keeps the lower-bound property (each partial already
    undercounts its own stream); the union's error adds per-partition
    bounds, still ≤ n/(k+1) overall by the PODS'12 merge argument.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    items = df.select(F.col(item_col).cast("string").alias("item"))
    partials = items.mapInPandas(_mg_partition(k), schema=_PARTIAL_SCHEMA)
    return partials.groupBy("item").agg(F.sum("cnt").alias("est"))
