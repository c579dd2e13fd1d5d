"""Deterministic Lloyd's k-means over an embedding column, Spark-shaped.

The 100 TB shape: each Lloyd iteration is (a) a MAP-ONLY assignment — the k
centroids are baked into the plan as literal arrays and each row computes its
argmin locally, no join, no shuffle — and (b) ONE groupBy(cluster) shuffle of
per-dimension partial sums to recompute centroids. The only driver-side data
is the k x dim centroid matrix itself (k rows per iteration, bounded and tiny
— collecting it is the point: centroids must become plan literals for the
next map-only assignment).

Everything is deterministic: initial centroids are the vectors of the k
smallest ids (no random seed), and centroid updates average through
DECIMAL partial sums so the result is independent of partition order
(IEEE double addition is not associative; decimal addition is).

This is the clustering half of SemDeDup-style semantic deduplication
(Abbas et al. 2023): cluster the corpus embeddings, then search for
near-duplicate pairs only WITHIN a cluster — the learned cluster id plays
the role `embedding_near_duplicates` gives to a label/LSH block, so the
pair space never goes global.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pandas_to_postgres_spark.functions.vectors import cosine_expr


def _sq_dist_to(vec: Column, centroid: Sequence[float]) -> Column:
    """Squared L2 distance from `vec` to a literal centroid (map-only)."""
    lit = F.array(*[F.lit(float(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(vec, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    df: DataFrame,
    vec_col: str,
    centroids: List[List[float]],
    out_col: str = "cluster",
) -> DataFrame:
    """Add `out_col`: the 0-based index of the nearest centroid.

    Centroids are literals, so this is a pure projection — at any scale it
    runs inside the scan stage with zero data movement. Ties break to the
    lowest cluster index (strict `<` comparison), deterministically.
    """
    dists = F.array(*[_sq_dist_to(F.col(vec_col), c) for c in centroids])
    # array_position returns the FIRST index of the min → lowest-index tie-break
    idx = F.array_position(dists, F.array_min(dists)) - 1
    return df.withColumn(out_col, idx.cast("int"))


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 5,
) -> List[List[float]]:
    """Deterministic Lloyd's iterations; returns the k x dim centroid matrix.

    Init = vectors of the k smallest ids (content-independent of partition
    layout). Each iteration: map-only assignment, one groupBy(cluster)
    recomputing per-dimension means through DECIMAL(28,12) partial sums
    (order-independent), then a k-row collect to re-literalize centroids.
    Empty clusters keep their previous centroid. Dimensionality is read
    from the schema-side first row of the init sample, never assumed.
    """
    init_rows = df.select(id_col, vec_col).orderBy(F.col(id_col)).limit(k).collect()
    if len(init_rows) < k:
        raise ValueError(f"k={k} but only {len(init_rows)} rows")
    centroids = [[float(x) for x in r[vec_col]] for r in init_rows]
    dim = len(centroids[0])

    for _ in range(iters):
        assigned = assign_clusters(df, vec_col, centroids)
        # per-dimension decimal mean: exact partial sums, order-independent
        aggs = [
            (
                F.sum(F.col(vec_col)[i].cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias(f"c{i}")
            for i in range(dim)
        ]
        rows = assigned.groupBy("cluster").agg(*aggs).collect()  # k rows, bounded
        new = {r["cluster"]: [float(r[f"c{i}"]) for i in range(dim)] for r in rows}
        centroids = [new.get(c, centroids[c]) for c in range(k)]
    return centroids


def semantic_near_duplicates(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 5,
    threshold: float = 0.9,
) -> DataFrame:
    """SemDeDup: k-means cluster, then cosine near-dup pairs within clusters.

    Returns (cluster, id_a, id_b, cosine) with id_a < id_b and cosine
    rounded to 5 decimals (deterministic output). The within-cluster join is
    an equi-join on the learned cluster id — candidate pairs scale with the
    largest cluster, not the corpus, and the cluster count k is the skew
    knob (raise k until clusters fit the pair budget)."""
    assigned = assign_clusters(df, vec_col, centroids=kmeans_fit(df, vec_col, id_col, k, iters))
    a = assigned.select(
        F.col("cluster"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
    )
    b = assigned.select(
        F.col("cluster"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
    )
    cos = cosine_expr(F.col("__va"), F.col("__vb"))
    return (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cos >= F.lit(threshold))
        .select("cluster", "id_a", "id_b", F.round(cos, 5).alias("cosine"))
    )
