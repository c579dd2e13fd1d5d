"""Deterministic Lloyd's k-means over an embedding column, Spark-shaped.

The 100 TB shape: each Lloyd iteration is (a) an effectively map-only
assignment — the k x dim centroid matrix rides a broadcast 1-row frame and
each row computes its argmin locally, no shuffle of the corpus — and (b)
ONE groupBy shuffle of per-dimension partial sums to recompute centroids.
The only driver-side data is the k x dim centroid matrix itself (bounded
and tiny — collecting it is the point: the matrix must re-enter the next
iteration's broadcast).

Two codegen decisions that dominate wall-clock (same economics as
`operators/dedup.signatures_from_hashed`):

- Centroids are DATA (a broadcast 1-row array<array<double>> frame), not
  plan literals. With literal centroids every iteration produces a NEW
  plan (the literals changed), so Janino recompiles the whole-stage body
  k times per fit; as data, the plan is bit-identical across iterations
  and the codegen cache hits. Measured: 15.0s -> ~3s for a 3-iteration
  fit at sf0.1.
- The distance-to-every-centroid computation is ONE nested higher-order
  expression (`transform` over the centroid array), not k unrolled
  distance columns; the centroid update is a posexplode + groupBy
  (cluster, dim) decimal mean, not dim unrolled avg aggregates.

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


def _sq_dist_to(vec: Column, centroid: Sequence[float]) -> Column:
    """Squared L2 distance from `vec` to a literal centroid (test helper /
    one-off probes; the fit loop uses the broadcast-frame form below)."""
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

    The centroid matrix arrives as a broadcast 1-row frame, so the corpus
    never shuffles and — because the matrix is data, not literals — the
    plan (and its compiled codegen) is identical for every centroid set.
    Ties break to the lowest cluster index (`array_position` returns the
    FIRST index of the min), deterministically.
    """
    spark = df.sparkSession
    cents = spark.createDataFrame(
        [([[float(x) for x in c] for c in centroids],)],
        "__cents array<array<double>>",
    )
    dists = F.transform(
        F.col("__cents"),
        lambda c: F.aggregate(
            F.zip_with(F.col(vec_col), c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    idx = F.array_position(dists, F.array_min(dists)) - 1
    return (
        df.crossJoin(F.broadcast(cents))
        .withColumn(out_col, idx.cast("int"))
        .drop("__cents")
    )


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 5,
) -> List[List[float]]:
    """Deterministic Lloyd's iterations; returns the k x dim centroid matrix.

    Init = vectors of the k smallest ids (content-independent of partition
    layout). Each iteration: broadcast-assignment, one posexplode +
    groupBy(cluster, dim) shuffle recomputing per-dimension means through
    DECIMAL(28,12) partial sums (order-independent), then a k*dim-row
    collect to rebuild the matrix (bounded: k x dim doubles). Empty
    clusters keep their previous centroid.
    """
    init_rows = df.select(id_col, vec_col).orderBy(F.col(id_col)).limit(k).collect()
    if len(init_rows) < k:
        raise ValueError(f"k={k} but only {len(init_rows)} rows")
    centroids = [[float(x) for x in r[vec_col]] for r in init_rows]
    dim = len(centroids[0])

    for _ in range(iters):
        assigned = assign_clusters(df, vec_col, centroids)
        means = (
            assigned.select(
                "cluster", F.posexplode(F.col(vec_col)).alias("pos", "x")
            )
            .groupBy("cluster", "pos")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
        )
        rows = means.collect()  # k * dim rows, bounded
        new: dict = {}
        for r in rows:
            new.setdefault(r["cluster"], [0.0] * dim)[r["pos"]] = float(r["m"])
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

    # Within-cluster pairwise cosine is DENSE linear algebra — the one
    # place a vectorized grouped-map beats JVM expressions: the
    # equi-self-join + per-pair higher-order dot evaluates interpreted
    # (HOFs are not codegen'd), ~5s for 250k pairs at sf0.1, while one
    # numpy matmul per cluster is milliseconds (and is exactly how
    # SemDeDup runs per-cluster similarity on accelerators). Rows are
    # sorted by id inside each group, and the row-blocked loop bounds
    # memory to block x cluster — at 100 TB raise k until clusters fit.
    out_schema = (
        f"cluster int, id_a long, id_b long, cosine double"
    )

    def _pairs(pdf):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        pdf = pdf.sort_values("__id").reset_index(drop=True)
        ids = pdf["__id"].to_numpy()
        V = np.stack(pdf["__vec"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0.0] = 1.0
        N = V / norms[:, None]
        cl = int(pdf["cluster"].iloc[0])
        outs = []
        block = 1024
        for s in range(0, len(ids), block):
            S = N[s : s + block] @ N.T  # (block, n)
            for bi in range(S.shape[0]):
                i = s + bi
                row = S[bi, i + 1 :]  # strict upper triangle: id_a < id_b
                hits = np.nonzero(row >= threshold)[0]
                for j in hits:
                    # grid round (floor(x*1e5+0.5)): the cross-engine-
                    # deterministic form — Python's round() is half-even,
                    # the DuckDB oracle's round() half-away; this rule is
                    # identical on both (see operators/graph._grid_round)
                    outs.append((cl, int(ids[i]), int(ids[i + 1 + j]),
                                 float(np.floor(row[j] * 1e5 + 0.5) / 1e5)))
        return pd.DataFrame(outs, columns=["cluster", "id_a", "id_b", "cosine"])

    return (
        assigned.select(
            "cluster",
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("__vec"),
        )
        .groupBy("cluster")
        .applyInPandas(_pairs, out_schema)
    )
