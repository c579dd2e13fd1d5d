"""Similarity search over embedding columns (SURVEY.md §2.11 D4).

Two tiers:
- brute-force top-k: query set × corpus, cosine via JVM-side array
  expressions, per-query top-k via window rank. Exact; the query side is
  broadcast (it is small by construction), so the corpus is scanned once
  with NO shuffle of the embedding column — at 100 TB the corpus never
  moves, only (query_id, corpus_id, score) tuples shuffle for the top-k.
- LSH-bucketed ANN: random-hyperplane signatures (deterministic seeds via
  xxhash64-derived pseudo-random planes) bucket the corpus; queries probe
  only their own bucket(s). Approximate; trades recall for a ~B× prune.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pandas_to_postgres_spark.functions.vectors import cosine_expr


def topk_cosine_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    k: int = 5,
    round_digits: int = 5,
) -> DataFrame:
    """Exact top-k corpus neighbors per query vector by cosine similarity.

    Ranking uses the ROUNDED score with the corpus id as tie-break, so
    results are stable across FP summation orders (oracle-reproducible).
    Output: (query_id, corpus_id, cosine, rank).
    """
    q = F.broadcast(
        queries.select(F.col(query_id).alias("__qid"), F.col(query_vec).alias("__qv"))
    )
    c = corpus.select(F.col(corpus_id).alias("__cid"), F.col(corpus_vec).alias("__cv"))
    scored = q.crossJoin(c).select(
        F.col("__qid"),
        F.col("__cid"),
        F.round(cosine_expr(F.col("__qv"), F.col("__cv")), round_digits).alias("cosine"),
    )
    w = Window.partitionBy("__qid").orderBy(F.col("cosine").desc(), F.col("__cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias(corpus_id),
            "cosine",
            "rank",
        )
    )


def ivf_centroids(corpus: DataFrame, cluster_col: str, corpus_vec: str) -> DataFrame:
    """Per-cluster mean centroid vectors, DECIMAL-exact (see
    topk_cosine_ivf). One row per cluster — broadcastable at any scale."""
    return (
        corpus.select(F.col(cluster_col), F.posexplode(F.col(corpus_vec)).alias("__i", "__x"))
        .groupBy(cluster_col, "__i")
        .agg(
            (
                F.sum(F.col("__x").cast("decimal(18,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("__m")
        )
        .groupBy(cluster_col)
        .agg(F.array_sort(F.collect_list(F.struct("__i", "__m"))).alias("__ims"))
        .select(
            F.col(cluster_col),
            F.transform("__ims", lambda s: s.getField("__m")).alias("__centroid"),
        )
    )


def ivf_probes(
    queries: DataFrame,
    centroids: DataFrame,
    query_id: str,
    query_vec: str,
    cluster_col: str,
    nprobe: int,
) -> DataFrame:
    """(query, probed cluster) pairs: each query's nprobe nearest
    centroids under the rounded, cluster-tiebroken cosine rank (the
    oracle-reproducible probe rule of topk_cosine_ivf)."""
    q = queries.select(F.col(query_id).alias("__qid"), F.col(query_vec).alias("__qv"))
    probe_w = Window.partitionBy("__qid").orderBy(
        F.col("__csim").desc(), F.col(cluster_col).asc()
    )
    return (
        q.crossJoin(F.broadcast(centroids))
        .withColumn(
            "__csim", F.round(cosine_expr(F.col("__qv"), F.col("__centroid")), 5)
        )
        .withColumn("__pr", F.row_number().over(probe_w))
        .filter(F.col("__pr") <= nprobe)
        .select("__qid", "__qv", cluster_col)
    )


def ivf_search_lists(
    probes: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    corpus_vec: str,
    cluster_col: str,
    k: int,
) -> DataFrame:
    """Score each query against its probed inverted lists only, then
    rank to top-k with the rounded-cosine + id tie-break (the exact tail
    of topk_cosine_ivf, exposed so a partition-pruned corpus scan can be
    substituted for the in-memory cluster filter)."""
    c = corpus.select(
        F.col(cluster_col), F.col(corpus_id).alias("__cid"), F.col(corpus_vec).alias("__cv")
    )
    scored = probes.join(c, cluster_col).select(
        "__qid",
        "__cid",
        F.round(cosine_expr(F.col("__qv"), F.col("__cv")), 5).alias("cosine"),
    )
    w = Window.partitionBy("__qid").orderBy(F.col("cosine").desc(), F.col("__cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias(corpus_id),
            "cosine",
            "rank",
        )
    )


def topk_cosine_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    cluster_col: str,
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-style ANN: a coarse quantizer (the ``cluster_col`` partition —
    a KMeans assignment, a label, or an LSH bucket) splits the corpus into
    inverted lists; each query is scored against the ``nprobe`` nearest
    cluster CENTROIDS (computed as per-cluster mean vectors), then searched
    only within those clusters.

    Scale: centroids are tiny (one row per cluster → broadcast); the
    corpus-side search joins on the cluster id, so each query touches
    nprobe/N of the corpus instead of all of it. Recall is tunable with
    ``nprobe``; exactness returns at nprobe = #clusters.

    Centroids go through DECIMAL partial sums (functions/agg.py rationale)
    so centroids — and therefore probe selection — are exact,
    partitioning-invariant, and reproducible in the DuckDB oracle; a bare
    avg(double) would drift with partial-merge order. Split into
    ivf_centroids / ivf_probes / ivf_search_lists so the persisted-layout
    variant (ivf_partitioned_search) reuses the identical ranking rules
    against a partition-pruned scan.
    """
    centroids = ivf_centroids(corpus, cluster_col, corpus_vec)
    probes = ivf_probes(queries, centroids, query_id, query_vec, cluster_col, nprobe)
    return ivf_search_lists(probes, corpus, query_id, corpus_id, corpus_vec, cluster_col, k)


def lsh_planes(num_planes: int = 8, dim: int = 64) -> list[list[float]]:
    """The deterministic ±1 hyperplanes (seeded numpy, fixed at plan
    time) — exposed so the DuckDB oracle can embed the IDENTICAL plane
    literals and replay the same buckets."""
    import numpy as np  # driver-side only

    return [
        [
            float(x)
            for x in np.random.default_rng(seed=1000 + j).choice(
                [-1.0, 1.0], size=dim
            )
        ]
        for j in range(num_planes)
    ]


def hyperplane_lsh_bucket_expr(vec_col: str, num_planes: int = 8, dim: int = 64):
    """Deterministic random-hyperplane LSH bucket id for a vector column.

    Plane j is a pseudo-random ±1 vector (``lsh_planes``), fixed at plan
    time, identical across runs and executors. Bucket = sign-bit string of
    the ``num_planes`` dot products. All JVM-side.
    """
    planes = lsh_planes(num_planes, dim)
    bucket = F.lit(0).cast("long")
    for j in range(num_planes):
        plane = planes[j]
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(p) for p in plane]),
                lambda x, p: x.cast("double") * p,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket.bitwiseOR(
            F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(F.lit(0).cast("long"))
        )
    return bucket


def topk_cosine_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    k: int = 5,
    num_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: only same-LSH-bucket pairs are scored.

    The corpus is bucketed once (a narrow long column); the equi-join on
    bucket replaces the crossJoin — the 100 TB path. Recall is tunable via
    ``num_planes`` (fewer planes → bigger buckets → higher recall).
    """
    bexpr_q = hyperplane_lsh_bucket_expr(query_vec, num_planes, dim)
    bexpr_c = hyperplane_lsh_bucket_expr(corpus_vec, num_planes, dim)
    q = queries.select(
        F.col(query_id).alias("__qid"), F.col(query_vec).alias("__qv"), bexpr_q.alias("__b")
    )
    c = corpus.select(
        F.col(corpus_id).alias("__cid"), F.col(corpus_vec).alias("__cv"), bexpr_c.alias("__b")
    )
    scored = q.join(c, "__b").select(
        "__qid",
        "__cid",
        F.round(cosine_expr(F.col("__qv"), F.col("__cv")), 5).alias("cosine"),
    )
    w = Window.partitionBy("__qid").orderBy(F.col("cosine").desc(), F.col("__cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias(corpus_id),
            "cosine",
            "rank",
        )
    )


def merge_topk(
    partials: Sequence[DataFrame],
    query_id: str,
    corpus_id: str,
    k: int = 5,
) -> DataFrame:
    """Merge per-shard top-k result sets into the global exact top-k.

    Top-k is merge-decomposable: the global top-k per query is contained in
    the union of each shard's top-k, so incremental search sessions (cf.
    EDBT 2020 incremental top-k) never rescan old shards — score only the
    NEW shard, union its (query, id, cosine) top-k with the cached results,
    re-rank, cut at k. Inputs carry (query_id, corpus_id, cosine[, rank]);
    output re-ranks with the same rounded-score + id tie-break as
    :func:`topk_cosine_bruteforce`, so a merge of shard results is
    bit-identical to a full recompute.

    Scale: each incremental step shuffles only O(queries x k) cached rows
    plus the new shard's scores — corpus embeddings are never revisited.
    """
    from functools import reduce

    cols = [query_id, corpus_id, "cosine"]
    u = reduce(
        lambda a, b: a.unionByName(b), [p.select(*cols) for p in partials]
    )
    # shards may overlap (re-delivered ingest batch, cached top-k merged with
    # a recomputed shard): a duplicate (query, corpus) pair would occupy two
    # ranks and displace a genuine top-k row. Scores are deterministic
    # rounded values, so duplicates are exact — drop before ranking.
    u = u.dropDuplicates([query_id, corpus_id])
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id).asc()
    )
    return (
        u.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def jl_matrix(out_dim: int = 16, dim: int = 64) -> list[list[float]]:
    """Deterministic ±1 Johnson-Lindenstrauss projection matrix (seeded
    numpy, Achlioptas 2003 sign variant) — exposed so the DuckDB oracle
    can embed the identical literals."""
    import numpy as np  # driver-side only

    return [
        [
            float(x)
            for x in np.random.default_rng(seed=7000 + j).choice(
                [-1.0, 1.0], size=dim
            )
        ]
        for j in range(out_dim)
    ]


def jl_project(
    df: DataFrame,
    vec_col: str,
    out_col: str = "proj",
    out_dim: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Map-only JL dimensionality reduction: out[j] = dot(v, R_j)/√k with
    a deterministic ±1 matrix. The distance-preserving (1±ε) squeeze that
    makes downstream ANN / dedup 4x cheaper per vector — the streaming,
    data-independent alternative to PCA (operators/pca.py), which needs a
    fit pass.

    The k x d matrix rides a broadcast 1-row frame (the broadcast-data
    pattern: one compiled plan regardless of matrix values, corpus
    partitioning untouched)."""
    spark = df.sparkSession
    mat = spark.createDataFrame(
        [(jl_matrix(out_dim, dim),)], "__jl array<array<double>>"
    )
    scale = float(out_dim) ** 0.5
    proj = F.transform(
        F.col("__jl"),
        lambda row: F.aggregate(
            F.zip_with(F.col(vec_col), row, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / F.lit(scale),
    )
    return df.crossJoin(F.broadcast(mat)).withColumn(out_col, proj).drop("__jl")
