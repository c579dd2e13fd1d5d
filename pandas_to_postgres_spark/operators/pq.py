"""Product Quantization (PQ) ANN — the memory-bounded tier of §2.11 D4.

Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor Search"
(TPAMI 2011): split each d-dim vector into M subvectors, quantize each
subspace against its own k-codeword codebook, and store only the M code
bytes. At d=64/M=8/k=16 that is 8 bytes per vector instead of 512 — the
64× compression that lets a 100 TB embedding corpus's index live in
executor memory while brute force (operators/similarity.py) would stream
raw vectors forever. Search is ADC (asymmetric distance computation): per
query, an M×k table of query-subvector→codeword distances is precomputed
once; a corpus row's approximate distance is then M table LOOKUPS, no
vector arithmetic at all.

Codebooks here are deterministic SAMPLES of the corpus (the k subvectors
of the md5-order-first k vectors per subspace) rather than k-means-trained
— that keeps every stage engine-reproducible and oracle-checkable while
staying a legitimate PQ instantiation (random codebooks are the standard
untrained baseline; swap in operators/kmeans.py per subspace for trained
ones, same encode/search below).

Scale shape:
- codebook: one TakeOrderedAndProject over md5(id) (k rows, tiny) → a
  1-row broadcast frame of M×k×(d/M) doubles (the broadcast-data pattern —
  BroadcastNestedLoopJoin over a single row, corpus partitioning
  untouched).
- encode: map-only nested HOF (argmin over k per subspace); the corpus
  never shuffles, output is id + M small ints.
- search: queries broadcast with their ADC tables; scoring is map-only
  table lookups over the CODES (the raw embedding column is never read at
  search time); per-query top-k via window rank on the rounded score.

Distance sums fold 8-64 doubles sequentially in both engines; scores are
grid-rounded (floor(x*10^s+0.5)/10^s, the cross-engine-deterministic form)
before ranking so FP merge noise cannot flip an order."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sq_l2(a, b):
    """Squared L2 distance between two equal-length array<double> columns,
    folded sequentially (matches DuckDB's list fold order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def pq_codebook(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
) -> DataFrame:
    """1-row frame ``pq_book: array<array<array<double>>>`` (M × k × d/M):
    subspace m's codewords are the m-th subvectors of the k corpus vectors
    that sort first by md5(id) — a deterministic sample codebook."""
    if dim % m != 0:
        raise ValueError("dim must divide into m subspaces")
    sub = dim // m
    seeds = (
        corpus.select(
            F.md5(F.col(id_col).cast("string")).alias("__h"),
            F.col(id_col).alias("__sid"),
            F.col(vec_col).alias("__v"),
        )
        .orderBy("__h", "__sid")
        .limit(k)
    )
    # seed order must survive the aggregation: carry the md5 key into the
    # collected structs and sort on it
    return seeds.agg(
        F.array_sort(F.collect_list(F.struct("__h", "__sid", "__v"))).alias("__svs")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda mi: F.transform(
                F.col("__svs"),
                lambda s: F.slice(s.getField("__v"), mi * sub + 1, sub),
            ),
        ).alias("pq_book")
    )


def pq_encode(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    book: DataFrame,
    m: int = 8,
    dim: int = 64,
) -> DataFrame:
    """(id, pq_codes: array<int>) — per subspace, the 0-based index of the
    nearest codeword (squared L2; grid-rounded; first-min tie-break, same
    in both engines via array_position of the min). Map-only: the 1-row
    codebook broadcasts, the corpus never shuffles."""
    sub = dim // m
    vec = F.col(vec_col)

    def code_for(mi):
        subv = F.slice(vec, mi * sub + 1, sub)
        dists = F.transform(
            F.element_at(F.col("pq_book"), mi + 1),
            lambda cw: F.floor(_sq_l2(subv, cw) * F.lit(1e9) + F.lit(0.5)),
        )
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    return corpus.crossJoin(F.broadcast(book)).select(
        F.col(id_col),
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)), lambda mi: code_for(mi)
        ).alias("pq_codes"),
    )


def pq_search(
    queries: DataFrame,
    codes: DataFrame,
    book: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    m: int = 8,
    dim: int = 64,
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """ADC top-k: (query_id, corpus_id, adc_dist, rank), smaller distance
    = closer. Each query precomputes its M×k distance table against the
    codebook ONCE (query side is small + broadcast); corpus-side work is
    M array lookups per row over the codes — the raw vectors never load.
    Ranking uses the grid-rounded distance with corpus id tie-break."""
    sub = dim // m
    qv = F.col("__qv")
    qtab = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda mi: F.transform(
            F.element_at(F.col("pq_book"), mi + 1),
            lambda cw: _sq_l2(F.slice(qv, mi * sub + 1, sub), cw),
        ),
    )
    q = (
        queries.select(
            F.col(query_id).alias("__qid"), F.col(query_vec).alias("__qv")
        )
        .crossJoin(F.broadcast(book))
        .select("__qid", qtab.alias("__qtab"))
    )
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, mi: acc
        + F.element_at(
            F.element_at(F.col("__qtab"), mi + 1),
            F.element_at(F.col("pq_codes"), mi + 1) + 1,
        ),
    )
    p = F.lit(float(10**round_digits))
    scored = F.broadcast(q).crossJoin(
        codes.select(F.col(corpus_id).alias("__cid"), "pq_codes")
    )
    w = Window.partitionBy("__qid").orderBy(
        F.col("adc_dist").asc(), F.col("__cid").asc()
    )
    return (
        scored.select(
            "__qid",
            "__cid",
            (F.floor(adc * p + F.lit(0.5)) / p).alias("adc_dist"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias(corpus_id),
            "adc_dist",
            "rank",
        )
    )
