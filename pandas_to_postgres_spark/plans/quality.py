"""Corpus-quality, behavior-analytics, and corpus-infrastructure queries
(round 3 batch). Operators a training-data pipeline runs constantly, each
with a DuckDB oracle twin where SQL-expressible:

- ``token_entropy_docs`` — per-document token Shannon entropy + type-token
  ratio (the Gopher-style repetitiveness signal), computed MAP-ONLY via a
  higher-order fold over the sorted token array: no explode, no shuffle
  before the final top-k.
- ``event_transitions`` — first-order Markov transition matrix over the
  event stream (behavior modeling / anomaly baselines).
- ``embedding_outliers`` — distance-to-label-centroid outlier mining over
  the embedding table (mislabel / contamination detection for curated
  embedding sets).
- ``equidepth_histogram`` — exact-percentile equi-depth (equal-frequency)
  histogram, the equi-width twin of ``histogram_totalprice``.
- ``pca_embeddings`` — whitened PCA summary (operators/pca.py).
- ``mixture_gini`` — per-language source-balance Gini audit.
- ``inverted_index`` — token → posting-list build (retrieval index).
- ``negative_pairs`` — deterministic bucketed negative sampling for
  contrastive training.

All floating aggregation goes through DECIMAL partial sums
(``functions/agg.py`` rationale) so results are bit-identical across
engines, partition counts, and reruns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pandas_to_postgres_spark.functions.agg import grid_round
from pandas_to_postgres_spark.functions.text import tokens_expr
from pandas_to_postgres_spark.plans.registry import register
from pandas_to_postgres_spark.sources.parquet import load_table

#: DuckDB twin of ``tokens_expr(F.lower(col))`` (see plans/analytics.py).
_TOKS = "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> '')"

# Per-run decimal term and accumulator types for the entropy fold. The
# accumulator precision leaves headroom so `acc + term` (which Spark types
# one precision digit wider) casts back EXACTLY — at decimal(38,_) the
# widened addition would instead drop a scale digit and break bitwise
# parity with the oracle's decimal sum.
_DEC_TERM = "decimal(18,10)"
_DEC_ACC = "decimal(27,10)"


@register(
    "token_entropy_docs",
    oracle=f"""
    WITH tokd AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    u AS (SELECT doc_id, unnest(tk) AS w FROM tokd WHERE len(tk) >= 1),
    g AS (SELECT doc_id, w, count(*) AS c FROM u GROUP BY doc_id, w),
    e AS (SELECT doc_id,
                 CAST(sum(c) AS BIGINT) AS n_tokens,
                 count(*) AS n_distinct,
                 sum(CAST(c * log2(c) AS DECIMAL(18,10))) AS s
          FROM g GROUP BY doc_id)
    SELECT doc_id, n_tokens, n_distinct,
           round(log2(n_tokens) - CAST(s AS DOUBLE) / n_tokens, 4) AS entropy,
           round(CAST(n_distinct AS DOUBLE) / n_tokens, 4) AS ttr
    FROM e
    ORDER BY entropy, doc_id
    LIMIT 50
    """,
)
def token_entropy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token Shannon entropy and type-token ratio; the 50
    most repetitive (lowest-entropy) documents — the Gopher/C4-style
    "repetition" quality signal used to drop boilerplate and spam.

    Scale: a document's tokens already live in ONE array cell, so the
    count-by-token step needs no explode and no shuffle — a higher-order
    ``aggregate`` folds the SORTED token array through run-length state
    (prev token, run length, decimal sum of c*log2(c), distinct count),
    making the whole entropy computation a map-only projection; the only
    cluster operation is the final TakeOrderedAndProject top-50
    (plan-asserted in tests/test_plans.py). The oracle takes the
    relational route (unnest → two GROUP BYs) — both sum the same
    per-count decimal terms, and decimal addition is order-independent,
    so the engines agree bitwise before the final round.
    """
    d = load_table(spark, sf_dir, "documents")
    tk = F.array_sort(tokens_expr(F.lower(F.col("text"))))
    zero_term = F.lit(0).cast(_DEC_TERM)
    zero_acc = F.lit(0).cast(_DEC_ACC)

    def runterm(r):
        # r * log2(r) as decimal; r == 0 contributes 0 (guards 0*log2(0)=NaN)
        rd = r.cast("double")
        return F.when(r > 0, (rd * F.log2(rd)).cast(_DEC_TERM)).otherwise(zero_term)

    def add(acc_s, r):
        # cast the widened sum back to the accumulator type (exact: see _DEC_ACC)
        return (acc_s + runterm(r)).cast(_DEC_ACC)

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        zero_acc.alias("s"),
        F.lit(0).cast("long").alias("d"),
    )

    def step(acc, x):
        same = acc["prev"].eqNullSafe(x)
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(same, acc["s"]).otherwise(add(acc["s"], acc["run"])).alias("s"),
            F.when(same, acc["d"]).otherwise(acc["d"] + 1).alias("d"),
        )

    def finish(acc):
        return F.struct(add(acc["s"], acc["run"]).alias("s"), acc["d"].alias("d"))

    st = F.aggregate(tk, init, step, finish)
    n = F.size(tk)
    per = (
        d.select(
            "doc_id",
            n.cast("long").alias("n_tokens"),
            st.alias("__st"),
        )
        .filter(F.col("n_tokens") >= 1)
        .select(
            "doc_id",
            "n_tokens",
            F.col("__st.d").alias("n_distinct"),
            F.round(
                F.log2(F.col("n_tokens").cast("double"))
                - F.col("__st.s").cast("double") / F.col("n_tokens"),
                4,
            ).alias("entropy"),
            F.round(F.col("__st.d").cast("double") / F.col("n_tokens"), 4).alias(
                "ttr"
            ),
        )
    )
    return per.orderBy("entropy", "doc_id").limit(50)


@register(
    "event_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events),
    c AS (SELECT prev_type, event_type, count(*) AS n_trans
          FROM seq WHERE prev_type IS NOT NULL
          GROUP BY prev_type, event_type)
    SELECT prev_type, event_type, n_trans,
           round(CAST(n_trans AS DOUBLE)
                 / CAST(sum(n_trans) OVER (PARTITION BY prev_type) AS DOUBLE),
                 4) AS p
    FROM c
    """,
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the event stream:
    count and conditional probability of event_type B directly following
    A for the same user — the baseline model for session simulation and
    sequence-anomaly detection.

    Scale: ONE shuffle (user_id) feeds the lag window; the transition
    count is a map-side-combinable aggregate whose cardinality is
    |event_type|^2 (tiny), so the row-normalizing window runs over a
    dimension-sized frame. Ties in ts break on event_id, so the lag
    sequence — and therefore every count — is deterministic.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .filter(F.col("prev_type").isNotNull())
    )
    counts = pairs.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n_trans")
    )
    wp = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "event_type",
        "n_trans",
        F.round(
            F.col("n_trans").cast("double")
            / F.sum("n_trans").over(wp).cast("double"),
            4,
        ).alias("p"),
    )


@register(
    "embedding_outliers",
    oracle="""
    WITH dv AS (SELECT vec_id, label,
                       generate_subscripts(embedding, 1) AS i,
                       CAST(unnest(embedding) AS DOUBLE) AS x
                FROM embeddings),
    cent AS (SELECT label, i,
                    CAST(sum(CAST(x AS DECIMAL(25,10))) AS DOUBLE) / count(*) AS c
             FROM dv GROUP BY label, i),
    d AS (SELECT dv.vec_id, dv.label,
                 round(sqrt(CAST(sum(CAST((dv.x - cent.c) * (dv.x - cent.c)
                                          AS DECIMAL(20,12))) AS DOUBLE)), 4)
                   AS dist
          FROM dv JOIN cent ON cent.label = dv.label AND cent.i = dv.i
          GROUP BY dv.vec_id, dv.label),
    r AS (SELECT label, vec_id, dist,
                 row_number() OVER (PARTITION BY label
                                    ORDER BY dist DESC, vec_id) AS rk
          FROM d)
    SELECT label, vec_id, dist FROM r WHERE rk <= 5
    """,
)
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-to-centroid outlier mining: the 5 vectors farthest from
    their label's mean embedding, per label — the standard first pass for
    mislabeled / contaminated examples in a curated embedding set.

    Scale: the centroid aggregate shuffles (label, dim)-keyed partial
    sums (map-side combinable, output = labels x dims rows); the
    centroid table then folds to one array per label and BROADCASTS, so
    the distance pass is map-only over the corpus — ``zip_with`` squares
    the per-dimension deltas into decimals, ``aggregate`` folds them in
    array order. The top-5-per-label rank applies a partial
    WindowGroupLimit BEFORE its exchange (plan-asserted), so the one
    corpus-side shuffle carries ≤ 5 x labels rows per input partition,
    not the corpus. Decimal partial sums make
    both the centroid and the distance bit-identical to the oracle's
    relational computation regardless of summation order.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    per_dim = (
        emb.select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(
            F.sum(F.col("x").cast("double").cast("decimal(25,10)")).alias("sx"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            "label",
            "pos",
            (F.col("sx").cast("double") / F.col("cnt")).alias("c"),
        )
    )
    cvec = (
        per_dim.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select("label", F.transform("pc", lambda s: s["c"]).alias("cvec"))
    )
    sq = F.zip_with(
        F.col("embedding"),
        F.col("cvec"),
        lambda x, c: (
            (x.cast("double") - c) * (x.cast("double") - c)
        ).cast("decimal(20,12)"),
    )
    # accumulator precision leaves headroom so `a + b` casts back exactly
    # (at decimal(38,_) the widened addition drops a scale digit instead)
    d2 = F.aggregate(
        sq,
        F.lit(0).cast("decimal(32,12)"),
        lambda a, b: (a + b).cast("decimal(32,12)"),
    )
    w = Window.partitionBy("label").orderBy(F.col("dist").desc(), "vec_id")
    return (
        emb.join(F.broadcast(cvec), "label")
        .select(
            "label",
            "vec_id",
            F.round(F.sqrt(d2.cast("double")), 4).alias("dist"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("label", "vec_id", "dist")
    )


@register(
    "equidepth_histogram",
    oracle="""
    WITH edges AS (
      SELECT list_transform(
               quantile_cont(o_totalprice, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
               e -> round(e, 4)) AS ed
      FROM orders)
    SELECT len(list_filter(ed, e -> o_totalprice > e)) AS bin,
           count(*) AS n_orders,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders, edges
    GROUP BY bin
    """,
)
def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-frequency) histogram of order totals: exact
    decile edges, then per-bin count and range — the equi-width twin of
    ``histogram_totalprice`` and the shape optimizers use for selectivity
    estimation.

    Scale: pass 1 computes the 9 edges as ONE 1-row aggregate (exact
    ``percentile`` here so the oracle can reproduce the edges bitwise —
    at 100 TB swap in ``approx_percentile``, the binning pass is
    unchanged); the 1-row edge array rides a broadcast nested-loop join
    onto the scan, bin assignment is a map-only higher-order filter
    (count of edges below the value), and the per-bin rollup is a
    map-side-combinable aggregate over ≤10 groups. Edges are rounded to
    4dp in BOTH engines before comparison so the strict ``>`` binning
    predicate agrees bitwise.
    """
    o = load_table(spark, sf_dir, "orders")
    edges = o.agg(
        F.transform(
            F.percentile(
                F.col("o_totalprice"),
                F.lit([i / 10.0 for i in range(1, 10)]),
            ),
            lambda e: F.round(e, 4),
        ).alias("ed")
    )
    binned = o.join(F.broadcast(edges)).select(
        "o_totalprice",
        F.size(
            F.filter(F.col("ed"), lambda e: F.col("o_totalprice") > e)
        ).alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@register("pca_embeddings", oracle=None)  # eigendecomposition: no SQL twin
def pca_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitened PCA of the embedding corpus (k=8), summarized per label:
    vector count and the mean of the first two whitened components —
    the dimensionality-reduction front end for SemDeDup k-means and ANN
    (distances drop from d to k multiplies after projection).

    Scale: the fit is ONE mapInPandas pass of per-batch sufficient
    statistics (d + d^2 doubles per partition to the driver, independent
    of corpus size) + a driver-side d x d eigensolve; the projection is a
    second map-only mapInPandas with the (k x d) matrix as a closure
    constant — the corpus never shuffles until the tiny per-label rollup.
    No SQL oracle (eigendecomposition is not SQL-expressible); pytest
    cross-checks the model against full-batch numpy PCA and asserts the
    whitened covariance is ~identity (tests/test_operators.py).
    """
    from pandas_to_postgres_spark.functions.agg import davg
    from pandas_to_postgres_spark.operators.pca import pca_fit_transform

    emb = load_table(spark, sf_dir, "embeddings")
    pcs = pca_fit_transform(emb, "embedding", k=8, whiten=True)
    return pcs.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        davg(F.col("pc")[0], 3).alias("pc0_mean"),
        davg(F.col("pc")[1], 3).alias("pc1_mean"),
    )


@register(
    "mixture_gini",
    oracle="""
    WITH s AS (SELECT lang, source, CAST(sum(n_chars) AS BIGINT) AS chars
               FROM documents GROUP BY lang, source),
    r AS (SELECT lang, chars,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY chars, source) AS i,
                 count(*) OVER (PARTITION BY lang) AS n
          FROM s)
    SELECT lang,
           CAST(max(n) AS BIGINT) AS n_sources,
           CAST(sum(chars) AS BIGINT) AS total_chars,
           round(CAST(sum((2 * i - n - 1) * chars) AS DOUBLE)
                 / (CAST(max(n) AS DOUBLE) * CAST(sum(chars) AS DOUBLE)),
                 4) AS gini
    FROM r GROUP BY lang
    """,
)
def mixture_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture balance audit: the Gini coefficient of per-source
    character mass within each language (0 = perfectly balanced sources,
    ->1 = one source dominates) — the one-number skew alarm for training
    mixtures before reweighting (`mix_sources` is the fix; this is the
    detector).

    Scale: ONE map-side-combinable (lang, source) rollup shrinks the
    corpus to dimension cardinality; ranking and the Gini sum then run
    on that tiny frame. All arithmetic before the final division is
    INTEGER (sorted-rank Gini formula: sum((2i - n - 1) x_i) / (n sum x))
    so both engines agree exactly; ties in chars rank deterministically
    by source, and any tie ordering yields the same Gini (equal x under
    permuted coefficients sum identically).
    """
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("lang", "source").agg(
        F.sum(F.col("n_chars").cast("long")).alias("chars")
    )
    wi = Window.partitionBy("lang").orderBy("chars", "source")
    wn = Window.partitionBy("lang")
    r = s.select(
        "lang",
        "chars",
        F.row_number().over(wi).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return r.groupBy("lang").agg(
        F.max("n").alias("n_sources"),
        F.sum("chars").alias("total_chars"),
        F.round(
            F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("chars")).cast(
                "double"
            )
            / (F.max("n").cast("double") * F.sum("chars").cast("double")),
            4,
        ).alias("gini"),
    )


@register(
    "inverted_index",
    oracle=f"""
    WITH tokd AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    u AS (SELECT DISTINCT doc_id, unnest(tk) AS token FROM tokd),
    g AS (SELECT token, count(*) AS df FROM u GROUP BY token),
    capped AS (SELECT token, doc_id,
                      row_number() OVER (PARTITION BY token ORDER BY doc_id)
                        AS pn
               FROM u),
    p AS (SELECT token, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
            AS postings
          FROM capped WHERE pn <= 100 GROUP BY token)
    SELECT g.token, g.df, p.postings FROM g JOIN p ON p.token = g.token
    """,
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: token → document frequency + the first 100
    doc ids of its sorted posting list (comma-joined string so the value
    hash is representation-stable cross-engine). Posting-list TRUNCATION
    is the index-build skew guard: a stopword's list is capped, never
    materialized whole.

    Scale: dedup to distinct (doc, token) pairs happens inside the
    explode projection; df is a map-side-combinable count; the cap is a
    row_number window whose partial WindowGroupLimit prunes each
    partition to <= 100 rows per token BEFORE the exchange, so the
    posting collect never sees an unbounded group (the same
    pre-exchange-prune shape as `embedding_outliers`' top-5). Both
    token-keyed exchanges move bounded data: the df exchange carries
    per-partition PARTIAL counts (one row per token per partition), the
    posting exchange carries the group-limited pairs — neither ever
    ships a stopword's full posting list; the final join unites two
    vocabulary-sized frames.
    """
    d = load_table(spark, sf_dir, "documents")
    pairs = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(tokens_expr(F.lower(F.col("text"))))
        ).alias("token"),
    )
    g = pairs.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    wcap = Window.partitionBy("token").orderBy("doc_id")
    p = (
        pairs.withColumn("pn", F.row_number().over(wcap))
        .filter(F.col("pn") <= 100)
        .groupBy("token")
        .agg(
            F.array_join(F.array_sort(F.collect_list("doc_id")), ",").alias(
                "postings"
            )
        )
    )
    return g.join(p, "token").select("token", "df", "postings")


@register(
    "negative_pairs",
    oracle="""
    WITH e AS (SELECT vec_id, label,
                      substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) AS b
               FROM embeddings),
    pool AS (SELECT *, row_number() OVER (
                 PARTITION BY b ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
               AS pn
             FROM e),
    cand AS (SELECT b, vec_id AS neg_id, label AS neg_label
             FROM pool WHERE pn <= 50),
    ranked AS (
      SELECT a.vec_id AS anchor_id, c.neg_id,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY md5(CAST(a.vec_id AS VARCHAR) || '|'
                            || CAST(c.neg_id AS VARCHAR)), c.neg_id) AS rk
      FROM e a JOIN cand c ON c.b = a.b AND c.neg_label <> a.label)
    SELECT anchor_id, neg_id, rk FROM ranked WHERE rk <= 2
    """,
)
def negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for every
    anchor vector, 2 pseudo-random different-label negatives, chosen by
    md5 order so the sample is engine- and rerun-reproducible (the same
    md5-keyed determinism contract as `weighted_sample_docs` /
    `corpus_shuffle`).

    Scale: anchors and candidates meet on a 16-way md5 hash bucket — and
    the candidate pool per bucket is CAPPED at 50 by md5 rank BEFORE the
    join, so the pair space is anchors x 50, linear in the corpus (an
    uncapped bucket join would stay quadratic, just 16x smaller). The cap
    is the LSH `max_bucket` idea applied to sampling: a uniform hash pool
    is statistically interchangeable with the full bucket.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    # 16 buckets = the first hex char of the id's md5 (string-typed so the
    # bucketing expression is engine-portable verbatim)
    b = F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1)
    e = emb.select("vec_id", "label", b.alias("b"))
    wpool = Window.partitionBy("b").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    cand = (
        e.withColumn("pn", F.row_number().over(wpool))
        .filter(F.col("pn") <= 50)
        .select(
            F.col("b"),
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
        )
    )
    pairh = F.md5(
        F.concat(
            F.col("vec_id").cast("string"), F.lit("|"), F.col("neg_id").cast("string")
        )
    )
    wrk = Window.partitionBy("vec_id").orderBy(pairh, "neg_id")
    return (
        e.join(cand, "b")
        .filter(F.col("neg_label") != F.col("label"))
        .withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") <= 2)
        .select(F.col("vec_id").alias("anchor_id"), "neg_id", "rk")
    )


@register(
    "chunk_overlap_docs",
    oracle="""
    WITH n AS (SELECT doc_id, text,
                      CASE WHEN len(text) <= 200 THEN 1
                           ELSE CAST(ceil((len(text) - 200) / 150.0) AS BIGINT) + 1
                      END AS n_chunks
               FROM documents),
    w AS (SELECT doc_id, text, unnest(range(1, n_chunks + 1)) AS chunk_idx
          FROM n)
    SELECT doc_id, chunk_idx,
           substr(text, CAST((chunk_idx - 1) * 150 + 1 AS BIGINT), 200) AS chunk
    FROM w
    """,
)
def chunk_overlap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided overlap chunking of the corpus (width 200, stride 150 →
    consecutive chunks share 50 chars of context) — the retrieval /
    context-window prep shape where disjoint chunks would cut answers in
    half at boundaries; `chunk_documents` is the disjoint twin.

    Scale: a per-row generate (sequence+explode) inheriting the scan's
    partitioning — zero shuffles, output ~width/stride x the corpus
    (plan-asserted map-only).
    """
    from pandas_to_postgres_spark.functions.text import chunk_text_overlap

    d = load_table(spark, sf_dir, "documents")
    return chunk_text_overlap(d, "text", "doc_id", width=200, stride=150)


@register(
    "weighted_reservoir",
    oracle="""
    SELECT doc_id, n_chars,
           round(ln(CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)
                          AS BIGINT) AS DOUBLE) / 4503599627370496.0)
                 / greatest(CAST(n_chars AS DOUBLE), 1.0), 9) AS es_key
    FROM documents
    ORDER BY es_key DESC, doc_id
    LIMIT 200
    """,
)
def weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, Efraimidis–Spirakis (2006):
    each document draws a deterministic uniform u from its id's md5 and
    competes with key u^(1/w) (computed in the log domain: ln(u)/w); the
    top-200 keys are an exact weight-proportional sample. Complements
    `weighted_sample_docs` (Bernoulli, random SIZE) with a FIXED-size
    sample — the reservoir shape — while staying engine-reproducible:
    the uniform is the first 13 md5 hex digits over 16^13 (= 2^52, both
    exact in a double), so reruns and engines agree.

    Scale: the key is a map-only projection and the top-200 is
    TakeOrderedAndProject — no global sort, no shuffle of the corpus;
    merging per-shard top-200s gives the exact global top-200 (the
    classic distributed-reservoir merge property of ES keys).
    """
    d = load_table(spark, sf_dir, "documents")
    v = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10
    ).cast("long")
    u = v / F.lit(float(16**13))
    w = F.greatest(F.col("n_chars").cast("double"), F.lit(1.0))
    key = F.round(F.log(u) / w, 9)
    return (
        d.select("doc_id", "n_chars", key.alias("es_key"))
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(200)
    )


@register(
    "heavy_hitters_docs",
    oracle=f"""
    WITH tokd AS (SELECT {_TOKS} AS tk FROM documents),
    u AS (SELECT unnest(tk) AS item FROM tokd)
    SELECT item, CAST(count(*) AS BIGINT) AS est FROM u GROUP BY item
    """,
)
def heavy_hitters_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra–Gries heavy hitters over the token stream (capacity 64) —
    the mergeable frequent-items sketch for UNBOUNDED universes (all
    n-grams, URLs, join keys) where exact groupBy would shuffle one
    partial row per distinct item per partition. Here capacity exceeds
    the fixture's vocabulary, so the sketch degenerates to exact counts
    and the oracle is plain GROUP BY; pytest exercises the approximate
    regime (planted skew, guarantee bounds) in
    tests/test_operators.TestHeavyHitters.

    Scale: per-partition MG tables are map-only; the ONE shuffle carries
    ≤ partitions x 64 summary rows regardless of vocabulary size.
    """
    from pandas_to_postgres_spark.operators.heavy_hitters import heavy_hitters

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(tokens_expr(F.lower(F.col("text")))).alias("token")
    )
    return heavy_hitters(toks, "token", k=64)


@register("multimodal_real_decode", oracle=None)  # binary codec path: no SQL twin
def multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL (not faked) media decode through the multimodal plumbing:
    odd doc_ids synthesize a deterministic 16-bit PCM WAV payload (tone
    frequency keyed by doc_id, duration by n_chars), EVEN doc_ids a
    deterministic gradient image — PNG (doc_id % 4 == 0), PROGRESSIVE
    JPEG (doc_id % 8 == 2; SOF2, DC successive approximation + two
    spectral AC bands), a palette-quantized 2-frame ANIMATED GIF
    (doc_id % 16 == 14; real LZW + draw-over compositing), or baseline
    JPEG (the remaining doc_id % 8 == 6) — and
    `operators/media_codecs.extract_features_real` decodes the ACTUAL
    samples/pixels back out with stdlib wave/zlib + numpy, no
    PIL/ffmpeg involved. PNG is a genuinely COMPRESSED format (DEFLATE
    + scanline filters), so the decode path here is not a header
    parse; both JPEG flavors run the full pure-numpy Huffman+IDCT
    decode (`jpeg_codec`, any integer subsampling incl. 4:2:0). Only
    arithmetic/lossless JPEG and MP4 remain honestly gated behind
    NotImplementedError in the same dispatcher.

    Scale: synthesis and decode are both map-only mapInPandas stages —
    payloads are created and consumed inside the same partition, never
    shuffled; only the 5-double feature rows move. The input is
    repartitioned first (the thumbnail-pipeline rule): Python-CPU-bound
    codec work on a one-split scan ran single-task (4.7s of a 5.0s wall
    on one core at sf0.1).
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from pandas_to_postgres_spark.operators.jpeg_codec import (
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from pandas_to_postgres_spark.operators.media_codecs import (
        encode_gif,
        encode_png,
        encode_wav,
        extract_features_real,
    )

    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    payload_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("mime", T.StringType()),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, mimes = [], []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                if int(doc_id) % 2 == 0:
                    h = 8 + (int(n_chars) % 24)
                    w = 8 + (int(doc_id) % 24)
                    yy, xx = np.mgrid[0:h, 0:w]
                    rgb = np.stack(
                        [
                            (yy * 7 + int(doc_id)) % 256,
                            (xx * 11) % 256,
                            (yy + xx) % 256,
                        ],
                        axis=-1,
                    ).astype(np.uint8)
                    if int(doc_id) % 4 == 0:
                        payloads.append(encode_png(rgb))
                        mimes.append("image/png")
                    elif int(doc_id) % 8 == 2:
                        payloads.append(encode_jpeg_progressive(rgb))
                        mimes.append("image/jpeg")
                    elif int(doc_id) % 16 == 14:
                        # palette-quantized 2-frame animation: the GIF
                        # leg (LZW dictionary coding + compositing)
                        q = (rgb // 64 * 64).astype(np.uint8)
                        payloads.append(
                            encode_gif([q, np.roll(q, 2, axis=0)])
                        )
                        mimes.append("image/gif")
                    else:
                        payloads.append(encode_jpeg(rgb))
                        mimes.append("image/jpeg")
                else:
                    freq = 200.0 + (int(doc_id) % 20) * 50.0
                    n = 800 + (int(n_chars) % 800)  # 0.1-0.2 s at 8 kHz
                    t = np.arange(n) / 8000.0
                    payloads.append(
                        encode_wav(0.4 * np.sin(2 * np.pi * freq * t))
                    )
                    mimes.append("audio/wav")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime": mimes,
                }
            )

    media = d.mapInPandas(synth, schema=payload_schema)
    return extract_features_real(media)


@register("multimodal_video_frames", oracle=None)  # binary codec: no SQL twin
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling, no ffmpeg: every 10th document
    synthesizes a deterministic Motion-JPEG AVI (3-10 16x16 gradient
    frames keyed by doc_id/frame index, encoded by our own baseline
    JPEG encoder into a RIFF container), `multimodal.sample_frames`
    chunk-walks the container and emits every 2nd frame's ACTUAL JPEG
    bytes, and each sampled frame is decoded back to pixels for a
    per-frame mean-luma row. This closes the last multimodal gap the
    round-3 board listed as env-gated: the container parse, the frame
    fan-out, and the per-frame decode are all real; only non-MJPEG
    codecs (H.264 etc.) remain honestly gated.

    Scale: synthesis, container walk, and per-frame decode all happen
    map-only inside mapInPandas — payloads are created and consumed in
    the same task; the fan-out rows (doc_id, frame stats) are the only
    thing that moves. Same D5 argument as every codec query.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from pandas_to_postgres_spark.operators.jpeg_codec import decode_jpeg
    from pandas_to_postgres_spark.operators.media_codecs import (
        encode_avi_mjpeg,
    )
    from pandas_to_postgres_spark.operators.multimodal import sample_frames

    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .filter(F.col("doc_id") % 10 == 0)
        .repartition(spark.sparkContext.defaultParallelism)
    )

    media_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField(
                "media_meta",
                T.StructType([T.StructField("n_frames", T.IntegerType())]),
            ),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                n_frames = 3 + int(n_chars) % 8
                yy, xx = np.mgrid[0:16, 0:16]
                frames = [
                    np.stack(
                        [
                            (yy * 5 + int(doc_id) + fi * 11) % 256,
                            (xx * 3 + fi * 7) % 256,
                            (yy + xx + fi) % 256,
                        ],
                        axis=-1,
                    ).astype(np.uint8)
                    for fi in range(n_frames)
                ]
                payloads.append(encode_avi_mjpeg(frames))
                metas.append({"n_frames": n_frames})
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_meta": metas,
                }
            )

    media = d.mapInPandas(synth, schema=media_schema)
    frames = sample_frames(media, every_n=2)

    stat_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("mean_luma", T.DoubleType()),
        ]
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hs, ws, lumas = [], [], []
            for p in pdf["frame_payload"]:
                px = decode_jpeg(bytes(p))
                hs.append(px.shape[0])
                ws.append(px.shape[1])
                lumas.append(round(float(px.mean()), 6))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_idx": pdf["frame_idx"],
                    "h": pd.Series(hs, dtype="int32"),
                    "w": pd.Series(ws, dtype="int32"),
                    "mean_luma": lumas,
                }
            )

    return frames.mapInPandas(featurize, schema=stat_schema).orderBy(
        "doc_id", "frame_idx"
    )


@register(
    "variant_events",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_min,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_max,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum
    FROM events GROUP BY event_type
    """,
)
def variant_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type: ``parse_json`` shreds the props string into
    the binary semi-structured VariantType once, ``variant_get`` then
    extracts typed paths WITHOUT re-parsing text per access — the
    engine-native JSON answer (`json_extract_events` is the classic
    string-path twin; at many extractions per row variant wins because
    the parse happens once).

    Scale: parse + extraction are map-only projections feeding one
    map-side-combinable aggregate keyed by event_type (dimension-sized).
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.sum("k").alias("k_sum"),
        )
    )


@register(
    "collation_distinct_names",
    oracle="""
    WITH cased AS (SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_name)
                               ELSE p_name END AS name
                   FROM part)
    SELECT count(DISTINCT name) AS n_binary,
           count(DISTINCT lower(name)) AS n_ci
    FROM cased
    """,
)
def collation_distinct_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations: a deterministically mixed-case name column
    (even part keys uppercased) counted distinct under BINARY vs
    UTF8_LCASE collation — the collated count collapses case variants
    the way a linguistic/CI comparison should, without rewriting every
    predicate as lower(x) = lower(y). The oracle mirrors CI semantics
    with lower() since DuckDB's default collation is binary.

    Scale: one scan, two partial-merged distinct aggregates; collation
    comparisons stay JVM-side (no UDF). Also the reminder from
    sinks/postgres_copy's notes: server-side collations ORDER differently
    than Spark's binary codepoints — never push string inequalities to a
    collated Postgres.
    """
    p = load_table(spark, sf_dir, "part")
    name = F.when(
        F.col("p_partkey") % 2 == 0, F.upper(F.col("p_name"))
    ).otherwise(F.col("p_name"))
    cased = p.select(name.alias("name"))
    return cased.agg(
        F.count_distinct(F.col("name")).alias("n_binary"),
        F.count_distinct(F.collate(F.col("name"), "UTF8_LCASE")).alias("n_ci"),
    )


@register(
    "sql_udf_revenue",
    oracle="""
    SELECT l_returnflag,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem GROUP BY l_returnflag
    """,
)
def sql_udf_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL UDFs (CREATE FUNCTION ... RETURN <expr>): the discount
    formula is declared once as a catalog-registered SQL function and
    reused by name — unlike Python UDFs, the body INLINES into the plan
    at resolution time, so it stays inside whole-stage codegen with zero
    serialization cost (the plan is identical to writing the expression
    inline; X2-X5 cover the Python-runtime UDF tiers).

    Scale: map-only expression + one decimal-partial-summed aggregate on
    a 3-value key.
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_for_sql_udf"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(round(sum(CAST(disc_price(l_extendedprice, l_discount)
                                   AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        FROM lineitem_for_sql_udf GROUP BY l_returnflag
        """
    )


@register(
    "bloom_semi_lineitem",
    oracle="""
    SELECT l_returnflag, count(*) AS n_lines,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS sum_qty
    FROM lineitem
    WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    GROUP BY l_returnflag
    """,
)
def bloom_semi_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter runtime prefilter ahead of an exact semi-join
    (operators/bloom.py): the urgent-order keys build a 2^20-bit bitset
    (map-side bit_or partials, ONE bitmap-bounded shuffle), the 1-row
    bitmap broadcasts, and lineitem is pruned MAP-SIDE before the real
    semi-join — the explicit, reusable form of Spark's InjectRuntimeFilter
    for shapes the automatic rule misses. False positives are cleared by
    the final semi-join, so the oracle is the plain SQL semi-join.

    Scale: the semi-join's exchange carries only the pruned fraction of
    the fact (selectivity + FPR, here ~20% instead of 100%); the bitmap
    stays 1 row at ANY dim size — only num_bits grows.
    """
    from pandas_to_postgres_spark.functions.agg import dsum
    from pandas_to_postgres_spark.operators.bloom import bloom_semi_join

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = load_table(spark, sf_dir, "lineitem")
    kept = bloom_semi_join(li, orders, "l_orderkey", "o_orderkey")
    return kept.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_lines"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
    )


_TRADE_EDGES_SQL = """
    SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY c.c_nationkey, s.s_nationkey
"""


def _pagerank_nations_oracle() -> str:
    from pandas_to_postgres_spark.operators.graph import pagerank_oracle_sql

    pr = pagerank_oracle_sql(_TRADE_EDGES_SQL, damping=0.85, iterations=4)
    return f"""
    SELECT n_name, rank
    FROM ({pr}) pr JOIN nation ON pr.node = n_nationkey
    """


@register("pagerank_nations", oracle=_pagerank_nations_oracle())
def pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the nation-level trade graph (edge u→v =
    lineitems a customer in nation u bought from a supplier in nation v)
    — the iterative message-passing algorithm class, expressed as joins
    (operators/graph.py). The oracle unrolls the same 4 iterations as
    DuckDB CTEs; parity holds because transition probabilities are single
    IEEE divisions and contribution sums go through DECIMAL.

    Scale: the edge list partitions once and is reused every round; each
    iteration moves only the |V|-row rank vector (broadcast-joinable for
    dimension-sized graphs, hash-co-partitioned for billion-node ones);
    rank frames are lineage-cut per round so the plan stays O(1) in
    iteration count.
    """
    from pandas_to_postgres_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .groupBy(
            customer.c_nationkey.alias("src"), supplier.s_nationkey.alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    pr = pagerank(edges, damping=0.85, iterations=4)
    return pr.join(nation, pr.node == nation.n_nationkey).select("n_name", "rank")


#: DuckDB twin of the PQ pipeline (operators/pq.py): same md5-sampled
#: codebook, same floor-rounded encode distances, same ADC lookups.
_PQ_SQ = (
    "list_sum(list_transform(generate_series(1, 8), i -> "
    "(embedding[mi*8 + i] - cw[mi*8 + i]) * (embedding[mi*8 + i] - cw[mi*8 + i])))"
)

_PQ_ORACLE = f"""
WITH seeds AS (
  SELECT embedding AS v, md5(CAST(vec_id AS VARCHAR)) AS h, vec_id AS sid
  FROM embeddings ORDER BY h, sid LIMIT 16
),
book AS (SELECT list(v ORDER BY h, sid) AS sv FROM seeds),
codes AS (
  SELECT vec_id,
         list_transform(generate_series(0, 7), mi ->
           list_position(
             list_transform(sv, cw -> floor({_PQ_SQ} * 1e9 + 0.5)),
             list_min(list_transform(sv, cw -> floor({_PQ_SQ} * 1e9 + 0.5)))
           ) - 1
         ) AS pq_codes
  FROM embeddings, book
),
q AS (
  SELECT vec_id AS qid,
         list_transform(generate_series(0, 7), mi ->
           list_transform(sv, cw -> {_PQ_SQ})) AS qtab
  FROM embeddings, book WHERE vec_id < 5
),
scored AS (
  SELECT q.qid, c.vec_id,
         floor(list_sum(list_transform(generate_series(0, 7), mi ->
           qtab[mi + 1][c.pq_codes[mi + 1] + 1])) * 1e6 + 0.5) / 1e6 AS adc_dist
  FROM q CROSS JOIN codes c
),
ranked AS (
  SELECT qid, vec_id, adc_dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY adc_dist, vec_id)
              AS BIGINT) AS rank
  FROM scored
)
SELECT qid, vec_id, adc_dist, rank FROM ranked WHERE rank <= 5
"""


@register("simsearch_pq", oracle=_PQ_ORACLE)
def simsearch_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4, memory-bounded tier: Product Quantization ANN (Jégou et al.,
    TPAMI 2011; operators/pq.py). The corpus is encoded to 8 one-byte
    codes (64x smaller than the raw 64-dim doubles); queries precompute
    an 8x16 ADC distance table and score corpus rows with table LOOKUPS
    only — the raw embedding column is never read at search time. The
    deterministic md5-sampled codebook makes every stage (encode argmin,
    ADC sums) bit-reproducible, so the WHOLE pipeline oracle-checks
    against the DuckDB twin — unlike the engine-pruned IVF/LSH tiers
    (rows-only), this ANN variant is value-verified.

    Scale: codebook + encode are map-only over a broadcast 1-row book;
    search scans codes (8 B/row) instead of vectors (512 B/row); ranking
    is a per-query window over the rounded distance.
    """
    from pandas_to_postgres_spark.operators.pq import (
        pq_codebook,
        pq_encode,
        pq_search,
    )

    e = load_table(spark, sf_dir, "embeddings")
    book = pq_codebook(e, "vec_id", "embedding")
    codes = pq_encode(e, "vec_id", "embedding", book)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = pq_search(q, codes, book, "qid", "vec_id", "qvec")
    return out.withColumn("rank", F.col("rank").cast("long"))


def _pq_trained_oracle(m: int = 8, k: int = 16, sub: int = 8,
                       iters: int = 2) -> str:
    """DuckDB twin of the FULL trained-PQ pipeline with the per-subspace
    Lloyd iterations unrolled as CTEs — same discipline as
    `_semdedup_oracle`: md5-sampled init, grid-floored argmin assignment
    (first-min ties), DECIMAL(28,12) per-dimension codeword means with
    empty-codeword fallback to the previous book, then ADC search with
    the trained book. Every stage is deterministic, so even the trained
    variant is value-checked, not rows-only."""

    def sqd(cw: str) -> str:
        # codewords are DOUBLE after training; embedding floats widen
        # exactly — both engines run the identical double fold
        return (f"list_sum(list_transform(generate_series(1, {sub}), i -> "
                f"(CAST(embedding[mi*{sub} + i] AS DOUBLE) - {cw}[i])"
                f" * (CAST(embedding[mi*{sub} + i] AS DOUBLE) - {cw}[i])))")

    def codes_cte(name: str, book: str) -> str:
        g = f"floor({sqd('cw')} * 1e9 + 0.5)"
        return (f"{name} AS (SELECT vec_id, embedding, "
                f"list_transform(generate_series(0, {m - 1}), mi -> "
                f"list_position(list_transform(bk[mi + 1], cw -> {g}), "
                f"list_min(list_transform(bk[mi + 1], cw -> {g}))) - 1"
                f") AS pq_codes FROM embeddings, {book})")

    def update_cte(codes: str, prev: str, name: str) -> str:
        return (
            f"m_{name} AS (SELECT mi, c.pq_codes[mi + 1] AS code, i, "
            f"CAST(sum(CAST(embedding[mi*{sub} + i] AS DECIMAL(28,12)))"
            f" AS DOUBLE) / count(*) AS mn "
            f"FROM {codes} c, range(0, {m}) t(mi), range(1, {sub + 1}) u(i) "
            f"GROUP BY mi, code, i), "
            f"v_{name} AS (SELECT g.mi, g.code, g.i, "
            f"coalesce(s.mn, prev.bk[g.mi + 1][g.code + 1][g.i]) AS v "
            f"FROM (SELECT t.mi, c.code, u.i FROM range(0, {m}) t(mi), "
            f"range(0, {k}) c(code), range(1, {sub + 1}) u(i)) g "
            f"CROSS JOIN {prev} prev "
            f"LEFT JOIN m_{name} s ON s.mi = g.mi AND s.code = g.code"
            f" AND s.i = g.i), "
            f"{name} AS (SELECT list(cws ORDER BY mi) AS bk FROM ("
            f"SELECT mi, list(cw ORDER BY code) AS cws FROM ("
            f"SELECT mi, code, list(v ORDER BY i) AS cw FROM v_{name} "
            f"GROUP BY mi, code) GROUP BY mi))")

    parts = [
        (f"seeds AS (SELECT embedding AS v, md5(CAST(vec_id AS VARCHAR))"
         f" AS h, vec_id AS sid FROM embeddings ORDER BY h, sid LIMIT {k})"),
        "svl AS (SELECT list(v ORDER BY h, sid) AS sv FROM seeds)",
        (f"bk0 AS (SELECT list_transform(generate_series(0, {m - 1}), mi -> "
         f"list_transform(sv, cwv -> list_transform(generate_series(1, {sub}),"
         f" i -> CAST(cwv[mi*{sub} + i] AS DOUBLE)))) AS bk FROM svl)"),
    ]
    prev = "bk0"
    for t in range(1, iters + 1):
        parts.append(codes_cte(f"c{t - 1}", prev))
        parts.append(update_cte(f"c{t - 1}", prev, f"bk{t}"))
        prev = f"bk{t}"
    parts.append(codes_cte("cf", prev))
    parts.append(
        f"q AS (SELECT vec_id AS qid, "
        f"list_transform(generate_series(0, {m - 1}), mi -> "
        f"list_transform(bk[mi + 1], cw -> {sqd('cw')})) AS qtab "
        f"FROM embeddings, {prev} WHERE vec_id < 5)")
    parts.append(
        f"scored AS (SELECT q.qid, c.vec_id, "
        f"floor(list_sum(list_transform(generate_series(0, {m - 1}), mi -> "
        f"qtab[mi + 1][c.pq_codes[mi + 1] + 1])) * 1e6 + 0.5) / 1e6"
        f" AS adc_dist FROM q CROSS JOIN cf c)")
    parts.append(
        "ranked AS (SELECT qid, vec_id, adc_dist, "
        "CAST(row_number() OVER (PARTITION BY qid ORDER BY adc_dist, vec_id)"
        " AS BIGINT) AS rank FROM scored)")
    return ("WITH " + ",\n".join(parts) +
            "\nSELECT qid, vec_id, adc_dist, rank FROM ranked WHERE rank <= 5")


@register("simsearch_pq_trained", oracle=_pq_trained_oracle())
def simsearch_pq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 memory-bounded tier, TRAINED: the PQ paper's intended form —
    per-subspace Lloyd-refined codebooks (`pq_codebook_trained`, 2 fixed
    iterations from the md5-sampled init) instead of the raw sample.
    Measured recall@5 vs exact brute force at sf0.01: 0.28 (sampled) →
    0.36 (trained) on the same 20-query set; the planted-cluster pytest
    fixture shows the same ordering deterministically.

    Because the training loop is deterministic end to end (grid-floored
    argmin assignment, DECIMAL per-dimension means, empty-codeword
    fallback), the DuckDB oracle unrolls BOTH Lloyd iterations as CTEs
    and value-checks the entire train→encode→ADC-search pipeline — same
    discipline as `semantic_dedup`'s unrolled k-means.

    Scale: each training iteration is one map-only assignment pass plus
    one shuffle of at most M·k·(d/M) post-combine groups; the collect is
    the 1024-double codebook, never data. Train on a deterministic
    sample at 100 TB; encode/search are unchanged from `simsearch_pq`.
    """
    from pandas_to_postgres_spark.operators.pq import (
        pq_codebook_trained,
        pq_encode,
        pq_search,
    )

    e = load_table(spark, sf_dir, "embeddings")
    # cache: training re-scans the corpus once per iteration + encode
    e = e.select("vec_id", "embedding").cache()
    book = pq_codebook_trained(e, "vec_id", "embedding", iters=2)
    codes = pq_encode(e, "vec_id", "embedding", book)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = pq_search(q, codes, book, "qid", "vec_id", "qvec")
    return out.withColumn("rank", F.col("rank").cast("long"))


@register(
    "ols_price_qty",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             count(*) AS n,
             CAST(sum(CAST(l_quantity      AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(24,6)))
                  AS DOUBLE) AS sxy,
             CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(18,6)))
                  AS DOUBLE) AS sxx,
             CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6)))
                  AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1e8 + 0.5) / 1e8
             AS slope,
           floor((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                 * 1e8 + 0.5) / 1e8 AS intercept,
           floor(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)) * 1e8 + 0.5) / 1e8
             AS r2
    FROM s
    """,
)
def ols_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped OLS linear regression (extendedprice ~ quantity per return
    flag) via the normal equations over one map-side-combined aggregate:
    the five moment sums go through DECIMAL so they are exact and
    partitioning-invariant, and the closed-form slope/intercept/R² are
    then derived with plain IEEE arithmetic — identical expression on
    both engines, grid-rounded. No MLlib, no iteration, no collect: a
    regression over 100 TB is ONE aggregation pass at scan speed.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum(y.cast("decimal(18,6)")).cast("double").alias("sy"),
        F.sum((x * y).cast("decimal(24,6)")).cast("double").alias("sxy"),
        F.sum((x * x).cast("decimal(18,6)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(28,6)")).cast("double").alias("syy"),
    )
    n, sx, sy, sxy, sxx, syy = (
        F.col("n"), F.col("sx"), F.col("sy"),
        F.col("sxy"), F.col("sxx"), F.col("syy"),
    )
    cov_n = n * sxy - sx * sy
    var_n = n * sxx - sx * sx
    slope = cov_n / var_n

    def grid8(c):
        return grid_round(c, 8)

    return s.select(
        "l_returnflag",
        "n",
        grid8(slope).alias("slope"),
        grid8((sy - slope * sx) / n).alias("intercept"),
        grid8((cov_n * cov_n) / (var_n * (n * syy - sy * sy))).alias("r2"),
    )


@register(
    "ewma_events",
    oracle="""
    WITH L AS (
      SELECT event_id, user_id, value,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS lst
      FROM events)
    SELECT event_id, user_id, value,
           floor(
             list_sum(list_transform(lst, (x, i) -> x * pow(0.5, len(lst) - i)))
             / list_sum(list_transform(lst, (x, i) -> pow(0.5, len(lst) - i)))
             * 1e8 + 0.5) / 1e8 AS ewma
    FROM L
    """,
)
def ewma_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of event values per user
    (trailing 10-row frame, pandas ewm adjust=True semantics: weighted
    mean with w_i = (1-a)^lag). a = 0.5 on purpose: every weight is an
    exact power of two, so the per-term scalings are EXACT in IEEE
    arithmetic and only the final 10-term sums carry rounding — which the
    1e-8 grid round absorbs identically on both engines.

    Scale: one window shuffle on user_id (the same exchange the lag/lead
    family already pays); the fold is a map-only HOF over a bounded
    10-element frame — no second pass, no Python.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, 0)
    )
    e = load_table(spark, sf_dir, "events")
    lst = F.col("lst")
    n = F.size(lst)
    num = F.aggregate(
        F.transform(lst, lambda x, i: x * F.pow(F.lit(0.5), n - 1 - i)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    den = F.aggregate(
        F.transform(lst, lambda x, i: F.pow(F.lit(0.5), (n - 1 - i).cast("double"))),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    return (
        e.withColumn("lst", F.collect_list("value").over(w))
        .select(
            "event_id",
            "user_id",
            "value",
            (F.floor(num / den * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8)).alias(
                "ewma"
            ),
        )
    )


@register(
    "argmax_per_segment",
    oracle="""
    SELECT c_mktsegment,
           arg_max(o_orderkey,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * 100000000
                   + o_orderkey) AS top_order,
           arg_min(o_orderkey,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * 100000000
                   + o_orderkey) AS bottom_order,
           CAST(round(max(o_totalprice), 2) AS DOUBLE) AS top_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def argmax_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax-as-AGGREGATE (max_by/min_by): the priciest and cheapest
    order per market segment WITHOUT a window — at scale the rank-window
    formulation materializes and sorts every group, while max_by is a
    map-side-combinable aggregate carrying one candidate per partition
    per group. Ties are impossible by construction: the ordering key is
    the composite cents*1e8 + orderkey (floor(x*100+0.5) avoids the
    cast-truncate-vs-round engine divergence; the 1e8 spacing assumes
    orderkeys below 1e8 — switch to a zero-padded string key beyond
    that).

    Scale: one broadcast-joinable dim join + one 5-group aggregate; no
    Exchange carries more than partial per-group candidates.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    key = (
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        * F.lit(100000000)
        + F.col("o_orderkey")
    )
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.max_by("o_orderkey", key).alias("top_order"),
            F.min_by("o_orderkey", key).alias("bottom_order"),
            F.round(F.max("o_totalprice"), 2).cast("double").alias("top_price"),
        )
    )


@register(
    "ansi_safe_math",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_rows,
           CAST(count(TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN o_orderpriority
                                    ELSE substr(o_orderpriority, 1, 1) END
                               AS BIGINT)) AS BIGINT) AS n_parsed,
           CAST(sum(TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN o_orderpriority
                                  ELSE substr(o_orderpriority, 1, 1) END
                             AS BIGINT)) AS BIGINT) AS prio_sum,
           CAST(sum(CASE WHEN o_orderkey % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_div_null,
           CAST(round(sum(CAST(o_totalprice / nullif(o_orderkey % 5, 0)
                               AS DECIMAL(18,6))), 2) AS DOUBLE) AS safe_div_sum
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def ansi_safe_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 runs ANSI mode by default: a bad cast or division by zero
    is a runtime ERROR mid-job — at 100 TB that is hours of work lost to
    one malformed row. The try_* family (try_cast/try_divide) is the
    per-expression opt-out that keeps ANSI's integrity everywhere else
    while mapping failures to NULL exactly where dirty input is expected.
    The oracle mirrors with TRY_CAST and nullif-guarded division.

    Scale: map-only expressions + one small-key aggregate; no error
    handling path, no row-level Python.
    """
    orders = load_table(spark, sf_dir, "orders")
    raw = F.when(
        F.col("o_orderkey") % 3 == 0, F.col("o_orderpriority")
    ).otherwise(F.substring(F.col("o_orderpriority"), 1, 1))
    parsed = raw.try_cast("bigint")
    div = F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 5)
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(parsed).alias("n_parsed"),
        F.sum(parsed).alias("prio_sum"),
        F.sum(F.when(F.col("o_orderkey") % 5 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_div_null"),
        F.round(F.sum(div.cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("safe_div_sum"),
    )


@register(
    "grouped_split_events",
    oracle="""
    SELECT CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2)
                     AS INT) < 205
                THEN 'train' ELSE 'test' END AS split,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events GROUP BY 1
    """,
)
def grouped_split_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe GROUP-level split: the unit of assignment is the
    user, not the row, so every event of a user lands in the same side —
    the split a model evaluated on held-out USERS needs (`train_test_split`
    is the row-level variant). Assignment hashes the group key (first md5
    byte < 205 ≈ 80/20): membership is a pure function of the key, so
    reruns, engines, and NEW events of an existing user all agree —
    id-modulo would instead inherit any structure in id assignment.

    Scale: map-only split column + one aggregate; the distinct-user count
    is the only shuffle-heavy part and is partial-aggregated per split.
    """
    e = load_table(spark, sf_dir, "events")
    byte0 = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    split = F.when(byte0 < 205, "train").otherwise("test")
    return e.groupBy(split.alias("split")).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "robust_outliers_events",
    oracle="""
    WITH med AS (
      SELECT event_type, percentile_cont(0.5) WITHIN GROUP (ORDER BY value)
                 AS med
      FROM events GROUP BY event_type),
    mad AS (
      SELECT e.event_type,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY abs(e.value - m.med))
                 AS mad
      FROM events e JOIN med m ON e.event_type = m.event_type
      GROUP BY e.event_type)
    SELECT e.event_type,
           floor(m.med * 1e6 + 0.5) / 1e6 AS med,
           floor(d.mad * 1e6 + 0.5) / 1e6 AS mad,
           CAST(sum(CASE WHEN 0.6745 * abs(e.value - m.med) / d.mad > 3.5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e
    JOIN med m ON e.event_type = m.event_type
    JOIN mad d ON e.event_type = d.event_type
    GROUP BY e.event_type, m.med, d.mad
    """,
)
def robust_outliers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier mining per event type: the classic
    modified z-score 0.6745·|x−med|/MAD > 3.5 — unlike mean/stddev
    z-scores (grouped_map_zscore), a heavy-tailed burst can't drag the
    threshold because median and MAD have 50% breakdown points. Exact
    medians on both engines (interpolation parity already proven by
    percentiles_price); the outlier comparison runs on identical doubles
    so no rounding is needed there, only on the reported med/MAD.

    Scale: two small per-type aggregates, each broadcast back — the wide
    events scan is read twice but never shuffled on rows (percentile agg
    shuffles per-type partials only).
    """
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    j = e.join(F.broadcast(med), "event_type")
    mad = j.groupBy("event_type").agg(
        F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias(
            "mad"
        )
    )
    j2 = j.join(F.broadcast(mad), "event_type")
    flag = (
        F.lit(0.6745) * F.abs(F.col("value") - F.col("med")) / F.col("mad")
        > 3.5
    )

    def grid6(c):
        return grid_round(c, 6)

    return j2.groupBy("event_type", "med", "mad").agg(
        F.sum(F.when(flag, 1).otherwise(0)).cast("long").alias("n_outliers")
    ).select(
        "event_type",
        grid6(F.col("med")).alias("med"),
        grid6(F.col("mad")).alias("mad"),
        "n_outliers",
    )


@register(
    "bitmap_audience_overlap",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'purchase' AND value > 18),
    b AS (SELECT DISTINCT user_id FROM events
          WHERE event_type = 'click' AND value > 18),
    u AS (SELECT user_id FROM a UNION SELECT user_id FROM b)
    SELECT (SELECT count(*) FROM a) AS n_purchasers,
           (SELECT count(*) FROM b) AS n_clickers,
           (SELECT count(*) FROM u) AS n_union,
           CAST((SELECT count(*) FROM a) + (SELECT count(*) FROM b)
                - (SELECT count(*) FROM u) AS BIGINT) AS n_both
    """,
)
def bitmap_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience set algebra with Spark 3.5+ BITMAP aggregates: high-value
    purchasers vs high-value clickers, their union, and their overlap via
    inclusion-exclusion — computed entirely on per-bucket roaring-style
    bitmaps (`bitmap_bucket_number`/`bitmap_bit_position` shard the id
    space into 32768-bit buckets, `bitmap_construct_agg` builds each
    bucket map-side, `bitmap_count`/`bitmap_or_agg` do cardinality and
    union WITHOUT touching ids again).

    Scale: count-distinct becomes a shuffle of ≤ one 4 KB bitmap per
    bucket per audience instead of one row per distinct id, and
    precomputed audience bitmaps answer overlap/union queries in
    O(buckets) — the precomputed-audience pattern ad-tech engines use.
    The oracle is plain DISTINCT set algebra.
    """
    e = load_table(spark, sf_dir, "events")

    def audience(ev_type):
        return (
            e.filter((F.col("event_type") == ev_type) & (F.col("value") > 18))
            .select(
                F.lit(ev_type).alias("aud"),
                F.bitmap_bucket_number(F.col("user_id")).alias("bkt"),
                F.bitmap_bit_position(F.col("user_id")).alias("pos"),
            )
        )

    per_bucket = (
        audience("purchase")
        .unionByName(audience("click"))
        .groupBy("aud", "bkt")
        .agg(F.bitmap_construct_agg("pos").alias("bm"))
    )
    counts = per_bucket.groupBy("aud").agg(
        F.sum(F.bitmap_count("bm")).alias("n")
    )
    union_n = (
        per_bucket.groupBy("bkt")
        .agg(F.bitmap_or_agg("bm").alias("u"))
        .agg(F.sum(F.bitmap_count("u")).alias("n_union"))
    )
    wide = counts.groupBy().pivot("aud", ["purchase", "click"]).sum("n")
    return wide.crossJoin(union_n).select(
        F.col("purchase").alias("n_purchasers"),
        F.col("click").alias("n_clickers"),
        F.col("n_union"),
        (F.col("purchase") + F.col("click") - F.col("n_union")).alias("n_both"),
    )


_SIMHASH_ORACLE = f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 300
      UNION ALL
      SELECT doc_id + 1000000, regexp_replace(text, '\\s+\\S+$', '')
      FROM documents WHERE doc_id < 300),
    tok AS (SELECT doc_id, unnest({_TOKS}) AS tk FROM corpus),
    h AS (SELECT doc_id,
                 CAST('0x' || substr(md5(tk), 1, 15) AS BIGINT) AS hv
          FROM tok),
    votes AS (
      SELECT doc_id, b.b,
             sum(((hv >> b.b) & 1) * 2 - 1) AS v
      FROM h, range(0, 60) b(b) GROUP BY doc_id, b.b),
    fp AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b)
                           ELSE 0 END) AS BIGINT) AS f
      FROM votes GROUP BY doc_id),
    bands AS (
      SELECT doc_id, f, j.j, (f >> (15 * j.j)) & 32767 AS band
      FROM fp, range(0, 4) j(j)),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                      a.f AS fa, b.f AS fb
      FROM bands a JOIN bands b
        ON a.j = b.j AND a.band = b.band AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(fa, fb)) <= 3
    """


@register("simhash_hamming_pairs", oracle=_SIMHASH_ORACLE)
def simhash_hamming_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manku-style SimHash near-dup detection (WWW'07), value-checked:
    md5-basis 60-bit fingerprints (oracle-replayable, unlike the
    xxhash64 throughput variant `simhash_docs`), 4x15-bit bands with the
    pigeonhole recall guarantee (Hamming <= 3 implies an exact match on
    >= 1 band), bit_count-xor verification. Demonstrated on documents ∪
    perturbed twins (last word dropped) so planted near-identical
    fingerprints exist at every scale factor.

    Scale: fingerprints are map-only; candidates come from an equi-join
    on (band_idx, band_value) — pair space bounded by band buckets,
    never |corpus|²; widen bands as the corpus grows.
    """
    from pandas_to_postgres_spark.operators.dedup import simhash_hamming_pairs

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select("doc_id", "text")
    )
    perturbed = d.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.regexp_replace(F.col("text"), r"\s+\S+$", "").alias("text"),
    )
    corpus = d.unionByName(perturbed)
    return simhash_hamming_pairs(corpus, "text", "doc_id")


@register(
    "psi_drift_events",
    oracle="""
    WITH ref AS (SELECT least(floor(value / 50), 9) AS bin
                 FROM events WHERE event_type = 'click'),
    cur AS (SELECT least(floor(value / 50), 9) AS bin
            FROM events WHERE event_type = 'view'),
    rc AS (SELECT bin, count(*) AS c FROM ref GROUP BY bin),
    cc AS (SELECT bin, count(*) AS c FROM cur GROUP BY bin),
    tot AS (SELECT (SELECT count(*) FROM ref) AS nr,
                   (SELECT count(*) FROM cur) AS nc),
    bins AS (
      SELECT CAST(b.b AS BIGINT) AS bin,
             CAST(coalesce(rc.c, 0) + 1 AS BIGINT) AS n_ref,
             CAST(coalesce(cc.c, 0) + 1 AS BIGINT) AS n_cur
      FROM range(0, 10) b(b)
      LEFT JOIN rc ON rc.bin = b.b
      LEFT JOIN cc ON cc.bin = b.b)
    SELECT bin, n_ref, n_cur,
           floor((CAST(n_ref AS DOUBLE) / (nr + 10)
                  - CAST(n_cur AS DOUBLE) / (nc + 10))
                 * ln((CAST(n_ref AS DOUBLE) / (nr + 10))
                      / (CAST(n_cur AS DOUBLE) / (nc + 10))) * 1e8 + 0.5)
             / 1e8 AS psi_term
    FROM bins, tot
    """,
)
def psi_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two event-value distributions
    (click vs view) — the standard ML-monitoring drift score: per-bin
    term (p−q)·ln(p/q) over 10 equi-width bins with Laplace +1 smoothing
    (no empty-bin infinities); Σ terms > 0.2 is the usual retrain alarm.

    Scale: ONE scan — both sides' bin counts come from a single
    conditional aggregate, and the totals are window sums over the
    10-row bin frame (no separate count() jobs re-reading the table).
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    counts = e.select(
        "event_type",
        F.least(F.floor(F.col("value") / 50), F.lit(9)).alias("bin"),
    ).groupBy("bin").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("rc"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("cc"),
    )
    bins = (
        spark.range(10)
        .select(F.col("id").alias("bin"))
        .join(counts, "bin", "left")
        .select(
            "bin",
            (F.coalesce("rc", F.lit(0)) + 1).alias("n_ref"),
            (F.coalesce("cc", F.lit(0)) + 1).alias("n_cur"),
        )
    )
    wtot = Window.partitionBy()
    nr = F.sum(F.col("n_ref") - 1).over(wtot)
    nc = F.sum(F.col("n_cur") - 1).over(wtot)
    p = F.col("n_ref").cast("double") / (nr + 10).cast("double")
    q = F.col("n_cur").cast("double") / (nc + 10).cast("double")
    term = (p - q) * F.log(p / q)
    return bins.select(
        "bin",
        "n_ref",
        "n_cur",
        grid_round(term, 8).alias("psi_term"),
    )


@register(
    "ks_drift_events",
    oracle="""
    WITH pts AS (
      SELECT value,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c1,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c2
      FROM events WHERE event_type IN ('click', 'view') GROUP BY value),
    cum AS (
      SELECT sum(c1) OVER (ORDER BY value) AS k1,
             sum(c2) OVER (ORDER BY value) AS k2
      FROM pts),
    tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2
            FROM pts),
    sd AS (SELECT abs(CAST(k1 AS DECIMAL(38,0)) * n2
                      - CAST(k2 AS DECIMAL(38,0)) * n1) AS d
           FROM cum, tot)
    SELECT n1, n2,
           CAST(max(sd.d) AS DOUBLE) AS max_scaled_diff,
           floor(CAST(max(sd.d) AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
                 * 1e8 + 0.5) / 1e8 AS ks_stat
    FROM sd, tot GROUP BY n1, n2
    """,
)
def ks_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the click and view
    value distributions — the nonparametric drift test (PSI's binless
    sibling): D = max |ECDF₁ − ECDF₂|, with the scaled gap |k₁·n₂ − k₂·n₁|
    computed EXACTLY in DECIMAL(38,0) — a BIGINT product would overflow
    (and under ANSI default, abort the job) once n₁·n₂ exceeds 2⁶³,
    i.e. ~3e9 rows per side; decimal keeps the max exact to 10³⁸ and the
    reported double is integer-exact below 2⁵³.

    Scale note: the cumulative window runs over the post-groupBy frame —
    ONE row per distinct value, not per event (pre-round continuous data
    to fixed precision to bound it); for truly unbounded value domains
    use the bucketed offset pattern (operators/sampling.py) instead of
    the single global window.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    pts = e.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    cum = pts.select(
        F.sum("c1").over(w).alias("k1"), F.sum("c2").over(w).alias("k2")
    )
    tot = pts.agg(
        F.sum("c1").cast("long").alias("n1"), F.sum("c2").cast("long").alias("n2")
    )
    d = cum.crossJoin(F.broadcast(tot)).select(
        "n1",
        "n2",
        F.abs(
            F.col("k1").cast("decimal(38,0)") * F.col("n2")
            - F.col("k2").cast("decimal(38,0)") * F.col("n1")
        ).alias("sd"),
    )
    return d.groupBy("n1", "n2").agg(
        F.max("sd").cast("double").alias("max_scaled_diff"),
        (
            F.floor(
                F.max("sd").cast("double")
                / (F.col("n1").cast("double") * F.col("n2").cast("double"))
                * F.lit(1e8)
                + F.lit(0.5)
            )
            / F.lit(1e8)
        ).alias("ks_stat"),
    )


def _knn_oracle(num_planes: int = 4, dim: int = 64) -> str:
    """DuckDB twin of the LSH-bucketed kNN disagreement: identical plane
    literals replay the buckets, then the same rank/vote chain."""
    from pandas_to_postgres_spark.operators.similarity import lsh_planes

    planes = lsh_planes(num_planes, dim)
    terms = []
    for j, plane in enumerate(planes):
        lit = "[" + ", ".join(repr(x) for x in plane) + "]"
        terms.append(
            f"(CASE WHEN (SELECT sum(CAST(embedding[i] AS DOUBLE) * ({lit}[i])) "
            f"FROM range(1, {dim + 1}) t(i)) > 0 THEN {1 << j} ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    return f"""
    WITH buck AS (
      SELECT vec_id, label, embedding, {bucket} AS b FROM embeddings),
    capped AS (
      SELECT vec_id, label, embedding, b FROM (
        SELECT vec_id, label, embedding, b,
               row_number() OVER (PARTITION BY b ORDER BY vec_id) AS rn
        FROM buck) z WHERE rn <= 200),
    pairs AS (
      SELECT q.vec_id AS qid, q.label AS qlabel, e.vec_id AS nid,
             e.label AS nlabel,
             round((SELECT sum(CAST(q.embedding[i] AS DOUBLE)
                               * CAST(e.embedding[i] AS DOUBLE))
                    FROM range(1, 65) t(i))
                   / (sqrt((SELECT sum(CAST(q.embedding[i] AS DOUBLE)
                                       * CAST(q.embedding[i] AS DOUBLE))
                            FROM range(1, 65) t(i)))
                      * sqrt((SELECT sum(CAST(e.embedding[i] AS DOUBLE)
                                         * CAST(e.embedding[i] AS DOUBLE))
                              FROM range(1, 65) t(i)))), 5) AS cosine
      FROM buck q JOIN capped e ON q.b = e.b AND q.vec_id <> e.vec_id),
    nn AS (
      SELECT qid, qlabel, nlabel FROM (
        SELECT qid, qlabel, nlabel,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY cosine DESC, nid) AS rnk
        FROM pairs) x WHERE rnk <= 10),
    votes AS (
      SELECT qid, qlabel, nlabel, count(*) AS c
      FROM nn GROUP BY qid, qlabel, nlabel),
    win AS (
      SELECT qid, qlabel, nlabel AS knn_label, CAST(c AS BIGINT) AS n_votes
      FROM (SELECT qid, qlabel, nlabel, c,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY c DESC, nlabel) AS r
            FROM votes) y WHERE r = 1)
    SELECT qid AS vec_id, qlabel AS label, knn_label, n_votes
    FROM win WHERE knn_label <> qlabel
    """


@register("knn_label_disagreement", oracle=_knn_oracle())
def knn_label_disagreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mislabel mining by k-NN disagreement (the confident-learning
    heuristic): a vector whose nearest neighbors mostly carry a DIFFERENT
    label is a labeling-error candidate — the stronger sibling of
    centroid-distance outliers (`embedding_outliers`), since it uses
    local structure instead of one global center per class. Majority
    ties break to the smallest label; neighbor ranking uses the rounded
    cosine with id tie-break (the proven oracle-stable rule).

    Scale: candidate neighbors come from a LABEL-INDEPENDENT blocking —
    the deterministic hyperplane-LSH bucket (16 buckets here), joined as
    an equi-join, with a 200-member bucket cap (the minhash max_bucket
    pattern, deterministic by vec_id order) so the pair space is
    ≤ cap·corpus, LINEAR, however the bucket histogram skews. The exact
    all-pairs form measured 8.5x wall at 8x data; at real scale raise
    num_planes so buckets stay under the cap instead of leaning on it,
    and note the blocking can't leak the label being audited. The
    oracle replays the identical plane literals and cap.
    """
    e = load_table(spark, sf_dir, "embeddings")
    from pandas_to_postgres_spark.functions.vectors import cosine_expr
    from pandas_to_postgres_spark.operators.similarity import (
        hyperplane_lsh_bucket_expr,
    )

    bexpr = hyperplane_lsh_bucket_expr("embedding", num_planes=4, dim=64)
    # materialize: the bucket expression is an interpreted 4x64 HOF fold;
    # without the checkpoint, projection collapse inlines it into the q
    # side, the capped side, AND the cap window — the simhash lesson.
    # repartition BELOW the checkpoint: the one-split embeddings scan
    # would otherwise freeze the checkpoint at width 1 and run the fold,
    # the cap window, and the bucket pair join single-task (3.9s of a
    # 5.1s wall on one core at sf0.1 — the checkpoint-width trap,
    # SCALE.md round 6)
    buck = (
        e.repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", "label", "embedding", bexpr.alias("b"))
        .localCheckpoint(eager=False)
    )
    wb = Window.partitionBy("b").orderBy("vec_id")
    capped = (
        buck.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= 200)
        .drop("rn")
    )
    q = buck.select(
        F.col("b"),
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qv"),
    )
    c = capped.select(
        F.col("b"),
        F.col("vec_id").alias("nid"),
        F.col("label").alias("nlabel"),
        F.col("embedding").alias("nv"),
    )
    pairs = (
        q.join(c, "b")
        .filter(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "qlabel",
            "nid",
            "nlabel",
            F.round(cosine_expr(F.col("qv"), F.col("nv")), 5).alias("cosine"),
        )
    )
    wn = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid"))
    nn = pairs.withColumn("rnk", F.row_number().over(wn)).filter(
        F.col("rnk") <= 10
    )
    votes = nn.groupBy("qid", "qlabel", "nlabel").agg(
        F.count(F.lit(1)).alias("c")
    )
    wv = Window.partitionBy("qid").orderBy(F.col("c").desc(), F.col("nlabel"))
    win = (
        votes.withColumn("r", F.row_number().over(wv))
        .filter(F.col("r") == 1)
        .select(
            F.col("qid").alias("vec_id"),
            F.col("qlabel").alias("label"),
            F.col("nlabel").alias("knn_label"),
            F.col("c").cast("long").alias("n_votes"),
        )
    )
    return win.filter(F.col("knn_label") != F.col("label"))


@register(
    "auc_purchase_score",
    oracle="""
    WITH pts AS (
      SELECT value,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS p,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n
      FROM events WHERE event_type IN ('purchase', 'click') GROUP BY value),
    cum AS (
      SELECT p, n,
             coalesce(sum(n) OVER (ORDER BY value
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS n_below
      FROM pts),
    tot AS (SELECT CAST(sum(p) AS BIGINT) AS n_pos,
                   CAST(sum(n) AS BIGINT) AS n_neg FROM pts)
    SELECT n_pos, n_neg,
           CAST(sum(CAST(p AS DECIMAL(38,0)) * (2 * n_below + n)) AS DOUBLE)
               AS u2,
           floor(CAST(sum(CAST(p AS DECIMAL(38,0)) * (2 * n_below + n))
                      AS DOUBLE)
                 / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
                 * 1e8 + 0.5) / 1e8 AS auc
    FROM cum, tot GROUP BY n_pos, n_neg
    """,
)
def auc_purchase_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of the event value as a purchase-vs-click discriminator,
    via the Mann-Whitney rank identity with midrank tie handling —
    2U = Σ_v p_v·(2·negs_below + n_v) over distinct score values,
    accumulated EXACTLY in DECIMAL(38,0) (the BIGINT form would overflow
    — and under ANSI default, abort — once n_pos·n_neg exceeds 2⁶³,
    ~3e9 rows per side; see `ks_drift_events`), so the statistic is
    engine-identical before the single final division. The
    classifier-evaluation metric, computed in-engine with no sort of the
    raw events.

    Scale: one groupBy on score value, then a cumulative window over one
    row per DISTINCT score — bound it by fixed-precision rounding for
    continuous scores, or bucket offsets (operators/sampling.py) beyond
    that.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    pts = e.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("p"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("n"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    cum = pts.select(
        "p",
        "n",
        F.coalesce(F.sum("n").over(w), F.lit(0)).alias("n_below"),
    )
    tot = pts.agg(
        F.sum("p").cast("long").alias("n_pos"),
        F.sum("n").cast("long").alias("n_neg"),
    )
    u2 = F.sum(
        F.col("p").cast("decimal(38,0)") * (2 * F.col("n_below") + F.col("n"))
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n_pos", "n_neg")
        .agg(
            u2.cast("double").alias("u2"),
            (
                F.floor(
                    u2.cast("double")
                    / (
                        F.lit(2.0)
                        * F.col("n_pos").cast("double")
                        * F.col("n_neg").cast("double")
                    )
                    * F.lit(1e8)
                    + F.lit(0.5)
                )
                / F.lit(1e8)
            ).alias("auc"),
        )
    )


def _jl_oracle(out_dim: int = 16, dim: int = 64) -> str:
    """DuckDB twin of the JL projection: identical ±1 matrix literals
    (operators/similarity.jl_matrix), same /√k scaling, grid rounding."""
    from pandas_to_postgres_spark.operators.similarity import jl_matrix

    mat = jl_matrix(out_dim, dim)
    rows = " UNION ALL ".join(
        f"SELECT {j} AS j, [" + ", ".join(repr(x) for x in mat[j]) + "] AS r"
        for j in range(out_dim)
    )
    scale = repr(float(out_dim) ** 0.5)
    return f"""
    WITH mat AS ({rows}),
    proj AS (
      SELECT e.vec_id, m.j,
             (SELECT sum(CAST(e.embedding[i] AS DOUBLE) * m.r[i])
              FROM range(1, {dim + 1}) t(i)) / {scale} AS pj
      FROM embeddings e CROSS JOIN mat m),
    agg AS (
      SELECT vec_id, list(pj ORDER BY j) AS pr
      FROM proj GROUP BY vec_id),
    norms AS (
      SELECT e.vec_id,
             sqrt((SELECT sum(CAST(e.embedding[i] AS DOUBLE)
                              * CAST(e.embedding[i] AS DOUBLE))
                   FROM range(1, {dim + 1}) t(i))) AS on_
      FROM embeddings e)
    SELECT a.vec_id,
           floor(pr[1] * 1e6 + 0.5) / 1e6 AS p1,
           floor(pr[2] * 1e6 + 0.5) / 1e6 AS p2,
           floor(pr[3] * 1e6 + 0.5) / 1e6 AS p3,
           floor(pr[4] * 1e6 + 0.5) / 1e6 AS p4,
           floor(sqrt(list_sum(list_transform(pr, x -> x * x))) / n.on_
                 * 1e6 + 0.5) / 1e6 AS norm_ratio
    FROM agg a JOIN norms n ON a.vec_id = n.vec_id
    """


@register("jl_projection_check", oracle=_jl_oracle())
def jl_projection_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64→16 dims (Achlioptas ±1
    signs, /√k scaling) with a per-vector norm-preservation audit — the
    map-only, data-independent squeeze that cuts downstream ANN / dedup
    cost 4x per vector where PCA (operators/pca.py) needs a fit pass.
    norm_ratio concentrates around 1 (the JL lemma); systematic drift
    means the projection is mis-scaled.

    Scale: the k x d matrix rides a broadcast 1-row frame (one compiled
    plan, corpus partitioning untouched); everything else is per-row
    expression work.
    """
    from pandas_to_postgres_spark.operators.similarity import jl_project

    e = load_table(spark, sf_dir, "embeddings")
    pr = jl_project(e, "embedding")

    def grid6(c):
        return grid_round(c, 6)

    def sq_norm(col):
        # cast BEFORE squaring: the parquet embedding column is
        # array<float>, and float*float squares in 32-bit (1e-7 relative
        # error) where the oracle casts to DOUBLE first — measured 9e-9
        # norm_ratio divergence, enough to straddle the 1e-6 grid
        return F.aggregate(
            col,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )

    return pr.select(
        "vec_id",
        grid6(F.element_at("proj", 1)).alias("p1"),
        grid6(F.element_at("proj", 2)).alias("p2"),
        grid6(F.element_at("proj", 3)).alias("p3"),
        grid6(F.element_at("proj", 4)).alias("p4"),
        grid6(
            F.sqrt(sq_norm(F.col("proj"))) / F.sqrt(sq_norm(F.col("embedding")))
        ).alias("norm_ratio"),
    )


@register(
    "activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    grp AS (
      SELECT user_id, d,
             CAST(d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                           AS INT) AS DATE) AS anchor
      FROM days),
    runs AS (
      SELECT user_id, count(*) AS len FROM grp GROUP BY user_id, anchor),
    best AS (
      SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
             CAST(count(*) AS BIGINT) AS n_streaks
      FROM runs GROUP BY user_id)
    SELECT user_id, longest_streak, n_streaks FROM best
    """,
)
def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's longest run of CONSECUTIVE active
    days and how many distinct streaks they had — the engagement metric
    time-gap sessionization can't express (a streak survives overnight
    gaps; a session doesn't). Uses the date-minus-row_number anchor
    trick: consecutive days share an anchor, so runs become a plain
    groupBy.

    Scale: one distinct on (user, day) — days compress events ~orders of
    magnitude — then one user-keyed window and two dimension-sized
    aggregates.
    """
    e = load_table(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    runs = grp.groupBy("user_id", "anchor").agg(F.count(F.lit(1)).alias("len"))
    return runs.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest_streak"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
    )


@register(
    "basket_lift_pairs",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM ob),
    bc AS (SELECT p_brand, count(*) AS c FROM ob GROUP BY p_brand),
    pairs AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS c_ab
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY a.p_brand, b.p_brand),
    scored AS (
      SELECT p.brand_a, p.brand_b, CAST(p.c_ab AS BIGINT) AS n_both,
             floor(CAST(p.c_ab AS DOUBLE) * n.n_orders
                   / (ca.c * CAST(cb.c AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS lift
      FROM pairs p
      JOIN bc ca ON ca.p_brand = p.brand_a
      JOIN bc cb ON cb.p_brand = p.brand_b
      CROSS JOIN n)
    SELECT brand_a, brand_b, n_both, lift
    FROM scored
    ORDER BY lift DESC, brand_a, brand_b
    LIMIT 20
    """,
)
def basket_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining at the brand level: for brand
    pairs co-occurring in an order, lift = P(A∧B) / (P(A)·P(B)) — the
    classic cross-sell signal (PMI's transactional sibling:
    `pmi_collocations` does tokens-in-documents, this does
    items-in-baskets). Top 20 by lift, deterministically tie-broken.

    Scale: baskets are first reduced to DISTINCT (order, brand) rows, so
    the within-order pair join is bounded by brands-per-order (single
    digits), never lines²; brand totals are a dimension-sized aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # NOT checkpointed (r10, measured both ways): the four ob legs'
    # identical distinct exchanges are deduplicated by exchange reuse,
    # so a localCheckpoint only adds its store cost — warm 1.9-2.2 s
    # without vs 2.2-3.0 s with at sf0.1 (contrast chi2_source_lang,
    # where the repeated frame feeds BROADCAST subtrees that replan
    # instead of reusing, and the checkpoint halved the wall)
    ob = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    # basket total rides a broadcast 1-row frame — no separate driver
    # count() job re-reading the join
    n_orders_f = ob.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    bc = ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("c"))
    a = ob.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_a"))
    b = ob.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    ca = bc.select(F.col("p_brand").alias("brand_a"), F.col("c").alias("ca"))
    cb = bc.select(F.col("p_brand").alias("brand_b"), F.col("c").alias("cb"))
    lift = (
        F.col("c_ab").cast("double")
        * F.col("n_orders")
        / (F.col("ca") * F.col("cb").cast("double"))
    )
    return (
        pairs.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .crossJoin(F.broadcast(n_orders_f))
        .select(
            "brand_a",
            "brand_b",
            F.col("c_ab").cast("long").alias("n_both"),
            (F.floor(lift * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "brand_a", "brand_b")
        .limit(20)
    )


@register(
    "benford_price_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1),
    c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
    tot AS (SELECT sum(n) AS t FROM c)
    SELECT g.g AS digit,
           CAST(coalesce(c.n, 0) AS BIGINT) AS n,
           floor(CAST(coalesce(c.n, 0) AS DOUBLE) / tot.t * 1e6 + 0.5) / 1e6
               AS observed,
           floor(log10(1.0 + 1.0 / g.g) * 1e6 + 0.5) / 1e6 AS benford,
           floor(abs(CAST(coalesce(c.n, 0) AS DOUBLE) / tot.t
                     - log10(1.0 + 1.0 / g.g)) * 1e6 + 0.5) / 1e6 AS dev
    FROM range(1, 10) g(g) LEFT JOIN c ON c.digit = g.g CROSS JOIN tot
    """,
)
def benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    forensic-accounting / data-fabrication screen: naturally occurring
    multi-scale amounts follow P(d) = log10(1 + 1/d), and a synthetic or
    tampered column deviates visibly (TPC-H's uniform price generator,
    for instance, should FAIL this audit — the deviations themselves are
    the interesting output). Per-digit observed vs expected frequency
    with absolute deviation.

    Scale: one map-only digit projection + a 9-row aggregate; nothing
    else moves.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    # total = window sum over the ≤9-row digit frame: no second scan job
    total = F.sum(F.coalesce(F.col("n"), F.lit(0))).over(Window.partitionBy())

    def grid6(col):
        return grid_round(col, 6)

    digits = spark.range(1, 10).select(F.col("id").alias("digit"))
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    obs = F.coalesce(F.col("n"), F.lit(0)).cast("double") / total.cast("double")
    return (
        digits.join(c, "digit", "left")
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
            grid6(obs).alias("observed"),
            grid6(benford).alias("benford"),
            grid6(F.abs(obs - benford)).alias("dev"),
        )
    )


def _kcore_oracle(k: int = 10, rounds: int = 4, frac: float = 0.022) -> str:
    """DuckDB twin of the fixed-round k-core peel: identical rounds
    unrolled as CTEs (the pagerank/Lloyd pinned-iteration trick)."""
    parts = [
        """WITH ob AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey)""",
        """nord AS (SELECT count(DISTINCT l_orderkey) AS n FROM ob)""",
        f"""e0 AS MATERIALIZED (
      SELECT a.p_brand AS u, b.p_brand AS v
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand, nord
      GROUP BY a.p_brand, b.p_brand, nord.n
      HAVING count(*) >= {frac!r} * nord.n)""",
    ]
    prev = "e0"
    for r in range(1, rounds + 1):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT n, count(*) AS d FROM ("
            f"SELECT u AS n FROM {prev} UNION ALL SELECT v FROM {prev}) x"
            f" GROUP BY n)"
        )
        parts.append(f"a{r} AS (SELECT n FROM d{r} WHERE d >= {k})")
        parts.append(
            f"e{r} AS MATERIALIZED (SELECT e.u, e.v FROM {prev} e"
            f" JOIN a{r} x ON e.u = x.n JOIN a{r} y ON e.v = y.n)"
        )
        prev = f"e{r}"
    parts.append(
        f"fin AS (SELECT n, count(*) AS degree FROM ("
        f"SELECT u AS n FROM {prev} UNION ALL SELECT v FROM {prev}) z"
        f" GROUP BY n)"
    )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT n AS node, CAST(degree AS BIGINT) AS degree FROM fin"
        f" WHERE degree >= {k}"
    )


@register("kcore_brands", oracle=_kcore_oracle())
def kcore_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (Matula & Beck 1983) of the thresholded
    brand co-purchase graph — the fourth distributed graph algorithm
    (after connected components, PageRank, triangles): iteratively peel
    vertices with in-subgraph degree < k until the dense core remains,
    the standard community-core / influence-seed primitive. The
    registered query pins FOUR peel rounds so the DuckDB oracle unrolls
    the identical iterations; `operators/graph.kcore` runs to the
    fixpoint for in-engine use (pytest asserts the pinned form HAS
    converged on this graph, so the output here IS the true core).

    Scale: each round is one degree aggregate + two semi-joins over an
    edge list that only shrinks; survivor frames are lineage-cut per
    round.
    """
    from pandas_to_postgres_spark.operators.graph import kcore_peel

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # not checkpointed — same measured call as basket_lift_pairs (the
    # self-join sides share ob's distinct exchange via exchange reuse;
    # a checkpoint measured flat-to-slower at sf0.1)
    ob = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a = ob.select(F.col("l_orderkey"), F.col("p_brand").alias("u"))
    b = ob.select(F.col("l_orderkey"), F.col("p_brand").alias("v"))
    nord = ob.agg(F.countDistinct("l_orderkey").alias("n"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .crossJoin(F.broadcast(nord))
        # RELATIVE support threshold (2.2% of baskets) so edge density —
        # and therefore a non-degenerate peel — survives any scale factor
        .filter(F.col("c") >= F.lit(0.022) * F.col("n"))
        .select("u", "v")
    )
    out = kcore_peel(edges, k=10, rounds=4, src="u", dst="v")
    return out.select("node", F.col("degree").cast("long").alias("degree"))


@register(
    "k_anonymity_audit",
    oracle="""
    WITH cells AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(count(*) AS BIGINT) AS cell_n,
             CAST(count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT))
                  AS BIGINT) AS sens_distinct
      FROM customer GROUP BY c_nationkey, c_mktsegment)
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST(min(cell_n) AS BIGINT) AS k_anonymity,
           CAST(sum(CASE WHEN cell_n < 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS cells_below_k5,
           CAST(sum(CASE WHEN cell_n < 5 THEN cell_n ELSE 0 END) AS BIGINT)
               AS rows_at_risk_k5,
           CAST(min(sens_distinct) AS BIGINT) AS l_diversity
    FROM cells
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-release audit (Sweeney's k-anonymity + Machanavajjhala's
    l-diversity): treat (nation, market segment) as the quasi-identifier,
    the account-balance band (1000-currency floor buckets)
    as the sensitive attribute, and report the dataset's k (smallest QI
    cell — any cell below the policy threshold re-identifies its members
    by linkage), the count of sub-threshold cells with the rows at risk,
    and l (minimum distinct sensitive values per cell — a k-anonymous
    cell with one sensitive value still leaks it). The pre-release gate
    every PII-adjacent training-data export runs.

    Exactness: cell counts and the banded sensitive attribute are
    integers end to end; the band is floor(bal/1000.0) — one IEEE divide
    then floor, identical in both engines for negative balances too
    (integer DIV would truncate toward zero in Spark but floor in
    DuckDB, flipping bands for the negative-balance customers). Scale: one
    map-side-combined groupBy over the QI plus a 1-row final aggregate —
    an audit at scan cost, same shape as `dq_gate`.
    """
    c = load_table(spark, sf_dir, "customer")
    cells = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("cell_n"),
        F.countDistinct(
            F.expr("CAST(floor(c_acctbal / 1000.0) AS BIGINT)")
        )
        .cast("bigint")
        .alias("sens_distinct"),
    )
    return cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.min("cell_n").cast("bigint").alias("k_anonymity"),
        F.sum(F.when(F.col("cell_n") < 5, 1).otherwise(0))
        .cast("bigint")
        .alias("cells_below_k5"),
        F.sum(F.when(F.col("cell_n") < 5, F.col("cell_n")).otherwise(0))
        .cast("bigint")
        .alias("rows_at_risk_k5"),
        F.min("sens_distinct").cast("bigint").alias("l_diversity"),
    )


#: Winnowing parameters: token 4-grams, window 5 → any shared run of
#: >= 4+5-1 = 8 tokens is GUARANTEED to share a fingerprint (Schleimer
#: et al., SIGMOD'03, the MOSS algorithm). Fingerprints appearing in
#: more than 50 docs are boilerplate and dropped before pairing.
_WIN_K, _WIN_W, _WIN_CAP, _WIN_T = 4, 5, 50, 2

#: guarded for short docs IN the expression (empty array, not a filter):
#: a separate size(__toks) >= 4 filter gets predicate-pushed below the
#: repartition exchange, dragging the tokenizer into the one-split scan
#: stage (measured 4.4s single-core at sf0.1 — the round-7 width gate's
#: catch); the CASE stays in the projection ABOVE the exchange
_WIN_HASH_SPARK = (
    "CASE WHEN size(__toks) >= 4 THEN "
    "transform(sequence(1, size(__toks) - 3), i -> "
    "CAST(conv(substr(md5(array_join(slice(__toks, i, 4), ' ')), 1, 15), "
    "16, 10) AS BIGINT)) "
    "ELSE CAST(array() AS array<bigint>) END"
)
_WIN_HASH_DUCK = (
    "CAST(('0x' || substr(md5(array_to_string("
    "list_slice(toks, pos, pos + 3), ' ')), 1, 15)) AS BIGINT)"
)


@register(
    "winnow_copy_pairs",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents),
    posed AS (
      SELECT doc_id, toks,
             unnest(generate_series(1, len(toks) - 3)) AS pos
      FROM tok WHERE len(toks) >= 4),
    hashed AS (
      SELECT doc_id, pos, {_WIN_HASH_DUCK} AS h FROM posed),
    mins AS (
      SELECT doc_id, pos,
             count(*) OVER (PARTITION BY doc_id) AS m,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING)
                 AS fp
      FROM hashed),
    fps AS (
      SELECT DISTINCT doc_id, fp FROM mins
      WHERE pos <= greatest(m - {_WIN_W}, 0) + 1),
    kept AS (
      SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {_WIN_CAP})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS shared_fps
    FROM fps a JOIN kept USING (fp) JOIN fps b USING (fp)
    WHERE a.doc_id < b.doc_id
    GROUP BY doc_a, doc_b
    HAVING count(*) >= {_WIN_T}
    ORDER BY doc_a, doc_b
    """,
)
def winnow_copy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing copy detection (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    the MOSS algorithm): hash token 4-grams, keep the MINIMUM hash of
    every 5-hash window as the document's fingerprints, and pair
    documents sharing >= 2 fingerprints. Unlike MinHash (global
    resemblance), winnowing detects LOCAL copying — any shared run of
    >= k+w-1 = 8 tokens is guaranteed to share a fingerprint — so it
    catches partial plagiarism / quoted-passage contamination that
    whole-document similarity misses.

    Plan: the k-gram hash array is ONE HOF expression referenced once
    (posexplode), so it is computed once per doc; winnowing itself is
    RELATIONAL — a per-doc windowed min over 5 following rows — which
    keeps the expensive md5 work out of repeated-evaluation territory
    and shuffles once on doc_id. Fingerprints in > 50 docs are
    boilerplate and dropped (semi-join on an aggregate, the same
    ubiquity cap as LSH bucket caps), bounding the pair join's bucket
    width; the pair aggregate touches (doc, fp) ids only, never text.
    Cross-engine: md5 dialect hashes, integer mins, integer counts —
    zero FP anywhere.
    """
    # the md5 k-gram fold is CPU-bound per row and the documents parquet
    # arrives as ONE split at sf0.1 — without the repartition the hash
    # stage runs single-task (measured 4.0s of a 5.6s wall on one core)
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    # Winnowing is per-doc local, so the sliding-window minima compute
    # MAP-SIDE over the doc's own hash array (r11, guide §2.4 "remove
    # shuffles outright"): window i's fingerprint is
    # array_min(slice(__h, i, w)) and the per-doc fingerprint SET is one
    # array_distinct — the r10 shape instead posexploded ~240 hash rows
    # per doc into a doc_id window exchange (corpus-gram-sized shuffle +
    # sort) and collapsed the per-window duplicates with a second
    # (doc, fp) distinct exchange; both exchanges are deleted, identical
    # fingerprint sets by construction. Bound: windows start at
    # 1..max(m-w, 0)+1 = greatest(m-(w-1), 1), and a short doc's
    # min-of-available-rows window equals array_min of the short slice.
    wins = (
        f"CASE WHEN size(__h) >= 1 THEN "
        f"array_distinct(transform("
        f"sequence(1, greatest(size(__h) - {_WIN_W - 1}, 1)), "
        f"i -> array_min(slice(__h, i, {_WIN_W})))) "
        f"ELSE CAST(array() AS array<bigint>) END"
    )
    fps = (
        d.select("doc_id", tokens_expr(F.lower(F.col("text"))).alias("__toks"))
        # short docs are guarded INSIDE _WIN_HASH_SPARK (empty array) and
        # the explode is OUTER: both a size filter here and the filter
        # Catalyst infers from a non-outer explode would be pushed below
        # the repartition exchange with the whole tokenize/hash pipeline
        # in tow, re-running it on the scan's single split
        .select("doc_id", F.expr(_WIN_HASH_SPARK).alias("__h"))
        .select("doc_id", F.explode_outer(F.expr(wins)).alias("fp"))
        .filter(F.col("fp").isNotNull())  # drop outer's empty-array rows
        # three downstream references (both self-join sides + the
        # ubiquity cap) would otherwise each recompute the tokenize/
        # hash/winnow pipeline — the (id, fp) frame is tiny vs the text.
        # repartition BELOW the checkpoint: localCheckpoint freezes the
        # split count, AQE coalesces this small frame to 1 partition,
        # and the fp self-join's fan-out would then run single-task (the
        # ngram_jaccard_prefix checkpoint-width trap, SCALE.md round 6 —
        # measured 4.3s of the query's 6.1s wall on one core here)
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=False)
    )
    kept = fps.groupBy("fp").count().filter(F.col("count") <= _WIN_CAP).select("fp")
    a = fps.join(kept, "fp").select(F.col("doc_id").alias("doc_a"), "fp")
    b = fps.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_fps"))
        .filter(F.col("shared_fps") >= _WIN_T)
        .orderBy("doc_a", "doc_b")
    )


def _gram_select_duck(n: int) -> str:
    return f"""
      SELECT source, {n} AS n,
             unnest(list_transform(generate_series(1, len(toks) - {n} + 1),
                    i -> array_to_string(list_slice(toks, i, i + {n} - 1), ' ')))
                 AS gram
      FROM tok WHERE len(toks) >= {n}"""


@register(
    "ngram_diversity",
    oracle=f"""
    WITH tok AS (
      SELECT source,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents),
    grams AS ({_gram_select_duck(1)}
      UNION ALL {_gram_select_duck(2)}
      UNION ALL {_gram_select_duck(3)})
    SELECT source, n,
           CAST(count(DISTINCT gram) AS BIGINT) AS distinct_grams,
           CAST(count(*) AS BIGINT) AS total_grams,
           floor(CAST(count(DISTINCT gram) AS DOUBLE) / count(*) * 1e6 + 0.5)
               / 1e6 AS diversity
    FROM grams
    GROUP BY source, n
    ORDER BY source, n
    """,
)
def ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n diversity (the self-repetition audit used on generated
    and scraped corpora; the distinct-1/2/3 metric of Li et al. 2016):
    per source, the fraction of n-gram occurrences that are distinct for
    n = 1, 2, 3. Low distinct-3 flags templated/boilerplate sources
    worth downweighting before training.

    Scale: gram construction is one HOF per n (map-only); the aggregate
    is count-distinct per (source, n) — Spark plans it as two hash
    aggregates around the (source, n, gram) shuffle, map-side partials
    first, so no grouped gram list ever materializes. The ratio is a
    single double division (no FP accumulation)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", tokens_expr(F.lower(F.col("text"))).alias("toks")
    )
    parts = []
    for n in (1, 2, 3):
        grams = (
            toks.filter(F.size("toks") >= n)
            .select(
                "source",
                F.lit(n).alias("n"),
                F.explode(
                    F.expr(
                        f"transform(sequence(1, size(toks) - {n} + 1), "
                        f"i -> array_join(slice(toks, i, {n}), ' '))"
                    )
                ).alias("gram"),
            )
        )
        parts.append(grams)
    allg = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return (
        allg.groupBy("source", "n")
        .agg(
            F.countDistinct("gram").cast("bigint").alias("distinct_grams"),
            F.count(F.lit(1)).cast("bigint").alias("total_grams"),
        )
        .withColumn(
            "diversity",
            grid_round(
                F.col("distinct_grams").cast("double") / F.col("total_grams"), 6
            ),
        )
        .orderBy("source", "n")
    )


@register(
    "zipf_fit_tokens",
    oracle="""
    WITH toks AS (
      SELECT unnest(list_filter(
               regexp_split_to_array(lower(trim(text)), '\\s+'),
               x -> x <> '')) AS tok
      FROM documents),
    tc AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    top AS (SELECT tok, c FROM tc ORDER BY c DESC, tok LIMIT 1000),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS r FROM top),
    xy AS (
      SELECT floor(log10(CAST(r AS DOUBLE)) * 1e9 + 0.5) / 1e9 AS x,
             floor(log10(CAST(c AS DOUBLE)) * 1e9 + 0.5) / 1e9 AS y
      FROM ranked),
    s AS (
      SELECT count(*) AS n,
             CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x * y AS DECIMAL(18,6))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(x * x AS DECIMAL(18,6))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(y * y AS DECIMAL(18,6))) AS DOUBLE) AS syy
      FROM xy)
    SELECT CAST(n AS BIGINT) AS n_terms,
           floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1e8 + 0.5) / 1e8
               AS slope,
           floor((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                 * 1e8 + 0.5) / 1e8 AS intercept,
           floor(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)) * 1e8 + 0.5)
               / 1e8 AS r2
    FROM s
    """,
)
def zipf_fit_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the rank-frequency curve: log10(count) ~
    log10(rank) OLS on the top-1000 vocabulary — the corpus-health probe
    that flags synthetic/templated corpora (natural text fits slope ≈ −1
    with high R²; boilerplate flattens or kinks the curve).

    Scale: the only corpus-sized stage is the map-side-combined token
    count; the rank window and moment sums run on the TakeOrdered 1000-row
    vocabulary frame (bounded by the top-k constant, not the corpus).
    log values are grid-quantized to 1e-9 BEFORE the decimal moment sums
    so a last-ulp libm difference cannot reach the accumulators; the
    closed form mirrors `ols_price_qty` (normal equations, grid-rounded).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(tokens_expr(F.lower(F.col("text")))).alias("tok")
    )
    tc = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    top = tc.orderBy(F.col("c").desc(), "tok").limit(1000)
    w = Window.orderBy(F.col("c").desc(), "tok")
    ranked = top.withColumn("r", F.row_number().over(w))
    x = grid_round(F.log10(F.col("r").cast("double")), 9)
    y = grid_round(F.log10(F.col("c").cast("double")), 9)
    xy = ranked.select(x.alias("x"), y.alias("y"))
    s = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(18,6)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(18,6)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(18,6)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(18,6)"))
        .cast("double")
        .alias("syy"),
    )
    n, sx, sy, sxy, sxx, syy = (
        F.col("n"), F.col("sx"), F.col("sy"),
        F.col("sxy"), F.col("sxx"), F.col("syy"),
    )
    cov_n = n * sxy - sx * sy
    var_n = n * sxx - sx * sx
    slope = cov_n / var_n
    return s.select(
        n.cast("bigint").alias("n_terms"),
        grid_round(slope, 8).alias("slope"),
        grid_round((sy - slope * sx) / n, 8).alias("intercept"),
        grid_round(
            (cov_n * cov_n) / (var_n * (n * syy - sy * sy)), 8
        ).alias("r2"),
    )


@register("image_phash_pairs", oracle=None)  # pixels live Python-side: no SQL twin
def image_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup detection: every 5th document
    synthesizes a deterministic 32x32 gradient image (base pattern keyed
    by doc_id % 20, per-doc brightness jitter), round-trips it through
    the REAL 24-bit BMP encoder/decoder, fingerprints the decoded pixels
    with a 60-bit dHash (block-mean 6x11 resize, horizontal gradient
    signs — `operators/multimodal.dhash60`), and pairs images within
    Hamming distance 3 via the banded fingerprint join
    (`operators/dedup.hamming_pairs_from_fp`). Images sharing a base
    pattern differ only by jitter, so their gradient signs — and
    fingerprints — agree; different bases collide nowhere. This welds
    the multimodal decode path onto the dedup family: the same pipeline
    runs on real thumbnails at scale.

    Scale: synthesis + BMP round-trip + hashing all happen inside ONE
    mapInPandas (payloads never shuffle; 8 bytes of fingerprint per
    image move); the pair stage is the pigeonhole-banded equi-join, so
    the candidate space is band-bucket-bounded, never |corpus|².
    Determinism asserted by the rows-only harness (two runs, identical
    multisets)."""
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from pandas_to_postgres_spark.operators.dedup import hamming_pairs_from_fp
    from pandas_to_postgres_spark.operators.media_codecs import (
        decode_bmp,
        encode_bmp,
    )
    from pandas_to_postgres_spark.operators.multimodal import dhash60

    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % 5 == 0)
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def synth_hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yy, xx = np.mgrid[0:32, 0:32]
        for pdf in batches:
            fps = []
            for doc_id in pdf["doc_id"]:
                g = int(doc_id) % 20
                # oriented stripe base: direction/frequency keyed by the
                # group — high-contrast edges whose horizontal gradient
                # SIGNS differ strongly across bases
                ax, ay = 1 + g % 5, 1 + g // 5
                base = (((yy * ay + xx * ax) // 4) % 2) * 200 + 20
                jitter = (int(doc_id) // 20) % 3  # same-group docs differ
                rgb = np.clip(base + jitter, 0, 255).astype(np.uint8)
                rgb = np.stack([rgb, rgb, rgb], axis=-1)
                decoded = decode_bmp(encode_bmp(rgb))  # REAL codec round-trip
                gray = decoded.astype(np.float64).mean(axis=-1)
                fps.append(dhash60(gray))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "fp": fps})

    fp_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("fp", T.LongType()),
        ]
    )
    fps = d.mapInPandas(synth_hash, schema=fp_schema)
    return hamming_pairs_from_fp(
        fps, id_col="doc_id", fp_col="fp", bits=60, max_hamming=3
    ).orderBy("id_a", "id_b")


@register("audio_spectrogram_features", oracle=None)  # DSP path: no SQL twin
def audio_spectrogram_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio DSP featurization, no librosa/scipy: every 7th document
    synthesizes a deterministic two-tone WAV (frequencies keyed by
    doc_id, 8 kHz / 0.5 s), round-trips the RIFF PCM codec
    (`media_codecs.encode_wav`/`decode_wav`), and computes an STFT
    magnitude spectrogram with numpy alone — 256-sample Hann windows,
    hop 128, rFFT per frame — emitting per-doc spectral features
    (dominant frequency bin, spectral centroid, 4-band energy split).
    The same shape runs speech/music feature extraction at scale; the
    synthetic tones make the features golden-testable (a planted 1 kHz
    tone MUST put its energy in bin 32 of a 256-point rFFT at 8 kHz).

    Scale: synthesis, codec round-trip, windowing, and FFTs all run
    inside ONE mapInPandas task (Arrow batches in, 6 feature columns
    out); audio payloads never shuffle. numpy's vectorized rFFT over a
    (frames x 256) matrix is the batch-friendly formulation — one BLAS-
    grade call per clip, not per window."""
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from pandas_to_postgres_spark.operators.media_codecs import (
        decode_wav,
        encode_wav,
    )

    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % 7 == 0)
        .repartition(spark.sparkContext.defaultParallelism)
    )

    RATE, NFFT, HOP = 8000, 256, 128

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        win = np.hanning(NFFT)
        t = np.arange(RATE // 2, dtype=np.float64) / RATE
        for pdf in batches:
            out = {
                "doc_id": [], "n_frames": [], "dominant_bin": [],
                "centroid_hz": [], "low_frac": [], "high_frac": [],
            }
            for doc_id in pdf["doc_id"]:
                f1 = 200.0 + (int(doc_id) % 10) * 100.0
                f2 = 1200.0 + (int(doc_id) % 7) * 150.0
                # encode_wav takes FLOAT samples in [-1, 1]
                sig = 0.6 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(
                    2 * np.pi * f2 * t
                )
                decoded, rate = decode_wav(encode_wav(sig, RATE))
                x = decoded
                n_frames = 1 + (len(x) - NFFT) // HOP
                idx = (
                    np.arange(NFFT)[None, :]
                    + HOP * np.arange(n_frames)[:, None]
                )
                spec = np.abs(np.fft.rfft(x[idx] * win, axis=1))
                power = spec.sum(axis=0)  # marginal spectrum
                freqs = np.fft.rfftfreq(NFFT, d=1.0 / rate)
                dom = int(power[1:].argmax()) + 1  # skip DC
                centroid = float((freqs * power).sum() / power.sum())
                total = float(power.sum())
                low = float(power[freqs < 1000].sum() / total)
                high = float(power[freqs >= 2000].sum() / total)
                out["doc_id"].append(doc_id)
                out["n_frames"].append(n_frames)
                out["dominant_bin"].append(dom)
                out["centroid_hz"].append(round(centroid, 3))
                out["low_frac"].append(round(low, 6))
                out["high_frac"].append(round(high, 6))
            yield pd.DataFrame(out)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("dominant_bin", T.IntegerType()),
            T.StructField("centroid_hz", T.DoubleType()),
            T.StructField("low_frac", T.DoubleType()),
            T.StructField("high_frac", T.DoubleType()),
        ]
    )
    return d.mapInPandas(featurize, schema=schema).orderBy("doc_id")
