"""Round-3 retrieval / layout operators: BM25 ranked search, bigram
language-model statistics, running distinct counts, and Z-order curve
layout with a locality audit.

Registered past the driver's 50-slot window (composition held fixed for
round-over-round comparability — see plans/__init__.py); oracle checks run
in tests/test_correctness.py.

All four keep their hot arithmetic integer-exact (scaled-micro BIGINTs,
integer division) so the Spark and DuckDB results are bit-identical with
no FP-summation-order exposure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pandas_to_postgres_spark.functions.agg import dsum, dsum_sql
from pandas_to_postgres_spark.functions.text import tokens_expr
from pandas_to_postgres_spark.plans.registry import register
from pandas_to_postgres_spark.sources.parquet import load_table

_RAW_TOKS_SQL = (
    "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> '')"
)

#: BM25 query terms: one common, one mid, one rarer term of the synthetic
#: vocabulary so the ranking actually discriminates.
_BM25_TERMS = ("spark", "vector", "window")

#: cosine macros for the hybrid RRF oracle (aliases q / e as used there);
#: float elements cast to DOUBLE before multiplying (float32 folds drift)
_BM_DOT = (
    "(SELECT sum(CAST(q.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)) "
    "FROM range(1, 65) t(i))"
)
_BM_NORM_Q = (
    "sqrt((SELECT sum(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)) "
    "FROM range(1, 65) t(i)))"
)
_BM_NORM_E = (
    "sqrt((SELECT sum(CAST(e.embedding[i] AS DOUBLE) "
    "* CAST(e.embedding[i] AS DOUBLE)) FROM range(1, 65) t(i)))"
)
_BM25_K1 = 1.2
_BM25_B = 0.75


def _plan_table_dir(spark: SparkSession, sf_dir: str, prefix: str) -> str:
    """Fresh per-(query, sf_dir) table directory under the session
    warehouse for snapshot-building plan functions: deterministic name
    (md5 tag keeps concurrent tiers apart), previous contents removed."""
    import hashlib
    import os
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path or "spark-warehouse"
    path = os.path.join(
        wh, f"{prefix}_{hashlib.md5(sf_dir.encode()).hexdigest()[:6]}"
    )
    shutil.rmtree(path, ignore_errors=True)
    return path


def _data_parquets(p: str) -> list[str]:
    """Sorted data-file names in a table dir (hidden/metadata excluded)."""
    import os

    return sorted(
        f for f in os.listdir(p)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )


@register(
    "bm25_docs",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {_RAW_TOKS_SQL} AS toks FROM documents),
    dl AS (SELECT doc_id, length(toks) AS dl FROM tok),
    stats AS (
      SELECT count(*) AS n_docs,
             CAST(CAST(sum(CAST(dl AS BIGINT)) AS BIGINT) AS DOUBLE)
                 / count(*) AS avgdl
      FROM dl),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id, unnest(toks) AS term FROM tok)
      WHERE term IN ('spark', 'vector', 'window')
      GROUP BY doc_id, term),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    -- every fractional literal is CAST(... AS DOUBLE) so DuckDB's decimal
    -- literal typing cannot diverge from Spark's double arithmetic
    scored AS (
      SELECT tf.doc_id,
             CAST(floor(
               ln((CAST(stats.n_docs - df.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                  / (CAST(df.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                  + CAST(1.0 AS DOUBLE))
               * (tf.tf * CAST(2.2 AS DOUBLE))
               / (tf.tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
                  + CAST(0.75 AS DOUBLE) * dl.dl / stats.avgdl))
               * CAST(1e6 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
               AS term_micro
      FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats)
    SELECT doc_id, CAST(sum(term_micro) AS BIGINT) AS score_micro
    FROM scored GROUP BY doc_id
    ORDER BY score_micro DESC, doc_id LIMIT 20
    """,
)
def bm25_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval over the documents table (Robertson/Sparck
    Jones probabilistic idf, k1=1.2 b=0.75) for a fixed 3-term query.

    Scale shape (100 TB): document length is a map-only projection (no
    explode); term frequencies explode ONLY the rows that contain a query
    term (the isin filter sits under the explode via an array_intersect
    pre-filter, so non-matching documents never widen); df and the corpus
    stats are vocabulary- and 1-row-sized frames that broadcast onto the
    tf frame; the final ranking is TakeOrderedAndProject. The one real
    shuffle is the (doc_id, term) tf aggregate, bounded by query-term
    postings — never by corpus token count.

    FP determinism: the per-(doc, term) partial score is floored to a
    scaled-micro BIGINT before the per-document sum, so aggregation order
    cannot perturb the result; DuckDB mirrors the identical expression
    tree. Reference has no retrieval surface (it is an ETL loader);
    this extends SURVEY.md §2.11 D3/D4 text analysis to ranked search.
    """
    terms = list(_BM25_TERMS)
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", tokens_expr(F.lower(F.col("text"))).alias("toks")
    )
    dl = tok.select("doc_id", F.size("toks").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum("dl").cast("bigint").cast("double") / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    # only query-term occurrences reach the explode: the token array is
    # pre-filtered in place (duplicates kept — tf needs them), so a
    # document with no query term is dropped before widening and a
    # matching one widens by its query-term occurrence count only
    qarr = F.array(*[F.lit(t) for t in terms])
    kept = F.filter("toks", lambda t: F.array_contains(qarr, t))
    tf = (
        tok.select("doc_id", kept.alias("kept"))
        .filter(F.size("kept") > 0)
        .select("doc_id", F.explode("kept").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    term_micro = F.floor(
        F.log(
            (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        )
        * (F.col("tf") * F.lit(2.2))
        / (
            F.col("tf")
            + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.col("avgdl"))
        )
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("bigint")
    return (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", term_micro.alias("term_micro"))
        .groupBy("doc_id")
        .agg(F.sum("term_micro").cast("bigint").alias("score_micro"))
        .orderBy(F.col("score_micro").desc(), "doc_id")
        .limit(20)
    )


@register(
    "hybrid_rrf_docs",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {_RAW_TOKS_SQL} AS toks FROM documents),
    dl AS (SELECT doc_id, length(toks) AS dl FROM tok),
    stats AS (
      SELECT count(*) AS n_docs,
             CAST(CAST(sum(CAST(dl AS BIGINT)) AS BIGINT) AS DOUBLE)
                 / count(*) AS avgdl
      FROM dl),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id, unnest(toks) AS term FROM tok)
      WHERE term IN ('spark', 'vector', 'window')
      GROUP BY doc_id, term),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             CAST(floor(
               ln((CAST(stats.n_docs - df.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                  / (CAST(df.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                  + CAST(1.0 AS DOUBLE))
               * (tf.tf * CAST(2.2 AS DOUBLE))
               / (tf.tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
                  + CAST(0.75 AS DOUBLE) * dl.dl / stats.avgdl))
               * CAST(1e6 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
               AS term_micro
      FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
    bm AS (
      SELECT doc_id, CAST(sum(term_micro) AS BIGINT) AS score_micro
      FROM scored GROUP BY doc_id
      ORDER BY score_micro DESC, doc_id LIMIT 50),
    lex AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id)
                  AS BIGINT) AS lex_rank
      FROM bm),
    cos AS (
      SELECT e.vec_id AS doc_id,
             round({_BM_DOT} / ({_BM_NORM_Q} * {_BM_NORM_E}), 5) AS cosine
      FROM (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q
      CROSS JOIN embeddings e),
    sem AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY cosine DESC, doc_id)
                  AS BIGINT) AS sem_rank
      FROM cos QUALIFY sem_rank <= 50),
    fused AS (
      SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
             coalesce(lex.lex_rank, 0) AS lex_rank,
             coalesce(sem.sem_rank, 0) AS sem_rank,
             CAST(CASE WHEN lex.lex_rank IS NULL THEN 0
                  ELSE 1000000000 // (60 + lex.lex_rank) END
                + CASE WHEN sem.sem_rank IS NULL THEN 0
                  ELSE 1000000000 // (60 + sem.sem_rank) END
               AS BIGINT) AS rrf_micro
      FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
    SELECT doc_id, lex_rank, sem_rank, rrf_micro
    FROM fused ORDER BY rrf_micro DESC, doc_id LIMIT 20
    """,
)
def hybrid_rrf_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion (Cormack/Clarke/
    Buettcher, SIGIR 2009): the RAG-ingest ranking shape — a lexical
    BM25 list and a semantic embedding-cosine list fused as
    Σ 1/(60 + rank), here on an exact integer grid (1e9 DIV (60+rank))
    so the fusion is bit-deterministic cross-engine. Documents in only
    one list contribute one term (rank 0 recorded for the missing side).

    Scale: each list is produced by its already-scale-shaped operator —
    BM25's one postings-bounded shuffle + TakeOrdered, brute-force
    cosine over a broadcast single query (the LSH/IVF/PQ tiers swap in
    unchanged) — and the fusion itself joins two k-row frames (k=50):
    constant-size work after the retrieval stages, trivially broadcast.

    Reference parity: the reference is a bulk loader with no retrieval
    surface; this extends §2.11 D3/D4 to the hybrid ranking every
    modern retrieval pipeline runs (BM25 ∪ dense, RRF fusion).
    """
    from pandas_to_postgres_spark.operators.similarity import (
        topk_cosine_bruteforce,
    )

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", tokens_expr(F.lower(F.col("text"))).alias("toks")
    )
    dl = tok.select("doc_id", F.size("toks").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("bigint").cast("double") / F.count(F.lit(1))).alias(
            "avgdl"
        ),
    )
    qarr = F.array(*[F.lit(t) for t in _BM25_TERMS])
    kept = F.filter("toks", lambda t: F.array_contains(qarr, t))
    tf = (
        tok.select("doc_id", kept.alias("kept"))
        .filter(F.size("kept") > 0)
        .select("doc_id", F.explode("kept").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    term_micro = F.floor(
        F.log(
            (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        )
        * (F.col("tf") * F.lit(2.2))
        / (
            F.col("tf")
            + F.lit(1.2)
            * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.col("avgdl"))
        )
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("bigint")
    bm = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", term_micro.alias("term_micro"))
        .groupBy("doc_id")
        .agg(F.sum("term_micro").cast("bigint").alias("score_micro"))
        .orderBy(F.col("score_micro").desc(), "doc_id")
        .limit(50)  # TakeOrdered; the rank window below sees only k rows
    )
    lex = bm.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score_micro").desc(), F.col("doc_id")))
        .cast("bigint")
        .alias("lex_rank"),
    )
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("qid"), F.col("embedding")
    )
    sem = topk_cosine_bruteforce(
        q, e, query_id="qid", corpus_id="vec_id", query_vec="embedding",
        corpus_vec="embedding", k=50,
    ).select(
        F.col("vec_id").alias("doc_id"),
        F.col("rank").cast("bigint").alias("sem_rank"),
    )
    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("lex_rank", F.lit(0)).cast("bigint").alias("lex_rank"),
            F.coalesce("sem_rank", F.lit(0)).cast("bigint").alias("sem_rank"),
            (
                F.when(
                    F.col("lex_rank").isNotNull(),
                    F.expr("CAST(1000000000 AS BIGINT) DIV (60 + lex_rank)"),
                ).otherwise(F.lit(0))
                + F.when(
                    F.col("sem_rank").isNotNull(),
                    F.expr("CAST(1000000000 AS BIGINT) DIV (60 + sem_rank)"),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("rrf_micro"),
        )
    )
    return fused.orderBy(F.col("rrf_micro").desc(), "doc_id").limit(20)


@register(
    "bigram_condprob",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {_RAW_TOKS_SQL} AS toks FROM documents),
    big AS (
      SELECT toks[g.g] AS w1, toks[g.g + 1] AS w2
      FROM tok CROSS JOIN LATERAL (
        SELECT unnest(generate_series(1, length(toks) - 1)) AS g) g
      WHERE length(toks) >= 2),
    n12 AS (SELECT w1, w2, count(*) AS n12 FROM big GROUP BY w1, w2),
    n1 AS (SELECT w1, CAST(sum(n12) AS BIGINT) AS n1 FROM n12 GROUP BY w1)
    SELECT n12.w1, n12.w2, CAST(n12.n12 AS BIGINT) AS n12, n1.n1,
           CAST(n12.n12 * 1000000 // n1.n1 AS BIGINT) AS p_micro
    FROM n12 JOIN n1 USING (w1)
    ORDER BY n12 DESC, w1, w2 LIMIT 30
    """,
)
def bigram_condprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model statistics: corpus-wide bigram counts and the
    conditional probability P(w2 | w1) as an exact integer-division micro
    ratio — the count layer of a KenLM-style n-gram model build.

    Scale shape: bigram pairing is a map-only ``transform(sequence(...))``
    over each token array (no posexplode + self-join — adjacent pairs are
    assembled inside the row before the single explode); the only
    shuffles are the (w1, w2) and w1 count aggregates, both map-side
    combined and bounded by vocabulary^2 observed, not corpus size. The
    conditional probability divides two exact BIGINTs with integer
    division, so both engines agree bit-for-bit. Top-30 is
    TakeOrderedAndProject. Extends unigram_logprob (SURVEY.md §2.11 D3).
    """
    docs = load_table(spark, sf_dir, "documents")
    big = (
        docs.select(tokens_expr(F.lower(F.col("text"))).alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(toks[i - 1] AS w1, toks[i] AS w2))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    n12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    n1 = n12.groupBy("w1").agg(F.sum("n12").cast("bigint").alias("n1"))
    return (
        n12.join(n1, "w1")
        .select(
            "w1",
            "w2",
            F.col("n12").cast("bigint").alias("n12"),
            "n1",
            # exact BIGINT floor division — no FP anywhere in the ratio
            F.expr("CAST(n12 * 1000000 AS BIGINT) DIV n1")
            .cast("bigint")
            .alias("p_micro"),
        )
        .orderBy(F.col("n12").desc(), "w1", "w2")
        .limit(30)
    )


@register(
    "cumulative_distinct_users",
    oracle="""
    WITH firsts AS (
      SELECT event_type, user_id, min(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY event_type, user_id),
    news AS (
      SELECT event_type, first_day AS day, count(*) AS new_users
      FROM firsts GROUP BY event_type, first_day),
    days AS (
      SELECT DISTINCT event_type, CAST(ts AS DATE) AS day FROM events)
    SELECT d.event_type, CAST(d.day AS VARCHAR) AS day,
           CAST(sum(coalesce(n.new_users, 0)) OVER (
             PARTITION BY d.event_type ORDER BY d.day) AS BIGINT)
             AS cum_users
    FROM days d LEFT JOIN news n
      ON n.event_type = d.event_type AND n.day = d.day
    ORDER BY d.event_type, d.day
    """,
)
def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT user count per event type by day — the metric SQL
    cannot express as ``count(distinct) OVER`` (Spark rejects DISTINCT in
    window functions), decomposed into the first-touch identity: a user
    enters the running distinct set exactly once, on their first day.

    Scale shape: ``min(day)`` per (event_type, user) is ONE map-side-
    combined shuffle on the natural key; everything after operates on
    frames bounded by |users| and then |event_type x days| — the running
    sum's window partition holds only a few hundred day rows per type, so
    there is no giant-partition window hazard. A naive implementation
    (per-day semi-joins or an exploding dedup set in a stateful op) would
    rescan the corpus per day; this form reads it once at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    ev = ev.select(
        "event_type", "user_id", F.col("ts").cast("date").alias("day")
    )
    firsts = ev.groupBy("event_type", "user_id").agg(
        F.min("day").alias("first_day")
    )
    news = firsts.groupBy("event_type", F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    days = ev.select("event_type", "day").distinct()
    w = Window.partitionBy("event_type").orderBy("day")
    return (
        days.join(news, ["event_type", "day"], "left")
        .select(
            "event_type",
            # dates ship as ISO strings — the driver's pandas bridge turns a
            # DuckDB DATE into datetime64 and the value hashes diverge
            F.col("day").cast("string").alias("day"),
            F.sum(F.coalesce("new_users", F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("cum_users"),
        )
        .orderBy("event_type", "day")
    )


def _z_terms_sql(x: str, y: str, bits: int = 16) -> str:
    """Unrolled Morton interleave of two masked ints — identical text for
    Spark SQL and DuckDB (both support &, |, <<, >> on BIGINT)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


_Z_EXPR = _z_terms_sql("(l_partkey & 65535)", "(l_suppkey & 65535)")


@register(
    "zorder_layout_lineitem",
    oracle=f"""
    WITH z AS (
      SELECT l_partkey, l_suppkey,
             CAST({_Z_EXPR} AS BIGINT) AS zval
      FROM lineitem),
    b AS (
      SELECT zval >> 22 AS bucket,
             count(*) AS n,
             max(l_partkey) - min(l_partkey) AS part_spread,
             max(l_suppkey) - min(l_suppkey) AS supp_spread
      FROM z GROUP BY bucket)
    SELECT CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(max(n) AS BIGINT) AS max_bucket_rows,
           CAST(sum(part_spread) // count(*) AS BIGINT) AS avg_part_spread,
           CAST(sum(supp_spread) // count(*) AS BIGINT) AS avg_supp_spread,
           CAST(max(part_spread) AS BIGINT) AS max_part_spread,
           CAST(max(supp_spread) AS BIGINT) AS max_supp_spread
    FROM b
    """,
)
def zorder_layout_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout audit: interleave the low 16 bits of
    (l_partkey, l_suppkey), bucket the curve into 1024 ranges, and report
    how tightly each bucket bounds BOTH dimensions — the property that
    makes multi-column min/max data skipping work.

    The write path this audits (100 TB): ``df.repartitionByRange(n,
    zval).sortWithinPartitions(zval).write.parquet(...)`` gives every
    output file a narrow [min, max] envelope on every interleaved column
    simultaneously, so footer/manifest pruning (sources/manifest.py)
    eliminates files for predicates on EITHER key — linear layouts only
    skip on the leading sort key. The audit here is the layout's quality
    metric: avg per-bucket spread ≪ the key's global range proves 2-D
    locality. The interleave itself is a compile-time-unrolled integer
    expression (32 shift/mask terms — whole-stage-codegen'd, no UDF, no
    shuffle); the bucket aggregate is map-side combined into <= 1024
    groups; all outputs are exact integers.
    """
    li = load_table(spark, sf_dir, "lineitem")
    z = li.select(
        "l_partkey",
        "l_suppkey",
        F.expr(_Z_EXPR).cast("bigint").alias("zval"),
    )
    b = z.groupBy(F.expr("zval >> 22").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        (F.max("l_partkey") - F.min("l_partkey")).alias("part_spread"),
        (F.max("l_suppkey") - F.min("l_suppkey")).alias("supp_spread"),
    )
    return b.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.max("n").cast("bigint").alias("max_bucket_rows"),
        # DIV: exact BIGINT floor division (a double ratio truncated back
        # to bigint could land one off an engine boundary)
        F.expr("CAST(sum(part_spread) DIV count(1) AS BIGINT)").alias(
            "avg_part_spread"
        ),
        F.expr("CAST(sum(supp_spread) DIV count(1) AS BIGINT)").alias(
            "avg_supp_spread"
        ),
        F.max("part_spread").cast("bigint").alias("max_part_spread"),
        F.max("supp_spread").cast("bigint").alias("max_supp_spread"),
    )


@register(
    "skyline_parts",
    oracle="""
    WITH p AS (
      SELECT p_retailprice AS price, p_size AS size, count(*) AS n
      FROM part GROUP BY p_retailprice, p_size)
    SELECT price, size, CAST(n AS BIGINT) AS n_parts
    FROM p a
    WHERE NOT EXISTS (
      SELECT 1 FROM p b
      WHERE b.price <= a.price AND b.size >= a.size
        AND (b.price < a.price OR b.size > a.size))
    ORDER BY price, size
    """,
)
def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) query: the parts not dominated on
    (minimize retail price, maximize size) — the classic multi-criteria
    shortlist (Borzsony/Kossmann/Stocker, ICDE'01).

    Scale shape — NO self-join and NO global sort: dominance collapses to
    a prefix-max scan. Work happens on the DISTINCT (price, size) value
    grid (a map-side-combined aggregate bounds it by the value domain,
    not row count). The grid is bucketed by a monotone price bucket; each
    bucket computes a LOCAL running max(size) window, and cross-bucket
    order arrives as a broadcast per-bucket prefix-max frame (tens of
    rows) — the same bucketed-global-order pattern as
    ``operators/sampling.budget_prefix_select``, so no SinglePartition
    window exists in the plan. A pair survives iff no strictly-prior pair
    carries size >= its own (on distinct pairs that is exactly
    non-dominance). The oracle states dominance declaratively via
    NOT EXISTS; values are raw column doubles — no arithmetic, no FP
    exposure.
    """
    p = (
        load_table(spark, sf_dir, "part")
        .groupBy(
            F.col("p_retailprice").alias("price"),
            F.col("p_size").alias("size"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    p = p.withColumn("bucket", F.expr("CAST(price AS BIGINT) DIV 10"))
    # local running max over rows strictly before, within bucket
    w_local = (
        Window.partitionBy("bucket")
        .orderBy(F.col("price").asc(), F.col("size").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = p.withColumn("lmax", F.max("size").over(w_local))
    # tiny per-bucket max frame -> prefix max over STRICTLY earlier buckets
    bmax = p.groupBy("bucket").agg(F.max("size").alias("bmax"))
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    prefix = bmax.select(
        "bucket", F.max("bmax").over(w_b).alias("pmax")
    )
    return (
        local.join(F.broadcast(prefix), "bucket")
        .filter(
            F.coalesce(F.greatest("lmax", "pmax"), F.lit(-(2**31)))
            < F.col("size")
        )
        .select("price", "size", F.col("n").cast("bigint").alias("n_parts"))
        .orderBy("price", "size")
    )


#: count-min sketch geometry: depth 4 x width 1024 (eps ~ e/1024, delta ~
#: e^-4). md5-derived row hashes so DuckDB can replay the exact sketch.
_CMS_D = 4
_CMS_W = 1024

_CMS_BUCKET_SPARK = (
    "CAST(conv(substr(md5(concat(CAST({s} AS STRING), '|', term)), 1, 15),"
    " 16, 10) AS BIGINT) % 1024"
)
_CMS_BUCKET_DUCK = (
    "CAST(('0x' || substr(md5(CAST({s} AS VARCHAR) || '|' || term), 1, 15))"
    " AS BIGINT) % 1024"
)


@register(
    "cms_token_audit",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_RAW_TOKS_SQL}) AS term FROM documents),
    exact AS (SELECT term, count(*) AS exact_n FROM tok GROUP BY term),
    cells AS (
      SELECT s.s AS seed, {_CMS_BUCKET_DUCK.format(s='s.s')} AS bucket,
             count(*) AS cell
      FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS s) s
      GROUP BY seed, bucket),
    est AS (
      SELECT e.term, e.exact_n, min(c.cell) AS cms_est
      FROM exact e
      CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS s) s
      JOIN cells c
        ON c.seed = s.s
       AND c.bucket = {_CMS_BUCKET_DUCK.format(s='s.s')}
      GROUP BY e.term, e.exact_n)
    SELECT term, CAST(exact_n AS BIGINT) AS exact_n,
           CAST(cms_est AS BIGINT) AS cms_est,
           CAST(cms_est - exact_n AS BIGINT) AS overcount
    FROM est
    ORDER BY exact_n DESC, term LIMIT 30
    """,
)
def cms_token_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode/Muthukrishnan '05) over corpus tokens,
    with an exact-count audit of its overestimate: build a depth-4 x
    width-1024 sketch, probe it for the top-30 true-heaviest tokens, and
    report estimate minus truth (>= 0 by the CMS one-sided guarantee).

    Scale shape: the sketch is 4 x 1024 BIGINT cells REGARDLESS of corpus
    size — each token occurrence contributes to 4 (seed, bucket) partial
    counts that map-side combine, so the sketch shuffle is bounded by
    4096 rows per partition and the merged sketch is mergeable across
    shards, days, or streams by cell-wise addition (the same
    decomposition as hll_shard_merge / Misra-Gries heavy_hitters_docs —
    CMS completes the sketch family with point-frequency estimates).
    Probing broadcasts the 4096-cell sketch onto the probe frame. Hashes
    are md5-derived in the shared Spark/DuckDB dialect, so the oracle
    replays the sketch bit-for-bit; all arithmetic is integer-exact.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(tokens_expr(F.lower(F.col("text")))).alias("term")
    )
    # ONE corpus tokenize pass (r10): the sketch cells are Σ exact_n
    # over the terms hashing into each (seed, bucket) — identical
    # integers to counting occurrences directly — so the cells leg
    # derives from the checkpointed vocab-sized exact frame instead of
    # re-tokenizing the corpus, and md5 hashes each DISTINCT term once
    # (4 cells per term) instead of every occurrence.
    exact = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .localCheckpoint(eager=False)  # vocab-sized; feeds cells + probes
    )
    # 4 (seed, bucket) pairs assembled in-row, ONE posexplode, then a
    # map-side-combined sum into <= 4096 cells
    cells = (
        exact.select(
            "exact_n",
            F.posexplode(
                F.expr(
                    "transform(sequence(0, 3), s -> "
                    + _CMS_BUCKET_SPARK.format(s="s")
                    + ")"
                )
            ).alias("seed", "bucket"),
        )
        .groupBy("seed", "bucket")
        .agg(F.sum("exact_n").alias("cell"))
    )
    probes = exact.select(
        "term",
        "exact_n",
        F.posexplode(
            F.expr(
                "transform(sequence(0, 3), s -> "
                + _CMS_BUCKET_SPARK.format(s="s")
                + ")"
            )
        ).alias("seed", "bucket"),
    )
    return (
        probes.join(F.broadcast(cells), ["seed", "bucket"])
        .groupBy("term", "exact_n")
        .agg(F.min("cell").alias("cms_est"))
        .select(
            "term",
            F.col("exact_n").cast("bigint").alias("exact_n"),
            F.col("cms_est").cast("bigint").alias("cms_est"),
            (F.col("cms_est") - F.col("exact_n"))
            .cast("bigint")
            .alias("overcount"),
        )
        .orderBy(F.col("exact_n").desc(), "term")
        .limit(30)
    )


def _minhash_checked_oracle() -> str:
    from pandas_to_postgres_spark.operators.dedup import (
        MINHASH_MD5_A,
        MINHASH_MD5_B,
    )

    a_lit = "[" + ",".join(str(v) for v in MINHASH_MD5_A) + "]"
    b_lit = "[" + ",".join(str(v) for v in MINHASH_MD5_B) + "]"
    return f"""
    WITH tok AS (
      SELECT doc_id, {_RAW_TOKS_SQL} AS toks FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN length(toks) >= 3 THEN
               list_transform(generate_series(1, length(toks) - 2),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
             ELSE [array_to_string(toks, ' ')] END) AS sh
      FROM tok),
    ms AS (
      SELECT doc_id,
             list_transform(sh, s ->
               CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS ms
      FROM sh),
    sig AS (
      SELECT doc_id,
             list_transform(generate_series(0, 31), j ->
               list_min(list_transform(ms, m ->
                 ({a_lit}[j+1] * (m % 1073741824) + {b_lit}[j+1])
                 % 2147483647))) AS sig
      FROM ms),
    keys AS (
      SELECT doc_id,
             list_transform(generate_series(0, 7), b ->
               array_to_string(list_transform(
                 sig[b*4+1 : b*4+4], x -> CAST(x AS VARCHAR)), '|')) AS ks
      FROM sig),
    banded AS (
      SELECT doc_id, g.g AS band_idx, ks[g.g + 1] AS band_key
      FROM keys CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS g) g),
    capped AS (
      SELECT doc_id, band_idx, band_key
      FROM (SELECT *, row_number() OVER (
              PARTITION BY band_idx, band_key ORDER BY doc_id) AS rn
            FROM banded)
      WHERE rn <= 200),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM capped a JOIN capped b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
      WHERE a.doc_id < b.doc_id),
    verified AS (
      SELECT c.id_a, c.id_b,
             length(list_intersect(ma.ms, mb.ms)) AS i,
             length(ma.ms) + length(mb.ms)
               - length(list_intersect(ma.ms, mb.ms)) AS u
      FROM cand c
      JOIN ms ma ON ma.doc_id = c.id_a
      JOIN ms mb ON mb.doc_id = c.id_b)
    SELECT id_a, id_b,
           CAST(i * 1000000 // u AS BIGINT) AS jaccard_micro
    FROM verified
    WHERE i * 1000000 >= 500000 * u
    """


@register("minhash_lsh_checked", oracle=_minhash_checked_oracle())
def minhash_lsh_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VALUE-CHECKED MinHash-LSH tier: same signatures → banded
    buckets → exact-Jaccard-verify pipeline as the flagship
    ``minhash_neardup``, built on an md5 hash basis with Carter-Wegman
    affine families baked as literals, so DuckDB replays the ENTIRE
    pipeline — signatures, band keys, bucket capping, candidate pairs,
    and the integer-micro Jaccard — bit-for-bit. Closes the last
    rows-only gap in the dedup family's checking story (the split mirrors
    ``simhash_docs`` [throughput, xxhash64] vs ``simhash_hamming_pairs``
    [checked, md5]). See ``operators/dedup.minhash_md5_pairs`` for the
    scale argument (identical to the throughput tier: map-only
    signatures, capped bucket join, verify on candidates only).
    """
    from pandas_to_postgres_spark.operators.dedup import minhash_md5_pairs

    docs = load_table(spark, sf_dir, "documents")
    return minhash_md5_pairs(docs, "text", "doc_id")


def _neardup_group_summary_oracle() -> str:
    """DuckDB twin: transitive closure over the md5-checked MinHash pairs,
    then ONE ROW PER DUP CLUSTER — the output-bound escape hatch."""
    return f"""
    WITH RECURSIVE
    pairs AS ({_minhash_checked_oracle()}),
    verts AS (SELECT doc_id FROM documents),
    sym AS (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs),
    reach AS (
        SELECT doc_id AS a, doc_id AS b FROM verts
        UNION
        SELECT r.a, e.d FROM reach r JOIN sym e ON e.s = r.b),
    labels AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
    members AS (
        SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
        FROM labels GROUP BY cluster_id HAVING count(*) >= 2),
    pstats AS (
        SELECT l.cluster_id,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(min(p.jaccard_micro) AS BIGINT) AS min_jaccard_micro,
               CAST(max(p.jaccard_micro) AS BIGINT) AS max_jaccard_micro
        FROM pairs p JOIN labels l ON l.doc_id = p.id_a
        GROUP BY l.cluster_id)
    SELECT m.cluster_id, m.n_members, s.n_pairs,
           s.min_jaccard_micro, s.max_jaccard_micro
    FROM members m JOIN pstats s USING (cluster_id)
    """


@register("neardup_group_summary", oracle=_neardup_group_summary_oracle())
def neardup_group_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OUTPUT-BOUND escape hatch for near-dup detection (round-5 64x
    finding: on dup-dense corpora `minhash_neardup` emitted 44.7M true
    pairs — the plan was linear, the OUTPUT wasn't). Instead of the pair
    list, emit one row per duplicate CLUSTER: (cluster_id, n_members,
    n_pairs, min/max verified Jaccard). Pipeline = the md5-checked
    MinHash-LSH pairs (`operators/dedup.minhash_md5_pairs`) → iterative
    min-label connected components (`operators/cluster.py`) → two
    aggregations. The result is bounded by the number of dup GROUPS, so
    collection cost no longer scales with pair density; the near-dup twin
    of `dedup_summary`. Oracle replays the identical pipeline: the
    bit-exact md5 pair oracle feeding a WITH RECURSIVE closure.

    Scale: pairs are banded/capped (never all-pairs); the closure
    shuffles (band-capped) edges with per-round localCheckpoint; the
    summary aggregations shuffle cluster labels only. Pair rows never
    leave the executors — the driver sees clusters, not pairs."""
    from pandas_to_postgres_spark.operators.cluster import connected_components
    from pandas_to_postgres_spark.operators.dedup import minhash_md5_pairs

    docs = load_table(spark, sf_dir, "documents")
    # pairs feed BOTH the closure and the per-cluster stats: materialize
    # once (lazy localCheckpoint — same cache discipline as
    # ngram_jaccard_prefix) so the LSH pipeline isn't recomputed
    pairs = minhash_md5_pairs(docs, "text", "doc_id").localCheckpoint(
        eager=False
    )
    comps = connected_components(
        pairs,
        docs.select("doc_id"),
        src="id_a",
        dst="id_b",
        id_col="doc_id",
        component_col="cluster_id",
    )
    members = (
        comps.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
        .filter(F.col("n_members") >= 2)
    )
    pstats = (
        pairs.join(
            comps.select(F.col("doc_id").alias("id_a"), "cluster_id"), "id_a"
        )
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.min("jaccard_micro").cast("bigint").alias("min_jaccard_micro"),
            F.max("jaccard_micro").cast("bigint").alias("max_jaccard_micro"),
        )
    )
    return members.join(pstats, "cluster_id").select(
        "cluster_id",
        "n_members",
        "n_pairs",
        "min_jaccard_micro",
        "max_jaccard_micro",
    )


_KMV_K = 256
_KMV_H = 1 << 48  # 12-hex md5 prefix: (k-1)*H and all downstream products
                  # stay far inside BIGINT — the whole estimator is
                  # integer-exact (the 60-bit single-set tier needs doubles)


@register(
    "kmv_set_ops",
    oracle=f"""
    WITH a AS (
      SELECT DISTINCT CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),
                            1, 12)) AS BIGINT) AS h
      FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995
      ORDER BY h LIMIT {_KMV_K}),
    b AS (
      SELECT DISTINCT CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),
                            1, 12)) AS BIGINT) AS h
      FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1996
      ORDER BY h LIMIT {_KMV_K}),
    u AS (
      SELECT h FROM (SELECT h FROM a UNION SELECT h FROM b)
      ORDER BY h LIMIT {_KMV_K}),
    ustat AS (
      SELECT count(*) AS n_u, max(h) AS kth,
             CAST(sum(CASE WHEN h IN (SELECT h FROM a)
                            AND h IN (SELECT h FROM b)
                      THEN 1 ELSE 0 END) AS BIGINT) AS matches
      FROM u),
    exact AS (
      SELECT CAST(count(*) AS BIGINT) AS exact_union,
             CAST(sum(CASE WHEN y95 = 1 AND y96 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS exact_inter
      FROM (SELECT o_custkey,
                   max(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1995
                       THEN 1 ELSE 0 END) AS y95,
                   max(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1996
                       THEN 1 ELSE 0 END) AS y96
            FROM orders
            WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996)
            GROUP BY o_custkey))
    SELECT exact.exact_union, exact.exact_inter,
           CAST(CASE WHEN ustat.n_u < {_KMV_K} THEN ustat.n_u
                ELSE ({_KMV_K - 1} * {_KMV_H}::BIGINT) // ustat.kth
                END AS BIGINT) AS est_union,
           CAST((ustat.matches *
                 (CASE WHEN ustat.n_u < {_KMV_K} THEN ustat.n_u
                  ELSE ({_KMV_K - 1} * {_KMV_H}::BIGINT) // ustat.kth END))
                // ustat.n_u AS BIGINT) AS est_inter,
           ustat.matches
    FROM exact CROSS JOIN ustat
    """,
)
def kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch-style SET ALGEBRA on KMV sketches: estimate the union
    and intersection cardinality of two audiences (customers ordering in
    1995 vs 1996) from two k=256 minimum-values sketches, next to the
    exact answer as the audit — extends `kmv_distinct_parts` (single-set
    cardinality) with the merge/intersect operations an audience-overlap
    system runs on precomputed sketches.

    Estimators (Beyer et al., SIGMOD'07): union from the merged sketch's
    k-th minimum; intersection via the Jaccard fraction of merged-sketch
    members present in both input sketches. The 48-bit md5-prefix hash
    space keeps every product inside BIGINT, so the whole estimator —
    including the two floor divisions — is integer-exact cross-engine
    (zero FP anywhere). DuckDB replays the identical sketches value by
    value.

    Scale: each sketch is TakeOrderedAndProject over a distinct-hash
    projection — per-partition local top-k, k values to the merge, O(k)
    memory at any row count; the sketches (256 rows each, cached) then
    drive the set algebra with no further corpus access. The exact audit
    is the expensive path (one full groupBy) and exists only to report
    the estimator's error; production reads sketches alone.
    """
    k, hsp = _KMV_K, _KMV_H
    orders = load_table(spark, sf_dir, "orders")
    yr = F.year(F.col("o_orderdate").cast("date"))
    h = F.conv(
        F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    sk_a = (
        orders.filter(yr == 1995).select(h.alias("h")).distinct()
        .orderBy("h").limit(k).cache()
    )
    sk_b = (
        orders.filter(yr == 1996).select(h.alias("h")).distinct()
        .orderBy("h").limit(k).cache()
    )
    u = sk_a.union(sk_b).distinct().orderBy("h").limit(k)
    in_a = F.broadcast(sk_a.withColumnRenamed("h", "ha"))
    in_b = F.broadcast(sk_b.withColumnRenamed("h", "hb"))
    ustat = (
        u.join(in_a, F.col("h") == F.col("ha"), "left")
        .join(in_b, F.col("h") == F.col("hb"), "left")
        .agg(
            F.count(F.lit(1)).alias("n_u"),
            F.max("h").alias("kth"),
            F.sum(
                F.when(
                    F.col("ha").isNotNull() & F.col("hb").isNotNull(), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("matches"),
        )
    )
    exact = (
        orders.filter(yr.isin(1995, 1996))
        .groupBy("o_custkey")
        .agg(
            F.max(F.when(yr == 1995, 1).otherwise(0)).alias("y95"),
            F.max(F.when(yr == 1996, 1).otherwise(0)).alias("y96"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("exact_union"),
            F.sum(
                F.when((F.col("y95") == 1) & (F.col("y96") == 1), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("exact_inter"),
        )
    )
    est_union = F.expr(
        f"CAST(CASE WHEN n_u < {k} THEN n_u"
        f" ELSE CAST({k - 1} * {hsp} AS BIGINT) DIV kth END AS BIGINT)"
    )
    return (
        exact.crossJoin(F.broadcast(ustat))
        .withColumn("est_union", est_union)
        .withColumn(
            "est_inter",
            F.expr("CAST(matches * est_union DIV n_u AS BIGINT)"),
        )
        .select(
            "exact_union", "exact_inter", "est_union", "est_inter", "matches"
        )
    )


@register(
    "prorate_order_totals",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_linenumber,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS item_c
      FROM lineitem WHERE l_orderkey < 2000),
    o AS (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_c
      FROM orders WHERE o_orderkey < 2000),
    s AS (
      SELECT l_orderkey, CAST(sum(item_c) AS BIGINT) AS sum_c
      FROM li GROUP BY l_orderkey),
    base AS (
      SELECT li.l_orderkey, li.l_linenumber, o.total_c,
             (o.total_c * li.item_c) // s.sum_c AS fl,
             (o.total_c * li.item_c) % s.sum_c AS rem
      FROM li JOIN s USING (l_orderkey)
      JOIN o ON o.o_orderkey = li.l_orderkey),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY rem DESC, l_linenumber) AS rn,
             CAST(total_c - sum(fl) OVER (PARTITION BY l_orderkey) AS BIGINT)
               AS deficit
      FROM base)
    SELECT l_orderkey, l_linenumber,
           CAST(fl + CASE WHEN rn <= deficit THEN 1 ELSE 0 END AS BIGINT)
             AS alloc_cents
    FROM ranked
    """,
)
def prorate_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder proration (Hamilton apportionment): allocate each
    order's total across its line items proportional to extended price,
    in EXACT integer cents, such that the per-order allocations sum to
    the order total to the cent — the reconciliation-grade allocation
    every revenue/cost-distribution pipeline needs (naive `round(share *
    total)` leaves per-order drift; the driver's FP rules would also make
    it engine-dependent).

    Method: floor allocation ``total*item DIV sum``, then the per-order
    deficit (always < line count) goes one cent each to the lines with
    the LARGEST integer remainder ``(total*item) mod sum`` — remainder
    comparison, ranking, and the final adjustment are all
    BIGINT-arithmetic, so both engines agree bit-for-bit.

    Scale: one equi-join on the order key plus two per-order window
    passes whose partitions are line-count sized (≤ 7 here, bounded by
    basket size in general) — the shape shuffles on the natural key once;
    no global ordering anywhere. The invariant (per-order sum equals
    order total exactly) is asserted in tests/test_operators.py.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    cents = lambda c: F.floor(c * 100 + F.lit(0.5)).cast("bigint")  # noqa: E731
    li = li.select(
        "l_orderkey", "l_linenumber", cents(F.col("l_extendedprice")).alias("item_c")
    )
    o = o.select(
        F.col("o_orderkey").alias("l_orderkey"),
        cents(F.col("o_totalprice")).alias("total_c"),
    )
    s = li.groupBy("l_orderkey").agg(F.sum("item_c").cast("bigint").alias("sum_c"))
    base = (
        li.join(s, "l_orderkey")
        .join(o, "l_orderkey")
        .select(
            "l_orderkey",
            "l_linenumber",
            "total_c",
            F.expr("(total_c * item_c) DIV sum_c").alias("fl"),
            F.expr("(total_c * item_c) % sum_c").alias("rem"),
        )
    )
    w_ord = Window.partitionBy("l_orderkey")
    w_rank = w_ord.orderBy(F.col("rem").desc(), "l_linenumber")
    ranked = base.select(
        "l_orderkey",
        "l_linenumber",
        "fl",
        F.row_number().over(w_rank).alias("rn"),
        (F.col("total_c") - F.sum("fl").over(w_ord)).cast("bigint").alias("deficit"),
    )
    return ranked.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("fl") + F.when(F.col("rn") <= F.col("deficit"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc_cents"),
    )


@register(
    "weighted_median_price",
    oracle="""
    WITH x AS (
      SELECT p.p_brand,
             l.l_extendedprice AS price,
             CAST(l.l_quantity AS BIGINT) AS w
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    g AS (
      SELECT p_brand, price, CAST(sum(w) AS BIGINT) AS w
      FROM x GROUP BY p_brand, price),
    c AS (
      SELECT p_brand, price, w,
             CAST(sum(w) OVER (PARTITION BY p_brand ORDER BY price)
                  AS BIGINT) AS cw,
             CAST(sum(w) OVER (PARTITION BY p_brand) AS BIGINT) AS tw
      FROM g)
    SELECT p_brand, min(price) AS weighted_median
    FROM c WHERE 2 * cw >= tw
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (lower weighted median: smallest price whose
    cumulative quantity-weight reaches half the total) of extended price
    per brand — the robust center a quantity-weighted distribution needs
    (plain median treats a 1-unit and a 50-unit line the same; `median()`
    with weights is not a SQL aggregate in either engine).

    Exactness: the crossing condition compares ``2*cw >= tw`` in BIGINT —
    no division, no FP; the reported median is a raw column value.

    Scale shape: weights first collapse onto DISTINCT (brand, price)
    grid cells (map-side-combined aggregate — the window then runs over
    value-domain-sized partitions, not row-count-sized ones); one
    cumulative window per brand; the crossing pick is an ordinary min
    aggregate, no second sort. Same global-order discipline as the
    equi-depth histogram tier.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    x = li.join(part, li.l_partkey == part.p_partkey).select(
        "p_brand",
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    g = x.groupBy("p_brand", "price").agg(F.sum("w").cast("bigint").alias("w"))
    w_cum = Window.partitionBy("p_brand").orderBy("price")
    w_tot = Window.partitionBy("p_brand")
    c = g.select(
        "p_brand",
        "price",
        F.sum("w").over(w_cum).cast("bigint").alias("cw"),
        F.sum("w").over(w_tot).cast("bigint").alias("tw"),
    )
    return (
        c.filter(F.lit(2) * F.col("cw") >= F.col("tw"))
        .groupBy("p_brand")
        .agg(F.min("price").alias("weighted_median"))
        .orderBy("p_brand")
    )


@register(
    "yoy_revenue_growth",
    oracle="""
    WITH m AS (
      SELECT year(CAST(o_orderdate AS DATE)) AS yr,
             month(CAST(o_orderdate AS DATE)) AS mo,
             sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_d
      FROM orders GROUP BY yr, mo)
    SELECT cur.yr, cur.mo,
           CAST(round(cur.rev_d, 2) AS DOUBLE) AS revenue,
           CAST(round(prev.rev_d, 2) AS DOUBLE) AS revenue_prior,
           CAST(floor((CAST(cur.rev_d AS DOUBLE) - CAST(prev.rev_d AS DOUBLE))
                      / CAST(prev.rev_d AS DOUBLE) * 1e4 + 0.5)
                AS BIGINT) AS growth_bps
    FROM m cur JOIN m prev ON prev.yr = cur.yr - 1 AND prev.mo = cur.mo
    ORDER BY cur.yr, cur.mo
    """,
)
def yoy_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue growth with calendar alignment —
    the period-over-period report shape (this-month vs same-month-last-
    year), expressed as a self-join of the month-level aggregate on
    (year-1, month) rather than a 12-row lag (lag assumes a gapless
    month spine; the join is correct under missing months).

    Exactness: monthly revenue is a DECIMAL-accumulated sum (order-
    independent) cast to double once; growth is reported in basis points
    via the shared floor(x*1e4+0.5) grid rule — one double division,
    deterministic cross-engine.

    Scale: ONE scan aggregates to |years x 12| rows; the self-join is on
    a frame that small (broadcast); nothing else touches the fact table.
    """
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    # keep the monthly sum DECIMAL until after the round: rounding the
    # exact decimal (then casting) sidesteps the Spark-vs-DuckDB
    # round(double) repr-tie divergence (see functions/agg.grid_round)
    m = o.groupBy(
        F.year(d).alias("yr"), F.month(d).alias("mo")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev_d"))
    cur = m.select("yr", "mo", F.col("rev_d").alias("rev_c"))
    prev = m.select(
        (F.col("yr") + 1).alias("yr"), "mo", F.col("rev_d").alias("rev_p")
    )
    return (
        cur.join(F.broadcast(prev), ["yr", "mo"])
        .select(
            "yr",
            "mo",
            F.round("rev_c", 2).cast("double").alias("revenue"),
            F.round("rev_p", 2).cast("double").alias("revenue_prior"),
            F.floor(
                (
                    F.col("rev_c").cast("double")
                    - F.col("rev_p").cast("double")
                )
                / F.col("rev_p").cast("double")
                * F.lit(1e4)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("growth_bps"),
        )
        .orderBy("yr", "mo")
    )


@register(
    "golden_record_customers",
    oracle="""
    WITH v AS (
      SELECT c_custkey AS entity_id, 1 AS prio,
             c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM customer
      UNION ALL
      -- CRM feed: fresher segment, but account balance unknown
      SELECT c_custkey, 3,
             c_name, c_nationkey, NULL, c_mktsegment || '*'
      FROM customer WHERE c_custkey % 3 = 0
      UNION ALL
      -- legacy feed: name cased differently, nation unknown
      SELECT c_custkey, 2,
             upper(c_name), NULL, c_acctbal, NULL
      FROM customer WHERE c_custkey % 2 = 0)
    SELECT entity_id,
           arg_max(c_name, CASE WHEN c_name IS NOT NULL
                           THEN prio ELSE -1 END) AS name,
           arg_max(c_nationkey, CASE WHEN c_nationkey IS NOT NULL
                                THEN prio ELSE -1 END) AS nationkey,
           arg_max(c_acctbal, CASE WHEN c_acctbal IS NOT NULL
                              THEN prio ELSE -1 END) AS acctbal,
           arg_max(c_mktsegment, CASE WHEN c_mktsegment IS NOT NULL
                                 THEN prio ELSE -1 END) AS mktsegment,
           CAST(count(*) AS BIGINT) AS n_versions
    FROM v GROUP BY entity_id
    """,
)
def golden_record_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship / golden-record merge — the last step of entity
    resolution (after matching, cf. `fuzzy_join_parts` /
    `cluster_representatives`): fuse each entity's versions from multiple
    source systems into ONE record by per-COLUMN precedence, taking each
    field from the highest-priority source that has it non-null (MDM
    "best of breed" survivorship, not whole-row wins).

    The multi-source input is derived deterministically from customer
    (a higher-priority CRM feed with fresher segment but no balance, a
    lower-priority legacy feed with cased names and no nation), so the
    oracle replays the same fusion with DuckDB's arg_max.

    Scale shape: survivorship is ONE map-side-combined aggregate —
    `max_by(col, nullaware_priority)` per column — over the union of
    source scans: no per-column joins, no window, one shuffle on the
    entity key regardless of how many sources or columns participate
    (the same max_by-beats-rank argument as `argmax_per_segment`).
    """
    cust = load_table(spark, sf_dir, "customer")
    v1 = cust.select(
        F.col("c_custkey").alias("entity_id"),
        F.lit(1).alias("prio"),
        "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
    )
    v3 = (
        cust.filter(F.col("c_custkey") % 3 == 0)
        .select(
            F.col("c_custkey").alias("entity_id"),
            F.lit(3).alias("prio"),
            "c_name",
            "c_nationkey",
            F.lit(None).cast("double").alias("c_acctbal"),
            F.concat("c_mktsegment", F.lit("*")).alias("c_mktsegment"),
        )
    )
    v2 = (
        cust.filter(F.col("c_custkey") % 2 == 0)
        .select(
            F.col("c_custkey").alias("entity_id"),
            F.lit(2).alias("prio"),
            F.upper("c_name").alias("c_name"),
            F.lit(None).cast("int").alias("c_nationkey"),
            "c_acctbal",
            F.lit(None).cast("string").alias("c_mktsegment"),
        )
    )
    v = v1.unionByName(v3).unionByName(v2)

    def best(col: str):
        key = F.when(F.col(col).isNotNull(), F.col("prio")).otherwise(F.lit(-1))
        return F.max_by(F.col(col), key)

    return v.groupBy("entity_id").agg(
        best("c_name").alias("name"),
        best("c_nationkey").alias("nationkey"),
        best("c_acctbal").alias("acctbal"),
        best("c_mktsegment").alias("mktsegment"),
        F.count(F.lit(1)).cast("bigint").alias("n_versions"),
    )


def _bfs_oracle(rounds: int = 3, frac: float = 0.022) -> str:
    """Unrolled-CTE twin of the pinned-round frontier BFS over the same
    thresholded brand co-purchase graph as `kcore_brands`."""
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
        """eu AS MATERIALIZED (
      SELECT u, v FROM e0 UNION SELECT v, u FROM e0)""",
        """deg AS (SELECT u AS n, count(*) AS d FROM eu GROUP BY u)""",
        """s AS (SELECT n FROM deg ORDER BY d DESC, n LIMIT 1)""",
        """d0 AS (SELECT n, 0 AS hop FROM s)""",
    ]
    prev_d, prev_f = "d0", "d0"
    for r in range(1, rounds + 1):
        parts.append(
            f"c{r} AS (SELECT DISTINCT eu.v AS n FROM {prev_f} f"
            f" JOIN eu ON f.n = eu.u)"
        )
        parts.append(
            f"n{r} AS (SELECT c.n, {r} AS hop FROM c{r} c"
            f" WHERE c.n NOT IN (SELECT n FROM {prev_d}))"
        )
        parts.append(
            f"d{r} AS (SELECT n, hop FROM {prev_d}"
            f" UNION ALL SELECT n, hop FROM n{r})"
        )
        prev_d, prev_f = f"d{r}", f"n{r}"
    body = ",\n".join(parts)
    return (
        f"{body}\nSELECT n AS node, CAST(hop AS BIGINT) AS hop"
        f" FROM {prev_d} ORDER BY hop, node"
    )


@register("bfs_brand_hops", oracle=_bfs_oracle())
def bfs_brand_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distances over the thresholded brand co-purchase graph
    (same relative-support edge build as `kcore_brands`) from a
    DATA-ADAPTIVE source — the highest-degree brand (ties to the
    smallest name), so the query is robust to testdata regeneration (a
    hard-pinned source brand might fall out of the thresholded graph at
    some scale factor). Three pinned frontier rounds; the oracle unrolls
    the identical rounds as CTEs. See `operators/graph.bfs_hops` for the
    frontier-only scale argument.
    """
    from pandas_to_postgres_spark.operators.graph import bfs_hops

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
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
        .filter(F.col("c") >= F.lit(0.022) * F.col("n"))
        .select("u", "v")
    )
    eu = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = eu.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    source = (
        deg.orderBy(F.col("d").desc(), "u").limit(1).select(F.col("u"))
    )
    out = bfs_hops(edges, source, rounds=3)
    return out.select("node", F.col("hop").cast("bigint").alias("hop")).orderBy(
        "hop", "node"
    )


@register(
    "cusum_changepoint_events",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY event_type, CAST(ts AS DATE)),
    tot AS (
      SELECT event_type, CAST(sum(x) AS BIGINT) AS t,
             CAST(count(*) AS BIGINT) AS nd
      FROM daily GROUP BY event_type),
    p AS (
      SELECT d.event_type, d.day, d.x,
             CAST(sum(d.x * tot.nd - tot.t) OVER (
               PARTITION BY d.event_type ORDER BY d.day) AS BIGINT) AS pre,
             tot.t
      FROM daily d JOIN tot USING (event_type)),
    m AS (
      SELECT event_type, day, x, t, pre,
             CAST(min(pre) OVER (PARTITION BY event_type ORDER BY day)
                  AS BIGINT) AS mn
      FROM p)
    SELECT event_type, day, x,
           CAST(pre - least(0, mn) AS BIGINT) AS cusum_scaled,
           pre - least(0, mn) > t AS is_alert
    FROM m ORDER BY event_type, day
    """,
)
def cusum_changepoint_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detector (Page 1954) over daily event counts
    per type — the classic sequential changepoint alarm: s_i = max(0,
    s_{i-1} + (x_i - mean)), alert when accumulated excess tops one
    mean-day. The recursion LOOKS inherently sequential; the reflection
    identity s_i = prefix_i - min(0, min_{j<=i} prefix_j) turns it into a
    running sum plus a running min — two stock window functions, no
    stateful fold, no UDF.

    Exactness: deviations are scaled by the day count (x*nd - t), so the
    whole statistic — prefix sums, running min, threshold compare — is
    BIGINT; both engines agree bit-for-bit (a float mean would make every
    prefix sum order-sensitive).

    Scale: one map-side-combined daily aggregate, a broadcast of the
    per-type totals, and one window pass over |type x days| rows (the
    windows share a single (event_type, day) sort). The detector is
    restartable: persist (prefix, running-min) at a cut date and both
    windows resume from those two numbers.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.col("ts").cast("date").cast("string").alias("day")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    tot = daily.groupBy("event_type").agg(
        F.sum("x").cast("bigint").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("nd"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    p = (
        daily.join(F.broadcast(tot), "event_type")
        .withColumn(
            "pre",
            F.sum(F.col("x") * F.col("nd") - F.col("t"))
            .over(w)
            .cast("bigint"),
        )
        .withColumn("mn", F.min("pre").over(w).cast("bigint"))
    )
    cusum = (F.col("pre") - F.least(F.lit(0), F.col("mn"))).cast("bigint")
    return p.select(
        "event_type",
        "day",
        "x",
        cusum.alias("cusum_scaled"),
        (cusum > F.col("t")).alias("is_alert"),
    ).orderBy("event_type", "day")


#: join-size sketches use width 4096 (vs 1024 for point queries): the
#: inner-product estimator's additive error is e/w * |A|*|B|, so width
#: buys accuracy linearly and 4x4096 BIGINT cells are still trivial state
_CMS_KEY_SPARK = (
    "CAST(conv(substr(md5(concat(CAST({s} AS STRING), '|',"
    " CAST(l_partkey AS STRING))), 1, 15), 16, 10) AS BIGINT) % 4096"
)
_CMS_KEY_DUCK = (
    "CAST(('0x' || substr(md5(CAST({s} AS VARCHAR) || '|' ||"
    " CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT) % 4096"
)


@register(
    "join_size_estimate",
    oracle=f"""
    WITH a AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'),
    b AS (SELECT l_partkey FROM lineitem WHERE l_linestatus = 'F'),
    exact AS (
      SELECT CAST(sum(ca.n * cb.n) AS BIGINT) AS exact_size
      FROM (SELECT l_partkey, count(*) AS n FROM a GROUP BY l_partkey) ca
      JOIN (SELECT l_partkey, count(*) AS n FROM b GROUP BY l_partkey) cb
      USING (l_partkey)),
    seeds AS (SELECT unnest(generate_series(0, 3)) AS s),
    cells_a AS (
      SELECT s.s AS seed, {_CMS_KEY_DUCK.format(s='s.s')} AS bucket,
             count(*) AS n
      FROM a CROSS JOIN seeds s GROUP BY seed, bucket),
    cells_b AS (
      SELECT s.s AS seed, {_CMS_KEY_DUCK.format(s='s.s')} AS bucket,
             count(*) AS n
      FROM b CROSS JOIN seeds s GROUP BY seed, bucket),
    per_row AS (
      SELECT ca.seed, CAST(sum(ca.n * cb.n) AS BIGINT) AS ip
      FROM cells_a ca JOIN cells_b cb
        ON ca.seed = cb.seed AND ca.bucket = cb.bucket
      GROUP BY ca.seed)
    SELECT exact.exact_size,
           CAST(min(per_row.ip) AS BIGINT) AS cms_estimate,
           CAST(min(per_row.ip) - exact.exact_size AS BIGINT) AS overcount
    FROM exact CROSS JOIN per_row
    GROUP BY exact.exact_size
    """,
)
def join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from count-min sketches (the
    AMS/CMS inner-product estimator, Cormode-Muthukrishnan '05 §4.2):
    |A ⋈_k B| = Σ_k a_k·b_k is estimated by min over sketch rows of the
    bucketwise inner product Σ_b cmsA[r,b]·cmsB[r,b] — what a cost-based
    optimizer consults BEFORE running a join, computed here next to the
    exact answer as the audit (the estimate is one-sided: always >=
    exact, like every CMS query).

    The two join sides are the returned ('R') and finished ('F') slices
    of lineitem on l_partkey — overlapping multiplicity on both sides,
    so the inner product is non-trivial.

    Exactness & scale: each sketch is 4x1024 BIGINT cells from one
    map-side-combined aggregate (sketch-sized shuffle regardless of
    corpus); the inner product joins two 4096-row frames; everything is
    integer arithmetic — both engines agree exactly. At 100 TB the
    sketches are maintained incrementally (cell-wise addition per ingest
    batch, same mergeability as `cms_token_audit`) and the estimate costs
    O(sketch), never a scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    b = li.filter(F.col("l_linestatus") == "F").select("l_partkey")
    ca = a.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("na"))
    cb = b.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("nb"))
    exact = (
        ca.join(cb, "l_partkey")
        .agg(F.sum(F.col("na") * F.col("nb")).cast("bigint").alias("exact_size"))
    )

    def cells(side: DataFrame) -> DataFrame:
        return (
            side.select(
                F.posexplode(
                    F.expr(
                        "transform(sequence(0, 3), s -> "
                        + _CMS_KEY_SPARK.format(s="s")
                        + ")"
                    )
                ).alias("seed", "bucket")
            )
            .groupBy("seed", "bucket")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    per_row = (
        cells(a).withColumnRenamed("n", "na")
        .join(cells(b).withColumnRenamed("n", "nb"), ["seed", "bucket"])
        .groupBy("seed")
        .agg(F.sum(F.col("na") * F.col("nb")).cast("bigint").alias("ip"))
    )
    return (
        exact.crossJoin(F.broadcast(per_row))
        .groupBy("exact_size")
        .agg(F.min("ip").cast("bigint").alias("cms_estimate"))
        .select(
            "exact_size",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_size"))
            .cast("bigint")
            .alias("overcount"),
        )
    )


@register(
    "vocab_drift_langs",
    oracle=f"""
    WITH tok AS (
      SELECT lang, unnest({_RAW_TOKS_SQL}) AS term FROM documents),
    c AS (
      SELECT term,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS b
      FROM tok GROUP BY term),
    tot AS (
      SELECT CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb,
             CAST(count(*) AS BIGINT) AS v
      FROM c),
    z AS (
      SELECT c.term, c.a, c.b,
             (ln((c.a + CAST(0.01 AS DOUBLE))
                 / ((tot.ta + CAST(0.01 AS DOUBLE) * tot.v) - c.a
                    - CAST(0.01 AS DOUBLE)))
              - ln((c.b + CAST(0.01 AS DOUBLE))
                   / ((tot.tb + CAST(0.01 AS DOUBLE) * tot.v) - c.b
                      - CAST(0.01 AS DOUBLE))))
             / sqrt(1.0 / (c.a + CAST(0.01 AS DOUBLE))
                    + 1.0 / (c.b + CAST(0.01 AS DOUBLE))) AS zr
      FROM c CROSS JOIN tot)
    SELECT term, a AS n_en, b AS n_rest,
           CAST(floor(zr * 1e6 + 0.5) AS BIGINT) AS z_micro
    FROM z
    ORDER BY CAST(floor(abs(zr) * 1e6 + 0.5) AS BIGINT) DESC, term
    LIMIT 20
    """,
)
def vocab_drift_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Fightin' Words' vocabulary drift (Monroe/Colaresi/Quinn 2008):
    log-odds ratio with an informative Dirichlet prior, z-scored, between
    the English slice of the corpus and everything else — the principled
    token-level answer to "how does this source's language differ?",
    and the text-native sibling of the numeric PSI/KS drift tier
    (training-data mixture monitoring flags exactly this before a model
    regresses).

    Determinism: counts are integers from ONE conditional aggregate; the
    z computation is a fixed tree of IEEE ln/sqrt/divide (bit-stable
    cross-engine); ranking and the top-20 cut both use the GRID-ROUNDED
    |z| (never the raw double), so the boundary row is decided by the
    same integer in both engines, with the term as the tiebreak.

    Scale: one token explode → one map-side-combined (term) aggregate
    (vocabulary-sized shuffle); corpus totals ride a broadcast 1-row
    frame; top-20 is TakeOrderedAndProject.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(tokens_expr(F.lower(F.col("text")))).alias("term")
    )
    c = tok.groupBy("term").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when(F.col("lang") == "en", 0).otherwise(1))
        .cast("bigint")
        .alias("b"),
    )
    tot = c.agg(
        F.sum("a").cast("bigint").alias("ta"),
        F.sum("b").cast("bigint").alias("tb"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    al = F.lit(0.01)
    zr = (
        F.log(
            (F.col("a") + al)
            / ((F.col("ta") + al * F.col("v")) - F.col("a") - al)
        )
        - F.log(
            (F.col("b") + al)
            / ((F.col("tb") + al * F.col("v")) - F.col("b") - al)
        )
    ) / F.sqrt(
        F.lit(1.0) / (F.col("a") + al) + F.lit(1.0) / (F.col("b") + al)
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .withColumn("zr", zr)
        .select(
            "term",
            F.col("a").alias("n_en"),
            F.col("b").alias("n_rest"),
            F.floor(F.col("zr") * F.lit(1e6) + F.lit(0.5))
            .cast("bigint")
            .alias("z_micro"),
            F.floor(F.abs(F.col("zr")) * F.lit(1e6) + F.lit(0.5))
            .cast("bigint")
            .alias("__za"),
        )
        .orderBy(F.col("__za").desc(), "term")
        .limit(20)
        .drop("__za")
    )


@register(
    "calibration_bins_score",
    oracle="""
    WITH pts AS (
      SELECT value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE event_type IN ('purchase', 'click')),
    st AS (SELECT min(value) AS mn, max(value) AS mx FROM pts),
    z AS (
      SELECT least(CAST(floor((pts.value - st.mn) / (st.mx - st.mn) * 10)
                        AS BIGINT), 9) AS bin,
             (pts.value - st.mn) / (st.mx - st.mn) AS conf,
             pts.y
      FROM pts CROSS JOIN st)
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(y) AS BIGINT) AS n_pos,
           CAST(CAST(sum(y) AS BIGINT) * 1000000 // count(*) AS BIGINT)
             AS rate_micro,
           round(CAST(sum(CAST(conf AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*), 4) AS mean_conf
    FROM z GROUP BY bin ORDER BY bin
    """,
)
def calibration_bins_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration / reliability curve of the event-value score as a
    purchase-vs-click predictor: min-max-normalized score, 10 fixed
    confidence bins, each reporting observed positive rate vs mean
    predicted confidence — the companion diagnostic to
    `auc_purchase_score` (AUC measures ranking; calibration measures
    whether the score's MAGNITUDE means what it claims; the gap per bin
    is the reliability-diagram deviation whose weighted sum is ECE).

    Determinism: the bin index and observed rate are integer-exact
    (BIGINT floor division); mean confidence goes through the shared
    DECIMAL-accumulated davg so partial-agg merge order cannot move it.
    The min/max normalization constants ride a broadcast 1-row frame.

    Scale: one scan → 10-group map-side-combined aggregate. The same
    shape at any corpus size; no window, no sort.
    """
    from pandas_to_postgres_spark.functions.agg import davg

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    pts = ev.select(
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    st = pts.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    z = pts.crossJoin(F.broadcast(st)).select(
        F.least(
            F.floor(
                (F.col("value") - F.col("mn"))
                / (F.col("mx") - F.col("mn"))
                * F.lit(10)
            ).cast("bigint"),
            F.lit(9).cast("bigint"),
        ).alias("bin"),
        (
            (F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn"))
        ).alias("conf"),
        "y",
    )
    return (
        z.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("n_pos"),
            F.expr(
                "CAST(CAST(sum(y) AS BIGINT) * 1000000 DIV count(1) AS BIGINT)"
            ).alias("rate_micro"),
            davg(F.col("conf"), 4).alias("mean_conf"),
        )
        .orderBy("bin")
    )


@register(
    "dedup_threshold_pr",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000,
             substr(text, 1, CAST((n_chars * 6) // 10 AS INT))
      FROM documents),
    tokd AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         t -> t <> '') AS toks
      FROM corpus),
    sized AS (
      SELECT doc_id,
             list_distinct(CASE WHEN length(toks) >= 3 THEN
               list_transform(generate_series(1, length(toks) - 2),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
             ELSE [array_to_string(toks, ' ')] END) AS tk
      FROM tokd),
    szd AS (SELECT doc_id, tk, length(tk) AS sz FROM sized),
    tok AS (SELECT doc_id, sz, unnest(tk) AS t FROM szd),
    dfreq AS (SELECT t, count(*) AS dfc FROM tok GROUP BY t),
    ranked AS (
      SELECT tok.doc_id, tok.sz, tok.t,
             row_number() OVER (PARTITION BY tok.doc_id
                                ORDER BY dfreq.dfc, tok.t) AS rn
      FROM tok JOIN dfreq USING (t)),
    pref AS (
      SELECT doc_id, t FROM ranked
      WHERE rn <= sz - ceil(0.4 * sz) + 1),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM pref a JOIN pref b ON a.t = b.t AND a.doc_id < b.doc_id),
    ver AS (
      SELECT id_a, id_b,
             CAST(len(list_intersect(x.tk, y.tk)) * 1000000
                  // (len(x.tk) + len(y.tk)
                      - len(list_intersect(x.tk, y.tk))) AS BIGINT) AS jm,
             (id_b = id_a + 1000000) AS planted
      FROM cand
      JOIN szd x ON x.doc_id = cand.id_a
      JOIN szd y ON y.doc_id = cand.id_b
      WHERE len(list_intersect(x.tk, y.tk)) * 1000000
            >= 400000 * (len(x.tk) + len(y.tk)
                         - len(list_intersect(x.tk, y.tk)))),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    th AS (SELECT unnest(generate_series(4, 9)) * 100000 AS t)
    SELECT th.t AS threshold_micro,
           CAST(sum(CASE WHEN ver.jm >= th.t AND ver.planted
                    THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN ver.jm >= th.t AND NOT ver.planted
                    THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(CASE WHEN ver.jm >= th.t AND ver.planted
                         THEN 1 ELSE 0 END) * 1000000
                // max(nd.n_docs) AS BIGINT) AS recall_micro
    FROM th CROSS JOIN nd LEFT JOIN ver ON true
    GROUP BY th.t
    ORDER BY th.t
    """,
)
def dedup_threshold_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold sweep of the exact dedup verifier against PLANTED ground
    truth: every document gets a 60%-length truncated twin (integer
    arithmetic for the cut — a double 0.6*n would ceil() differently per
    engine), exact prefix-filtered trigram Jaccard finds candidate pairs
    at tau >= 0.4, and six thresholds report TP / FP / recall — the
    operating-point curve a dedup pipeline owner reads before picking
    tau (the same evaluation discipline as `calibration_bins_score`, but
    for the similarity-join family; recall's denominator is the planted
    pair count = |documents|).

    Exactness: pair Jaccard is the integer micro ratio; the sweep
    compares BIGINTs; recall uses integer floor division. Recall < 1 at
    tau = 0.4 is a finding, not a bug: truncation pushes some twins'
    true trigram Jaccard below 0.4 (they are genuinely not
    0.4-duplicates).

    Scale: candidates come from the SIGMOD'10 prefix filter (exact
    recall by construction, candidate space bounded by rare-shingle df);
    the sweep itself is a 6-row literal crossJoin over the verified-pair
    frame — threshold count never multiplies corpus work.
    """
    from pandas_to_postgres_spark.operators.dedup import ngram_jaccard_prefix

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )
    trunc = d.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.expr(
            "substring(text, 1, CAST((n_chars * 6) DIV 10 AS INT))"
        ).alias("text"),
    )
    corpus = d.select("doc_id", "text").unionByName(trunc)
    pairs = ngram_jaccard_prefix(
        corpus, text_col="text", id_col="doc_id", threshold=0.4, n=3,
        with_sizes=True,
    )
    # EXACT integer micro ratio i*1e6 DIV u — the same arithmetic the
    # oracle runs. (Deriving jm from the 4-dp-rounded double drifted up
    # to ~50 micro, flipping pairs whose true Jaccard sits within 5e-5
    # of a 100000-micro threshold between engines.)
    ver = pairs.select(
        F.expr("CAST(inter_sz * 1000000 DIV union_sz AS BIGINT)").alias("jm"),
        (F.col("id_b") == F.col("id_a") + F.lit(1_000_000)).alias("planted"),
    )
    nd = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    th = spark.range(4, 10).select(
        (F.col("id") * F.lit(100000)).cast("bigint").alias("t")
    )
    return (
        th.crossJoin(F.broadcast(nd))
        .join(ver, F.lit(True), "left")
        .groupBy("t")
        .agg(
            F.sum(
                F.when((F.col("jm") >= F.col("t")) & F.col("planted"), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("tp"),
            F.sum(
                F.when((F.col("jm") >= F.col("t")) & ~F.col("planted"), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("fp"),
            F.expr(
                "CAST(CAST(sum(CASE WHEN jm >= t AND planted THEN 1 ELSE 0 "
                "END) AS BIGINT) * 1000000 DIV max(n_docs) AS BIGINT)"
            ).alias("recall_micro"),
        )
        .select(F.col("t").alias("threshold_micro"), "tp", "fp", "recall_micro")
        .orderBy("threshold_micro")
    )


@register(
    "burstiness_users",
    oracle="""
    WITH g AS (
      SELECT user_id,
             CAST(epoch_us(ts) // 1000000
                  - lag(epoch_us(ts) // 1000000) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id)
                  AS BIGINT) AS gap
      FROM events),
    s AS (
      SELECT user_id,
             CAST(count(gap) AS BIGINT) AS n,
             CAST(sum(gap) AS BIGINT) AS sg,
             CAST(sum(gap * gap) AS BIGINT) AS sg2
      FROM g WHERE gap IS NOT NULL GROUP BY user_id
      HAVING count(gap) >= 2)
    SELECT user_id, n,
           CAST(sg // n AS BIGINT) AS mean_gap_s,
           CAST(floor((sqrt(CAST(n * sg2 - sg * sg AS DOUBLE)) / n
                       - CAST(sg AS DOUBLE) / n)
                      / (sqrt(CAST(n * sg2 - sg * sg AS DOUBLE)) / n
                         + CAST(sg AS DOUBLE) / n)
                      * 1e6 + 0.5) AS BIGINT) AS burstiness_micro
    FROM s
    ORDER BY n DESC, user_id LIMIT 20
    """,
)
def burstiness_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival burstiness (Goh & Barabási 2008): B = (σ−μ)/(σ+μ)
    of each user's event gaps — B→−1 periodic, 0 Poisson, →+1 bursty;
    the temporal-signature feature bot-detection and engagement models
    use, which plain rate/streak metrics can't see.

    Exactness: gaps are integer seconds; Σg and Σg² accumulate in BIGINT
    (order-free), so the variance numerator n·Σg² − (Σg)² is EXACT
    before the one sqrt; μ and σ then take identical IEEE paths in both
    engines and B lands on the shared micro grid. (A double-accumulated
    variance would be partial-merge-order dependent — the same trap
    `functions/agg` exists for, solved here with integers instead of
    DECIMAL because gaps are naturally integral.)

    Scale: the lag rides the SAME per-user window exchange the
    lag/EWMA family pays (one shuffle), then a map-side-combined
    per-user aggregate; top-20 is TakeOrderedAndProject.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 1000000")
    g = ev.select(
        "user_id", (sec - F.lag(sec).over(w)).cast("bigint").alias("gap")
    ).filter(F.col("gap").isNotNull())
    s = (
        g.groupBy("user_id")
        .agg(
            F.count("gap").cast("bigint").alias("n"),
            F.sum("gap").cast("bigint").alias("sg"),
            F.sum(F.col("gap") * F.col("gap")).cast("bigint").alias("sg2"),
        )
        .filter(F.col("n") >= 2)
    )
    sigma = F.sqrt((F.col("n") * F.col("sg2") - F.col("sg") * F.col("sg")).cast("double")) / F.col("n")
    mu = F.col("sg").cast("double") / F.col("n")
    return (
        s.select(
            "user_id",
            "n",
            F.expr("CAST(sg DIV n AS BIGINT)").alias("mean_gap_s"),
            F.floor((sigma - mu) / (sigma + mu) * F.lit(1e6) + F.lit(0.5))
            .cast("bigint")
            .alias("burstiness_micro"),
        )
        .orderBy(F.col("n").desc(), "user_id")
        .limit(20)
    )


@register(
    "rolling_corr_events",
    oracle="""
    WITH d AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events GROUP BY CAST(ts AS DATE)),
    w AS (
      SELECT day, x, y,
             CAST(count(*) OVER win AS BIGINT) AS n,
             CAST(sum(x) OVER win AS BIGINT) AS sx,
             CAST(sum(y) OVER win AS BIGINT) AS sy,
             CAST(sum(x * y) OVER win AS BIGINT) AS sxy,
             CAST(sum(x * x) OVER win AS BIGINT) AS sx2,
             CAST(sum(y * y) OVER win AS BIGINT) AS sy2
      FROM d
      WINDOW win AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
    SELECT day, n,
           CASE WHEN (n * sx2 - sx * sx) > 0 AND (n * sy2 - sy * sy) > 0
           THEN CAST(floor(
             CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sx2 - sx * sx AS DOUBLE))
                * sqrt(CAST(n * sy2 - sy * sy AS DOUBLE)))
             * 1e6 + 0.5) AS BIGINT)
           ELSE NULL END AS corr_micro
    FROM w WHERE n >= 3 ORDER BY day
    """,
)
def rolling_corr_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day Pearson correlation between the purchase and click
    daily-count series — the co-movement monitor (did the funnel's
    stages decouple this week?). Every moment (Σx, Σy, Σxy, Σx², Σy²)
    accumulates in BIGINT over integer counts, so both variance terms
    and the covariance numerator are EXACT; the two sqrts and one
    division take identical IEEE paths and the result lands on the
    micro grid. Zero-variance windows yield NULL, not a crash or a
    fake 0.

    Scale: one map-side-combined daily aggregate, then ONE window over
    |days| rows computing all five moments in the same frame — the
    7-day trailing window never touches raw events. (The day-level
    global window is fine: |days| rows per series; shard by series key
    when monitoring many metrics.)
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.col("ts").cast("date").cast("string").alias("day")
    ).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    win = Window.orderBy("day").rowsBetween(-6, 0)
    w = d.select(
        "day",
        F.count(F.lit(1)).over(win).cast("bigint").alias("n"),
        F.sum("x").over(win).cast("bigint").alias("sx"),
        F.sum("y").over(win).cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(win).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(win).cast("bigint").alias("sx2"),
        F.sum(F.col("y") * F.col("y")).over(win).cast("bigint").alias("sy2"),
    )
    varx = F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("sy2") - F.col("sy") * F.col("sy")
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    r = F.floor(
        num / (F.sqrt(varx.cast("double")) * F.sqrt(vary.cast("double")))
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("bigint")
    return (
        w.filter(F.col("n") >= 3)
        .select(
            "day",
            "n",
            F.when((varx > 0) & (vary > 0), r).alias("corr_micro"),
        )
        .orderBy("day")
    )


@register(
    "seasonal_backtest_events",
    oracle="""
    WITH d AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(sum(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT)
               AS a_micro
      FROM events GROUP BY CAST(ts AS DATE)),
    f AS (
      SELECT day, a_micro,
             lag(a_micro, 7) OVER (ORDER BY day) AS f_micro
      FROM d)
    SELECT day, a_micro, f_micro,
           CAST(2000000 * abs(f_micro - a_micro)
                // (abs(f_micro) + abs(a_micro)) AS BIGINT) AS smape_micro
    FROM f WHERE f_micro IS NOT NULL
      AND abs(f_micro) + abs(a_micro) > 0
    ORDER BY day
    """,
)
def seasonal_backtest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's total event
    value with the value seven days earlier (the baseline every real
    forecasting system must beat) and score each prediction with sMAPE —
    the standard scale-free backtest error. Daily totals become exact
    micro BIGINTs through DECIMAL accumulation, so the lag, the absolute
    errors, and the sMAPE ratio (integer floor division) are bit-exact
    cross-engine — no FP anywhere.

    Scale: one daily aggregate, one lag window over |days| rows. The
    backtest never re-reads events; horizon changes are a lag offset.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.col("ts").cast("date").cast("string").alias("day")
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,6)")) * F.lit(1000000))
        .cast("bigint")
        .alias("a_micro")
    )
    w = Window.orderBy("day")
    f = d.select(
        "day", "a_micro", F.lag("a_micro", 7).over(w).alias("f_micro")
    )
    return (
        f.filter(
            F.col("f_micro").isNotNull()
            & (F.abs("f_micro") + F.abs("a_micro") > 0)
        )
        .select(
            "day",
            "a_micro",
            "f_micro",
            F.expr(
                "CAST(2000000 * abs(f_micro - a_micro)"
                " DIV (abs(f_micro) + abs(a_micro)) AS BIGINT)"
            ).alias("smape_micro"),
        )
        .orderBy("day")
    )


@register(
    "hhi_concentration",
    oracle="""
    WITH c AS (
      SELECT c_mktsegment, o_custkey, count(*) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment, o_custkey)
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(n) AS BIGINT) AS n_orders,
           CAST(sum(n * n) * 1000000
                // (CAST(sum(n) AS BIGINT) * CAST(sum(n) AS BIGINT))
                AS BIGINT) AS hhi_micro
    FROM c GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index per market segment: HHI
    = Σ share² over customers' order shares — the standard market- /
    supplier-concentration screen (1/n_customers = perfectly even, 1 =
    single-customer dependence). The ratio Σn² · 10⁶ // (Σn)² is pure
    BIGINT (move to DECIMAL(38,0) when Σn² can exceed 2⁶³ — same
    escalation rule as the AUC/KS statistics).

    Scale: two map-side-combined aggregates (customer grain, then
    segment grain) on the same join — no window, no sort.
    """
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    c = (
        o.join(cust, o.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("n").cast("bigint").alias("n_orders"),
            F.expr(
                "CAST(sum(n * n) * 1000000 DIV"
                " (CAST(sum(n) AS BIGINT) * CAST(sum(n) AS BIGINT))"
                " AS BIGINT)"
            ).alias("hhi_micro"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "table_digest_lineitem",
    oracle="""
    WITH h AS (
      SELECT CAST(('0x' || substr(md5(
               CAST(l_orderkey AS VARCHAR) || '|' ||
               CAST(l_linenumber AS VARCHAR) || '|' ||
               CAST(l_partkey AS VARCHAR) || '|' ||
               CAST(l_suppkey AS VARCHAR) || '|' ||
               l_returnflag || '|' || l_linestatus || '|' ||
               CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                    AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM lineitem)
    SELECT CAST(h % 256 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(bit_xor(h) AS BIGINT) AS digest
    FROM h GROUP BY h % 256 ORDER BY bucket
    """,
)
def table_digest_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed content digest for TABLE RECONCILIATION: every row hashes
    to a 60-bit md5 value over a canonical serialization (integers,
    flags, and money floored to exact cents — raw double-to-string
    formatting is NOT engine-portable and is deliberately absent), rows
    land in 256 hash buckets, and each bucket reports (count, XOR of row
    hashes). Two replicas of a table — across clusters, engines, or a
    migration — compare 256 rows instead of re-scanning each other: a
    mismatched bucket pinpoints WHERE to drill (recurse on the bucket's
    prefix for a Merkle-style descent), identical digests certify
    equality up to hash collisions. `snapshot_diff` finds WHICH rows
    changed between local snapshots; this answers the cheaper remote
    question "are we even different?" with O(buckets) transfer.

    Exactness: XOR is order- and partition-independent and BIGINT-exact;
    both engines replay the identical md5 serialization. Scale: one
    map-side-combinable aggregate into <=256 groups — scan-bound, zero
    wide shuffles, digest size independent of row count.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ser = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_partkey").cast("string"),
        F.col("l_suppkey").cast("string"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .cast("string"),
    )
    h = F.conv(F.substring(F.md5(ser), 1, 15), 16, 10).cast("bigint")
    return (
        li.select(h.alias("h"))
        .groupBy((F.col("h") % 256).cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.expr("CAST(bit_xor(h) AS BIGINT)").alias("digest"),
        )
        .orderBy("bucket")
    )


@register(
    "mann_kendall_trend",
    oracle="""
    WITH d AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(sum(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT)
               AS v
      FROM events GROUP BY CAST(ts AS DATE)),
    n_ AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    s_ AS (
      SELECT CAST(sum(CASE WHEN b.v > a.v THEN 1
                           WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s
      FROM d a JOIN d b ON a.day < b.day),
    ties AS (
      SELECT coalesce(CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT), 0)
               AS tie_term
      FROM (SELECT count(*) AS t FROM d GROUP BY v HAVING count(*) > 1)),
    var_ AS (
      SELECT CAST(n_.n * (n_.n - 1) * (2 * n_.n + 5) - ties.tie_term
                  AS BIGINT) AS var18
      FROM n_ CROSS JOIN ties)
    SELECT n_.n, s_.s, var_.var18,
           CAST(floor(
             (s_.s - CASE WHEN s_.s > 0 THEN 1
                          WHEN s_.s < 0 THEN -1 ELSE 0 END)
             / sqrt(CAST(var_.var18 AS DOUBLE) / 18.0)
             * 1e6 + 0.5) AS BIGINT) AS z_micro
    FROM n_ CROSS JOIN s_ CROSS JOIN var_
    """,
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test on the daily event-value series
    — the distribution-free "is this metric drifting?" answer that
    complements CUSUM (level shifts) and KS/PSI (distribution changes):
    S = Σ_{i<j} sign(x_j − x_i), tie-corrected variance, and the
    continuity-corrected z statistic.

    Exactness: daily totals are DECIMAL-derived micro BIGINTs; S, the
    tie term, and 18·Var(S) are all pure integer arithmetic (both
    engines identical), with the single sqrt/division at the very end on
    the micro grid.

    Scale: the pair sum is a self-join over the DAY-GRAIN frame — |days|²
    comparisons per series, which is the statistic's definition and is
    tiny at any corpus size (the corpus-sized work is one map-side-
    combined daily aggregate); per-series sharding applies unchanged
    when monitoring many metrics.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.col("ts").cast("date").cast("string").alias("day")
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,6)")) * F.lit(1000000))
        .cast("bigint")
        .alias("v")
    )
    n_ = d.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = d.select(F.col("day").alias("da"), F.col("v").alias("va"))
    b = d.select(F.col("day").alias("db"), F.col("v").alias("vb"))
    s_ = (
        a.join(b, F.col("da") < F.col("db"))
        .agg(
            F.sum(
                F.when(F.col("vb") > F.col("va"), 1)
                .when(F.col("vb") < F.col("va"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s")
        )
    )
    ties = (
        d.groupBy("v")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ).cast("bigint"),
                F.lit(0).cast("bigint"),
            ).alias("tie_term")
        )
    )
    out = (
        n_.crossJoin(F.broadcast(s_))
        .crossJoin(F.broadcast(ties))
        .withColumn(
            "var18",
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.col("tie_term")
            ).cast("bigint"),
        )
    )
    sign_s = (
        F.when(F.col("s") > 0, 1).when(F.col("s") < 0, -1).otherwise(0)
    )
    return out.select(
        "n",
        "s",
        "var18",
        F.floor(
            (F.col("s") - sign_s)
            / F.sqrt(F.col("var18").cast("double") / F.lit(18.0))
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("z_micro"),
    )


@register(
    "theilsen_slope",
    oracle="""
    WITH d AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             row_number() OVER (ORDER BY CAST(ts AS DATE)) AS di,
             CAST(sum(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT)
               AS v
      FROM events GROUP BY CAST(ts AS DATE)),
    sl AS (
      SELECT CAST(b.v - a.v AS DOUBLE) / (b.di - a.di) AS slope
      FROM d a JOIN d b ON a.di < b.di),
    r AS (
      SELECT slope,
             row_number() OVER (ORDER BY slope) AS rn,
             count(*) OVER () AS m
      FROM sl)
    SELECT CAST(max(m) AS BIGINT) AS n_pairs,
           CAST(floor(max(CASE WHEN rn = (m + 1) // 2 THEN slope END)
                      + 0.5) AS BIGINT) AS slope_micro_per_day
    FROM r
    """,
)
def theilsen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen slope of the daily event-value series: the (lower)
    median of all pairwise slopes — the robust trend MAGNITUDE that
    pairs with `mann_kendall_trend`'s direction test (29% breakdown
    point; a single corrupt day cannot drag it, unlike OLS).

    Determinism: day values are DECIMAL-derived micro BIGINTs and day
    indexes are dense ranks, so every pairwise slope is ONE exact-
    integer-over-integer IEEE division — bit-identical cross-engine —
    and the median pick selects by rank over those doubles (lower median
    at rank (m+1) DIV 2; equal slopes order equally in both engines).

    Scale: pairing is over the DAY-GRAIN frame (the estimator's own
    O(|days|²) definition — 435 pairs for a month); corpus-sized work is
    one map-side-combined daily aggregate. Per-series sharding applies
    unchanged; for very long series the repeated-median variant bounds
    the pair space per point.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.col("ts").cast("date").cast("string").alias("day")
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,6)")) * F.lit(1000000))
        .cast("bigint")
        .alias("v")
    )
    d = d.withColumn("di", F.row_number().over(Window.orderBy("day")))
    a = d.select(F.col("di").alias("ia"), F.col("v").alias("va"))
    b = d.select(F.col("di").alias("ib"), F.col("v").alias("vb"))
    sl = a.join(b, F.col("ia") < F.col("ib")).select(
        (
            (F.col("vb") - F.col("va")).cast("double")
            / (F.col("ib") - F.col("ia"))
        ).alias("slope")
    )
    r = sl.select(
        "slope",
        F.row_number().over(Window.orderBy("slope")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
    )
    return r.agg(
        F.max("m").cast("bigint").alias("n_pairs"),
        F.floor(
            F.max(
                F.when(
                    F.col("rn") == F.expr("(m + 1) DIV 2"), F.col("slope")
                )
            )
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("slope_micro_per_day"),
    )


@register("multimodal_thumbnail", oracle=None)  # binary codec path: no SQL twin
def multimodal_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full REAL image-processing loop inside one map-only stage:
    synthesize a deterministic JPEG per document (gradient keyed by
    doc_id), DECODE it (pure-numpy Huffman + IDCT,
    `operators/jpeg_codec.py`), nearest-neighbor RESIZE to an 8x8
    thumbnail, and RE-ENCODE as PNG — the decode→transform→encode
    pipeline every multimodal training-data prep runs, with zero stubbed
    steps and zero imaging libraries. Output per doc: original and
    thumbnail dimensions + payload sizes and the thumbnail's mean
    luminance (deterministic — rows-only checked by the driver,
    golden-tested in pytest via the codec unit suite).

    Scale: synthesis, decode, resize, and re-encode all happen inside
    ONE mapInPandas over the documents scan — payloads are created and
    consumed in the same task, never shuffled; only the small stat rows
    move. At 100 TB this is the D5 scale argument verbatim
    (`operators/multimodal.py`): Arrow-batched, partition-local,
    output-bounded.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    # the codec work is Python-CPU-bound: spread it across cores even
    # when the small documents file arrives as one scan split (a real
    # 100 TB corpus is many splits and needs no repartition)
    d = d.repartition(d.sparkSession.sparkContext.defaultParallelism)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("src_h", T.LongType()),
            T.StructField("src_w", T.LongType()),
            T.StructField("src_bytes", T.LongType()),
            T.StructField("thumb_bytes", T.LongType()),
            T.StructField("thumb_mean_y", T.DoubleType()),
        ]
    )

    def pipeline(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pandas_to_postgres_spark.operators.jpeg_codec import (
            decode_jpeg,
            encode_jpeg,
        )
        from pandas_to_postgres_spark.operators.media_codecs import (
            encode_png,
            resize_rgb,
        )

        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                # small frames keep the pure-Python codec proportionate
                # (a libjpeg swap-in lifts this limit; see jpeg_codec.py)
                h = 8 + (int(n_chars) % 16)
                w = 8 + (int(doc_id) % 16)
                yy, xx = np.mgrid[0:h, 0:w]
                rgb = np.stack(
                    [
                        (yy * 5 + int(doc_id)) % 256,
                        (xx * 9) % 256,
                        (yy * 2 + xx * 3) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                jpg = encode_jpeg(rgb)
                decoded = decode_jpeg(jpg)
                thumb = resize_rgb(decoded, 8, 8)
                png = encode_png(thumb)
                lum = (
                    0.299 * thumb[..., 0]
                    + 0.587 * thumb[..., 1]
                    + 0.114 * thumb[..., 2]
                )
                rows.append(
                    (
                        int(doc_id),
                        h,
                        w,
                        len(jpg),
                        len(png),
                        round(float(lum.mean()), 4),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "src_h", "src_w", "src_bytes",
                    "thumb_bytes", "thumb_mean_y",
                ],
            )

    return d.mapInPandas(pipeline, schema=schema)


@register(
    "sliding_distinct_types",
    oracle="""
    WITH base AS (
      SELECT DISTINCT user_id,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dayidx,
             event_type
      FROM events)
    SELECT DISTINCT user_id,
           CAST(DATE '1970-01-01' + CAST(dayidx AS INT) AS VARCHAR) AS day,
           CAST(count(DISTINCT event_type) OVER (
             PARTITION BY user_id ORDER BY dayidx
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_types
    FROM base
    ORDER BY user_id, day
    """,
)
def sliding_distinct_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day DISTINCT event-type count per user — the sliding
    distinct-count window SQL promises but Spark's window functions
    refuse (``count(DISTINCT) OVER`` is unsupported), bridged with
    ``size(collect_set() OVER range-window)``: set semantics give
    exactness, and the per-window state is bounded by event-TYPE
    cardinality (a handful), not event count — the difference between
    this and a naive collect_list is what makes it safe at scale.

    Shape: events first collapse to DISTINCT (user, day, type) rows (a
    map-side-combined aggregate — the window then runs over at most
    |types| rows per user-day, never raw events); one RANGE window on
    the integer day index handles calendar gaps correctly (ROWS would
    silently span missing days). DuckDB's native DISTINCT window
    aggregate replays it declaratively.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("dayidx"),
        "event_type",
    ).distinct()
    w = (
        Window.partitionBy("user_id")
        .orderBy("dayidx")
        .rangeBetween(-6, 0)
    )
    return (
        base.select(
            "user_id",
            F.date_add(F.lit("1970-01-01").cast("date"), F.col("dayidx"))
            .cast("string")
            .alias("day"),
            F.size(F.collect_set("event_type").over(w))
            .cast("bigint")
            .alias("n_types"),
        )
        .distinct()
        .orderBy("user_id", "day")
    )


@register(
    "diversified_topk_docs",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS score,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rs
      FROM documents)
    SELECT doc_id, source, score
    FROM ranked WHERE rs <= 2
    ORDER BY score DESC, doc_id LIMIT 20
    """,
)
def diversified_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified top-k: the 20 highest-scoring documents subject to AT
    MOST 2 PER SOURCE — the curation shortlist shape (best examples for
    review/eval sets) where a plain top-k would let one prolific source
    monopolize the list. Score here is document length; swap any quality
    expression.

    Shape: per-source cap first (a rank window whose partitions are
    source-sized and whose output is ≤ 2·|sources| rows), THEN the
    global top-k over that tiny survivor frame as
    TakeOrderedAndProject — order matters: global-rank-first would need
    the full sort; cap-first bounds everything after the one window
    shuffle. Deterministic tiebreaks (doc_id) at both levels keep the
    boundary rows engine-stable.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    return (
        d.select(
            "doc_id",
            "source",
            F.col("n_chars").cast("bigint").alias("score"),
            F.row_number().over(w).alias("rs"),
        )
        .filter(F.col("rs") <= 2)
        .select("doc_id", "source", "score")
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(20)
    )


@register(
    "spearman_value_hour",
    oracle="""
    WITH base AS (
      SELECT event_type, value AS x,
             CAST(hour(ts) AS BIGINT) AS y
      FROM events),
    rk AS (
      SELECT event_type,
             CAST(2 * rank() OVER (PARTITION BY event_type ORDER BY x)
                  + count(*) OVER (PARTITION BY event_type, x) - 1
                  AS BIGINT) AS rx,
             CAST(2 * rank() OVER (PARTITION BY event_type ORDER BY y)
                  + count(*) OVER (PARTITION BY event_type, y) - 1
                  AS BIGINT) AS ry
      FROM base),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(rx) AS BIGINT) AS sx,
             CAST(sum(ry) AS BIGINT) AS sy,
             CAST(sum(rx * ry) AS BIGINT) AS sxy,
             CAST(sum(rx * rx) AS BIGINT) AS sx2,
             CAST(sum(ry * ry) AS BIGINT) AS sy2
      FROM rk GROUP BY event_type)
    SELECT event_type, n,
           CAST(floor(
             CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sx2 - sx * sx AS DOUBLE))
                * sqrt(CAST(n * sy2 - sy * sy AS DOUBLE)))
             * 1e6 + 0.5) AS BIGINT) AS rho_micro
    FROM m ORDER BY event_type
    """,
)
def spearman_value_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between event value and hour-of-day per
    event type — the NONPARAMETRIC monotone-association test (is value
    drifting by time of day in ANY monotone way?), complementing the
    parametric `rolling_corr_events`. Tie handling is the textbook
    average-rank rule made exact: doubled average rank = 2·min_rank +
    tie_count − 1 is an INTEGER, so every Pearson-on-ranks moment
    accumulates in BIGINT and the one sqrt/divide happens at the end on
    the micro grid (the naive 1 − 6Σd²/... shortcut is WRONG under ties
    and is deliberately not used).

    Shape: two rank windows sharing the per-type partitioning, then one
    map-side-combined moment aggregate. Ranks are per-type-sized
    windows; n·Σ(r²) stays < 2⁶³ up to ~10⁷ rows per group — beyond
    that, DECIMAL(38,0) (the shared escalation rule).
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.col("value").alias("x"),
        F.hour("ts").cast("bigint").alias("y"),
    )
    wx = Window.partitionBy("event_type").orderBy("x")
    wxc = Window.partitionBy("event_type", "x")
    wy = Window.partitionBy("event_type").orderBy("y")
    wyc = Window.partitionBy("event_type", "y")
    rk = base.select(
        "event_type",
        (
            2 * F.rank().over(wx) + F.count(F.lit(1)).over(wxc) - 1
        ).cast("bigint").alias("rx"),
        (
            2 * F.rank().over(wy) + F.count(F.lit(1)).over(wyc) - 1
        ).cast("bigint").alias("ry"),
    )
    m = rk.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("rx").cast("bigint").alias("sx"),
        F.sum("ry").cast("bigint").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).cast("bigint").alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).cast("bigint").alias("sx2"),
        F.sum(F.col("ry") * F.col("ry")).cast("bigint").alias("sy2"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt(
        (F.col("n") * F.col("sy2") - F.col("sy") * F.col("sy")).cast("double")
    )
    return m.select(
        "event_type",
        "n",
        F.floor(num / den * F.lit(1e6) + F.lit(0.5))
        .cast("bigint")
        .alias("rho_micro"),
    ).orderBy("event_type")


@register(
    "trimmed_mean_price",
    oracle="""
    WITH r AS (
      SELECT p_brand, l_extendedprice AS price,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY l_extendedprice) AS rn,
             count(*) OVER (PARTITION BY p_brand) AS n
      FROM lineitem JOIN part ON l_partkey = p_partkey)
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_kept,
           round(CAST(sum(CAST(price AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*), 4) AS trimmed_mean
    FROM r
    WHERE rn > n // 10 AND rn <= n - n // 10
    GROUP BY p_brand ORDER BY p_brand
    """,
)
def trimmed_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 10% two-sided TRIMMED mean of extended price per brand —
    the drop-the-tails robust center (`winsorized_stats` CLAMPS the
    tails instead; trimming discards them, the classic Tukey choice when
    outliers are erroneous rather than extreme-but-real).

    Correctness subtlety: rows are trimmed by count (floor(n/10) per
    side) via a rank whose tie order is engine-arbitrary — harmless,
    because tied rows carry EQUAL values, so the kept multiset of
    values (and therefore the DECIMAL-accumulated mean) is identical
    whichever duplicates the rank drops. The mean follows the shared
    davg discipline (exact decimal sum, one division, round).

    Shape: one rank window per brand (the same per-brand partitioning
    the window family pays) and a map-side-combined aggregate over the
    kept rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey).select(
        "p_brand", F.col("l_extendedprice").alias("price")
    )
    w = Window.partitionBy("p_brand").orderBy("price")
    wc = Window.partitionBy("p_brand")
    r = j.select(
        "p_brand",
        "price",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    kept = r.filter(
        (F.col("rn") > F.expr("n DIV 10"))
        & (F.col("rn") <= F.col("n") - F.expr("n DIV 10"))
    )
    return (
        kept.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.round(
                F.sum(F.col("price").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("trimmed_mean"),
        )
        .orderBy("p_brand")
    )


@register(
    "mean_ci_segments",
    oracle="""
    WITH c AS (
      SELECT c_mktsegment,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders JOIN customer ON o_custkey = c_custkey),
    m AS (
      SELECT c_mktsegment,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s,
             CAST(sum(CAST(cents AS DECIMAL(38,0))
                      * CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
      FROM c GROUP BY c_mktsegment)
    SELECT c_mktsegment, n,
           -- HUGEINT floor division: DECIMAL // BIGINT detours through
           -- DOUBLE in DuckDB and can round up off the true floor
           CAST(CAST(s AS HUGEINT) // n AS BIGINT) AS mean_cents,
           CAST(floor(
             1.959964 * sqrt(CAST(n * s2 - s * s AS DOUBLE)
                             / (CAST(n AS DOUBLE) * (n - 1)))
             / sqrt(CAST(n AS DOUBLE)) * 100.0 + 0.5) AS BIGINT)
             AS ci_halfwidth_hundredth_cents
    FROM m ORDER BY c_mktsegment
    """,
)
def mean_ci_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean order value per market segment with a 95% normal-theory
    confidence half-width — the error bar every reporting surface needs
    next to the point estimate. Moments are EXACT: cents are integers,
    Σx and Σx² accumulate in DECIMAL(38,0) (Σx² exceeds BIGINT at ~10⁴
    rows of 10⁵-dollar orders — the same escalation the AUC/KS tier
    documents), so the variance numerator n·Σx² − (Σx)² is exact and
    partition-order-free; the two sqrts and one multiply by z happen
    once at the end on the grid.

    Shape: one join + one map-side-combined aggregate; no window, no
    sort. (The DECIMAL(38,0) products stay 24 digits here — inside
    Spark's decimal precision cap; ANSI would error, not corrupt, if a
    larger corpus crossed it.)
    """
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    c = o.join(cust, o.o_custkey == cust.c_custkey).select(
        "c_mktsegment",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    dec = F.col("cents").cast("decimal(38,0)")
    m = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec).cast("decimal(38,0)").alias("s"),
        F.sum(dec * dec).cast("decimal(38,0)").alias("s2"),
    )
    var_num = (F.col("n") * F.col("s2") - F.col("s") * F.col("s")).cast(
        "double"
    )
    sd = F.sqrt(
        var_num / (F.col("n").cast("double") * (F.col("n") - 1))
    )
    return m.select(
        "c_mktsegment",
        "n",
        F.expr("CAST(s DIV n AS BIGINT)").alias("mean_cents"),
        F.floor(
            F.lit(1.959964)
            * sd
            / F.sqrt(F.col("n").cast("double"))
            * F.lit(100.0)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("ci_halfwidth_hundredth_cents"),
    ).orderBy("c_mktsegment")


# ---------------------------------------------------------------- DSIR

#: DSIR hashed feature space: unigrams + bigrams folded into 256 buckets
#: via the shared md5 dialect, so DuckDB replays the exact model.
_DSIR_B = 256
_DSIR_BUCKET_SPARK = (
    "CAST(conv(substr(md5(f), 1, 15), 16, 10) AS BIGINT) % 256"
)
_DSIR_BUCKET_DUCK = "CAST(('0x' || substr(md5(f), 1, 15)) AS BIGINT) % 256"


@register(
    "dsir_select_docs",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, {_RAW_TOKS_SQL} AS toks FROM documents),
    feats AS (
      SELECT doc_id, lang,
             unnest(list_concat(
               toks,
               list_transform(generate_series(1, len(toks) - 1),
                              i -> toks[i] || ' ' || toks[i + 1]))) AS f
      FROM tok),
    hashed AS (
      SELECT doc_id, lang, {_DSIR_BUCKET_DUCK} AS b FROM feats),
    src AS (SELECT b, CAST(count(*) AS BIGINT) AS c_s FROM hashed GROUP BY b),
    tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS c_t
            FROM hashed WHERE lang = 'en' GROUP BY b),
    counts AS (
      SELECT src.b, src.c_s, coalesce(tgt.c_t, 0) AS c_t
      FROM src LEFT JOIN tgt USING (b)),
    tot AS (SELECT CAST(sum(c_s) AS BIGINT) AS n_s,
                   CAST(sum(c_t) AS BIGINT) AS n_t FROM counts),
    model AS (
      SELECT counts.b,
             log10(CAST(counts.c_t + 1 AS DOUBLE) / (tot.n_t + {_DSIR_B}))
           - log10(CAST(counts.c_s + 1 AS DOUBLE) / (tot.n_s + {_DSIR_B}))
               AS lam
      FROM counts CROSS JOIN tot),
    scored AS (
      SELECT h.doc_id,
             CAST(count(*) AS BIGINT) AS n_feats,
             {dsum_sql('m.lam', 6)} AS dsir_score
      FROM hashed h JOIN model m USING (b)
      GROUP BY h.doc_id)
    SELECT doc_id, n_feats, dsir_score
    FROM scored
    ORDER BY dsir_score DESC, doc_id
    LIMIT 100
    """,
)
def dsir_select_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): fit hashed n-gram
    (unigram+bigram, 256 buckets) unigram models over a TARGET domain
    (here ``lang = 'en'``) and the raw SOURCE corpus, score every
    document by its log-likelihood ratio under the two models, and keep
    the top-k — the standard recipe for skewing a web-scale crawl toward
    a target distribution before training.

    Cross-engine determinism: buckets use the shared md5 dialect; the
    +1-smoothed probabilities are exact-integer ratios lowered to double
    once; per-document scores go through decimal accumulation (`dsum`)
    so partition order cannot move them; ties at the k boundary break on
    doc_id in both engines.

    Scale (100 TB): two corpus passes and nothing else — pass 1 builds
    the 256-row bucket counts (map-side-combined groupBy; the corpus is
    NOT cached because re-tokenizing beats materializing a token-
    exploded 100 TB frame), pass 2 joins the BROADCAST 256-row model
    onto the feature stream and aggregates per doc (one shuffle on
    doc_id). Selection is TakeOrderedAndProject, never a global sort.
    The model frames collect nothing; totals derive from the 256-row
    counts frame, not a corpus scan.
    """
    d = load_table(spark, sf_dir, "documents")
    ts = tokens_expr(F.lower(F.col("text")))
    toks = d.select("doc_id", "lang", ts.alias("toks"))
    # unigrams ++ bigrams; sequence(1, 0) DESCENDS in Spark, so guard
    # single-token docs before building the bigram index range
    bigrams = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("toks", i), F.element_at("toks", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = toks.select(
        "doc_id", "lang", F.explode(F.concat("toks", bigrams)).alias("f")
    )
    hashed = feats.select(
        "doc_id", "lang", F.expr(_DSIR_BUCKET_SPARK).alias("b")
    )
    # source and target counts fold in ONE pass (r10): c_t is a
    # conditional counter over the same rows, so the separate tgt leg —
    # a third full tokenize+bucket pass plus a join — collapses into the
    # src aggregate (buckets with no 'en' rows get the exact 0 the old
    # left-join fill produced). The docstring's two-pass shape now holds.
    # the 256-row counts frame feeds both the totals and the model —
    # checkpoint it so neither leg re-derives the corpus pass
    counts = hashed.groupBy("b").agg(
        F.count(F.lit(1)).alias("c_s"),
        F.sum(
            F.when(F.col("lang") == "en", 1).otherwise(0)
        ).cast("long").alias("c_t"),
    ).localCheckpoint(eager=False)
    tot = counts.agg(
        F.sum("c_s").alias("n_s"), F.sum("c_t").alias("n_t")
    )
    lam = F.log10(
        (F.col("c_t") + 1).cast("double") / (F.col("n_t") + _DSIR_B)
    ) - F.log10(
        (F.col("c_s") + 1).cast("double") / (F.col("n_s") + _DSIR_B)
    )
    model = counts.crossJoin(F.broadcast(tot)).select("b", lam.alias("lam"))
    scored = (
        hashed.join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_feats"),
            dsum(F.col("lam"), 6).alias("dsir_score"),
        )
    )
    return scored.orderBy(F.col("dsir_score").desc(), "doc_id").limit(100)


@register(
    "dsir_kl_audit",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, {_RAW_TOKS_SQL} AS toks FROM documents),
    feats AS (
      SELECT doc_id, lang,
             unnest(list_concat(
               toks,
               list_transform(generate_series(1, len(toks) - 1),
                              i -> toks[i] || ' ' || toks[i + 1]))) AS f
      FROM tok),
    hashed AS (
      SELECT doc_id, lang, {_DSIR_BUCKET_DUCK} AS b FROM feats),
    sel AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
    grp AS (
      SELECT b,
             CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS c_t,
             CAST(count(*) FILTER (WHERE doc_id IN (SELECT doc_id FROM sel))
                  AS BIGINT) AS c_s,
             CAST(count(*) AS BIGINT) AS c_all
      FROM hashed GROUP BY b),
    tot AS (SELECT CAST(sum(c_t) AS BIGINT) AS n_t,
                   CAST(sum(c_s) AS BIGINT) AS n_s,
                   CAST(sum(c_all) AS BIGINT) AS n_all FROM grp),
    terms AS (
      SELECT
        (CAST(c_t + 1 AS DOUBLE) / (tot.n_t + {_DSIR_B}))
          * log10((CAST(c_t + 1 AS DOUBLE) / (tot.n_t + {_DSIR_B}))
                  / (CAST(c_s + 1 AS DOUBLE) / (tot.n_s + {_DSIR_B})))
            AS kl_sel,
        (CAST(c_t + 1 AS DOUBLE) / (tot.n_t + {_DSIR_B}))
          * log10((CAST(c_t + 1 AS DOUBLE) / (tot.n_t + {_DSIR_B}))
                  / (CAST(c_all + 1 AS DOUBLE) / (tot.n_all + {_DSIR_B})))
            AS kl_all
      FROM grp CROSS JOIN tot)
    SELECT CAST(count(*) AS BIGINT) AS n_buckets,
           {dsum_sql('kl_sel', 6)} AS kl_target_vs_selected,
           {dsum_sql('kl_all', 6)} AS kl_target_vs_corpus
    FROM terms
    """,
)
def dsir_kl_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR's own evaluation metric (Xie et al. 2023, §4): KL divergence
    of the TARGET hashed-feature distribution from (a) a selected subset
    and (b) the raw corpus — the selection is good when
    KL(target || selected) < KL(target || corpus). Here the audited
    subset is a deterministic 1-in-3 slice so the oracle can replay it;
    in production the subset is `dsir_select_docs`' output.

    Scale: identical shape to `dsir_select_docs` — one corpus pass
    builds the 256-bucket counts for all three distributions in a
    SINGLE conditional aggregate (map-side combined); totals derive
    from the 256-row frame; the KL sums are decimal-accumulated over
    256 bucket terms. Nothing downstream of the one groupBy touches
    corpus-sized data."""
    d = load_table(spark, sf_dir, "documents")
    ts = tokens_expr(F.lower(F.col("text")))
    toks = d.select("doc_id", "lang", ts.alias("toks"))
    bigrams = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("toks", i), F.element_at("toks", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    hashed = toks.select(
        "doc_id", "lang", F.explode(F.concat("toks", bigrams)).alias("f")
    ).select("doc_id", "lang", F.expr(_DSIR_BUCKET_SPARK).alias("b"))
    grp = hashed.groupBy("b").agg(
        F.count(F.when(F.col("lang") == "en", 1)).cast("bigint").alias("c_t"),
        F.count(F.when(F.col("doc_id") % 3 == 0, 1)).cast("bigint").alias("c_s"),
        F.count(F.lit(1)).cast("bigint").alias("c_all"),
    )
    tot = grp.agg(
        F.sum("c_t").alias("n_t"),
        F.sum("c_s").alias("n_s"),
        F.sum("c_all").alias("n_all"),
    )
    j = grp.crossJoin(F.broadcast(tot))
    p_t = (F.col("c_t") + 1).cast("double") / (F.col("n_t") + _DSIR_B)
    p_s = (F.col("c_s") + 1).cast("double") / (F.col("n_s") + _DSIR_B)
    p_all = (F.col("c_all") + 1).cast("double") / (F.col("n_all") + _DSIR_B)
    terms = j.select(
        (p_t * F.log10(p_t / p_s)).alias("kl_sel"),
        (p_t * F.log10(p_t / p_all)).alias("kl_all"),
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        dsum(F.col("kl_sel"), 6).alias("kl_target_vs_selected"),
        dsum(F.col("kl_all"), 6).alias("kl_target_vs_corpus"),
    )


_TIMETRAVEL_ORACLE = """
    WITH s1 AS (
      SELECT l_orderkey, CAST(l_quantity * 100 AS BIGINT) AS qc
      FROM lineitem WHERE l_orderkey % 10 = 0),
    s2 AS (
      SELECT l_orderkey, CAST(l_quantity * 100 AS BIGINT) AS qc
      FROM lineitem WHERE l_orderkey % 10 = 5)
    SELECT CAST(1 AS BIGINT) AS version,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(qc) AS BIGINT) AS qty_cents,
           CAST(max(l_orderkey) AS BIGINT) AS max_key
    FROM s1
    UNION ALL
    SELECT CAST(2 AS BIGINT),
           CAST(count(*) AS BIGINT),
           CAST(sum(qc) AS BIGINT),
           CAST(max(l_orderkey) AS BIGINT)
    FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2)
    """


@register("snapshot_time_travel", min_rows=2, oracle=_TIMETRAVEL_ORACLE)
def snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse snapshot isolation, driver-visible end to end: build a
    two-version snapshot table from deterministic lineitem slices
    (publish slice A as v1, append slice B, publish v2), then read BOTH
    versions back through the ``format("snapshot")`` Spark 4 DataSource
    and aggregate each — proving v1 stays frozen after the append (its
    row count, quantity total, and max key never see slice B) while the
    latest version serves the union. Quantities ride as exact integer
    cents. The table is rebuilt from scratch per run (tier-tagged dir wiped
    first) so versions are deterministically 1 and 2 — reruns idempotent.

    Scale: the publishes harvest footer stats only (no data re-scan);
    each version read schedules one task per manifest file with Arrow
    batches; the aggregate is the only shuffle. Oracle: the same two
    slices and the same integer aggregates straight off lineitem."""
    import hashlib
    import os
    import shutil
    from urllib.parse import urlparse

    from pandas_to_postgres_spark.sources.manifest import publish_snapshot
    from pandas_to_postgres_spark.sources.snapshot_datasource import (
        SnapshotDataSource,
    )

    spark.dataSource.register(SnapshotDataSource)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    wh = urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path or "spark-warehouse"
    path = os.path.join(wh, f"tt_table_{tag}")
    shutil.rmtree(path, ignore_errors=True)

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.col("l_quantity") * 100).cast("long").alias("qc"),
    )
    li.filter(F.col("l_orderkey") % 10 == 0).coalesce(2).write.mode(
        "overwrite"
    ).parquet(path)
    publish_snapshot(path, ["l_orderkey"])
    li.filter(F.col("l_orderkey") % 10 == 5).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    publish_snapshot(path, ["l_orderkey"])

    # ONE multi-version DataSource read spanning both versions (r11:
    # halves the planning-worker spawns; identical values — see
    # snapshot_merge_upsert)
    df = (
        spark.read.format("snapshot")
        .option("path", path)
        .option("versions", "1,2")
        .load()
    )
    return (
        df.groupBy(F.col("_snapshot_version").cast("long").alias("version"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("qc").cast("long").alias("qty_cents"),
            F.max("l_orderkey").cast("long").alias("max_key"),
        )
        .select("version", "n_rows", "qty_cents", "max_key")
    )


_MERGE_ORACLE = """
    WITH a AS (
      SELECT o_orderkey AS k,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS tc
      FROM orders WHERE o_orderkey % 10 = 0),
    u AS (
      SELECT k, tc * 2 AS tc FROM a WHERE k % 50 = 0
      UNION ALL
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
      FROM orders WHERE o_orderkey % 10 = 7),
    m AS (
      SELECT * FROM a WHERE NOT EXISTS (SELECT 1 FROM u WHERE u.k = a.k)
      UNION ALL
      SELECT * FROM u)
    SELECT CAST(1 AS BIGINT) AS version,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(tc) AS BIGINT) AS tc_cents,
           CAST(max(k) AS BIGINT) AS max_key
    FROM a
    UNION ALL
    SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
           CAST(sum(tc) AS BIGINT), CAST(max(k) AS BIGINT)
    FROM m
    """


@register("snapshot_merge_upsert", min_rows=2, oracle=_MERGE_ORACLE)
def snapshot_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write MERGE (upsert) on the snapshot table, driver-visible
    end to end (`sources/manifest.merge_snapshot` — the Delta/Iceberg
    ``MERGE INTO`` pattern): build v1 from a deterministic orders slice
    (keys ≡ 0 mod 10, totalprice as exact integer cents), merge an
    updates frame that DOUBLES the cents on keys ≡ 0 mod 50 (matched →
    replaced) and inserts the keys ≡ 7 mod 10 slice (unmatched →
    appended), then read BOTH versions back through ONE multi-version
    ``format("snapshot")`` read (``option("versions", "1,2")``, r11)
    and aggregate each — v1 must still serve the pre-merge table
    bit-exactly (copy-on-write isolation) while v2 serves the merged
    result. The table is rebuilt per run (tier-tagged dir wiped) so
    versions are deterministically 1 and 2.

    Scale: manifest key-range stats prune the rewrite candidates, one
    column-pruned probe join finds the files that really contain matched
    keys, and ONLY those are rewritten — on a key-sorted 100 TB layout a
    point-ish update batch rewrites O(matched files), with the publish a
    metadata-sized atomic version claim. Oracle: the same slices and the
    same anti-join ∪ updates algebra straight off orders."""
    import hashlib
    import os
    import shutil
    from urllib.parse import urlparse

    from pandas_to_postgres_spark.sources.manifest import (
        merge_snapshot,
        publish_snapshot,
    )
    from pandas_to_postgres_spark.sources.snapshot_datasource import (
        SnapshotDataSource,
    )

    spark.dataSource.register(SnapshotDataSource)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    wh = urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path or "spark-warehouse"
    path = os.path.join(wh, f"mg_table_{tag}")
    shutil.rmtree(path, ignore_errors=True)

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("tc"),
    )
    a = o.filter(F.col("k") % 10 == 0)
    # several files so the probe has something to prune/skip
    a.repartition(4, F.col("k")).write.mode("overwrite").parquet(path)
    publish_snapshot(path, ["k"])

    updates = (
        a.filter(F.col("k") % 50 == 0)
        .select("k", (F.col("tc") * 2).alias("tc"))
        .unionByName(o.filter(F.col("k") % 10 == 7))
    )
    merge_snapshot(spark, path, updates, ["k"])

    # ONE multi-version DataSource read spanning both versions (r11:
    # every read pays a fresh Python planning-worker spawn — the plural
    # `versions` option halves them and the per-version aggregate rides
    # one scan, grouped on the version tag; values identical to two
    # separate reads by construction)
    df = (
        spark.read.format("snapshot")
        .option("path", path)
        .option("versions", "1,2")
        .load()
    )
    return (
        df.groupBy(F.col("_snapshot_version").cast("long").alias("version"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("tc").cast("long").alias("tc_cents"),
            F.max("k").cast("long").alias("max_key"),
        )
        .select("version", "n_rows", "tc_cents", "max_key")
    )


_CDC_APPLY_ORACLE = """
    WITH a AS (
      SELECT o_orderkey AS k,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS tc
      FROM orders WHERE o_orderkey % 10 = 0),
    latest AS (
      SELECT k, tc * 2 AS tc, 'U' AS op FROM a WHERE k % 40 = 0
      UNION ALL
      SELECT k, NULL, 'D' FROM a WHERE k % 30 = 0 AND k % 40 <> 0
      UNION ALL
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), 'I'
      FROM orders WHERE o_orderkey % 10 = 3),
    m AS (
      SELECT k, tc FROM a
      WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.k = a.k)
      UNION ALL
      SELECT k, tc FROM latest WHERE op <> 'D')
    SELECT CAST(1 AS BIGINT) AS version,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(tc) AS BIGINT) AS tc_cents,
           CAST(max(k) AS BIGINT) AS max_key
    FROM a
    UNION ALL
    SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
           CAST(sum(tc) AS BIGINT), CAST(max(k) AS BIGINT)
    FROM m
    """


@register("snapshot_cdc_apply", min_rows=2, oracle=_CDC_APPLY_ORACLE)
def snapshot_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I/U/D change-feed apply into the snapshot table, driver-visible
    (`sources/manifest.apply_changes_to_snapshot` — the lakehouse twin of
    the Postgres CDC apply sink): build v1 from the orders keys ≡ 0 mod
    10 slice, then apply ONE change batch that proves every semantic —
    keys ≡ 0 mod 40 get a seq-1 update AND a conflicting seq-2 update
    (the LAST change per key must win: doubled cents), keys ≡ 0 mod 30
    (and not ≡ 0 mod 40) are DELETED, and the keys ≡ 3 mod 10 slice is
    INSERTED — landing as exactly one copy-on-write version. Both
    versions read back through ``format("snapshot")``; v1 must be
    bit-exact (isolation), v2 the applied feed. Oracle replays only the
    WINNING changes (the seq-1 losers never appear in SQL — if last-wins
    broke, tc_cents would be off by the +1-cent losers).

    Scale: latest-per-key is one window over the batch (bounded by batch
    size, not table size); the table-side cost is merge_snapshot's
    pruned probe + touched-file rewrite; the publish is one atomic
    version claim per batch, so readers time-travel to batch boundaries."""
    import hashlib
    import os
    import shutil
    from urllib.parse import urlparse

    from pandas_to_postgres_spark.sources.manifest import (
        apply_changes_to_snapshot,
        publish_snapshot,
    )
    from pandas_to_postgres_spark.sources.snapshot_datasource import (
        SnapshotDataSource,
    )

    spark.dataSource.register(SnapshotDataSource)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    wh = urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path or "spark-warehouse"
    path = os.path.join(wh, f"cdc_table_{tag}")
    shutil.rmtree(path, ignore_errors=True)

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("tc"),
    )
    a = o.filter(F.col("k") % 10 == 0)
    a.repartition(4, F.col("k")).write.mode("overwrite").parquet(path)
    publish_snapshot(path, ["k"])

    upd = a.filter(F.col("k") % 40 == 0)
    changes = (
        # seq-1 LOSERS: +1 cent — must never reach the table
        upd.select(
            F.lit(1).alias("seq"), "k",
            (F.col("tc") + 1).alias("tc"), F.lit("U").alias("op"),
        )
        # seq-2 winners: doubled cents
        .unionByName(
            upd.select(
                F.lit(2).alias("seq"), "k",
                (F.col("tc") * 2).alias("tc"), F.lit("U").alias("op"),
            )
        )
        .unionByName(
            a.filter((F.col("k") % 30 == 0) & (F.col("k") % 40 != 0)).select(
                F.lit(1).alias("seq"), "k",
                F.lit(None).cast("long").alias("tc"), F.lit("D").alias("op"),
            )
        )
        .unionByName(
            o.filter(F.col("k") % 10 == 3).select(
                F.lit(1).alias("seq"), "k", "tc", F.lit("I").alias("op")
            )
        )
    )
    apply_changes_to_snapshot(spark, path, changes, ["k"])

    # ONE multi-version DataSource read spanning both versions (r11:
    # halves the planning-worker spawns; identical values — see
    # snapshot_merge_upsert)
    df = (
        spark.read.format("snapshot")
        .option("path", path)
        .option("versions", "1,2")
        .load()
    )
    return (
        df.groupBy(F.col("_snapshot_version").cast("long").alias("version"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("tc").cast("long").alias("tc_cents"),
            F.max("k").cast("long").alias("max_key"),
        )
        .select("version", "n_rows", "tc_cents", "max_key")
    )


_OPTIMIZE_ORACLE = """
    WITH li AS (
      SELECT l_orderkey AS k,
             CAST(l_quantity * 100 AS BIGINT) AS qc
      FROM lineitem),
    r AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(qc) AS BIGINT) AS qty_cents,
             CAST(min(k) AS BIGINT) AS min_key,
             CAST(max(k) AS BIGINT) AS max_key
      FROM li WHERE k BETWEEN 1000 AND 3000)
    SELECT CAST(1 AS BIGINT) AS version, n_rows, qty_cents, min_key, max_key
    FROM r
    UNION ALL
    SELECT CAST(2 AS BIGINT), n_rows, qty_cents, min_key, max_key FROM r
    """


@register("snapshot_optimize_prune", min_rows=2, oracle=_OPTIMIZE_ORACLE)
def snapshot_optimize_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted (clustered) compaction + stats-pruned range reads, driver
    end-to-end: ingest lineitem in ARRIVAL order (6 epoch-ish appends,
    each spreading keys over the whole domain — the worst case for
    min/max pruning), publish v1, then ``compact_snapshot(sort_cols)``
    into range-clustered files (v2, the OPTIMIZE ... SORT BY leg). The
    same key-range aggregate is then read from v1 via
    ``read_snapshot_pruned`` (stats prune nothing — scattered layout)
    and from v2 through the ``format("snapshot")`` DataSource with
    ``pushdown=true`` (planning-time file pruning keeps O(1) of the
    rewritten files). Both versions MUST return identical values —
    pruning and compaction are transparent to results; only the plan
    changes. `tests/test_skew_and_sinks.TestSortedCompaction` asserts
    the file-count drop; this query pins the value semantics under the
    driver's oracle. Quantities ride as exact integer cents."""
    import hashlib
    import os
    import shutil
    from urllib.parse import urlparse

    from pandas_to_postgres_spark.sources.manifest import (
        compact_snapshot,
        load_snapshot,
        publish_snapshot,
        read_snapshot_pruned,
    )
    from pandas_to_postgres_spark.sources.snapshot_datasource import (
        SnapshotDataSource,
    )

    spark.dataSource.register(SnapshotDataSource)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    wh = urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path or "spark-warehouse"
    path = os.path.join(wh, f"opt_table_{tag}")
    shutil.rmtree(path, ignore_errors=True)

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"),
        (F.col("l_quantity") * 100).cast("long").alias("qc"),
    )
    for i in range(6):  # arrival-order epochs: keys scattered per file
        li.filter(F.col("k") % 6 == i).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    publish_snapshot(path, ["k"])
    total = sum(int(e["bytes"]) for e in load_snapshot(path)["files"])
    compact_snapshot(
        spark, path, target_bytes=max(1, total // 4), sort_cols=["k"]
    )

    lo, hi = 1000, 3000
    v1 = read_snapshot_pruned(spark, path, "k", lo, hi, version=1)
    # the pushFilters reader needs this conf (a vanilla driver session
    # ships it false and ERRORS on any reader that merely defines
    # pushFilters); it is runtime-settable and result-neutral, so enable
    # it here — with a fallback to the plain reader if a future Spark
    # pins it static (results identical either way; pruning is a plan
    # property, asserted in tests)
    pushdown = "true"
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pushdown = "false"
    v2 = (
        spark.read.format("snapshot")
        .option("path", path)
        .option("version", 2)
        .option("pushdown", pushdown)
        .load()
        .filter((F.col("k") >= lo) & (F.col("k") <= hi))
    )
    outs = []
    for v, df in ((1, v1), (2, v2)):
        outs.append(
            df.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("qc").cast("long").alias("qty_cents"),
                F.min("k").cast("long").alias("min_key"),
                F.max("k").cast("long").alias("max_key"),
            ).select(
                F.lit(v).cast("long").alias("version"),
                "n_rows", "qty_cents", "min_key", "max_key",
            )
        )
    return outs[0].unionAll(outs[1])


_HIDDEN_PART_ORACLE = """
    WITH d0 AS (SELECT CAST(min(ts) AS DATE) AS d FROM events),
    u0 AS (SELECT user_id AS uid FROM events ORDER BY event_id LIMIT 1),
    win AS (
        SELECT e.event_type,
               CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS vc
        FROM events e, d0
        WHERE CAST(e.ts AS DATE) BETWEEN d0.d + 1 AND d0.d + 2),
    usr AS (
        SELECT e.event_type,
               CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS vc
        FROM events e, u0
        WHERE e.user_id = u0.uid)
    SELECT 'day_range' AS branch, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(vc) AS BIGINT) AS value_cents
    FROM win GROUP BY event_type
    UNION ALL
    SELECT 'user_bucket' AS branch, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(vc) AS BIGINT) AS value_cents
    FROM usr GROUP BY event_type
    """


@register("snapshot_hidden_partition", min_rows=2, oracle=_HIDDEN_PART_ORACLE)
def snapshot_hidden_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden partitioning (Iceberg partition transforms) end-to-end
    under the driver oracle: events land as a snapshot table partitioned
    by ``day(ts)`` AND ``bucket(4, user_id)`` — the spec lives in the
    manifest, each file records its transformed tuple, and NOTHING in
    the query below names a partition column. Two reads exercise both
    pruning shapes:

    - ``day_range``: a raw ``ts BETWEEN`` predicate planner-maps to the
      day transform and keeps 2 of ~30 day partitions;
    - ``user_bucket``: a raw ``user_id =`` equality maps through the
      md5 bucket transform to exactly 1 of 4 buckets (ranges over a
      bucket can never prune — hash destroys order — which
      `tests/test_hidden_partitioning.py` pins).

    Pruning is a superset guarantee: the exact predicate re-applies on
    the scan, so the oracle replays plain WHERE clauses on the raw
    events table. Value sums ride the grid-round cents convention.
    Scale: the write clusters by transform value (one file never mixes
    partitions), the planner touches metadata only, and a spec change
    never breaks old predicates — the Iceberg contract this re-expresses
    (hive-style layout columns would put the transform in USER queries).

    Reference: the 988-LoC loader has no partitioning concept; this is
    [EXT] lakehouse surface (SURVEY §2.12)."""
    import datetime
    import hashlib
    import os
    import shutil
    from urllib.parse import urlparse

    from pandas_to_postgres_spark.sources.partition_spec import (
        read_snapshot_hidden,
        spec_field,
        write_partitioned_snapshot,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    wh = urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path or "spark-warehouse"
    path = os.path.join(wh, f"hp_table_{tag}")
    shutil.rmtree(path, ignore_errors=True)

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    spec = [spec_field("day", "ts"), spec_field("bucket", "user_id", 4)]
    write_partitioned_snapshot(spark, ev, path, spec, stat_cols=["event_id"])

    # bounded driver-side reduction (2 scalars): the predicate anchors
    first = ev.orderBy("event_id").select("ts", "user_id").first()
    d0 = ev.agg(F.min("ts")).first()[0].date()
    uid0 = int(first["user_id"])
    lo = datetime.datetime.combine(d0 + datetime.timedelta(days=1),
                                   datetime.time.min)
    hi = datetime.datetime.combine(d0 + datetime.timedelta(days=3),
                                   datetime.time.min
                                   ) - datetime.timedelta(microseconds=1)

    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    day_read = read_snapshot_hidden(
        spark, path, {"ts": ("between", lo, hi)}
    )
    usr_read = read_snapshot_hidden(spark, path, {"user_id": ("=", uid0)})
    outs = []
    for branch, df in (("day_range", day_read), ("user_bucket", usr_read)):
        outs.append(
            df.groupBy("event_type").agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.sum(cents).cast("long").alias("value_cents"),
            ).select(
                F.lit(branch).alias("branch"),
                "event_type", "n_events", "value_cents",
            )
        )
    return outs[0].unionAll(outs[1])


_SPEC_EVOLUTION_ORACLE = """
    WITH u0 AS (SELECT user_id AS uid FROM events ORDER BY event_id LIMIT 1)
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS value_cents
    FROM events e, u0
    WHERE e.user_id = u0.uid
    GROUP BY e.event_type
    """


@register(
    "spec_evolution_scan", min_rows=1, oracle=_SPEC_EVOLUTION_ORACLE
)
def spec_evolution_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-spec EVOLUTION (Iceberg spec-id-per-file) end-to-end
    under the driver oracle: the first half of events lands partitioned
    ``bucket(4, user_id)``, the second half APPENDS under an evolved
    ``bucket(8, user_id)`` — same source column, same field name,
    DIFFERENT hash modulus, the case where pruning old files with the
    new spec would silently drop data. No file is rewritten at the
    evolution (re-partitioning a 100 TB table is metadata + new data
    only); the manifest registers both specs, every entry carries the
    ``spec_id`` it was written under, and a raw ``user_id =`` equality
    prunes each vintage against ITS OWN transform (old files to 1-of-4
    buckets, new files to 1-of-8). Pruning stays a superset guarantee —
    the exact predicate re-applies — so the oracle is a plain WHERE over
    the raw events table spanning both vintages.

    Reference: the 988-LoC loader has no partitioning concept; this is
    [EXT] lakehouse surface (SURVEY §2.12), the round-7 verdict's
    "partition-spec evolution is absent" gap closed."""
    import hashlib
    import os
    import shutil
    from urllib.parse import urlparse

    from pandas_to_postgres_spark.sources.partition_spec import (
        append_partitioned_snapshot,
        read_snapshot_hidden,
        spec_field,
        write_partitioned_snapshot,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    wh = urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path or "spark-warehouse"
    path = os.path.join(wh, f"spec_evo_{tag}")
    shutil.rmtree(path, ignore_errors=True)

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    mid = ev.agg(
        F.percentile_approx("event_id", 0.5, 1000000)
    ).first()[0]
    write_partitioned_snapshot(
        spark,
        ev.filter(F.col("event_id") <= mid),
        path,
        [spec_field("bucket", "user_id", 4)],
        stat_cols=["event_id"],
    )
    append_partitioned_snapshot(
        spark,
        ev.filter(F.col("event_id") > mid),
        path,
        [spec_field("bucket", "user_id", 8)],
        stat_cols=["event_id"],
    )

    uid0 = int(
        ev.orderBy("event_id").select("user_id").first()["user_id"]
    )
    got = read_snapshot_hidden(spark, path, {"user_id": ("=", uid0)})
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    return got.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(cents).cast("long").alias("value_cents"),
    )


_JOIN_MV_ORACLE = """
    WITH j AS (
        SELECT c.c_mktsegment AS segment,
               CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS tc
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(tc) AS BIGINT) AS cents
    FROM j GROUP BY segment
    """


@register("incremental_join_mv", min_rows=3, oracle=_JOIN_MV_ORACLE)
def incremental_join_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance (Gupta–Mumick delta rule) over
    two snapshot tables, driver end-to-end: orders and customer each
    land in TWO published versions (epochs), and the silver per-segment
    rollup of orders ⋈ customer is refreshed incrementally after each —
    ΔL ⋈ R_head plus L_prev ⋈ ΔR, never a re-join of the full bronzes.
    The applied (left, right) version pair is stamped INSIDE each silver
    manifest, so a crashed refresh re-derives the identical delta
    (exactly-once without a ledger, the `stream_incremental_mv` move).
    The oracle is the FULL join aggregate over the final tables — the
    incremental trajectory must land bit-exactly on it (integer cents).

    Scale: each refresh scans only the bronze files its version diff
    added; the silver is group-cardinality-sized. At 100 TB the full
    rebuild this replaces is the nightly-pipeline bottleneck; the delta
    refresh tracks ingest volume instead. Reference: no reference
    parity — [EXT] lakehouse surface (SURVEY §2.12)."""
    import hashlib
    import os
    import shutil
    from urllib.parse import urlparse

    from pandas_to_postgres_spark.sources.manifest import publish_snapshot
    from pandas_to_postgres_spark.streaming.mv import refresh_join_mv

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    wh = urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path or "spark-warehouse"
    o_path = os.path.join(wh, f"jmv_o_{tag}")
    c_path = os.path.join(wh, f"jmv_c_{tag}")
    s_path = os.path.join(wh, f"jmv_s_{tag}")
    for p in (o_path, c_path, s_path):
        shutil.rmtree(p, ignore_errors=True)

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    # epoch 1: half of each bronze; refresh; epoch 2: the rest; refresh
    c.filter(F.col("o_custkey") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(c_path)
    publish_snapshot(c_path, ["o_custkey"])
    o.filter(F.col("o_custkey") % 3 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(o_path)
    publish_snapshot(o_path, ["o_custkey"])
    refresh_join_mv(
        spark, s_path, o_path, c_path, "o_custkey", "segment", "o_totalprice"
    )
    o.filter(F.col("o_custkey") % 3 != 0).coalesce(1).write.mode(
        "append"
    ).parquet(o_path)
    publish_snapshot(o_path, ["o_custkey"])
    c.filter(F.col("o_custkey") % 2 != 0).coalesce(1).write.mode(
        "append"
    ).parquet(c_path)
    publish_snapshot(c_path, ["o_custkey"])
    refresh_join_mv(
        spark, s_path, o_path, c_path, "o_custkey", "segment", "o_totalprice"
    )

    from pandas_to_postgres_spark.sources.manifest import read_snapshot

    return read_snapshot(spark, s_path).select("segment", "n", "cents")


_BLOOM_LOOKUP_ORACLE = """
    WITH keys AS (SELECT unnest([37, 1234, 4133]) AS k)
    SELECT k AS l_orderkey,
           CAST(count(l.l_orderkey) AS BIGINT) AS n_lines,
           CAST(COALESCE(sum(CAST(l.l_quantity * 100 AS BIGINT)), 0)
                AS BIGINT) AS qty_cents
    FROM keys LEFT JOIN lineitem l ON l.l_orderkey = keys.k
    GROUP BY k
    """


@register("snapshot_bloom_lookup", min_rows=3, oracle=_BLOOM_LOOKUP_ORACLE)
def snapshot_bloom_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file Bloom secondary index under the driver oracle: lineitem
    lands in ARRIVAL order (6 epoch files, each spanning the whole
    orderkey domain — min/max stats provably cannot prune a point probe
    on this layout), one distributed pass builds a 16 KiB Bloom bitset
    per file (`sources/file_bloom.py` — md5-derived positions the Python
    planner replays with no Spark round trip, the hidden-partitioning
    rule), and three point lookups run through
    ``read_snapshot_point``: planning keeps only the files whose filter
    claims the key (false positives bounded at ~0.1%, removed by the
    exact predicate — superset guarantee). Output is the per-key line
    count + quantity cents, LEFT-join shaped so a key absent at some
    scale factor still yields its zero row. Oracle: the same lookups
    straight off lineitem.

    Scale: this is the Iceberg-puffin / Delta-bloom answer to "WHERE
    id = X" on a 100 TB streaming-ingested table — stats keep every
    file (each epoch spans the domain), partition transforms don't apply
    (no natural partition column), but the sidecar probe is k bit tests
    per file at planning time and the scan touches ~1 file per key."""
    import hashlib
    import os
    import shutil
    from urllib.parse import urlparse

    from pandas_to_postgres_spark.sources.file_bloom import (
        build_bloom_index,
        read_snapshot_point,
    )
    from pandas_to_postgres_spark.sources.manifest import publish_snapshot

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    wh = urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path or "spark-warehouse"
    path = os.path.join(wh, f"bloom_tbl_{tag}")
    shutil.rmtree(path, ignore_errors=True)

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.col("l_quantity") * 100).cast("long").alias("qc"),
    )
    for i in range(6):  # arrival-order epochs: every file spans the domain
        li.filter(F.col("l_orderkey") % 6 == i).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    publish_snapshot(path, ["l_orderkey"])
    build_bloom_index(spark, path, "l_orderkey")

    outs = []
    for key in (37, 1234, 4133):
        hit = read_snapshot_point(spark, path, "l_orderkey", key)
        outs.append(
            hit.agg(
                F.count(F.lit(1)).cast("long").alias("n_lines"),
                F.coalesce(F.sum("qc"), F.lit(0)).cast("long").alias(
                    "qty_cents"
                ),
            ).select(
                F.lit(key).cast("long").alias("l_orderkey"),
                "n_lines",
                "qty_cents",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


_DV_ORACLE = """
    WITH base AS (
        SELECT o_orderkey AS k,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS tc
        FROM orders WHERE o_orderkey % 10 = 0),
    v1 AS (
        SELECT 1 AS version, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(tc) AS BIGINT) AS total_cents,
               CAST(max(k) AS BIGINT) AS max_key
        FROM base),
    v2 AS (
        SELECT 2 AS version, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(tc) AS BIGINT) AS total_cents,
               CAST(max(k) AS BIGINT) AS max_key
        FROM base WHERE k % 100 <> 0)
    SELECT * FROM v1 UNION ALL SELECT * FROM v2
    """


@register("snapshot_delete_dv", min_rows=2, oracle=_DV_ORACLE)
def snapshot_delete_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE (deletion vectors) under the driver oracle:
    a slice of orders lands as a snapshot table, a selective delete
    (every 10th key) publishes a METADATA-ONLY version —
    `delete_snapshot_rows_dv` records the doomed rows' ordinals in the
    manifest; not one data file is touched (asserted: the query itself
    verifies the file list is unchanged and raises otherwise) — and both
    versions aggregate through the DV-aware reader: v1 sees everything
    (time travel ignores later vectors), v2 sees survivors only. The
    oracle replays both aggregates straight off orders. Exact integer
    cents throughout.

    Scale: this is the point-delete answer at 100 TB — GDPR erasure of
    k rows costs one column-pruned probe (bounded by the DELETE's size)
    plus a manifest publish, instead of rewriting every touched 100 MB
    file; readers pay one broadcast anti-join on (file, ordinal) until
    the next compaction materializes the vector. The copy-on-write
    sibling (`delete_snapshot_rows`) remains the bulk-delete path, and
    the hybrid fraction knob rewrites any file whose dead share passes
    20% (`tests/test_deletion_vectors.py`)."""
    import hashlib
    import os
    import shutil
    from urllib.parse import urlparse

    from pandas_to_postgres_spark.sources.manifest import (
        delete_snapshot_rows_dv,
        load_snapshot,
        publish_snapshot,
        read_snapshot,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    wh = urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path or "spark-warehouse"
    path = os.path.join(wh, f"dv_table_{tag}")
    shutil.rmtree(path, ignore_errors=True)

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("tc"),
    ).filter(F.col("k") % 10 == 0)
    o.repartition(4, F.col("k")).write.mode("overwrite").parquet(path)
    publish_snapshot(path, ["k"])

    files_before = {e["path"] for e in load_snapshot(path)["files"]}
    doomed = o.filter(F.col("k") % 100 == 0).select("k")
    delete_snapshot_rows_dv(spark, path, doomed, ["k"])
    man = load_snapshot(path)
    # the whole point: a metadata-only delete (hybrid CoW leg unused at
    # this selectivity) — fail loudly if a file was rewritten
    if {e["path"] for e in man["files"]} != files_before:
        raise AssertionError("DV delete rewrote data files")

    outs = []
    for v in (1, 2):
        df = read_snapshot(spark, path, version=v)
        outs.append(
            df.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("tc").cast("long").alias("total_cents"),
                F.max("k").cast("long").alias("max_key"),
            ).select(
                F.lit(v).cast("int").alias("version"),
                "n_rows", "total_cents", "max_key",
            )
        )
    return outs[0].unionAll(outs[1])


_RENAME_ORACLE = """
    WITH base AS (
        SELECT p_brand,
               CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS pc,
               p_partkey
        FROM part)
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(pc) AS BIGINT) AS price_cents
    FROM base GROUP BY p_brand
    """


@register("snapshot_rename_column", min_rows=3, oracle=_RENAME_ORACLE)
def snapshot_rename_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only column RENAME under the driver oracle: half of part
    lands as a snapshot table with a ``pc`` price-cents column,
    ``rename_snapshot_column`` renames it to ``price_cents`` WITHOUT
    touching a byte of data (the query asserts the file list is
    unchanged), and the second half appends AFTER the rename carrying
    the new name physically — so the final read coalesces a
    mixed-vintage file set (old files say ``pc``, new files say
    ``price_cents``) into one logical column. The per-brand aggregate
    over that logical column must equal the oracle's plain aggregate
    over raw part: any row lost or null-filled by the mapping breaks
    the value hash.

    Scale: rename is O(manifest) regardless of table size — the Iceberg
    column-mapping answer to "rename a column on a 100 TB table" (a
    physical rewrite would be the single most expensive DDL there is);
    the read-side coalesce is a per-row projection, no shuffle."""
    import hashlib
    import os
    import shutil
    from urllib.parse import urlparse

    from pandas_to_postgres_spark.sources.manifest import (
        append_snapshot,
        load_snapshot,
        publish_snapshot,
        read_snapshot,
        rename_snapshot_column,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    wh = urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path or "spark-warehouse"
    path = os.path.join(wh, f"rn_table_{tag}")
    shutil.rmtree(path, ignore_errors=True)

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        F.floor(F.col("p_retailprice") * 100 + 0.5).cast("long").alias("pc"),
    )
    p.filter(F.col("p_partkey") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    publish_snapshot(path, ["p_partkey"])
    files_v1 = {e["path"] for e in load_snapshot(path)["files"]}

    rename_snapshot_column(path, "pc", "price_cents")
    if {e["path"] for e in load_snapshot(path)["files"]} != files_v1:
        raise AssertionError("rename rewrote data files")

    # post-rename vintage: written under the LOGICAL name
    p.filter(F.col("p_partkey") % 2 == 1).select(
        "p_partkey", "p_brand", F.col("pc").alias("price_cents")
    ).coalesce(1).write.mode("append").parquet(path)
    head = {e["path"] for e in load_snapshot(path)["files"]}
    append_snapshot(
        path,
        [
            f
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet") and not f.startswith((".", "_"))
            and f not in head
        ],
    )

    return (
        read_snapshot(spark, path)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("price_cents").cast("long").alias("price_cents"),
        )
    )


_RESTORE_ORACLE = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS value_cents
    FROM events
    WHERE event_id % 3 IN (0, 1)
    GROUP BY event_type
    """


@register("snapshot_restore", min_rows=1, oracle=_RESTORE_ORACLE)
def snapshot_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-style RESTORE under the driver oracle: three versions land
    (two appends, then a DV DELETE that kills every 7th event), the
    table ROLLS BACK to the pre-delete version with one metadata write
    — no data file is touched, the bad version stays time-travelable —
    and the restored read must equal the plain two-epoch union, which
    is exactly what the oracle computes. Rolling back a 100 TB table
    costs one manifest publish; the deleted rows resurrect because the
    restore re-references the files WITHOUT the deletion vectors, the
    rollback semantics Delta RESTORE / Iceberg rollback define.

    Reference: no versioning concept in the 988-LoC loader; [EXT]
    lakehouse surface (SURVEY §2.12), sibling of the other snapshot
    DML queries."""
    import hashlib
    import os
    import shutil
    from urllib.parse import urlparse

    from pandas_to_postgres_spark.sources.manifest import (
        append_snapshot,
        delete_snapshot_rows_dv,
        load_snapshot,
        publish_snapshot,
        read_snapshot,
        restore_snapshot,
        snapshot_versions,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    wh = urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path or "spark-warehouse"
    path = os.path.join(wh, f"restore_{tag}")
    shutil.rmtree(path, ignore_errors=True)

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    ev.filter(F.col("event_id") % 3 == 0).coalesce(1).write.parquet(path)
    publish_snapshot(path, ["event_id"])
    ev.filter(F.col("event_id") % 3 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    published = {e["path"] for e in load_snapshot(path, 1)["files"]}
    new = sorted(
        f
        for f in os.listdir(path)
        if f.endswith(".parquet")
        and not f.startswith((".", "_"))
        and f not in published
    )
    append_snapshot(path, new)
    # the regrettable delete: every 7th event dies in place (DV)
    delete_snapshot_rows_dv(
        spark,
        path,
        ev.filter(
            (F.col("event_id") % 3 < 2) & (F.col("event_id") % 7 == 0)
        ).select("event_id"),
        ["event_id"],
    )
    assert read_snapshot(spark, path).count() < ev.filter(
        F.col("event_id") % 3 < 2
    ).count()
    man = restore_snapshot(path, 2)
    assert man["dml"] == "restore" and man["restored_from"] == 2
    assert len(snapshot_versions(path)) == 4  # history preserved
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    return read_snapshot(spark, path).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(cents).cast("long").alias("value_cents"),
    )


_TEXT_SEARCH_ORACLE = """
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(
                   regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                   t -> t <> '')) AS tok
        FROM documents),
    ranked AS (
        SELECT tok, count(*) AS n,
               row_number() OVER (ORDER BY count(*) DESC, tok ASC) AS rn
        FROM toks GROUP BY tok),
    term AS (SELECT tok FROM ranked WHERE rn = 20)
    SELECT term.tok AS term,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(d.text)) AS BIGINT) AS sum_len
    FROM documents d, term
    WHERE list_contains(
        list_filter(regexp_split_to_array(lower(d.text), '[^a-z0-9]+'),
                    t -> t <> ''),
        term.tok)
    GROUP BY term.tok
    """


@register("snapshot_text_search", min_rows=1, oracle=_TEXT_SEARCH_ORACLE)
def snapshot_text_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Needle-term lookup over a snapshot corpus THROUGH the token
    Bloom index — the lakehouse/text crossover: documents land as an
    arrival-ordered snapshot table (3 epochs, every file spans the
    vocabulary so min/max stats cannot prune), a per-file TOKEN bloom
    sidecar is built distributed (executor-side bitsets, shard files),
    and a ``CONTAINS term`` query plans by probing each file's bitset —
    scheduling O(matching files) — then re-checks with the exact
    tokenizer (superset guarantee). The probed term is the corpus's
    rank-20 token (count DESC, token ASC), derived with the SAME
    tokenizer in both engines, so the oracle replays term choice AND
    result. At 10^5 shard files a rare-term lookup reads the few files
    that contain it; the index build is one distributed scan.

    Reference: the 988-LoC loader has no text or indexing concept;
    [EXT] lakehouse surface (SURVEY §2.12)."""
    import hashlib
    import os
    import shutil
    from urllib.parse import urlparse

    from pandas_to_postgres_spark.sources.file_bloom import (
        TOKENIZE_SQL,
        build_token_bloom_index,
        read_snapshot_contains,
    )
    from pandas_to_postgres_spark.sources.manifest import publish_snapshot

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    wh = urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path or "spark-warehouse"
    path = os.path.join(wh, f"txt_idx_{tag}")
    shutil.rmtree(path, ignore_errors=True)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    publish_snapshot(path, ["doc_id"])
    build_token_bloom_index(spark, path, "text")

    term = (
        docs.select(
            F.explode(F.expr(TOKENIZE_SQL.format(col="text"))).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(20)
        .orderBy(F.col("n").asc(), F.col("tok").desc())
        .first()["tok"]  # bounded: ONE term string drives the probe
    )
    hits = read_snapshot_contains(spark, path, "text", term)
    return hits.agg(
        F.lit(term).alias("term"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("sum_len"),
    )


_CLONE_SCAN_ORACLE = """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders
    WHERE o_orderkey % 4 IN (0, 1, 3)
    GROUP BY o_orderpriority
    """


@register("snapshot_clone_scan", min_rows=3, oracle=_CLONE_SCAN_ORACLE)
def snapshot_clone_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHALLOW CLONE read-through under the driver oracle (Delta's
    ``CREATE TABLE ... SHALLOW CLONE``, per its public docs): a source
    snapshot table (two append epochs of orders) is cloned with ZERO
    data bytes copied — the clone's v1 manifest references the source's
    files by relative path — then BOTH sides diverge: the source gains a
    post-clone append the clone must never see, and the clone gains its
    own append landing under its own directory. The returned aggregate
    reads the CLONE, so the oracle (source-epoch rows + clone-side rows,
    never the source's post-clone rows) proves zero-copy readability AND
    clone independence in one hash-checked row set.

    In-query invariants (asserted, not just described): the clone dir
    holds no data file at clone time (the zero-copy claim is checked
    against the filesystem), every v1 entry resolves OUTSIDE the clone
    directory, and ``cloned_from`` pins the source lineage.

    Scale: cloning is O(manifest) metadata regardless of table bytes —
    a 100 TB source clones with one manifest write; the divergent
    appends are ordinary O(new files) commits.

    Reference: no versioning concept in the 988-LoC loader
    (pandas_to_postgres/_base_copy.py drops/reloads in place); [EXT]
    lakehouse surface (SURVEY §2.12) — the CLONE verb's query face
    (sources/manifest.py clone_snapshot, Delta SHALLOW CLONE
    semantics)."""
    import os

    from pandas_to_postgres_spark.sources.manifest import (
        _escapes_table_dir,
        append_snapshot,
        clone_snapshot,
        load_snapshot,
        publish_snapshot,
        read_snapshot,
    )

    src = _plan_table_dir(spark, sf_dir, "clone_src")
    dst = _plan_table_dir(spark, sf_dir, "clone_dst")
    _parquets = _data_parquets

    ords = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    for r in (0, 1):  # two source epochs
        ords.filter(F.col("o_orderkey") % 4 == r).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    publish_snapshot(src, ["o_orderkey"])

    man = clone_snapshot(src, dst)
    # unconditional raises (not assert): the zero-copy proofs must hold
    # even under python -O, or the docstring's "asserted" claim is false
    if man["cloned_from"]["path"] != os.path.abspath(src):
        raise RuntimeError("clone lineage does not pin the source")
    if _parquets(dst):
        raise RuntimeError("clone copied data bytes; expected zero")
    if not all(_escapes_table_dir(dst, e["path"]) for e in man["files"]):
        raise RuntimeError("clone entry resolves inside the clone dir")

    # diverge the SOURCE: the clone must never see this append
    pre = set(_parquets(src))
    ords.filter(F.col("o_orderkey") % 4 == 2).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    append_snapshot(src, sorted(set(_parquets(src)) - pre))

    # diverge the CLONE: its new file lands under its own directory
    ords.filter(F.col("o_orderkey") % 4 == 3).coalesce(1).write.mode(
        "append"
    ).parquet(dst)
    append_snapshot(dst, _parquets(dst))
    if load_snapshot(dst)["version"] != 2:
        raise RuntimeError("clone-side append did not publish v2")

    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return read_snapshot(spark, dst).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(cents).cast("long").alias("total_cents"),
    )


_REWRITE_MANIFESTS_ORACLE = """
    SELECT CAST(2 AS BIGINT) AS shards_before_publish,
           CAST(9 AS BIGINT) AS shards_before,
           CAST(2 AS BIGINT) AS shards_after,
           CAST(1156 AS BIGINT) AS n_files,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM lineitem
    """


@register(
    "manifest_rewrite_audit", min_rows=1, oracle=_REWRITE_MANIFESTS_ORACLE
)
def manifest_rewrite_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``rewrite_manifests`` under the driver oracle (Iceberg's
    ``rewrite_manifests`` procedure, per its public docs): a sharded
    snapshot table is deliberately degraded — 1100 files publish into
    [1000, 100] shards, then seven 8-file micro-appends each land their
    own small shard (below the inline merge-on-write threshold), leaving
    a 9-shard manifest list — and one metadata-only repack restores the
    [1000, 156] packed layout. The returned audit row carries the shard
    counts at each stage (deterministic: file counts are fixed by the
    query's construction, independent of scale factor) PLUS row-count
    and value invariance measured by re-reading the table AFTER the
    rewrite — the oracle recomputes the invariants from the raw rows, so
    a repack that dropped or duplicated an entry hash-mismatches.

    Scale: the repack touches manifest SHARDS only (metadata-sized; no
    data file moves, ``data_change: false``, every prior version still
    time-travels) — on a 100 TB table this is O(entries) JSON, not
    O(bytes); exactly the shape Iceberg's procedure promises.

    Reference: the 988-LoC loader has no manifest concept; [EXT]
    lakehouse surface (SURVEY §2.12) — the rewrite_manifests verb's
    query face (sources/manifest.py rewrite_manifests).
    """
    from pandas_to_postgres_spark.sources.manifest import (
        append_snapshot,
        load_snapshot,
        publish_snapshot,
        read_snapshot,
        rewrite_manifests,
        snapshot_versions,
    )

    path = _plan_table_dir(spark, sf_dir, "rwm")

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    # 1100 files force the sharded manifest layout (INLINE_MAX = 1000);
    # explicit repartition(n) is exempt from AQE coalescing, so the file
    # count is deterministic at every scale factor
    li.filter(F.col("l_orderkey") % 2 == 0).repartition(1100).write.parquet(
        path
    )
    publish_snapshot(path, ["l_orderkey"])

    def _shards(p):
        raw = load_snapshot(p, snapshot_versions(p)[-1], materialize=False)
        return raw.get("shards") or []

    shards_publish = len(_shards(path))

    # seven micro-appends: each lands one small shard; 7 smalls + the
    # 100-entry publish remainder = 8 smalls, below the inline
    # merge-on-write threshold (> 8), so the degraded layout persists
    for i in range(7):
        pre = set(_data_parquets(path))
        li.filter(F.col("l_orderkey") % 14 == 2 * i + 1).repartition(
            8
        ).write.mode("append").parquet(path)
        append_snapshot(
            path, sorted(set(_data_parquets(path)) - pre)
        )

    before = _shards(path)
    shards_before, files_before = len(before), sum(int(r["n"]) for r in before)
    man = rewrite_manifests(path)
    # unconditional raises (not assert): the no-loss proofs must hold
    # even under python -O
    if man.get("data_change") is not False:
        raise RuntimeError("rewrite_manifests published a data change")
    after = _shards(path)
    shards_after, files_after = len(after), sum(int(r["n"]) for r in after)
    if files_after != files_before:
        raise RuntimeError("manifest repack lost or duplicated entries")

    return read_snapshot(spark, path).agg(
        F.lit(shards_publish).cast("long").alias("shards_before_publish"),
        F.lit(shards_before).cast("long").alias("shards_before"),
        F.lit(shards_after).cast("long").alias("shards_after"),
        F.lit(files_after).cast("long").alias("n_files"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
        ).cast("long").alias("sum_cents"),
    )


_HISTORY_AUDIT_ORACLE = """
    WITH k AS (SELECT o_orderkey AS k FROM orders),
    c1 AS (SELECT CAST(count(*) AS BIGINT) AS c FROM k WHERE k % 3 = 0),
    c2 AS (SELECT CAST(count(*) AS BIGINT) AS c FROM k WHERE k % 3 IN (0, 1)),
    c3 AS (SELECT CAST(count(*) AS BIGINT) AS c FROM k
           WHERE k % 3 IN (0, 1) AND k % 10 <> 5)
    SELECT CAST(1 AS BIGINT) AS version, CAST('publish' AS VARCHAR) AS operation,
           CAST(TRUE AS BOOLEAN) AS data_change, c1.c AS n_rows FROM c1
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'append', TRUE, c2.c FROM c2
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'delete_snapshot_rows', TRUE, c3.c FROM c3
    UNION ALL
    SELECT CAST(4 AS BIGINT), 'set_check_constraint', FALSE, c3.c FROM c3
    """


@register("snapshot_history_audit", min_rows=4, oracle=_HISTORY_AUDIT_ORACLE)
def snapshot_history_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE HISTORY under the driver oracle (Delta's DESCRIBE
    HISTORY / Iceberg's ``tbl.history`` metadata table, per their public
    docs): a snapshot table runs a four-verb lifecycle — publish, append,
    copy-on-write DELETE, ADD CONSTRAINT — and the returned rows are the
    table's own HISTORY metadata table: per version the stamped
    operation, the data_change flag (the constraint commit is
    metadata-only), and the live row count. The oracle recomputes each
    version's row count from the raw orders table, so a history row
    that misreports what a commit did (wrong op, wrong count, a delete
    that did not land, a constraint version that touched data)
    hash-mismatches.

    Scale: the history table is a driver-side O(manifest-metadata) walk
    (shard-ref aggregates carry file/row/byte totals — no shard I/O, no
    data file opened); on a 100 TB table this is exactly Iceberg's
    inspection-table promise.

    Reference: the 988-LoC loader has no table versioning; [EXT]
    lakehouse surface (SURVEY §2.12) — the inspection-table verb
    (sources/manifest.py snapshot_metadata_table)."""
    from pandas_to_postgres_spark.sources.manifest import (
        append_snapshot,
        delete_snapshot_rows,
        publish_snapshot,
        set_check_constraint,
        snapshot_metadata_table,
    )

    path = _plan_table_dir(spark, sf_dir, "hist")
    _parquets = _data_parquets

    ords = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    ords.filter(F.col("o_orderkey") % 3 == 0).coalesce(2).write.parquet(path)
    publish_snapshot(path, ["o_orderkey"])  # v1

    pre = set(_parquets(path))
    ords.filter(F.col("o_orderkey") % 3 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    append_snapshot(path, sorted(set(_parquets(path)) - pre))  # v2

    keys = (
        ords.filter(
            (F.col("o_orderkey") % 3 <= 1) & (F.col("o_orderkey") % 10 == 5)
        )
        .select("o_orderkey")
        .distinct()
    )
    delete_snapshot_rows(spark, path, keys, ["o_orderkey"])  # v3 (CoW)

    set_check_constraint(spark, path, "key_nonneg", "o_orderkey >= 0")  # v4

    return snapshot_metadata_table(spark, path, "history").select(
        F.col("version").cast("long").alias("version"),
        F.col("operation"),
        F.col("data_change"),
        F.col("n_rows").cast("long").alias("n_rows"),
    )
