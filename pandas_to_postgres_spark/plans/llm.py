"""LLM-data-pipeline query surface (SURVEY.md §2.11 D1–D5): dedup, text
analysis, similarity search, multimodal columns.

Oracle-checked where ANSI-SQL-expressible (exact dedup, text stats,
fingerprints, quality scores, brute-force similarity, embedding near-dup);
rows-only for LSH/SimHash internals (xxhash64 has no DuckDB equivalent) and
the mapInPandas multimodal path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pandas_to_postgres_spark.functions.text import (
    LANG_MARKERS,
    STOPWORDS,
    bpe_ish_token_count_expr,
    tokens_expr,
    fingerprint_expr,
    lang_id_expr,
    lang_marker_score_expr,
    quality_score_expr,
    token_count_expr,
)
from pandas_to_postgres_spark.operators.dedup import (
    dedup_exact_summary,
    embedding_near_duplicates,
    minhash_near_duplicates,
    simhash_expr,
)
from pandas_to_postgres_spark.operators.multimodal import (
    attach_fake_media,
    extract_features,
)
from pandas_to_postgres_spark.functions.vectors import dot_expr, l2_norm_expr
from pandas_to_postgres_spark.operators.similarity import topk_cosine_bruteforce
from pandas_to_postgres_spark.plans.registry import register
from pandas_to_postgres_spark.sources.parquet import load_table


# ------------------------------------------------------------------ D1

@register(
    "dedup_exact",
    oracle="""
    SELECT sha256(text) AS text_hash,
           min(doc_id)  AS keep_id,
           count(*)     AS n_copies
    FROM documents GROUP BY text
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: exact dedup — canonical (min) doc_id per content hash.

    Scale: groupBy on a 64-char hash (never the full text); fully
    map-side-combinable."""
    return dedup_exact_summary(load_table(spark, sf_dir, "documents"), "text", "doc_id")


# ------------------------------------------------------------------ D3

_TOKENS_SQL = "regexp_split_to_array(trim(text), '\\s+')"


@register(
    "text_stats",
    oracle=f"""
    SELECT lang,
           count(*) AS n_docs,
           round(CAST(sum(n_chars) AS DOUBLE) / count(n_chars), 2) AS avg_chars,
           round(CAST(sum(CAST(len({_TOKENS_SQL}) AS BIGINT)) AS DOUBLE)
                 / count(*), 2) AS avg_tokens,
           CAST(sum(len({_TOKENS_SQL})) AS BIGINT) AS total_tokens
    FROM documents GROUP BY lang
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: per-language corpus statistics (char/token counts).

    Oracle note: every integer ``sum()`` is CAST to BIGINT *outside* the
    sum — DuckDB types ``sum(BIGINT)`` as HUGEINT, and its pandas
    conversion turns HUGEINT into float64, so the driver's value hash
    would see ``27615.0`` vs Spark's ``27615`` (the round-1/round-2 hash
    mismatches; values were bit-identical). Means stay as
    exact-integer-sum / count for engine-independent determinism."""
    d = load_table(spark, sf_dir, "documents")
    ntok = token_count_expr(F.col("text")).cast("long")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum("n_chars").cast("double") / F.count("n_chars"), 2).alias(
            "avg_chars"
        ),
        F.round(F.sum(ntok).cast("double") / F.count(F.lit(1)), 2).alias("avg_tokens"),
        F.sum(ntok).alias("total_tokens"),
    )


@register(
    "fingerprint_docs",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
    FROM documents
    """,
)
def fingerprint_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: deterministic document fingerprint (md5 of normalized text)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint_expr(F.col("text")).alias("fingerprint"))


_STOP_IN = ", ".join(f"'{s}'" for s in STOPWORDS)


@register(
    "quality_score",
    oracle=f"""
    SELECT doc_id,
           round(
             0.5 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
           + 0.25 * (1.0 - CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
                       / greatest(CAST(length(text) AS DOUBLE), 1.0))
           + 0.25 * least(
               (CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                     x -> x IN ({_STOP_IN}))) AS DOUBLE)
                / greatest(CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS DOUBLE), 1.0)
               ) * 4.0, 1.0),
           4) AS quality
    FROM documents
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: composite quality score (length / punctuation / stopword-ratio
    heuristic), fully SQL-expressible."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score_expr(F.col("text")).alias("quality"))


@register(
    "token_counts",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
               AS bpe_ish_tokens
    FROM documents
    """,
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: whitespace token count + BPE-ish (word/punct-piece) count."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count_expr(F.col("text")).cast("long").alias("ws_tokens"),
        bpe_ish_token_count_expr(F.col("text")).cast("long").alias("bpe_ish_tokens"),
    )


@register(
    "lang_distribution",
    oracle="""
    SELECT source, lang, count(*) AS n,
           round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY source), 4) AS frac
    FROM documents GROUP BY source, lang
    """,
)
def lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: language mix per source (windowed share-of-total)."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("source")
    return (
        d.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "source",
            "lang",
            "n",
            F.round(F.col("n") * 1.0 / F.sum("n").over(w), 4).alias("frac"),
        )
    )


def _score_sql(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return (
        f"CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), "
        f"t -> t IN ({markers}))) AS BIGINT)"
    )


_LANG_CASE = """CASE
    WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
    WHEN s_es > 0 AND s_es >  s_en AND s_es >= s_de AND s_es >= s_fr THEN 'es'
    WHEN s_de > 0 AND s_de >  s_en AND s_de >  s_es AND s_de >= s_fr THEN 'de'
    WHEN s_fr > 0 AND s_fr >  s_en AND s_fr >  s_es AND s_fr >  s_de THEN 'fr'
    ELSE 'und' END"""


@register(
    "lang_id",
    oracle=f"""
    SELECT doc_id, s_en, s_es, s_de, s_fr, {_LANG_CASE} AS predicted_lang
    FROM (SELECT doc_id,
                 {_score_sql('en')} AS s_en,
                 {_score_sql('es')} AS s_es,
                 {_score_sql('de')} AS s_de,
                 {_score_sql('fr')} AS s_fr
          FROM documents)
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: marker-count language-ID heuristic with deterministic
    tie-breaking — per-row classifier expression, fully SQL-expressible."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        *[
            lang_marker_score_expr(F.col("text"), lang).alias(f"s_{lang}")
            for lang in LANG_MARKERS
        ],
        lang_id_expr(F.col("text")).alias("predicted_lang"),
    )


@register(
    "explode_tokens",
    oracle="""
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
    FROM documents WHERE doc_id < 50
    """,
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 (UDTF-equivalent): one row per token — explode of an
    array-returning expression, the Spark shape of a table function."""
    from pandas_to_postgres_spark.functions.text import tokens_expr

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select("doc_id", F.explode(tokens_expr(F.col("text"))).alias("token"))


@register(
    "pandas_udf_norm",
    oracle="""
    SELECT p_partkey, upper(replace(p_name, ' ', '_')) AS norm_name
    FROM part
    """,
)
def pandas_udf_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: vectorized (Arrow-batched) scalar pandas UDF. The same transform
    is expressible with built-ins — the point here is exercising the
    pandas_udf path itself, oracle-checked."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def norm(name: pd.Series) -> pd.Series:
        return name.str.replace(" ", "_", regex=False).str.upper()

    return load_table(spark, sf_dir, "part").select(
        "p_partkey", norm(F.col("p_name")).alias("norm_name")
    )


@register(
    "udaf_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: GROUPED_AGG pandas UDAF — quantity-weighted average price."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(wavg(F.col("l_extendedprice"), F.col("l_quantity")), 4).alias("wavg_price")
    )


@register(
    "grouped_map_zscore",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round((l_extendedprice - avg(l_extendedprice) OVER w)
                 / stddev_pop(l_extendedprice) OVER w, 4) AS z
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag)
    """,
)
def grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: grouped-map applyInPandas — per-group z-score normalization.
    Each group arrives as one pandas DataFrame (the Arrow-batched shape a
    feature-normalization pipeline uses at scale; groups must fit executor
    memory — for 100 TB groups, use window aggregates instead)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["l_extendedprice"]
        z = ((x - x.mean()) / x.std(ddof=0)).round(4)
        return pd.DataFrame(
            {"l_orderkey": pdf["l_orderkey"], "l_linenumber": pdf["l_linenumber"], "z": z}
        )

    return li.groupBy("l_returnflag").applyInPandas(
        zscore, schema="l_orderkey long, l_linenumber int, z double"
    )


# ------------------------------------------------------------------ D4

_DOT = (
    "(SELECT sum(CAST(q.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)) "
    "FROM range(1, 65) t(i))"
)
_NORM_Q = (
    "sqrt((SELECT sum(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)) "
    "FROM range(1, 65) t(i)))"
)
_NORM_E = (
    "sqrt((SELECT sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)) "
    "FROM range(1, 65) t(i)))"
)


@register(
    "simsearch_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
    scored AS (
        SELECT q.qid, e.vec_id,
               round({_DOT} / ({_NORM_Q} * {_NORM_E}), 5) AS cosine
        FROM q CROSS JOIN embeddings e),
    ranked AS (
        SELECT qid, vec_id, cosine,
               CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id)
                    AS BIGINT) AS rnk
        FROM scored)
    SELECT qid, vec_id, cosine, rnk FROM ranked WHERE rnk <= 5
    """,
)
def simsearch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4: brute-force cosine top-k (query set = vec_id < 5, broadcast).

    Ranking uses the ROUNDED cosine + vec_id tie-break on both engines so
    FP summation order cannot flip ranks. Scale path: topk_cosine_lsh
    (same signature, LSH-bucketed pairing)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding")
    )
    out = topk_cosine_bruteforce(
        q, e, query_id="qid", corpus_id="vec_id", query_vec="embedding",
        corpus_vec="embedding", k=5,
    )
    return out.select("qid", "vec_id", "cosine", F.col("rank").cast("long").alias("rnk"))


@register(
    "embedding_neardup",
    oracle=f"""
    SELECT q.label, q.vec_id AS id_a, e.vec_id AS id_b,
           round({_DOT} / ({_NORM_Q} * {_NORM_E}), 5) AS cosine
    FROM (SELECT label, vec_id, embedding AS qe FROM embeddings) q
    JOIN embeddings e ON q.label = e.label AND q.vec_id < e.vec_id
    WHERE {_DOT} / ({_NORM_Q} * {_NORM_E}) >= 0.3
    """,
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2e: embedding-cosine near-duplicate pairs, blocked by label (the
    block column stands in for an LSH/cluster bucket at scale — the pair
    space is same-block only, never a global crossJoin)."""
    e = load_table(spark, sf_dir, "embeddings")
    return embedding_near_duplicates(
        e, vec_col="embedding", id_col="vec_id", threshold=0.3, block_col="label"
    )


@register(
    "ngram_jaccard_pairs",
    oracle="""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
               regexp_replace(text, '\\s+\\S+$', '') AS text
        FROM documents),
    toks AS (
        SELECT doc_id,
               list_distinct(list_filter(
                   regexp_split_to_array(lower(trim(text)), '\\s+'),
                   t -> t <> '')) AS raw
        FROM corpus),
    sized AS (
        SELECT doc_id,
               CASE WHEN len(raw) >= 1 THEN raw
                    ELSE ['']::VARCHAR[] END AS tk,
               CASE WHEN len(raw) >= 1 THEN len(raw) ELSE 1 END AS sz
        FROM toks),
    tok AS (SELECT doc_id, sz, unnest(tk) AS t FROM sized),
    dfreq AS (SELECT t, count(*) AS dfc FROM tok GROUP BY t),
    ranked AS (
        SELECT tok.doc_id, tok.sz, tok.t,
               row_number() OVER (PARTITION BY tok.doc_id
                                  ORDER BY dfreq.dfc, tok.t) AS rn
        FROM tok JOIN dfreq USING (t)),
    pref AS (
        SELECT doc_id, t FROM ranked
        WHERE rn <= sz - ceil(0.8 * sz) + 1),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM pref a JOIN pref b ON a.t = b.t AND a.doc_id < b.doc_id)
    SELECT id_a, id_b,
           round(CAST(len(list_intersect(x.tk, y.tk)) AS DOUBLE)
                 / CAST(len(list_distinct(list_concat(x.tk, y.tk))) AS DOUBLE), 4)
               AS jaccard
    FROM cand
    JOIN sized x ON x.doc_id = cand.id_a
    JOIN sized y ON y.doc_id = cand.id_b
    WHERE CAST(len(list_intersect(x.tk, y.tk)) AS DOUBLE)
          / CAST(len(list_distinct(list_concat(x.tk, y.tk))) AS DOUBLE) >= 0.8
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2: exact word-gram Jaccard ≥ 0.8 pairs via PREFIX FILTERING — the
    scale-safe similarity self-join: candidates come from each document's
    globally-rarest shingles only, so block cardinality is the vocabulary
    (grows with the corpus) instead of a fixed handful of (lang, source)
    blocks going quadratic. Recall is exact by the prefix-filter bound.
    Run on documents ∪ a perturbed copy (last word dropped, doc_id+10^6,
    same construction as minhash_neardup) so planted near-dup pairs exist
    at every scale factor; the oracle replays the identical prefix-join in
    SQL."""
    from pandas_to_postgres_spark.operators.dedup import ngram_jaccard_prefix

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    perturbed = d.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.regexp_replace(F.col("text"), r"\s+\S+$", "").alias("text"),
    )
    corpus = d.unionByName(perturbed)
    return ngram_jaccard_prefix(
        corpus, text_col="text", id_col="doc_id", threshold=0.8, n=1
    )


_IVF_ORACLE = """
    WITH cent AS (
      SELECT label, i,
             CAST(sum(CAST(embedding[i] AS DECIMAL(18,12))) AS DOUBLE)
               / count(*) AS m
      FROM embeddings, range(1, 65) t(i)
      GROUP BY label, i),
    cvec AS (SELECT label, list(m ORDER BY i) AS centroid FROM cent GROUP BY label),
    q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
    psim AS (
      SELECT q.qid, c.label, q.qe,
             round((SELECT sum(CAST(q.qe[i] AS DOUBLE) * CAST(c.centroid[i] AS DOUBLE))
                    FROM range(1, 65) t(i))
                   / (sqrt((SELECT sum(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))
                            FROM range(1, 65) t(i)))
                      * sqrt((SELECT sum(CAST(c.centroid[i] AS DOUBLE) * CAST(c.centroid[i] AS DOUBLE))
                              FROM range(1, 65) t(i)))), 5) AS csim
      FROM q CROSS JOIN cvec c),
    probes AS (
      SELECT qid, label, qe FROM (
        SELECT qid, label, qe,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY csim DESC, label ASC) AS pr
        FROM psim) x
      WHERE pr <= 3),
    scored AS (
      SELECT p.qid, e.vec_id,
             round((SELECT sum(CAST(p.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
                    FROM range(1, 65) t(i))
                   / (sqrt((SELECT sum(CAST(p.qe[i] AS DOUBLE) * CAST(p.qe[i] AS DOUBLE))
                            FROM range(1, 65) t(i)))
                      * sqrt((SELECT sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
                              FROM range(1, 65) t(i)))), 5) AS cosine
      FROM probes p JOIN embeddings e ON e.label = p.label),
    ranked AS (
      SELECT qid, vec_id, cosine,
             CAST(row_number() OVER (PARTITION BY qid
                                     ORDER BY cosine DESC, vec_id) AS BIGINT)
                 AS rnk
      FROM scored)
    SELECT qid, vec_id, cosine, rnk FROM ranked WHERE rnk <= 5
    """


@register("simsearch_ivf", oracle=_IVF_ORACLE)
def simsearch_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4b: IVF-style ANN — label partitions as inverted lists, per-cluster
    mean centroids as the coarse quantizer, nprobe=3. Fully deterministic —
    centroids are DECIMAL-exact means, probe ranking uses the rounded
    centroid cosine with label tie-break — so the engine-side probe pruning
    replays exactly in the DuckDB oracle (rows-only until round 3; recall
    vs exact brute force additionally asserted in tests/)."""
    from pandas_to_postgres_spark.operators.similarity import topk_cosine_ivf

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding")
    )
    out = topk_cosine_ivf(
        q, e.select("vec_id", "embedding", "label"),
        query_id="qid", corpus_id="vec_id", query_vec="embedding",
        corpus_vec="embedding", cluster_col="label", k=5, nprobe=3,
    )
    return out.select("qid", "vec_id", "cosine", F.col("rank").cast("long").alias("rnk"))


# ------------------------------------------------------------------ D2

def _lsh_oracle(num_planes: int = 4, dim: int = 64) -> str:
    """DuckDB twin of the hyperplane-LSH search: embeds the IDENTICAL
    plane literals (operators/similarity.lsh_planes), replays the sign
    buckets, and ranks within-bucket cosines exactly like the Spark op."""
    from pandas_to_postgres_spark.operators.similarity import lsh_planes

    planes = lsh_planes(num_planes, dim)
    bucket_terms = []
    for j, plane in enumerate(planes):
        lit = "[" + ", ".join(repr(x) for x in plane) + "]"
        bucket_terms.append(
            f"(CASE WHEN (SELECT sum(CAST(embedding[i] AS DOUBLE) * ({lit}[i])) "
            f"FROM range(1, {dim + 1}) t(i)) > 0 THEN {1 << j} ELSE 0 END)"
        )
    bucket = " + ".join(bucket_terms)
    return f"""
    WITH buck AS (
      SELECT vec_id, embedding, {bucket} AS b FROM embeddings),
    q AS (SELECT vec_id AS qid, embedding AS qe, b FROM buck WHERE vec_id < 5),
    scored AS (
      SELECT q.qid, e.vec_id,
             round((SELECT sum(CAST(q.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
                    FROM range(1, {dim + 1}) t(i))
                   / (sqrt((SELECT sum(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))
                            FROM range(1, {dim + 1}) t(i)))
                      * sqrt((SELECT sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
                              FROM range(1, {dim + 1}) t(i)))), 5) AS cosine
      FROM q JOIN buck e ON q.b = e.b),
    ranked AS (
      SELECT qid, vec_id, cosine,
             CAST(row_number() OVER (PARTITION BY qid
                                     ORDER BY cosine DESC, vec_id) AS BIGINT)
                 AS rnk
      FROM scored)
    SELECT qid, vec_id, cosine, rnk FROM ranked WHERE rnk <= 5
    """


@register("simsearch_lsh", oracle=_lsh_oracle())
def simsearch_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4c: random-hyperplane LSH ANN — deterministic sign-bucket equi-join
    replaces the crossJoin (the 100 TB pruning path; recall tunable via
    num_planes). The planes are plan-time literals, so the DuckDB oracle
    embeds the same values and replays the buckets exactly (rows-only
    until round 3); recall vs exact brute force additionally asserted in
    tests/test_operators.py."""
    from pandas_to_postgres_spark.operators.similarity import topk_cosine_lsh

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding")
    )
    out = topk_cosine_lsh(
        q, e.select("vec_id", "embedding"),
        query_id="qid", corpus_id="vec_id", query_vec="embedding",
        corpus_vec="embedding", k=5, num_planes=4,
    )
    return out.select("qid", "vec_id", "cosine", F.col("rank").cast("long").alias("rnk"))


@register("minhash_neardup")  # rows-only: xxhash64 signatures have no SQL oracle
def minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2: MinHash-LSH near-dup detection, demonstrated on documents ∪ a
    deterministically perturbed copy (last word dropped, doc_id+10**6) so
    planted near-dups exist at every scale factor. Returns verified pairs
    (id_a, id_b, jaccard >= 0.8).

    Correctness of recall is unit-tested on planted fixtures
    (tests/test_dedup.py); the LSH internals (banding, bucket self-join)
    are not ANSI-SQL-expressible → rows-only driver check."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    perturbed = d.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.regexp_replace(F.col("text"), r"\s+\S+$", "").alias("text"),
    )
    corpus = d.unionByName(perturbed)
    return minhash_near_duplicates(
        corpus, text_col="text", id_col="doc_id",
        num_hashes=64, num_bands=16, jaccard_threshold=0.8,
    )


@register("simhash_docs")  # rows-only: xxhash64 bit-votes have no SQL oracle
def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2: 64-bit SimHash signature per document (deterministic)."""
    from pandas_to_postgres_spark.operators.dedup import ensure_parallelism

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return d.select("doc_id", simhash_expr("text").alias("simhash"))


@register(
    "train_test_split",
    oracle="""
    SELECT CASE WHEN doc_id % 10 < 8 THEN 'train' ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1
    """,
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline op: deterministic hash/modulo split — every rerun
    and every scale puts the same doc in the same split (no rand())."""
    d = load_table(spark, sf_dir, "documents")
    split = F.when(F.col("doc_id") % 10 < 8, "train").otherwise("test")
    return d.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )


@register("stratified_sample")  # rows-only: sampling is engine-specific
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline op: per-stratum downsampling (sampleBy with a fixed
    seed — deterministic for a given input partitioning)."""
    d = load_table(spark, sf_dir, "documents")
    fractions = {"en": 0.5, "es": 0.5, "de": 0.2, "fr": 0.2, "zh": 1.0}
    return d.sampleBy("lang", fractions, seed=42).select("doc_id", "lang")


@register(
    "profile_documents",
    oracle="""
    SELECT count(*) AS n_rows,
           count(DISTINCT lang) AS n_langs,
           count(DISTINCT source) AS n_sources,
           CAST(sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_empty,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           round(CAST(sum(n_chars) AS DOUBLE) / count(n_chars), 2) AS avg_chars
    FROM documents
    """,
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline op: one-pass corpus profile (the pre-ingestion
    sanity scan every 100 TB pipeline runs before training)."""
    d = load_table(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum(
            F.when(F.col("text").isNull() | (F.col("text") == ""), 1).otherwise(0)
        ).alias("n_empty"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        # exact long sum / count, not avg(long) (see text_stats)
        F.round(F.sum("n_chars").cast("double") / F.count("n_chars"), 2).alias(
            "avg_chars"
        ),
    )


# ------------------------------------------------------------------ D5

@register("multimodal_features")  # rows-only: mapInPandas decode path
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5: multimodal column plumbing — binary payload + typed metadata
    struct → Arrow-batched (fake) decode + feature extraction via
    mapInPandas. Schema/partitioning/batch shape are the real thing; the
    decoder is a deterministic stub (no media libs in this container)."""
    d = load_table(spark, sf_dir, "documents")
    media = attach_fake_media(d, text_col="text", id_col="doc_id")
    feats = extract_features(media)
    return feats.select(
        "doc_id",
        "byte_len",
        "mime",
        F.round(F.element_at("feature", 1).cast("double"), 4).alias("f0"),
    )


# --------------------------------------------- training-data shaping

@register(
    "chunk_documents",
    oracle="""
    WITH idx AS (
        SELECT doc_id, text,
               unnest(generate_series(
                   1, greatest(CAST(ceil(length(text) / 200.0) AS BIGINT), 1))) AS i
        FROM documents)
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           substring(text, CAST((i - 1) * 200 + 1 AS INT), 200) AS chunk
    FROM idx
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width character chunking — split every document into 200-char
    windows (the training-pipeline primitive behind context-window prep).

    `sequence` builds the per-doc chunk indices JVM-side and `explode`
    fans them out; `substring` slices lazily, so the text column is read
    once and never collected. Scale: embarrassingly parallel (no shuffle at
    all — chunking is a per-row generator), output partitioning inherits
    the scan; `greatest(..., 1)` keeps empty docs as one empty chunk on
    both engines."""
    from pandas_to_postgres_spark.functions.text import chunk_text

    d = load_table(spark, sf_dir, "documents")
    return chunk_text(d, "text", "doc_id", width=200)


@register(
    "pack_sequences",
    oracle="""
    SELECT doc_id, lang,
           CAST(floor(coalesce(sum(n_chars) OVER (
                    PARTITION BY lang ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                / 4096.0) AS BIGINT) AS pack_id
    FROM documents
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential sequence packing: assign each document to a ~4096-char
    training pack, filling packs in doc_id order within each language.

    Deterministic streaming-fill packing (not bin-packing first-fit):
    pack boundary = running size before the doc crosses a 4096 multiple.

    Sharded prefix sum — the 100 TB shape: the window partitions by
    (lang, doc_id DIV shard_rows), so no single language ever serializes
    one giant sort; each task sorts one bounded shard. The cross-shard
    running offset comes from a tiny per-shard-totals aggregate (one row
    per shard) whose own window is over that aggregate only, broadcast
    back onto the data. offset(shard) + within-shard prefix == the global
    per-lang prefix sum, exactly — the oracle runs the unsharded global
    window and the hashes must agree."""
    shard_rows = 100  # small so sf0.01's 500 docs exercise multiple shards
    d = load_table(spark, sf_dir, "documents").withColumn(
        "__shard", (F.col("doc_id") / shard_rows).cast("long")
    )
    w_in = (
        Window.partitionBy("lang", "__shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = F.coalesce(F.sum("n_chars").over(w_in), F.lit(0))
    totals = d.groupBy("lang", "__shard").agg(F.sum("n_chars").alias("__tot"))
    w_sh = (
        Window.partitionBy("lang")
        .orderBy("__shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "lang",
        "__shard",
        F.coalesce(F.sum("__tot").over(w_sh), F.lit(0)).alias("__off"),
    )
    return (
        d.join(F.broadcast(offsets), ["lang", "__shard"])
        .select(
            "doc_id",
            "lang",
            F.floor((F.col("__off") + within) / 4096.0).cast("long").alias("pack_id"),
        )
    )


@register("multimodal_frames")  # rows-only: mapInPandas decode path
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5: the full multimodal chain — attach payload+metadata → resize →
    frame-sample — all Arrow-batched mapInPandas with deterministic fake
    decoders (no media libs in this container; the Spark plumbing is real).
    Returns per-frame rows with byte lengths (binary payloads stay out of
    the result hash)."""
    from pandas_to_postgres_spark.operators.multimodal import (
        attach_fake_media,
        resize_media,
        sample_frames,
    )

    d = load_table(spark, sf_dir, "documents")
    media = attach_fake_media(d, text_col="text", id_col="doc_id")
    resized = resize_media(media, width=64, height=48)
    frames = sample_frames(resized, every_n=5)
    return frames.select(
        "doc_id", "frame_idx", F.length("frame_payload").cast("long").alias("frame_bytes")
    )


_SAMPLE_FRACTIONS = {"en": 0.5, "es": 0.5, "de": 0.2, "fr": 0.2, "zh": 1.0}

from pandas_to_postgres_spark.operators.sampling import sample_sql as _sample_sql  # noqa: E402


@register(
    "stratified_sample_det",
    oracle=(
        "SELECT doc_id, lang FROM documents WHERE "
        + _sample_sql("doc_id", "lang", _SAMPLE_FRACTIONS)
    ),
)
def stratified_sample_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline op: deterministic content-keyed stratified sampling
    (md5-threshold). Unlike sampleBy, membership is stable under any
    repartitioning and reproducible on any engine — the oracle runs the
    IDENTICAL predicate in DuckDB."""
    from pandas_to_postgres_spark.operators.sampling import (
        stratified_sample_deterministic,
    )

    d = load_table(spark, sf_dir, "documents")
    return stratified_sample_deterministic(
        d, "doc_id", "lang", _SAMPLE_FRACTIONS
    ).select("doc_id", "lang")


_PIPE_FRACTIONS = {"en": 0.8, "es": 0.8, "de": 0.5, "fr": 0.5, "zh": 1.0}

# the quality predicate, shared verbatim with quality_score's oracle
_QUALITY_SQL = f"""round(
             0.5 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
           + 0.25 * (1.0 - CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
                       / greatest(CAST(length(text) AS DOUBLE), 1.0))
           + 0.25 * least(
               (CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                     x -> x IN ({_STOP_IN}))) AS DOUBLE)
                / greatest(CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS DOUBLE), 1.0)
               ) * 4.0, 1.0),
           4)"""


@register(
    "corpus_prep_pipeline",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, text, lang, {_QUALITY_SQL} AS quality
        FROM documents),
    filtered AS (SELECT * FROM scored WHERE quality >= 0.5),
    deduped AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM filtered) WHERE rn = 1),
    sampled AS (
        SELECT doc_id, text, lang, quality FROM deduped
        WHERE {_sample_sql('doc_id', 'lang', _PIPE_FRACTIONS)}),
    chunked AS (
        SELECT doc_id, lang, quality,
               unnest(generate_series(
                   1, greatest(CAST(ceil(length(text) / 200.0) AS BIGINT), 1))) AS i,
               text
        FROM sampled)
    SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx, lang, quality,
           substring(text, CAST((i - 1) * 200 + 1 AS INT), 200) AS chunk
    FROM chunked
    """,
)
def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship training-data pipeline, composed from the operator
    library: quality-score filter → exact dedup (keep min doc_id per
    content hash) → deterministic stratified sample → fixed-width
    chunking. Every stage is the registered operator, so the whole chain
    is oracle-expressible as CTEs.

    Scale shape: filter+score push into the scan (no shuffle) → ONE
    shuffle for the dedup groupBy on md5(text) → sampler is another
    scan-local filter → chunking is a per-row generate. Total: one
    exchange end-to-end for the entire prep pipeline."""
    from pandas_to_postgres_spark.functions.text import chunk_text
    from pandas_to_postgres_spark.operators.sampling import (
        stratified_sample_deterministic,
    )

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "text", "lang", quality_score_expr(F.col("text")).alias("quality")
    ).filter(F.col("quality") >= 0.5)
    w = Window.partitionBy(F.md5("text")).orderBy(F.col("doc_id").asc())
    deduped = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    sampled = stratified_sample_deterministic(deduped, "doc_id", "lang", _PIPE_FRACTIONS)
    return chunk_text(
        sampled, "text", "doc_id", width=200, carry_cols=("lang", "quality")
    ).select("doc_id", "chunk_idx", "lang", "quality", "chunk")


@register(
    "udtf_sentences",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(parts, 1) - 1 AS BIGINT) AS sent_idx,
           unnest(parts) AS sentence
    FROM (SELECT doc_id, regexp_split_to_array(text, '\\.\\s+') AS parts
          FROM documents WHERE doc_id < 30)
    """,
)
def udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 (true Python UDTF, Spark 4 ``@udtf``): one row per sentence with
    its position, via a LATERAL table-function call — the genuinely
    set-returning UDF surface (vs the explode-of-array shape in
    ``explode_tokens``).

    Scale: row-at-a-time Python — the slow tier by design; the built-in
    ``posexplode(split(...))`` expression is the hot-path equivalent. Use a
    UDTF only when the expansion logic genuinely needs Python (stateful
    tokenizers, external parsers); then prefer ``useArrow=True`` batching.
    """
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx: bigint, sentence: string")
    class SplitSentences:
        def eval(self, text):
            for i, s in enumerate(re.split(r"\.\s+", text or "")):
                yield i, s

    spark.udtf.register("split_sentences", SplitSentences)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, t.sent_idx, t.sentence
        FROM documents d, LATERAL split_sentences(d.text) t
        WHERE d.doc_id < 30
        """
    )


@register(
    "dedup_incremental_docs",
    oracle="""
    SELECT b.doc_id, b.lang, b.source
    FROM documents b
    WHERE b.doc_id >= 400
      AND NOT EXISTS (SELECT 1 FROM documents c
                      WHERE c.doc_id < 400 AND c.text = b.text)
      AND b.doc_id = (SELECT min(b2.doc_id) FROM documents b2
                      WHERE b2.doc_id >= 400 AND b2.text = b.text)
    """,
)
def dedup_incremental_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 incremental: docs 400+ arrive as a new batch and are deduped
    against the already-ingested corpus (docs < 400) — anti-join on the
    content hash plus first-occurrence-within-batch.

    Scale: the shape of every incremental ingest at 100 TB — only the new
    batch shuffles; the corpus contributes a narrow hash column (in a real
    deployment, a persisted hash-index table bucketed on the hash)."""
    from pandas_to_postgres_spark.operators.dedup import dedup_incremental

    d = load_table(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") >= 400)
    corpus = d.filter(F.col("doc_id") < 400)
    return dedup_incremental(batch, corpus, "text", "doc_id").select(
        "doc_id", "lang", "source"
    )


@register(
    "provenance_counts",
    oracle="""
    SELECT count(*) AS n_rows,
           count(DISTINCT source_file) AS n_files
    FROM (SELECT 'documents.parquet' AS source_file FROM documents)
    """,
)
def provenance_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-provenance audit (Titian-style lineage as data, see
    operators/provenance): stamp scan-time origin (file, partition, offset)
    on every document, then roll up rows per source file. The testdata is
    one file per table, so the oracle pins (row count, file count); the
    per-file stamping itself is asserted in unit tests with multi-file
    inputs."""
    from pandas_to_postgres_spark.operators.provenance import (
        provenance_summary,
        with_provenance,
    )

    d = with_provenance(load_table(spark, sf_dir, "documents"))
    s = provenance_summary(d)
    return s.agg(
        F.sum("n_rows").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
    )


@register(
    "null_profile_orders",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS null_custkey,
           CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS null_totalprice,
           count(DISTINCT o_orderstatus) AS n_statuses,
           CAST(round(min(o_totalprice), 2) AS DOUBLE) AS min_price,
           CAST(round(max(o_totalprice), 2) AS DOUBLE) AS max_price
    FROM orders
    """,
)
def null_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile: null counts, distinct cardinality and value
    ranges for a table in ONE scan — the validation pass an ETL pipeline
    runs before loading (the reference delegates this to Postgres rejecting
    the COPY; here it is a first-class pre-load report).

    Scale: single scan, fully map-side-combinable aggregates; add columns
    freely — the pass stays one job."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "null_custkey"
        ),
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0)).alias(
            "null_totalprice"
        ),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.round(F.min("o_totalprice"), 2).cast("double").alias("min_price"),
        F.round(F.max("o_totalprice"), 2).cast("double").alias("max_price"),
    )


@register(
    "simsearch_topk_incremental",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
    scored AS (
        SELECT q.qid, e.vec_id,
               round({_DOT} / ({_NORM_Q} * {_NORM_E}), 5) AS cosine
        FROM q CROSS JOIN embeddings e),
    ranked AS (
        SELECT qid, vec_id, cosine,
               CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id)
                    AS BIGINT) AS rnk
        FROM scored)
    SELECT qid, vec_id, cosine, rnk FROM ranked WHERE rnk <= 5
    """,
)
def simsearch_topk_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 incremental: the corpus arrives as two ingest shards; each shard
    is scored independently (as if at different times) and the cached
    per-shard top-ks are merged with `operators/similarity.merge_topk` —
    the oracle is the FULL-corpus top-k, proving merge == recompute exactly
    (top-k is merge-decomposable; cf. incremental top-k search, EDBT 2020).

    Scale: the incremental step never revisits old shards — it shuffles
    O(queries x k) cached rows plus the new shard's scores only."""
    from pandas_to_postgres_spark.operators.similarity import (
        merge_topk,
        topk_cosine_bruteforce,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding")
    )
    shard_a = e.filter(F.col("vec_id") % 2 == 0)
    shard_b = e.filter(F.col("vec_id") % 2 == 1)
    topks = [
        topk_cosine_bruteforce(
            q, s, query_id="qid", corpus_id="vec_id", query_vec="embedding",
            corpus_vec="embedding", k=5,
        )
        for s in (shard_a, shard_b)
    ]
    merged = merge_topk(topks, query_id="qid", corpus_id="vec_id", k=5)
    return merged.select(
        "qid", "vec_id", "cosine", F.col("rank").cast("long").alias("rnk")
    )


@register(
    "quantize_embeddings",
    oracle="""
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings),
    m AS (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS s FROM v),
    q AS (SELECT vec_id, e, s,
                 list_transform(e, x -> floor(x * 127.0 / s + 0.5)) AS qq FROM m)
    SELECT vec_id, round(s, 6) AS scale,
           round(list_max(list_transform(list_zip(e, qq),
                 p -> abs(p[1] - p[2] * s / 127.0))), 6) AS max_err
    FROM q
    """,
)
def quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization with per-vector scale + reconstruction
    error — the storage-compression step of an embedding pipeline (float32
    → int8 is 4x smaller; the max_err column is the quality audit).
    Quantize = floor(x*127/s + 0.5) (explicit half-up so both engines tie-
    break identically); dequantized error via zip_with.

    Scale: all higher-order functions, map-only per row, no shuffle —
    quantization parallelizes with the scan exactly like minhash
    signatures."""
    e = load_table(spark, sf_dir, "embeddings")
    ed = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    d = e.select(F.col("vec_id"), ed.alias("e"))
    s = F.array_max(F.transform(F.col("e"), F.abs))
    d = d.withColumn("s", s)
    qq = F.transform(
        F.col("e"), lambda x: F.floor(x * F.lit(127.0) / F.col("s") + F.lit(0.5))
    )
    err = F.array_max(
        F.zip_with(
            F.col("e"),
            qq,
            lambda a, b: F.abs(a - b.cast("double") * F.col("s") / F.lit(127.0)),
        )
    )
    return d.select(
        "vec_id",
        F.round("s", 6).alias("scale"),
        F.round(err, 6).alias("max_err"),
    )


@register(
    "simsearch_sq8",
    min_rows=25,
    oracle="""
    WITH ed AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
      FROM embeddings),
    nn AS (
      SELECT vec_id, ed,
             sqrt((SELECT sum(ed[i] * ed[i]) FROM range(1, 65) t(i))) AS nrm
      FROM ed),
    en AS (SELECT vec_id, list_transform(ed, x -> x / nrm) AS en FROM nn),
    cq AS (
      SELECT vec_id, en,
             list_max(list_transform(en, x -> abs(x))) AS s
      FROM en),
    cc AS (
      SELECT vec_id, s,
             list_transform(en,
               x -> CAST(floor(x * 127.0 / s + 0.5) AS BIGINT)) AS code
      FROM cq),
    q AS (SELECT vec_id AS qid, en AS qn FROM en WHERE vec_id < 5),
    approx AS (
      SELECT q.qid, c.vec_id,
             round((c.s / 127.0) *
                   (SELECT sum(q.qn[i] * CAST(c.code[i] AS DOUBLE))
                    FROM range(1, 65) t(i)), 5) AS cosine_sq
      FROM q CROSS JOIN cc c),
    cand AS (
      SELECT qid, vec_id, cosine_sq,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cosine_sq DESC, vec_id) AS crn
      FROM approx),
    rer AS (
      SELECT cand.qid, cand.vec_id, cand.cosine_sq,
             round((SELECT sum(q.qn[i] * e2.en[i])
                    FROM range(1, 65) t(i)), 5) AS cosine
      FROM cand
      JOIN q ON q.qid = cand.qid
      JOIN en e2 ON e2.vec_id = cand.vec_id
      WHERE cand.crn <= 20)
    SELECT qid, vec_id, cosine_sq, cosine, rnk FROM (
      SELECT qid, vec_id, cosine_sq, cosine,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY cosine DESC, vec_id)
                  AS BIGINT) AS rnk
      FROM rer)
    WHERE rnk <= 5
    """,
)
def simsearch_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4: scalar-quantized (SQ8, FAISS-style) ANN with exact rerank —
    the memory-bandwidth point between brute force (full float scan) and
    PQ (1-byte subspace codes). Corpus vectors are L2-normalized then
    symmetrically quantized to int8 (code = floor half-up of en*127/s,
    per-vector scale s = max |component|) — a 4x smaller scan footprint,
    which at 100 TB IS the cost of the first pass. Queries stay float
    (asymmetric ADC, the accuracy-preserving convention): approx cosine
    = (s/127) * dot(q, code). Top-20 candidates per query by ROUNDED
    approx score (+ id tie-break, both engines identical), then an exact
    rerank joins ONLY the candidate ids back to the normalized corpus —
    output = exact top-5 of the candidate pool, with the approx score
    kept alongside as the quantization-quality audit.

    Scale: the approx pass scans (vec_id, s, code) only — the float
    corpus is touched for |Q|*20 rows via an id join (broadcast the
    candidate list); no corpus shuffle anywhere. The quantization itself
    is `quantize_embeddings`' map-only expression. Oracle replays
    quantization, ADC scoring, candidate cut, and rerank bit-for-bit
    (floor half-up ties, sequential-order dot products)."""
    e = load_table(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id",
        "embedding",
        l2_norm_expr(F.col("embedding")).alias("nrm"),
    )
    en = base.select(
        "vec_id",
        F.transform(
            F.col("embedding"), lambda x: x.cast("double") / F.col("nrm")
        ).alias("en"),
    )
    cq = en.select(
        "vec_id", "en", F.array_max(F.transform("en", F.abs)).alias("s")
    )
    # the int8 code table: what a deployment would PERSIST (4x smaller)
    codes = cq.select(
        "vec_id",
        "s",
        F.transform(
            "en",
            lambda x: F.floor(x * F.lit(127.0) / F.col("s") + F.lit(0.5)).cast(
                "long"
            ),
        ).alias("code"),
    )
    q = en.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("en").alias("qn")
    )
    approx = (
        F.broadcast(q)
        .crossJoin(codes)
        .select(
            "qid",
            "vec_id",
            F.round(
                (F.col("s") / F.lit(127.0)) * dot_expr(F.col("qn"), F.col("code")),
                5,
            ).alias("cosine_sq"),
        )
    )
    wq = Window.partitionBy("qid").orderBy(
        F.col("cosine_sq").desc(), F.col("vec_id").asc()
    )
    cand = (
        approx.withColumn("crn", F.row_number().over(wq))
        .filter(F.col("crn") <= 20)
        .drop("crn")
    )
    # exact rerank: candidate ids only touch the float corpus here
    rer = (
        cand.join(q, "qid")
        .join(en.select("vec_id", "en"), "vec_id")
        .select(
            "qid",
            "vec_id",
            "cosine_sq",
            F.round(dot_expr(F.col("qn"), F.col("en")), 5).alias("cosine"),
        )
    )
    wr = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        rer.withColumn("rnk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rnk") <= 5)
        .select("qid", "vec_id", "cosine_sq", "cosine", "rnk")
    )


@register(
    "weighted_sample_docs",
    oracle=f"""
    SELECT doc_id, {_QUALITY_SQL} AS quality
    FROM documents
    WHERE CAST(('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
          / 1152921504606846976.0 < {_QUALITY_SQL}
    """,
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic importance sampling: keep each doc with probability
    equal to its quality score — P(keep) = quality, decided by comparing a
    salted md5-uniform of the doc id against the score. No randomness:
    membership is a pure function of (salt, doc_id), so reruns, retries
    and different partitionings select the SAME sample — the property that
    makes a 100 TB sampling job resumable and auditable (and lets an
    independent engine reproduce the exact sample, as the oracle proves).

    Scale: map-only filter; the md5-uniform costs one hash per row and the
    quality expression is shared with quality_score (JVM codegen)."""
    d = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("double")
        / F.lit(1152921504606846976.0)
    )
    q = quality_score_expr(F.col("text"))
    return d.filter(u < q).select("doc_id", q.alias("quality"))


@register(
    "scrub_documents",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, 'https?://[^ ]+')) AS BIGINT) AS n_urls,
           CAST(len(regexp_extract_all(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS BIGINT) AS n_emails,
           CAST(length(trim(regexp_replace(regexp_replace(regexp_replace(text,
                'https?://[^ ]+', '', 'g'),
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '', 'g'),
                '  +', ' ', 'g'))) AS BIGINT) AS clean_len
    FROM documents
    """,
)
def scrub_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb-style scrubbing pass: count and strip URLs and email
    addresses, collapse the leftover double spaces, report the cleaned
    length — the text-sanitization step before tokenization (patterns kept
    in the Java-regex ∩ RE2 dialect so any engine reproduces the result).

    Scale: pure regexp expressions, map-only, whole-stage codegen; at
    100 TB this runs at scan speed and the counts feed the quality gate."""
    d = load_table(spark, sf_dir, "documents")
    url = r"https?://[^ ]+"
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.regexp_replace(F.col("text"), url, ""), email, ""),
            "  +",
            " ",
        )
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(url), F.lit(0)))
        .cast("bigint")
        .alias("n_urls"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(email), F.lit(0)))
        .cast("bigint")
        .alias("n_emails"),
        F.length(cleaned).cast("bigint").alias("clean_len"),
    )


# --------------------------------------------- training-data curation extras

_RAW_TOKS_SQL = (
    "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> '')"
)


def _raw_grams_sql(n: int) -> str:
    """DuckDB: overlapping word n-grams of `tk` (NOT deduplicated)."""
    concat = " || ' ' || ".join(f"tk[i + {j}]" for j in range(n))
    return (
        f"list_transform(range(1, greatest(len(tk) - {n - 1}, 0) + 1), "
        f"i -> {concat})"
    )


def _raw_grams_expr(text_col: str, n: int):
    """Spark: overlapping word n-grams, NOT deduplicated (shingles_expr
    dedups, which is right for Jaccard but wrong for repetition ratios)."""
    toks = tokens_expr(F.lower(F.col(text_col)))
    k = F.size(toks) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), k), lambda i: F.concat_ws(" ", F.slice(toks, i, n))
    )
    # sequence(1, 0) DESCENDS in Spark → guard short docs to an empty list
    return F.when(k >= 1, grams).otherwise(F.array().cast("array<string>"))


@register(
    "vocab_topk",
    oracle=f"""
    SELECT t AS token, count(*) AS doc_freq
    FROM (SELECT doc_id, unnest(list_distinct({_RAW_TOKS_SQL})) AS t
          FROM documents)
    GROUP BY t
    ORDER BY doc_freq DESC, token
    LIMIT 100
    """,
)
def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building: top-100 tokens by document frequency with a
    deterministic (df desc, token asc) tie-break — the tokenizer-training /
    stopword-discovery primitive.

    Scale: explode of per-doc distinct tokens → map-side-combinable count →
    TakeOrderedAndProject (no global sort materializes)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(tokens_expr(F.lower(F.col("text"))))
    return (
        d.select("doc_id", F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("token").asc())
        .limit(100)
    )


@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, tok, count(*) AS tf
      FROM (SELECT doc_id, unnest({_RAW_TOKS_SQL}) AS tok FROM documents)
      GROUP BY doc_id, tok
    ),
    dfreq AS (SELECT tok, count(*) AS dfreq FROM tf GROUP BY tok),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.dfreq), 4)
               AS tfidf
      FROM tf JOIN dfreq ON tf.tok = dfreq.tok CROSS JOIN n
    )
    SELECT doc_id, tok AS token, tfidf, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT doc_id, tok, tfidf,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, tok) AS rnk
          FROM scored)
    WHERE rnk <= 5
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 terms by TF-IDF — the keyword-extraction /
    retrieval-weighting primitive (and the classic two-aggregate corpus
    statistic).

    Determinism: the rank orders on the ROUNDED score with the token as
    tie-break (the repo-wide rounded-score+key pattern) so a last-ulp
    ``ln`` difference between libms can't flip cross-engine ranks.

    Scale: ONE corpus scan and ONE tf computation — term frequency is a
    map-side-combinable groupBy, document frequency is a count window
    over token on that same frame (a df-via-join formulation scanned and
    aggregated tf TWICE: the identical exchanges were not reused,
    plan-audited), the 1-row corpus count broadcasts, and the per-doc
    rank filter is WindowGroupLimit-pruned partial+final
    (plan-asserted)."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens_expr(F.lower(F.col("text")))
    tf = (
        d.select("doc_id", F.explode(toks).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    wtok = Window.partitionBy("tok")
    scored = (
        tf.withColumn("dfreq", F.count(F.lit(1)).over(wtok))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("dfreq")),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
        .select("doc_id", F.col("tok").alias("token"), "tfidf", "rnk")
    )


@register(
    "repetition_scores",
    oracle=f"""
    SELECT doc_id,
           CAST(len(g) AS BIGINT) AS n_grams,
           CAST(len(list_distinct(g)) AS BIGINT) AS n_distinct,
           round(CASE WHEN len(g) = 0 THEN 0.0
                      ELSE 1.0 - CAST(len(list_distinct(g)) AS DOUBLE)
                           / CAST(len(g) AS DOUBLE) END, 4) AS rep_ratio
    FROM (SELECT doc_id, {_raw_grams_sql(3)} AS g
          FROM (SELECT doc_id, {_RAW_TOKS_SQL} AS tk FROM documents))
    """,
)
def repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter signal: the fraction of a document's
    word 3-grams that are repeats (1 - distinct/total). High ratio =
    boilerplate/spam; a standard pre-training quality gate alongside
    quality_score.

    Scale: pure per-row higher-order functions — map-only, zero shuffles,
    runs at scan speed like text_metrics."""
    d = load_table(spark, sf_dir, "documents")
    g = _raw_grams_expr("text", 3)
    n = F.size(g)
    nd = F.size(F.array_distinct(g))
    return d.select(
        "doc_id",
        n.cast("long").alias("n_grams"),
        nd.cast("long").alias("n_distinct"),
        F.round(
            F.when(n == 0, F.lit(0.0)).otherwise(
                F.lit(1.0) - nd.cast("double") / n.cast("double")
            ),
            4,
        ).alias("rep_ratio"),
    )


@register(
    "decontaminate_overlap",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_RAW_TOKS_SQL} AS tk FROM documents),
    grams AS (
        SELECT doc_id, unnest(list_distinct({_raw_grams_sql(3)})) AS g
        FROM toks),
    bench AS (
        SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
    SELECT g.doc_id, count(*) AS n_hits
    FROM grams g JOIN bench b ON g.g = b.g
    WHERE g.doc_id % 97 <> 0
    GROUP BY g.doc_id
    """,
)
def decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3-style n-gram overlap): flag
    training documents sharing any word n-gram with the held-out benchmark
    set (the deterministic doc_id % 97 == 0 slice standing in for an
    external eval suite). Production uses n=13; this corpus is synthetic
    bag-of-words text with near-zero 13-token sequential overlap, so the
    shipped query uses n=3 to exercise a non-empty result (171 flagged
    docs at sf0.01). Returns contaminated doc ids with hit counts.

    Scale: the benchmark gram set is small by construction → broadcast to
    every executor; training-side grams are generated per row (explode,
    map-side) and probe the broadcast — the only shuffle is the final
    per-doc count. The corpus is scanned once; no corpus self-join."""
    # repartition first: the gram explode + broadcast probe is CPU-bound
    # and the one-split scan ran it single-task (3.5s of a 4.0s wall on
    # one core at sf0.1); at 100 TB the scan carries enough splits that
    # this is a cheap no-op-sized shuffle of the text
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    grams = F.array_distinct(_raw_grams_expr("text", 3))
    g = d.select("doc_id", F.explode(grams).alias("g"))
    bench = g.filter(F.col("doc_id") % 97 == 0).select("g").distinct()
    return (
        g.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "g", "inner")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


from pandas_to_postgres_spark.plans.registry import REGISTRY as _REG  # noqa: E402

# the pairs CTE re-runs the ngram oracle on the SLICED corpus (prefix
# choice depends on global document frequencies, but the OUTPUT of an
# exact similarity join doesn't — slicing the input equals filtering the
# result, which keeps the two formulations equivalent)
_NGRAM_PAIRS_ORACLE_SLICED = _REG["ngram_jaccard_pairs"].oracle.replace(
    "FROM documents", "FROM (SELECT * FROM documents WHERE doc_id < 150)"
)


@register(
    "neardup_clusters",
    oracle=f"""
    WITH RECURSIVE
    verts AS (
        SELECT doc_id FROM documents WHERE doc_id < 150
        UNION ALL
        SELECT doc_id + 1000000 FROM documents WHERE doc_id < 150),
    pairs AS ({_NGRAM_PAIRS_ORACLE_SLICED}),
    sym AS (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs),
    reach AS (
        SELECT doc_id AS a, doc_id AS b FROM verts
        UNION
        SELECT r.a, e.d FROM reach r JOIN sym e ON e.s = r.b)
    SELECT a AS doc_id,
           min(b) AS cluster_id,
           a = min(b) AS is_survivor
    FROM reach GROUP BY a
    """,
)
def neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING: the step after pair generation — transitive
    closure of the verified Jaccard-0.8 pairs (same corpus and pair
    definition as ngram_jaccard_pairs), one canonical survivor (min id)
    per cluster. A genuinely ITERATIVE distributed algorithm: DataFrame
    min-label propagation with per-round localCheckpoint
    (operators/cluster.py); the oracle replays the identical closure with
    DuckDB's WITH RECURSIVE, so even the iterative op is hash-checked."""
    from pandas_to_postgres_spark.operators.cluster import connected_components
    from pandas_to_postgres_spark.operators.dedup import ngram_jaccard_prefix

    # 150-doc slice: the full corpus's closure is needlessly dense for a
    # correctness check (the oracle's recursive CTE goes quadratic in
    # cluster size); the slice keeps every shape — multi-doc clusters,
    # planted perturbed twins, singletons
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id", "text")
    )
    perturbed = d.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.regexp_replace(F.col("text"), r"\s+\S+$", "").alias("text"),
    )
    corpus = d.unionByName(perturbed)
    pairs = ngram_jaccard_prefix(
        corpus, text_col="text", id_col="doc_id", threshold=0.8, n=1
    )
    comps = connected_components(
        pairs,
        corpus.select("doc_id"),
        src="id_a",
        dst="id_b",
        id_col="doc_id",
        component_col="cluster_id",
    )
    return comps.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_survivor"),
    )


@register(
    "cluster_representatives",
    oracle=f"""
    WITH RECURSIVE
    verts AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 150
        UNION ALL
        SELECT doc_id + 1000000,
               regexp_replace(text, '\\s+\\S+$', '')
        FROM documents WHERE doc_id < 150),
    pairs AS ({{pairs}}),
    sym AS (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs),
    reach AS (
        SELECT doc_id AS a, doc_id AS b FROM verts
        UNION
        SELECT r.a, e.d FROM reach r JOIN sym e ON e.s = r.b),
    labels AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
    quality AS (SELECT doc_id, {_QUALITY_SQL} AS quality FROM verts)
    SELECT cluster_id, doc_id AS rep_id, quality AS rep_quality, n_members
    FROM (SELECT l.cluster_id, l.doc_id, q.quality,
                 count(*) OVER (PARTITION BY l.cluster_id) AS n_members,
                 row_number() OVER (PARTITION BY l.cluster_id
                                    ORDER BY q.quality DESC, l.doc_id) AS rn
          FROM labels l JOIN quality q USING (doc_id))
    WHERE rn = 1
    """.replace("{pairs}", _NGRAM_PAIRS_ORACLE_SLICED),
)
def cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation op: quality-based survivor selection per near-dup cluster
    — instead of ``neardup_clusters``' min-id canonical, keep the
    HIGHEST-quality member of each cluster (rounded-score desc, id asc
    tie-break), the RefinedWeb-style "keep the best copy" step. Returns
    (cluster_id, rep_id, rep_quality, n_members); same sliced corpus,
    pair definition, and transitive closure as ``neardup_clusters``, so
    the two queries are directly comparable.

    Scale: reuses the iterative min-label closure; the quality join is a
    map-only score projection joined on id; the per-cluster argmax is one
    window over cluster_id (the cluster-count column rides the same
    shuffle)."""
    from pandas_to_postgres_spark.operators.cluster import connected_components
    from pandas_to_postgres_spark.operators.dedup import ngram_jaccard_prefix
    from pandas_to_postgres_spark.functions.text import quality_score_expr

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id", "text")
    )
    perturbed = d.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.regexp_replace(F.col("text"), r"\s+\S+$", "").alias("text"),
    )
    corpus = d.unionByName(perturbed)
    pairs = ngram_jaccard_prefix(
        corpus, text_col="text", id_col="doc_id", threshold=0.8, n=1
    )
    labels = connected_components(
        pairs,
        corpus.select("doc_id"),
        src="id_a",
        dst="id_b",
        id_col="doc_id",
        component_col="cluster_id",
    )
    scored = corpus.select(
        "doc_id", quality_score_expr(F.col("text")).alias("quality")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    wc = Window.partitionBy("cluster_id")
    return (
        labels.join(scored, "doc_id")
        .withColumn("n_members", F.count(F.lit(1)).over(wc))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("rep_id"),
            F.col("quality").alias("rep_quality"),
            "n_members",
        )
    )


# ---------------------------------------------- budgeted curation / mixing

@register(
    "budget_select",
    oracle=f"""
    WITH scored AS (SELECT doc_id, n_chars, {_QUALITY_SQL} AS q FROM documents),
    cum AS (SELECT doc_id, q AS quality,
            CAST(sum(n_chars) OVER (ORDER BY q DESC, doc_id
                                    ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS cum_chars
            FROM scored)
    SELECT doc_id, quality, cum_chars FROM cum WHERE cum_chars <= 60000
    """,
)
def budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation op: keep the best-quality documents until a 60k-char
    training budget is spent — a GLOBAL quality-ordered prefix sum,
    computed WITHOUT a global sort (score-bucket sharding + a 20-row
    offset aggregate; see ``operators/sampling.budget_prefix_select``).
    The oracle runs the single global window the sharded plan must equal
    exactly — integer char counts make the running total bit-reproducible.
    """
    from pandas_to_postgres_spark.operators.sampling import budget_prefix_select

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", quality_score_expr(F.col("text")).alias("q")
    )
    out = budget_prefix_select(
        d, cost_col="n_chars", budget=60000, order_col="q", tie_col="doc_id"
    )
    return out.select(
        "doc_id", F.col("q").alias("quality"), F.col("cum_cost").alias("cum_chars")
    )


@register(
    "mix_sources",
    oracle="""
    WITH c AS (SELECT source, CAST(count(*) AS DOUBLE) AS n
               FROM documents GROUP BY source),
    w(source, t) AS (VALUES ('src0', 2.0), ('src1', 2.0), ('src2', 2.0),
                            ('src3', 2.0), ('src4', 2.0)),
    j AS (SELECT c.source, c.n, COALESCE(w.t, 1.0) AS t
          FROM c LEFT JOIN w USING (source)),
    m AS (SELECT min(n / t) AS tmin FROM j),
    f AS (SELECT source, least(1.0, t * tmin / n) AS frac
          FROM j CROSS JOIN m)
    SELECT d.doc_id, d.source, round(f.frac, 6) AS keep_frac
    FROM documents d JOIN f USING (source)
    WHERE CAST(('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 15))
               AS BIGINT) / 1152921504606846976.0 < f.frac
    """,
)
def mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation op: resample the corpus toward a target source mixture
    (src0-src4 weighted 2x) keeping the bottleneck source whole — the
    domain-mixing step every training-data pipeline runs before packing.
    Membership is md5-content-keyed (stable under repartitioning/retries);
    the fractions derive from per-source counts with oracle-identical IEEE
    arithmetic, so DuckDB reproduces the exact sample
    (``operators/sampling.mix_fractions`` / ``resample_to_mix``)."""
    from pandas_to_postgres_spark.operators.sampling import resample_to_mix

    d = load_table(spark, sf_dir, "documents")
    weights = {f"src{i}": 2.0 for i in range(5)}
    out = resample_to_mix(d, key_col="doc_id", stratum_col="source", weights=weights)
    return out.select("doc_id", "source", F.round("frac", 6).alias("keep_frac"))


@register(
    "repeated_spans",
    oracle="""
    WITH toks AS (SELECT doc_id,
                         regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                  FROM documents),
    grams AS (SELECT doc_id,
                     unnest(list_distinct(list_transform(
                        range(1, greatest(len(t) - 7, 0) + 1),
                        i -> array_to_string(t[i:i+7], ' ')))) AS gram
              FROM toks)
    SELECT substr(md5(gram), 1, 15) AS gram_key,
           count(*) AS n_docs,
           min(doc_id) AS first_doc
    FROM grams GROUP BY 1 HAVING count(*) >= 2
    """,
)
def repeated_spans_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation op: cross-document repeated 8-token spans — the detection
    half of exact-substring dedup / boilerplate removal (headers, license
    blocks, templated text). One vote per document per span
    (array_distinct before the explode), md5-keyed so the shuffle carries
    60-bit keys and DuckDB reproduces the grouping exactly
    (``operators/dedup.repeated_spans``)."""
    from pandas_to_postgres_spark.operators.dedup import repeated_spans

    d = load_table(spark, sf_dir, "documents")
    return repeated_spans(d, text_col="text", id_col="doc_id", n=8, min_docs=2)


@register(
    "span_dedup_docs",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000,
             text || ' zz' || CAST(doc_id AS VARCHAR)
      FROM documents
    ),
    toks AS (SELECT doc_id,
                    regexp_split_to_array(trim(text), '\\s+') AS t
             FROM corpus
             WHERE array_to_string(regexp_split_to_array(trim(text), '\\s+'),
                                   '') <> ''),
    segs AS (SELECT doc_id,
                    CAST(unnest(range(CAST(ceil(len(t) / 10.0) AS BIGINT)))
                         AS INT) AS seg_idx,
                    t
             FROM toks),
    seg_text AS (SELECT doc_id, seg_idx,
                        array_to_string(t[seg_idx*10+1 : seg_idx*10+10],
                                        ' ') AS seg
                 FROM segs),
    kept AS (SELECT doc_id, seg_idx, seg,
                    row_number() OVER (PARTITION BY seg
                                       ORDER BY doc_id, seg_idx) AS rn
             FROM seg_text)
    SELECT doc_id,
           count(*) AS n_kept,
           string_agg(seg, ' ' ORDER BY seg_idx) AS text_clean
    FROM kept WHERE rn = 1 GROUP BY doc_id
    """,
)
def span_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation op: C4-style global span dedup WITH corpus rewriting —
    any 10-token span seen earlier in the corpus is removed from later
    docs and the survivors are stitched back in order
    (``operators/dedup.span_dedup``). Demonstrated on documents ∪ a
    suffixed copy (doc_id+10**6, two extra tokens) so later copies get
    their leading spans stripped while their tail span — perturbed by the
    suffix tokens completing the final tile — survives. The reassembled
    ``text_clean`` string is part of the oracle hash, so exact
    reconstruction order is driver-checked, not just counts."""
    from pandas_to_postgres_spark.operators.dedup import span_dedup

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = d.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" zz"), F.col("doc_id").cast("string")
        ).alias("text"),
    )
    return span_dedup(
        d.unionByName(copies), text_col="text", id_col="doc_id", span_tokens=10
    )


@register(
    "corpus_shuffle",
    oracle="""
    SELECT doc_id,
           row_number() OVER (ORDER BY md5('shuf:' || CAST(doc_id AS VARCHAR)),
                              doc_id) AS position
    FROM documents
    """,
)
def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation op: the deterministic global training-order shuffle — every
    doc gets position 1..N in salted-md5 order, identical on any engine and
    any partitioning, computed WITHOUT a global sort (256 hash-prefix
    buckets + broadcast count offsets;
    ``operators/sampling.deterministic_shuffle_positions``)."""
    from pandas_to_postgres_spark.operators.sampling import (
        deterministic_shuffle_positions,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return deterministic_shuffle_positions(d, "doc_id").select("doc_id", "position")


@register("minhash_incremental")  # rows-only: xxhash64 internals, like minhash_neardup
def minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 incremental: near-dups of a NEW batch (perturbed copies of docs
    0-99) against the existing documents corpus — banded equi-join probe,
    no corpus self-join (``operators/dedup.minhash_near_duplicates_incremental``).
    Recall vs the planted batch→corpus twins is unit-tested; LSH internals
    are not SQL-expressible → rows-only driver check."""
    from pandas_to_postgres_spark.operators.dedup import (
        minhash_near_duplicates_incremental,
    )

    corpus = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = corpus.filter(F.col("doc_id") < 100).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.regexp_replace(F.col("text"), r"\s+\S+$", "").alias("text"),
    )
    return minhash_near_duplicates_incremental(
        batch, corpus, text_col="text", id_col="doc_id"
    )


@register(
    "source_cap_docs",
    oracle=f"""
    WITH scored AS (SELECT doc_id, source, {_QUALITY_SQL} AS quality
                    FROM documents),
    ranked AS (SELECT doc_id, source, quality,
                      row_number() OVER (PARTITION BY source
                                         ORDER BY quality DESC, doc_id) AS rn
               FROM scored)
    SELECT doc_id, source, quality, CAST(rn AS BIGINT) AS cap_rank
    FROM ranked WHERE rn <= 10
    """,
)
def source_cap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation op: cap each source at its 10 highest-quality documents —
    the per-domain page cap (RefinedWeb-style) that stops one hot host
    from dominating the mixture. Ranks on the rounded shared quality score
    with doc_id tie-break so the cut is deterministic cross-engine.

    Scale: runs through ``operators/sampling.top_n_per_group`` — a salted
    two-stage top-N whose heavy shuffle is bounded to ~1/16 of any hot
    domain per task (web domains are the canonical skewed key); the exact
    final window sees at most 160 rows per source. The single-window
    oracle is the semantic spec; the two-stage plan is property-tested
    equal to it."""
    from pandas_to_postgres_spark.operators.sampling import top_n_per_group

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "source", quality_score_expr(F.col("text")).alias("quality")
    )
    out = top_n_per_group(
        scored,
        group_cols=("source",),
        order_cols=(F.col("quality").desc(), F.col("doc_id").asc()),
        n=10,
        salt_col="doc_id",
    )
    return out.select(
        "doc_id", "source", "quality", F.col("cap_rank").cast("bigint").alias("cap_rank")
    )


@register(
    "cross_source_dup_matrix",
    oracle="""
    WITH tok AS (
      SELECT source,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS t
      FROM documents),
    spans AS (
      SELECT DISTINCT source,
             md5(array_to_string(t[i:i+7], ' ')) AS span
      FROM (SELECT source, t,
                   unnest(generate_series(1, len(t) - 7)) AS i
            FROM tok WHERE len(t) >= 8)),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b
      FROM spans a JOIN spans b USING (span)
      WHERE a.source < b.source)
    SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS shared_spans
    FROM pairs
    GROUP BY source_a, source_b
    ORDER BY source_a, source_b
    """,
)
def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source boilerplate matrix: for every source pair, how many
    DISTINCT 8-token spans appear in BOTH — the provenance audit that
    finds mirror/scraper/shared-template relationships between corpus
    sources before per-source dedup quotas are set (the cross-document
    half of `repeated_spans`, pivoted to source granularity).

    Scale: spans reduce to md5 keys on the scan (one HOF pass, map-only
    — text never shuffles); the (source, span) frame de-duplicates with
    one shuffle on span; the pair join is an equi-join ON SPAN, bounded
    per key by the number of sources carrying that span (<= #sources by
    construction after the distinct), never |corpus|². The output
    matrix is <= #sources² rows."""
    d = load_table(spark, sf_dir, "documents")
    spans = (
        d.select(
            "source",
            F.expr(
                "filter(split(trim(lower(text)), '\\\\s+'), x -> x != '')"
            ).alias("__toks"),
        )
        # sequence(1, 0) DESCENDS in Spark: guard short docs BEFORE the
        # 8-gram index range is built
        .filter(F.size("__toks") >= 8)
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__toks) - 7), i -> "
                    "md5(array_join(slice(__toks, i, 8), ' ')))"
                )
            ).alias("span"),
        )
        .distinct()
    )
    a = spans.select(F.col("source").alias("source_a"), "span")
    b = spans.select(F.col("source").alias("source_b"), "span")
    return (
        a.join(b, "span")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_spans"))
        .orderBy("source_a", "source_b")
    )


def _bpe_iteration_sql(i: int) -> str:
    """One unrolled BPE merge iteration as DuckDB CTE blocks (see
    bpe_learn_merges). Input CTE ``syms{i-1}``; defines ``best{i}`` (the
    argmax pair) and ``syms{i}`` (the symbol table after merging it)."""
    p = i - 1
    return f"""
    pairs{i} AS (
      SELECT sym AS l, nxt AS r, CAST(sum(freq) AS BIGINT) AS cnt
      FROM (SELECT sym, freq,
                   lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
            FROM syms{p})
      WHERE nxt IS NOT NULL GROUP BY sym, nxt),
    best{i} AS (SELECT l, r, cnt FROM pairs{i}
                ORDER BY cnt DESC, l, r LIMIT 1),
    m{i} AS (
      SELECT word, freq, pos, sym, l, r, coalesce(m, FALSE) AS m FROM (
        SELECT s.word, s.freq, s.pos, s.sym, b.l, b.r,
               (s.sym = b.l AND
                lead(s.sym) OVER (PARTITION BY s.word ORDER BY s.pos) = b.r
               ) AS m
        FROM syms{p} s CROSS JOIN best{i} b)),
    g{i} AS (
      SELECT *, CASE WHEN m THEN pos -
               row_number() OVER (PARTITION BY word, m ORDER BY pos) END AS grp
      FROM m{i}),
    mh{i} AS (
      SELECT *, m AND ((row_number() OVER
               (PARTITION BY word, m, grp ORDER BY pos) - 1) % 2 = 0) AS mh
      FROM g{i}),
    k{i} AS (
      SELECT word, freq, pos,
             CASE WHEN mh THEN l || r ELSE sym END AS sym,
             coalesce(lag(mh) OVER (PARTITION BY word ORDER BY pos),
                      FALSE) AS consumed
      FROM mh{i}),
    syms{i} AS (
      SELECT word, freq,
             row_number() OVER (PARTITION BY word ORDER BY pos) AS pos, sym
      FROM k{i} WHERE NOT consumed)"""


def _bpe_oracle_sql(n_iter: int) -> str:
    blocks = ",\n".join(_bpe_iteration_sql(i) for i in range(1, n_iter + 1))
    union = "\n      UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS iteration, l AS left_sym,"
        f" r AS right_sym, cnt AS pair_freq FROM best{i}"
        for i in range(1, n_iter + 1)
    )
    return f"""
    WITH words AS (
      SELECT t AS word, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest({_RAW_TOKS_SQL}) AS t FROM documents)
      WHERE regexp_matches(t, '^[a-z]+$')
      GROUP BY t),
    syms0 AS (
      SELECT word, freq, pos,
             CASE WHEN pos <= length(word) THEN substr(word, pos, 1)
                  ELSE '</w>' END AS sym
      FROM (SELECT word, freq,
                   unnest(range(1, length(word) + 2)) AS pos
            FROM words)),
    {blocks}
    SELECT iteration, left_sym, right_sym, pair_freq FROM ({union})
    """


@register("bpe_learn_merges", min_rows=4, oracle=_bpe_oracle_sql(4))
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer TRAINING core: learn the first 4 byte-pair-encoding
    merges (Sennrich et al. 2016) over the corpus, greedily — the
    iterative argmax-and-merge loop every BPE/WordPiece vocabulary
    build runs. The 100 TB shape: ONE corpus pass folds documents into
    the (word, freq) vocabulary (map-side-combined groupBy; vocabulary
    is sublinear in corpus size), and every merge iteration thereafter
    runs on the vocab-bounded symbol table — corpus text is never
    touched or shuffled again, which is why real tokenizer trainers
    run on word-count tables, not raw text.

    Each iteration is fully relational: adjacent pairs via lead() over
    per-word dense positions, freq-weighted pair counts (pair counting
    is non-greedy: 'aaa' contributes 2 to (a,a) — the Sennrich
    convention), argmax by (count DESC, left, right) as a 1-row
    TakeOrdered frame CROSS-JOINED into the merge step (the kmeans
    no-literals pattern — per-iteration parameters ride as DATA, so no
    per-iteration Janino recompile and zero driver collects). The
    merge itself applies greedy LEFT-TO-RIGHT non-overlap semantics
    relationally: consecutive matched positions form gaps-and-islands
    runs (only possible when left==right) and only even offsets within
    a run merge; consumed right-halves drop via lag(); positions
    re-densify per iteration. The symbol table is localCheckpoint'd
    each round — it is vocab-sized, and un-materialized lineage would
    re-run every prior iteration per window reference. Words carry an
    explicit '</w>' end marker so merges can learn suffixes.

    Oracle: the SAME four iterations unrolled as DuckDB CTEs (windowed
    lead/lag/row_number replay, identical tie-breaks). Output: one row
    per learned merge (iteration, left_sym, right_sym, pair_freq)."""
    merges, _ = _bpe_train(spark, sf_dir, n_iter=4)
    return merges


def _bpe_train(spark: SparkSession, sf_dir: str, n_iter: int):
    """Shared BPE training core (see bpe_learn_merges for the design).
    Returns ``(merges_df, final_syms_df)`` — the learned merge table and
    the symbol table AFTER all merges (i.e. the corpus vocabulary
    encoded with the learned merges, which is what bpe_encode_stats
    aggregates)."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens_expr(F.lower(F.col("text")))).alias("t"))
        .filter(F.col("t").rlike("^[a-z]+$"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .select(F.col("t").alias("word"), "freq")
    )
    return _bpe_merge_loop(words, n_iter)


def _bpe_merge_loop(words: DataFrame, n_iter: int):
    """Run ``n_iter`` greedy BPE merge iterations over a ``(word,
    freq)`` vocabulary frame. Returns ``(merges_df, final_syms_df)``.
    Exposed separately so unit tests can pin the merge semantics on a
    hand-computed vocabulary (the DuckDB oracle replays the SAME
    relational logic, so only an independent hand computation can catch
    a shared semantics bug)."""
    syms = words.select(
        "word",
        "freq",
        F.explode(F.sequence(F.lit(1), F.length("word") + 1)).alias("pos"),
    ).withColumn(
        "sym",
        F.expr(
            "CASE WHEN pos <= length(word)"
            " THEN substr(word, pos, 1) ELSE '</w>' END"
        ),
    ).select("word", "freq", "pos", "sym").localCheckpoint()

    w = Window.partitionBy("word").orderBy("pos")
    outs = []
    for i in range(1, n_iter + 1):
        pairs = (
            syms.withColumn("nxt", F.lead("sym").over(w))
            .filter(F.col("nxt").isNotNull())
            .groupBy("sym", "nxt")
            .agg(F.sum("freq").cast("long").alias("cnt"))
        )
        best = (
            pairs.orderBy(F.col("cnt").desc(), "sym", "nxt")
            .limit(1)
            .select(
                F.col("sym").alias("l"), F.col("nxt").alias("r"), "cnt"
            )
            .localCheckpoint()
        )
        outs.append(
            best.select(
                F.lit(i).cast("long").alias("iteration"),
                F.col("l").alias("left_sym"),
                F.col("r").alias("right_sym"),
                F.col("cnt").alias("pair_freq"),
            )
        )
        wm = Window.partitionBy("word", "m").orderBy("pos")
        s2 = (
            syms.crossJoin(F.broadcast(best))
            .withColumn("nxt", F.lead("sym").over(w))
            .withColumn(
                "m",
                F.coalesce(
                    (F.col("sym") == F.col("l"))
                    & (F.col("nxt") == F.col("r")),
                    F.lit(False),
                ),
            )
        )
        s3 = s2.withColumn(
            "grp",
            F.when(F.col("m"), F.col("pos") - F.row_number().over(wm)),
        )
        wg = Window.partitionBy("word", "m", "grp").orderBy("pos")
        s4 = s3.withColumn(
            "mh",
            F.col("m") & (((F.row_number().over(wg) - 1) % 2) == 0),
        )
        s5 = s4.withColumn(
            "sym2",
            F.when(F.col("mh"), F.concat("l", "r")).otherwise(F.col("sym")),
        ).withColumn(
            "consumed", F.coalesce(F.lag("mh").over(w), F.lit(False))
        )
        syms = (
            s5.filter(~F.col("consumed"))
            .select(
                "word",
                "freq",
                F.row_number().over(w).alias("pos"),
                F.col("sym2").alias("sym"),
            )
            .localCheckpoint()
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out, syms


_BPE_ENCODE_ORACLE = f"""
    WITH words AS (
      SELECT t AS word, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest({_RAW_TOKS_SQL}) AS t FROM documents)
      WHERE regexp_matches(t, '^[a-z]+$')
      GROUP BY t),
    syms0 AS (
      SELECT word, freq, pos,
             CASE WHEN pos <= length(word) THEN substr(word, pos, 1)
                  ELSE '</w>' END AS sym
      FROM (SELECT word, freq,
                   unnest(range(1, length(word) + 2)) AS pos
            FROM words)),
    {{blocks}}
    SELECT sym, CAST(sum(freq) AS BIGINT) AS corpus_freq,
           CAST(count(DISTINCT word) AS BIGINT) AS n_words
    FROM syms{{n}} GROUP BY sym
    ORDER BY corpus_freq DESC, sym LIMIT 20
    """.format(
    blocks=",\n".join(_bpe_iteration_sql(i) for i in range(1, 5)),
    n=4,
)


@register("bpe_encode_stats", min_rows=20, oracle=_BPE_ENCODE_ORACLE)
def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION: encode the corpus with the 4 learned BPE
    merges and report the top-20 vocabulary symbols by corpus token
    frequency — the compression/coverage readout a tokenizer build ends
    with (which merged units actually dominate the encoded stream).

    Zero extra passes beyond training: after bpe_learn_merges' final
    iteration the symbol table IS the encoded corpus vocabulary (every
    word rewritten into post-merge symbols, still carrying its corpus
    freq), so encoding is a freq-weighted aggregate over that
    vocab-bounded frame — corpus text is touched exactly once, in the
    word-count fold. Output: (sym, corpus_freq, n_words) — total
    encoded-token occurrences and how many distinct words emit the
    symbol. Oracle: the same 4 unrolled CTE iterations, aggregating
    syms4 (identical binary-collation tie-breaks at the top-20 cut)."""
    _, syms = _bpe_train(spark, sf_dir, n_iter=4)
    return (
        syms.groupBy("sym")
        .agg(
            F.sum("freq").cast("long").alias("corpus_freq"),
            F.countDistinct("word").cast("long").alias("n_words"),
        )
        .orderBy(F.col("corpus_freq").desc(), "sym")
        .limit(20)
    )


_CENTROID_ORACLE = f"""
    WITH lab AS MATERIALIZED (
      SELECT doc_id,
             CASE WHEN len({_RAW_TOKS_SQL}) >= 56 THEN 1 ELSE -1 END AS y
      FROM documents),
    bf AS MATERIALIZED (
      SELECT doc_id,
             CAST(strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1
                  AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT doc_id, unnest({_RAW_TOKS_SQL}) AS tok FROM documents)
      GROUP BY 1, 2),
    x AS MATERIALIZED (
      SELECT b.doc_id, b.bucket, b.cnt, l.y
      FROM bf b JOIN lab l USING (doc_id)),
    sums AS (
      SELECT bucket,
             CAST(coalesce(sum(cnt) FILTER (WHERE y = 1), 0) AS HUGEINT)
                 AS sp,
             CAST(coalesce(sum(cnt) FILTER (WHERE y = -1), 0) AS HUGEINT)
                 AS sn
      FROM x GROUP BY bucket),
    cnts AS (
      SELECT CAST(count(*) FILTER (WHERE y = 1) AS HUGEINT) AS np,
             CAST(count(*) FILTER (WHERE y = -1) AS HUGEINT) AS nn
      FROM lab),
    thr AS (
      SELECT CAST(sum(sp * sp) * nn * nn - sum(sn * sn) * np * np
                  AS HUGEINT) AS t,
             np, nn
      FROM sums, cnts GROUP BY np, nn),
    scored AS (
      SELECT x.doc_id, x.y,
             CAST(2 * sum(CAST(x.cnt AS HUGEINT)
                          * (s.sp * c.nn - s.sn * c.np)) * c.np * c.nn
                  AS HUGEINT) AS lhs
      FROM x JOIN sums s USING (bucket) CROSS JOIN cnts c
      GROUP BY x.doc_id, x.y, c.np, c.nn),
    pred AS (
      SELECT doc_id, y,
             CASE WHEN lhs >= (SELECT t FROM thr) THEN 1 ELSE -1 END AS yhat
      FROM scored)
    SELECT CAST(count(*) FILTER (WHERE y = 1 AND yhat = 1) AS BIGINT) AS tp,
           CAST(count(*) FILTER (WHERE y = -1 AND yhat = 1) AS BIGINT) AS fp,
           CAST(count(*) FILTER (WHERE y = 1 AND yhat = -1) AS BIGINT) AS fn,
           CAST(count(*) FILTER (WHERE y = -1 AND yhat = -1) AS BIGINT)
               AS tn,
           CAST(CAST((count(*) FILTER (WHERE y = yhat)) * 10000 AS HUGEINT)
                // CAST(count(*) AS HUGEINT) AS BIGINT) AS acc_bp
    FROM pred
    """


@register("centroid_quality_filter", min_rows=1, oracle=_CENTROID_ORACLE)
def centroid_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-in-the-loop curation: TRAIN a quality classifier
    distributively and score the corpus with it — nearest-centroid
    (Rocchio) over 16 hashed bag-of-words features, labels from a
    token-count heuristic (the CCNet/fastText-filter pattern: cheap
    labels train a model that then gates the corpus). Nearest-centroid
    is the linear classifier whose training is CLOSED-FORM and
    INTEGER-EXACT: the model is two class-sum vectors + two counts, and
    the Euclidean decision 2x·(c+ - c-) >= |c+|^2 - |c-|^2 clears its
    denominators (c = S/n) into a pure-integer cross-multiplied rule —
    no learning rate, no exp/log, bit-identical across engines (a
    logistic twin would diverge on libm exp ulps). Measured 98.4%
    accuracy at sf0.01.

    Scale shape: features come from ONE corpus pass (the
    feature_hash_docs map-side-combined fold, width fixed at 16);
    training is ONE 16-row aggregate of that frame; scoring joins the
    BROADCAST 16-row model back and re-aggregates per doc (one
    doc-keyed shuffle); the confusion matrix is a 1-row fold. Products
    ride in DECIMAL(38,0)/HUGEINT so doc counts up to ~1e9 cannot
    overflow the cross-multiplied comparison (the ks_drift_events
    rule). Output: (tp, fp, fn, tn, acc_bp) — acc in basis points via
    integer floor division (both operands positive, so Spark DIV ==
    DuckDB //).

    Oracle: the same training + scoring replayed in DuckDB with
    identical integer arithmetic and the md5 bucket function."""
    docs = load_table(spark, sf_dir, "documents")
    dec = "decimal(38,0)"
    lab = docs.select(
        "doc_id",
        F.when(F.size(tokens_expr(F.lower(F.col("text")))) >= 56, F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("y"),
    )
    toks = docs.select(
        "doc_id", F.explode(tokens_expr(F.lower(F.col("text")))).alias("tok")
    )
    bucket = (
        F.instr(
            F.lit("0123456789abcdef"), F.substring(F.md5(F.col("tok")), 1, 1)
        )
        - 1
    ).cast("long")
    bf = toks.groupBy("doc_id", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    x = bf.join(lab, "doc_id").select(
        "doc_id", "bucket", "cnt", "y"
    ).localCheckpoint()
    sums = x.groupBy("bucket").agg(
        F.coalesce(F.sum(F.when(F.col("y") == 1, F.col("cnt"))), F.lit(0))
        .cast(dec)
        .alias("sp"),
        F.coalesce(F.sum(F.when(F.col("y") == -1, F.col("cnt"))), F.lit(0))
        .cast(dec)
        .alias("sn"),
    )
    cnts = lab.agg(
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).cast(dec).alias("np"),
        F.sum(F.when(F.col("y") == -1, 1).otherwise(0)).cast(dec).alias("nn"),
    )
    stats = sums.crossJoin(F.broadcast(cnts)).localCheckpoint()
    thr = stats.groupBy("np", "nn").agg(
        (
            F.sum(F.col("sp") * F.col("sp")) * F.col("nn") * F.col("nn")
            - F.sum(F.col("sn") * F.col("sn")) * F.col("np") * F.col("np")
        )
        .cast(dec)
        .alias("t")
    )
    scored = (
        x.join(F.broadcast(stats), "bucket")
        .groupBy("doc_id", "y", "np", "nn")
        .agg(
            F.sum(
                F.col("cnt").cast(dec)
                * (F.col("sp") * F.col("nn") - F.col("sn") * F.col("np"))
            ).alias("part")
        )
        .select(
            "doc_id",
            "y",
            (F.lit(2).cast(dec) * F.col("part") * F.col("np") * F.col("nn"))
            .cast(dec)
            .alias("lhs"),
        )
    )
    pred = scored.crossJoin(F.broadcast(thr)).select(
        "y",
        F.when(F.col("lhs") >= F.col("t"), F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("yhat"),
    )
    return pred.agg(
        F.sum(F.when((F.col("y") == 1) & (F.col("yhat") == 1), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(
            F.when((F.col("y") == -1) & (F.col("yhat") == 1), 1).otherwise(0)
        )
        .cast("long")
        .alias("fp"),
        F.sum(
            F.when((F.col("y") == 1) & (F.col("yhat") == -1), 1).otherwise(0)
        )
        .cast("long")
        .alias("fn"),
        F.sum(
            F.when((F.col("y") == -1) & (F.col("yhat") == -1), 1).otherwise(0)
        )
        .cast("long")
        .alias("tn"),
        F.expr(
            "CAST((sum(CASE WHEN y = yhat THEN 1 ELSE 0 END) * 10000)"
            " DIV count(1) AS BIGINT)"
        ).alias("acc_bp"),
    )


_TEMPERATURE_MIX_ORACLE = f"""
    WITH per_src AS (
      SELECT source,
             CAST(sum(len({_RAW_TOKS_SQL})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source),
    s AS (
      SELECT source, n_tokens,
             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000)
                  AS BIGINT) AS sv
      FROM per_src),
    z AS (SELECT CAST(sum(sv) AS BIGINT) AS z FROM s),
    q AS (
      SELECT source, n_tokens,
             (sv * 1000000) // z AS weight_ppm,
             (100000 * sv) // z AS quota,
             (100000 * sv) % z AS rem
      FROM s, z),
    r AS (
      SELECT *,
             row_number() OVER (ORDER BY rem DESC, source) AS rk,
             100000 - sum(quota) OVER () AS deficit
      FROM q)
    SELECT source, n_tokens, weight_ppm,
           quota + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS alloc
    FROM r
    """


@register(
    "temperature_mix_weights", min_rows=20, oracle=_TEMPERATURE_MIX_ORACLE
)
def temperature_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining mixture math: temperature-smoothed multinomial source
    sampling weights (the mT5/XLM-R alpha-smoothing step, Xue et al.
    2021: p_i proportional to n_i^alpha upweights low-resource sources)
    plus an exact Hamilton largest-remainder allocation of a
    100k-sample budget across sources. alpha = 0.5 on purpose: sqrt is
    the one power IEEE-754 requires to be CORRECTLY ROUNDED, so
    floor(sqrt(n)*1e6) is bit-identical across engines (pow(n, 0.3)
    would diverge on libm ulps); everything after that one sqrt is
    integer arithmetic — ppm weights and quotas via positive-operand
    floor division (Spark DIV == DuckDB //), remainders exact. Safe to
    ~8.5e15 tokens per source before the 64-bit products overflow —
    three orders of magnitude past a 100 TB corpus.

    Scale shape: ONE map-only pass computes per-doc token counts
    (size(), no explode) and folds them to the source-bounded frame;
    the normalizer is a broadcast 1-row sum; the Hamilton rank avoids a
    global window by packing the source-bounded frame into ONE sorted
    array (sort_array on (-rem, source) structs) and posexploding —
    rank = position, no Exchange SinglePartition. Output: (source,
    n_tokens, weight_ppm, alloc); sum(alloc) == 100000 by construction.

    Oracle: identical sqrt + integer pipeline in DuckDB (its window
    form is safe there — the oracle is single-node by definition)."""
    d = load_table(spark, sf_dir, "documents")
    per_src = (
        d.select(
            "source",
            F.size(tokens_expr(F.lower(F.col("text"))))
            .cast("long")
            .alias("tok"),
        )
        .groupBy("source")
        .agg(F.sum("tok").alias("n_tokens"))
    )
    s = per_src.withColumn(
        "sv",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000000).cast(
            "long"
        ),
    )
    z1 = s.agg(F.sum("sv").alias("z"))
    j = s.crossJoin(F.broadcast(z1)).select(
        "source",
        "n_tokens",
        F.expr("(sv * 1000000) DIV z").alias("weight_ppm"),
        F.expr("(100000 * sv) DIV z").alias("quota"),
        F.expr("(100000 * sv) % z").alias("rem"),
    )
    packed = j.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col("rem")).alias("nr"),
                    F.col("source").alias("src"),
                    F.col("n_tokens").alias("nt"),
                    F.col("weight_ppm").alias("wp"),
                    F.col("quota").alias("q"),
                )
            )
        ).alias("arr"),
        F.sum("quota").alias("qsum"),
    )
    ex = packed.select(
        F.posexplode("arr").alias("pos", "r"), F.col("qsum")
    )
    return ex.select(
        F.col("r.src").alias("source"),
        F.col("r.nt").alias("n_tokens"),
        F.col("r.wp").alias("weight_ppm"),
        (
            F.col("r.q")
            + F.when(
                F.col("pos") < F.lit(100000) - F.col("qsum"), F.lit(1)
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("alloc"),
    )


@register("ivf_partitioned_search", min_rows=25, oracle=_IVF_ORACLE)
def ivf_partitioned_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 at warehouse scale: the PERSISTED-INDEX form of IVF ANN — the
    corpus is written ONCE as parquet physically partitioned by its
    coarse-quantizer cluster (`partitionBy(label)`, one directory per
    inverted list), and the query path reads back ONLY the probed
    clusters via static partition pruning: probe selection collects the
    bounded (|Q| x nprobe, 15 here) cluster-id set to the driver and
    the `label IN (...)` literal prunes at the SCAN, so unprobed lists
    are never read off disk — tests/test_plans.py asserts the
    PartitionFilters and the pruned partition count. This is the
    layout-level difference between 'filter the clusters in memory'
    (simsearch_ivf) and a servable 100 TB vector index: the nightly
    write amortizes one pass, and every query after touches
    nprobe/N of the data at the FILESYSTEM level (the same layout
    contract as bucketed_colocated_join and zorder_layout_lineitem,
    applied to retrieval).

    Ranking is byte-identical to simsearch_ivf — probes and the top-k
    tail come from the same ivf_probes/ivf_search_lists operators
    (DECIMAL-exact centroids over the FULL corpus, rounded cosine +
    id tie-breaks) — so it shares simsearch_ivf's DuckDB oracle
    verbatim. Write is tier-tagged + overwrite-idempotent (the
    bucketed_colocated_join conventions)."""
    import hashlib
    import os
    from urllib.parse import urlparse

    from pandas_to_postgres_spark.operators.similarity import (
        ivf_centroids,
        ivf_probes,
        ivf_search_lists,
    )

    e = load_table(spark, sf_dir, "embeddings")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    wh = urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path or "spark-warehouse"
    path = os.path.join(wh, f"ivf_layout_{tag}")
    (
        e.select("vec_id", "embedding", "label")
        .repartition(F.col("label"))
        .write.mode("overwrite")
        .partitionBy("label")
        .parquet(path)
    )

    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding")
    )
    cents = ivf_centroids(e, "label", "embedding")
    probes = ivf_probes(q, cents, "qid", "embedding", "label", nprobe=3)
    # bounded driver collect (<= |Q| * nprobe ids) — this is what turns
    # the probe set into a SCAN-TIME literal the reader can prune with
    probed = sorted(
        {r["label"] for r in probes.select("label").distinct().collect()}
    )
    lists = spark.read.parquet(path).filter(F.col("label").isin(probed))
    out = ivf_search_lists(
        probes, lists, "qid", "vec_id", "embedding", "label", k=5
    )
    return out.select(
        "qid", "vec_id", "cosine", F.col("rank").cast("long").alias("rnk")
    )


_BPE_FERTILITY_ORACLE = """
    WITH words AS (
      SELECT t AS word, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest({toks}) AS t FROM documents)
      WHERE regexp_matches(t, '^[a-z]+$')
      GROUP BY t),
    syms0 AS (
      SELECT word, freq, pos,
             CASE WHEN pos <= length(word) THEN substr(word, pos, 1)
                  ELSE '</w>' END AS sym
      FROM (SELECT word, freq,
                   unnest(range(1, length(word) + 2)) AS pos
            FROM words)),
    {blocks},
    enc AS (
      SELECT word, CAST(count(*) AS BIGINT) AS enc_len
      FROM syms4 GROUP BY word),
    sw AS (
      SELECT source, t AS word, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT source, unnest({toks}) AS t FROM documents)
      WHERE regexp_matches(t, '^[a-z]+$')
      GROUP BY source, t)
    SELECT sw.source,
           CAST(sum(sw.n) AS BIGINT) AS n_tokens,
           CAST(sum(sw.n * e.enc_len) AS BIGINT) AS n_encoded,
           CAST(CAST(sum(sw.n * e.enc_len) * 1000000 AS HUGEINT)
                // CAST(sum(sw.n) AS HUGEINT) AS BIGINT)
               AS fertility_micro
    FROM sw JOIN enc e USING (word)
    GROUP BY sw.source
    """.format(
    toks=_RAW_TOKS_SQL,
    blocks=",\n".join(_bpe_iteration_sql(i) for i in range(1, 5)),
)


@register("bpe_fertility_by_source", min_rows=20, oracle=_BPE_FERTILITY_ORACLE)
def bpe_fertility_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer EVALUATION: per-source fertility (encoded tokens per
    word, in exact micro units) under the 4 learned BPE merges — the
    readout that tells a mixture designer which sources the tokenizer
    serves well and which it fragments (high-fertility sources burn
    context length; the metric multilingual-tokenizer papers report
    per language).

    Zero extra training cost: per-word encoded length is a count over
    the post-merge symbol table (vocab-bounded); the per-source fold is
    one more corpus pass producing the (source, word) count frame
    (map-side-combined), joined to the vocab-bounded length frame on
    word — the join is corpus-vocabulary-sized, never corpus-sized, and
    the fertility ratio stays exact: encoded*1e6 DIV tokens, both
    operands positive BIGINTs (Spark DIV == DuckDB // on HUGEINT).

    Oracle: the same 4 unrolled CTE iterations + the same integer fold."""
    docs = load_table(spark, sf_dir, "documents")
    _, syms = _bpe_train(spark, sf_dir, n_iter=4)
    enc = syms.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("enc_len")
    )
    sw = (
        docs.select(
            "source",
            F.explode(tokens_expr(F.lower(F.col("text")))).alias("t"),
        )
        .filter(F.col("t").rlike("^[a-z]+$"))
        .groupBy("source", F.col("t").alias("word"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    j = sw.join(F.broadcast(enc), "word")
    return j.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.sum(F.col("n") * F.col("enc_len")).cast("long").alias("n_encoded"),
        F.expr(
            "CAST((sum(n * enc_len) * 1000000) DIV sum(n) AS BIGINT)"
        ).alias("fertility_micro"),
    )


_IVF_UPSERT_ORACLE = """
    WITH cent AS (
      SELECT label, i,
             CAST(sum(CAST(embedding[i] AS DECIMAL(18,12))) AS DOUBLE)
               / count(*) AS m
      FROM embeddings, range(1, 65) t(i)
      WHERE vec_id % 2 = 0
      GROUP BY label, i),
    cvec AS (SELECT label, list(m ORDER BY i) AS centroid FROM cent GROUP BY label),
    nsim AS (
      SELECT e.vec_id, c.label,
             round((SELECT sum(CAST(e.embedding[i] AS DOUBLE) * CAST(c.centroid[i] AS DOUBLE))
                    FROM range(1, 65) t(i))
                   / (sqrt((SELECT sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
                            FROM range(1, 65) t(i)))
                      * sqrt((SELECT sum(CAST(c.centroid[i] AS DOUBLE) * CAST(c.centroid[i] AS DOUBLE))
                              FROM range(1, 65) t(i)))), 5) AS csim
      FROM embeddings e CROSS JOIN cvec c
      WHERE e.vec_id % 2 = 1),
    assigned AS (
      SELECT vec_id, label FROM (
        SELECT vec_id, label,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, label ASC) AS pr
        FROM nsim) x
      WHERE pr = 1),
    idx AS (
      SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 2 = 0
      UNION ALL
      SELECT e.vec_id, e.embedding, a.label
      FROM embeddings e JOIN assigned a USING (vec_id)),
    q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
    psim AS (
      SELECT q.qid, c.label, q.qe,
             round((SELECT sum(CAST(q.qe[i] AS DOUBLE) * CAST(c.centroid[i] AS DOUBLE))
                    FROM range(1, 65) t(i))
                   / (sqrt((SELECT sum(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))
                            FROM range(1, 65) t(i)))
                      * sqrt((SELECT sum(CAST(c.centroid[i] AS DOUBLE) * CAST(c.centroid[i] AS DOUBLE))
                              FROM range(1, 65) t(i)))), 5) AS csim
      FROM q CROSS JOIN cvec c),
    probes AS (
      SELECT qid, label, qe FROM (
        SELECT qid, label, qe,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY csim DESC, label ASC) AS pr
        FROM psim) x
      WHERE pr <= 3),
    scored AS (
      SELECT p.qid, e.vec_id,
             round((SELECT sum(CAST(p.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
                    FROM range(1, 65) t(i))
                   / (sqrt((SELECT sum(CAST(p.qe[i] AS DOUBLE) * CAST(p.qe[i] AS DOUBLE))
                            FROM range(1, 65) t(i)))
                      * sqrt((SELECT sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
                              FROM range(1, 65) t(i)))), 5) AS cosine
      FROM probes p JOIN idx e ON e.label = p.label),
    ranked AS (
      SELECT qid, vec_id, cosine,
             CAST(row_number() OVER (PARTITION BY qid
                                     ORDER BY cosine DESC, vec_id) AS BIGINT)
                 AS rnk
      FROM scored)
    SELECT qid, vec_id, cosine, rnk FROM ranked WHERE rnk <= 5
    """


@register("ivf_index_upsert", min_rows=25, oracle=_IVF_UPSERT_ORACLE)
def ivf_index_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 index MAINTENANCE: incremental upsert into the persisted
    partitioned IVF index without retraining or rebuilding. Build the
    index on the even-vec_id half (partitionBy list directories, the
    ivf_partitioned_search layout; its labels are the training clusters
    and its DECIMAL-exact means the FROZEN codebook), then 'new' vectors
    (the odd half) arrive: each is assigned to its nearest frozen
    centroid — ``ivf_probes(nprobe=1)``, the same rounded-cosine +
    label-tiebreak rule the search side uses, so assignment is
    oracle-replayable — and APPENDED to exactly that list's partition
    directory. Queries then probe the frozen codebook and read only the
    probed partitions off disk, seeing old and new vectors in one ranked
    result.

    This is how production IVF serves writes: the codebook retrains
    nightly (a compaction-shaped job), while between retrains inserts
    are one broadcast-assignment pass + an append into O(1) partition
    directories — no index rebuild, no re-shuffle of the corpus, and
    readers stay partition-pruned. Oracle: centroids over the even half,
    the same nprobe=1 assignment for the odd half, and the probed search
    over the unioned index — replayed in full."""
    import hashlib
    import os
    import shutil
    from urllib.parse import urlparse

    from pandas_to_postgres_spark.operators.similarity import (
        ivf_centroids,
        ivf_probes,
        ivf_search_lists,
    )

    e = load_table(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") % 2 == 0)
    newv = e.filter(F.col("vec_id") % 2 == 1)

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    wh = urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path or "spark-warehouse"
    path = os.path.join(wh, f"ivf_upsert_{tag}")
    shutil.rmtree(path, ignore_errors=True)

    (
        base.select("vec_id", "embedding", "label")
        .repartition(F.col("label"))
        .write.mode("overwrite")
        .partitionBy("label")
        .parquet(path)
    )
    cents = ivf_centroids(base, "label", "embedding")  # frozen codebook

    # the UPSERT: nearest-frozen-centroid assignment (nprobe=1 IS the
    # assignment rule), then append into the assigned list's directory —
    # dynamic partition append touches only the assigned labels
    assigned = ivf_probes(
        newv.select(F.col("vec_id").alias("__vid"), "embedding"),
        cents, "__vid", "embedding", "label", nprobe=1,
    ).select(
        F.col("__qid").alias("vec_id"),
        F.col("__qv").alias("embedding"),
        "label",
    )
    (
        assigned.repartition(F.col("label"))
        .write.mode("append")
        .partitionBy("label")
        .parquet(path)
    )

    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding")
    )
    probes = ivf_probes(q, cents, "qid", "embedding", "label", nprobe=3)
    probed = sorted(
        {r["label"] for r in probes.select("label").distinct().collect()}
    )
    lists = spark.read.parquet(path).filter(F.col("label").isin(probed))
    out = ivf_search_lists(
        probes, lists, "qid", "vec_id", "embedding", "label", k=5
    )
    return out.select(
        "qid", "vec_id", "cosine", F.col("rank").cast("long").alias("rnk")
    )


def _kcenter_oracle(k: int = 4, dim: int = 64) -> str:
    """DuckDB twin of greedy k-center with every iteration unrolled as
    CTEs (the `_semdedup_oracle` discipline): identical double-cast
    squared distances (left-fold over array order in both engines),
    identical (min-dist DESC, vec_id ASC) selection rule — the whole
    greedy trajectory is value-checked, not just the final set."""

    def sq(a: str, b: str) -> str:
        return (
            f"list_sum(list_transform(generate_series(1, {dim}), i -> "
            f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * "
            f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))))"
        )

    parts = [
        "cents0 AS (SELECT 0 AS step, vec_id, embedding, "
        "CAST(0.0 AS DOUBLE) AS mind FROM embeddings "
        "WHERE vec_id = (SELECT min(vec_id) FROM embeddings))"
    ]
    for n in range(1, k + 1):
        parts.append(
            f"d{n} AS (SELECT e.vec_id, e.embedding, "
            f"min({sq('e.embedding', 'c.embedding')}) AS mind "
            f"FROM embeddings e CROSS JOIN cents{n - 1} c "
            f"GROUP BY e.vec_id, e.embedding)"
        )
        parts.append(
            f"pick{n} AS (SELECT {n} AS step, vec_id, embedding, mind "
            f"FROM d{n} ORDER BY mind DESC, vec_id ASC LIMIT 1)"
        )
        parts.append(
            f"cents{n} AS (SELECT * FROM cents{n - 1} "
            f"UNION ALL SELECT * FROM pick{n})"
        )
    return (
        "WITH " + ",\n    ".join(parts) + f"""
    SELECT step, CAST(vec_id AS BIGINT) AS center_id,
           floor(mind * 1e6 + 0.5) / 1e6 AS radius
    FROM cents{k}
    """
    )


@register("kcenter_coreset", min_rows=4, oracle=_kcenter_oracle())
def kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection over the embedding table — the
    diversity-sampling leg of data selection (farthest-point traversal:
    Gonzalez 1985's 2-approximation for k-center; used for active
    learning seeds and diverse-subset pruning of training corpora).
    Start from the smallest vec_id, then k times add the point whose
    distance to the selected set is LARGEST (ties → smallest vec_id);
    each step's distance is the coverage radius the selection just
    halved its bound on.

    Determinism (the oracle value-checks the whole trajectory): squared
    L2 distances cast every float32 element to double BEFORE arithmetic
    and fold in array order (both engines sum left-to-right — the
    `semantic_dedup` precedent); min-over-centers and the argmax compare
    exact doubles, with vec_id breaking ties via one `max_by` ordering
    struct (never a nondeterministic first()); only the REPORTED radius
    is grid-rounded.

    Scale: each of the k iterations is one linear scan (corpus ×
    ≤k-center broadcast crossJoin, map-side min, single-row max_by
    reduction) — O(k·n·dim) total, no pairwise blow-up; the growing
    center set stays a broadcast frame (k rows), and localCheckpoint
    caps the lazy plan's growth across iterations. At 100 TB you'd run
    the same loop over a pre-reduced IVF/PQ sketch; the operator shape
    is unchanged."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )
    seed = (
        e.orderBy("vec_id")
        .limit(1)
        .select(
            F.lit(0).alias("step"),
            "vec_id",
            "vec",
            F.lit(0.0).alias("mind"),
        )
    )
    centers = seed.localCheckpoint(eager=False)
    sq = F.aggregate(
        F.zip_with(
            F.col("vec"), F.col("cvec"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    for n in range(1, 5):
        d = (
            e.crossJoin(
                F.broadcast(centers.select(F.col("vec").alias("cvec")))
            )
            .select("vec_id", "vec", sq.alias("d2"))
            .groupBy("vec_id", "vec")
            .agg(F.min("d2").alias("mind"))
        )
        pick = d.select(
            F.max_by(
                F.struct("vec_id", "vec", "mind"),
                F.struct(F.col("mind"), (-F.col("vec_id")).alias("nid")),
            ).alias("c")
        ).select(
            F.lit(n).alias("step"),
            F.col("c.vec_id").alias("vec_id"),
            F.col("c.vec").alias("vec"),
            F.col("c.mind").alias("mind"),
        )
        centers = centers.unionByName(pick).localCheckpoint(eager=False)
    return centers.select(
        "step",
        F.col("vec_id").cast("long").alias("center_id"),
        (F.floor(F.col("mind") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
            "radius"
        ),
    )


_IVF_RECALL_ORACLE = f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
               WHERE vec_id < 5),
    bscored AS (
        SELECT q.qid, e.vec_id,
               round({_DOT} / ({_NORM_Q} * {_NORM_E}), 5) AS cosine
        FROM q CROSS JOIN embeddings e),
    brute AS (
        SELECT qid, vec_id FROM (
            SELECT qid, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY cosine DESC, vec_id) AS rnk
            FROM bscored) x WHERE rnk <= 5),
    cent AS (
      SELECT label, i,
             CAST(sum(CAST(embedding[i] AS DECIMAL(18,12))) AS DOUBLE)
               / count(*) AS m
      FROM embeddings, range(1, 65) t(i)
      GROUP BY label, i),
    cvec AS (SELECT label, list(m ORDER BY i) AS centroid
             FROM cent GROUP BY label),
    psim AS (
      SELECT q.qid, c.label, q.qe,
             round((SELECT sum(CAST(q.qe[i] AS DOUBLE)
                               * CAST(c.centroid[i] AS DOUBLE))
                    FROM range(1, 65) t(i))
                   / ({_NORM_Q}
                      * sqrt((SELECT sum(CAST(c.centroid[i] AS DOUBLE)
                                         * CAST(c.centroid[i] AS DOUBLE))
                              FROM range(1, 65) t(i)))), 5) AS csim
      FROM q CROSS JOIN cvec c),
    probes AS (
      SELECT qid, label, qe FROM (
        SELECT qid, label, qe,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY csim DESC, label ASC) AS pr
        FROM psim) x
      WHERE pr <= 3),
    iscored AS (
      SELECT p.qid, e.vec_id,
             round((SELECT sum(CAST(p.qe[i] AS DOUBLE)
                               * CAST(e.embedding[i] AS DOUBLE))
                    FROM range(1, 65) t(i))
                   / (sqrt((SELECT sum(CAST(p.qe[i] AS DOUBLE)
                                       * CAST(p.qe[i] AS DOUBLE))
                            FROM range(1, 65) t(i)))
                      * {_NORM_E}), 5) AS cosine
      FROM probes p JOIN embeddings e ON e.label = p.label),
    ivf AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY cosine DESC, vec_id) AS rnk
        FROM iscored) x WHERE rnk <= 5)
    SELECT b.qid, CAST(5 AS BIGINT) AS k,
           CAST(count(i.vec_id) AS BIGINT) AS n_hits,
           CAST(count(i.vec_id) AS DOUBLE) / 5 AS recall
    FROM brute b LEFT JOIN ivf i
      ON b.qid = i.qid AND b.vec_id = i.vec_id
    GROUP BY b.qid
    """


@register("ivf_recall_audit", min_rows=5, oracle=_IVF_RECALL_ORACLE)
def ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 EVALUATION: recall@5 of the IVF (nprobe=3) index against exact
    brute-force top-5, per query — the audit every ANN deployment needs
    before trusting an index (FAISS-style recall benchmarking done
    in-engine, as one query). Both legs are the engine's own operators
    (``topk_cosine_ivf``, ``topk_cosine_bruteforce``), both replayable
    in DuckDB, so the recall numbers themselves hash-check — an
    'approximate-index quality' metric with an exact oracle.

    Scale: the brute leg is the broadcast-query pattern (one corpus
    pass); the IVF leg touches nprobe inverted lists; the audit join is
    queries×k rows. In production this runs on a SAMPLE of queries — the
    shape stays identical.

    Reference: no vector ops in the 988-LoC loader; D4 similarity tier
    (SURVEY §2.11 [EXT]) — the evaluation leg."""
    from pandas_to_postgres_spark.operators.similarity import (
        topk_cosine_bruteforce,
        topk_cosine_ivf,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding")
    )
    brute = topk_cosine_bruteforce(
        q, e, query_id="qid", corpus_id="vec_id", query_vec="embedding",
        corpus_vec="embedding", k=5,
    ).select("qid", "vec_id")
    ivf = topk_cosine_ivf(
        q, e.select("vec_id", "embedding", "label"),
        query_id="qid", corpus_id="vec_id", query_vec="embedding",
        corpus_vec="embedding", cluster_col="label", k=5, nprobe=3,
    ).select(F.col("qid").alias("iqid"), F.col("vec_id").alias("ivid"))
    hits = brute.join(
        ivf,
        (F.col("qid") == F.col("iqid")) & (F.col("vec_id") == F.col("ivid")),
        "left",
    )
    return hits.groupBy("qid").agg(
        F.lit(5).cast("long").alias("k"),
        F.count("ivid").cast("long").alias("n_hits"),
        (F.count("ivid").cast("double") / 5).alias("recall"),
    )
