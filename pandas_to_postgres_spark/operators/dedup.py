"""Deduplication operators (SURVEY.md §2.11 D1/D2): exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

All deterministic (seeded ``xxhash64``, no randomness) so results are
reproducible run-to-run — a hard requirement for oracle checks and for
incremental 100 TB pipelines (re-running a shard must not change survivors).

Scale design:
- exact dedup: one shuffle on the content hash; `row_number` picks the
  canonical survivor (min id) per group. At 100 TB the hash groupBy is the
  canonical map-side-combine-friendly shuffle.
- MinHash-LSH: per-doc signature is a narrow fixed-width array (k longs)
  computed JVM-side; banding turns the O(n^2) pair problem into
  groupBy(band_idx, band_hash) buckets. Candidate pairs are generated ONLY
  within buckets (self-join on the bucket key), then verified with true
  Jaccard. No crossJoin anywhere. Huge buckets (degenerate content) are
  capped to bound the quadratic blowup inside a single bucket.
- SimHash: 64-bit signature via per-token hash bit-voting, all with
  built-in bitwise expressions; near-dup candidates = exact signature match
  (or banded sub-keys), again a plain groupBy.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pandas_to_postgres_spark.functions.text import tokens_expr
from pandas_to_postgres_spark.functions.vectors import cosine_expr

#: Vocabulary bound for the bitset verify fast path in
#: :func:`ngram_jaccard_prefix`. With V distinct shingles the per-doc token
#: set fits in ceil(V/64) BIGINT words; exact intersection is then
#: bit_count(a & b) summed over words — a handful of ALU ops per candidate
#: pair instead of a hash-set build over both shingle arrays. 512 keeps the
#: mask at <= 8 codegen columns (64 B/row); the decision is made from the
#: MEASURED vocabulary (the interning check's countDistinct), so natural
#: corpora (vocabulary in the millions) always take the general array path.
_BITSET_MAX_VOCAB = 512

#: Broadcast bound for the bitset path's prefix frame, in BYTES of built
#: hash relation (r11, VERDICT r10 scale-watch: the old 2M-ROW bound
#: allowed up to ~160 MB at the 8-word vocab edge — heavy on executor
#: memory). The row budget derives from the actual row width
#: (id + size + ix + n_words mask words), so narrow-vocab frames keep
#: the old reach while wide-vocab frames are bounded by what they cost.
#: The decision reads the materialized checkpoint's exact count, never a
#: plan estimate; a corpus whose prefix frame exceeds it keeps the
#: planner's shuffle join (broadcasting a corpus-sized frame would be
#: the 100 TB scale bug).
_BITSET_BCAST_BYTES = 64 << 20

#: candidate-enumeration rows per task targeted by the scale-adaptive
#: fan-out in :func:`_ngram_jaccard_bitset` (module constant so the
#: path-equivalence test can force the scaled branch on a small corpus)
_BITSET_ENUM_PER_TASK = 20_000_000


def ensure_parallelism(df: DataFrame, min_partitions: Optional[int] = None) -> DataFrame:
    """Repartition iff the input has fewer partitions than the target.

    Hash-heavy operators (MinHash families, SimHash bit votes) are
    CPU-bound per row; a small parquet file arrives as 1-2 splits and would
    serialize on 2 of N cores. At 100 TB inputs already carry thousands of
    partitions and this is a no-op — the guard keeps it from adding a
    shuffle where none is needed.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# ---------------------------------------------------------------- exact (D1)

def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one row per exact text content: the row with the lowest id.

    sha2-256 of the raw text is the group key (collision-safe at any scale;
    groupBy on a 64-char hash shuffles far less than the full text).
    """
    w = Window.partitionBy("__h").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__h", F.sha2(F.col(text_col), 256))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__h", "__rn")
    )


def dedup_exact_summary(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-content-hash summary: canonical (min) id + duplicate count.

    Aggregation form of :func:`dedup_exact` — fully map-side-combinable,
    and oracle-expressible in ANSI SQL.
    """
    return df.groupBy(F.sha2(F.col(text_col), 256).alias("text_hash")).agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


# ------------------------------------------------------- shingles / n-grams

def shingles_expr(text_col: str, n: int = 3):
    """Word n-gram shingles of a text column → array<string> (distinct).

    Built from ``slice`` over the token array via ``transform`` — stays
    JVM-side, no explode needed until the caller wants one.
    """
    return shingles_from_tokens(tokens_expr(F.lower(F.col(text_col))), n)


def shingles_from_tokens(toks, n: int = 3):
    """Shingle expression over an already-computed token-array column.

    Callers that project the token array into its own column first get the
    tokenization computed ONCE: ``toks`` is referenced four times below, so
    Catalyst's CollapseProject keeps the producing projection separate
    (non-cheap, multi-referenced) instead of inlining ``split(...)`` into
    every reference."""
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    # degenerate short docs: fall back to the whole text as one shingle
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array(F.concat_ws(" ", toks)))
    )


# ------------------------------------------------------------ MinHash (D2)

def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, signature array<long>[num_hashes]) per document.

    The shingle string is hashed ONCE to a 64-bit long, and family i is
    ``xxhash64(h, i)`` — rehashing the long through k seeds. Families are as
    independent as the 2^-64 string-collision rate allows (verified: the
    banded-LSH candidate set is bit-identical to k full string-hash
    families at sf0.01). Linear derived families (Kirsch-Mitzenmacher
    h1+i*h2) are NOT used: they measurably cost banded-LSH recall, and
    wraparound arithmetic is an ANSI-mode overflow error in Spark 4.
    Deterministic — no randomness anywhere.

    Shape: the whole signature is computed per-row with higher-order
    functions — ``transform`` hashes the shingle array to longs once, then
    family i is ``array_min(transform(hs, h -> xxhash64(h, i)))``. No
    explode, NO SHUFFLE: a map-only projection from (id, text) straight to
    (id, k longs). This beats the explode → groupBy(id, k min-aggs)
    formulation ~17x on first run (the wide agg's whole-stage codegen alone
    compiles for seconds) and at 100 TB removes the signature shuffle
    entirely — each executor emits finished signatures from its own scan
    split.
    """
    hashed = hashed_shingles(df, text_col, id_col, shingle_n)
    return signatures_from_hashed(hashed, id_col, num_hashes)


def hashed_shingles(
    df: DataFrame, text_col: str, id_col: str, shingle_n: int = 3
) -> DataFrame:
    """(id, __hs array<long>): each distinct shingle hashed once to a
    64-bit long. The narrow shared input of the LSH pipeline — signatures
    and the verification join both derive from it, so the expensive
    tokenize→shingle→hash expression runs (and compiles) exactly once.
    Tokenization is projected into its own column so the shingle
    expression's four references to it don't each re-split the text."""
    toks = tokens_expr(F.lower(F.col(text_col)))
    d = df.select(F.col(id_col), toks.alias("__toks"))
    sh = shingles_from_tokens(F.col("__toks"), shingle_n)
    hs = F.transform(sh, lambda s: F.xxhash64(s))
    return d.select(F.col(id_col), hs.alias("__hs"))


def signatures_from_hashed(
    hashed: DataFrame, id_col: str, num_hashes: int = 64
) -> DataFrame:
    """Signature array from a ``hashed_shingles`` frame (map-only).

    The family loop is a ``transform`` over ``sequence(0, k-1)`` — ONE
    nested higher-order expression, not k unrolled ``array_min`` columns.
    Both produce bit-identical signatures (``xxhash64(h, i)`` with i as a
    runtime value hashes the same (h, i) pair as a literal seed column),
    but the unrolled form generates 64 independent codegen bodies: ~2-3s
    of Janino compilation on first use (the dominant cost in short
    sessions) plus ~1.4x higher per-core runtime warm (2.15s vs 1.58s
    single-partition over 10k sf0.1 docs). The nested form is two tight
    loops in one small generated method."""
    k = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    return hashed.select(
        F.col(id_col),
        F.transform(
            k,
            lambda i: F.array_min(
                F.transform(F.col("__hs"), lambda h: F.xxhash64(h, i))
            ),
        ).alias("signature"),
    )


def minhash_lsh_candidates(
    signatures: DataFrame,
    id_col: str,
    num_bands: int = 16,
    max_bucket: int = 1000,
    num_hashes: int = 64,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) from banded LSH buckets.

    Rows of each band are hashed together (xxhash64 over the band's
    signature slice); docs sharing any (band_idx, band_hash) bucket become
    candidates. ``max_bucket`` caps pathological buckets (e.g. empty docs)
    so a single degenerate bucket can't go quadratic at scale.

    Shape: band-hash posexplode → row_number bucket cap → bucket-key
    self-join → distinct. (An alternative single-groupBy collect_list +
    in-array pair expansion was benchmarked and is ~1.7x slower end-to-end
    despite two fewer shuffles: the nested higher-order pair-expansion
    expression costs more per row than the narrow (band, id) exchanges it
    saves — the shuffled rows are only 3 longs wide.)
    """
    width = num_hashes // num_bands
    # one nested HOF, not num_bands unrolled xxhash64 columns (same codegen
    # economics as signatures_from_hashed). The band hash is a chained
    # xxhash64 fold over the band's slice seeded with the band index —
    # different VALUES than the old flat xxhash64(varargs) call, but band
    # hashes are internal bucket keys: equal slices hash equal either way,
    # so true near-dup recall is unchanged, and unequal-slice bucket
    # collisions (the only behavioral delta, ~2^-64) are removed by the
    # exact-Jaccard verification downstream.
    band_hashes = F.transform(
        F.sequence(F.lit(0), F.lit(num_bands - 1)),
        lambda b: F.aggregate(
            F.slice(F.col("signature"), b * width + 1, width),
            b.cast("long"),
            lambda acc, x: F.xxhash64(acc, x),
        ),
    )
    banded = signatures.select(
        F.col(id_col),
        F.posexplode(band_hashes).alias("band_idx", "band_hash"),
    )
    # cap bucket size before the self-join
    wb = Window.partitionBy("band_idx", "band_hash").orderBy(F.col(id_col))
    capped = banded.withColumn("__bn", F.row_number().over(wb)).filter(
        F.col("__bn") <= max_bucket
    )
    # materialize the capped band table once: the self-join's two sides do
    # NOT share the window exchange in practice (measured: two identical
    # 32-task scan→signature→band→window stages, ~6.5s CPU each, because
    # the broadcast build side replans the whole subtree instead of
    # reusing the exchange) — the checkpoint guarantees one signature
    # computation. repartition BELOW the checkpoint pins the width the
    # bucket fan-out runs at (the ngram_jaccard_prefix pattern: AQE
    # coalesces the ~3 MB band frame to 1-2 partitions and cannot see the
    # self-join's fan-out under it).
    capped = (
        capped.select(F.col(id_col), "band_idx", "band_hash")
        .repartition(signatures.sparkSession.sparkContext.defaultParallelism)
        .localCheckpoint(eager=False)
    )
    a = capped.select(
        F.col("band_idx"), F.col("band_hash"), F.col(id_col).alias("id_a")
    )
    b = capped.select(
        F.col("band_idx"), F.col("band_hash"), F.col(id_col).alias("id_b")
    )
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    num_bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → banded candidates →
    shingle-set Jaccard verification. Returns (id_a, id_b, jaccard).

    Verification runs on HASHED shingle sets (the same ``hashed_shingles``
    frame the signatures derive from), not the string shingles: Jaccard
    over the 64-bit hashes equals Jaccard over the shingles up to the
    2^-64 collision rate, the tokenize→shingle→hash expression runs (and
    compiles) once instead of twice, and the set ops compare longs instead
    of strings. The join re-attaches hash sets only for candidate ids
    (a semi-join-sized shuffle, not the full corpus).

    The (id, shingle-hashes) frame is cached — it feeds the signature
    expression AND both sides of the verification join, and Catalyst's
    projection collapse would otherwise inline tokenize→shingle→hash into
    every reference. The signature frame is NOT cached: the bucket
    self-join's two sides share the row_number window's shuffle, so AQE
    reuses that exchange and signatures compute exactly once either way —
    measured, dropping the cache saves its materialization job (~0.2s at
    sf0.1) with identical output. At 100 TB persist (id, hashes) once,
    then band/join against it."""
    df = ensure_parallelism(df)
    hashed = hashed_shingles(df, text_col, id_col, shingle_n).cache()
    sigs = signatures_from_hashed(hashed, id_col, num_hashes)
    cands = minhash_lsh_candidates(sigs, id_col, num_bands)
    a = hashed.select(F.col(id_col).alias("id_a"), F.col("__hs").alias("sh_a"))
    b = hashed.select(F.col(id_col).alias("id_b"), F.col("__hs").alias("sh_b"))
    verified = (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )
    return verified


def ngram_jaccard_blocked(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_cols: Sequence[str],
    n: int = 1,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all SAME-BLOCK pairs (id_a < id_b).

    The block columns (language, source, cluster, LSH bucket, …) bound the
    pair space — the blocked-comparison pattern that keeps exact Jaccard
    feasible at scale (never an unblocked self-join). With n=1 this is word
    Jaccard and fully SQL-expressible for the oracle; MinHash (above) is the
    approximation tier when even blocked pairs are too many.
    """
    sh = df.select(
        *block_cols, F.col(id_col), shingles_expr(text_col, n).alias("__sh")
    )
    a = sh.select(
        *block_cols, F.col(id_col).alias("id_a"), F.col("__sh").alias("sh_a")
    )
    b = sh.select(
        *block_cols, F.col(id_col).alias("id_b"), F.col("__sh").alias("sh_b")
    )
    return (
        a.join(b, list(block_cols))
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(*block_cols, "id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


def _ngram_jaccard_bitset(
    tok: DataFrame,
    dfreq: DataFrame,
    n_vocab: int,
    width: int,
    threshold: float,
    prefix_len,
    with_sizes: bool,
) -> DataFrame:
    """Bitset verify leg of :func:`ngram_jaccard_prefix` (gated on the
    measured vocabulary fitting ``_BITSET_MAX_VOCAB``; see the call site
    for the full rationale).

    Candidate generation is the same Vernica/Chaudhuri prefix join; the
    difference is that each prefix row carries the document's EXACT token
    set as ``ceil(V/64)`` BIGINT mask words over a dense vocabulary index
    (built once: broadcast <=512-row vocab join + one ``bit_or`` window
    that rides the SAME per-doc exchange the prefix-rank window already
    pays), so the exact Jaccard verify runs INLINE in the join —
    ``sum_j bit_count(wa_j & wb_j)`` — with no verify joins and no array
    payloads in any exchange.

    Pair de-duplication is BY CONSTRUCTION (the PPJoin trick, Xiao/Wang/
    Lin/Yu WWW'08 §3.1): a pair is emitted once per shared prefix token,
    so instead of a corpus-pair-sized ``distinct`` the join keeps ONLY the
    candidate whose join token is the pair's MINIMUM common token — a
    per-row mask test against the ANDed bitsets (no common bit strictly
    below ``__ix``). The minimum common token of the FULL sets is always
    in both prefixes whenever any shared prefix token exists (prefixes
    are the per-doc smallest tokens in the same global (df, token) order
    the dense index encodes, and they are downward-closed within a doc's
    set), so exactly one candidate per qualifying pair survives and the
    output is row-identical to the distinct — with the entire post-join
    shuffle (62M surviving rows at the sf0.1 fixture) deleted from the
    plan: after the broadcast candidate join the query is map-only.
    """
    n_words = (n_vocab + 63) // 64
    # dense 0..V-1 index in the global (df, token) order; V <= 512 rows, so
    # the single-partition row_number window and the broadcast are both
    # metadata-sized at any corpus size
    vocab = dfreq.select(
        "__t",
        "__df",
        (F.row_number().over(Window.orderBy("__df", "__t")) - 1).alias("__ix"),
    )
    rn = F.row_number().over(Window.partitionBy("__id").orderBy("__df", "__t"))
    wdoc = Window.partitionBy("__id")
    masks = [
        F.bit_or(
            F.expr(
                f"CASE WHEN __ix DIV 64 = {j} THEN "
                "shiftleft(CAST(1 AS BIGINT), CAST(__ix % 64 AS INT)) "
                "ELSE CAST(0 AS BIGINT) END"
            )
        )
        .over(wdoc)
        .alias(f"__w{j}")
        for j in range(n_words)
    ]
    wcols = [f"__w{j}" for j in range(n_words)]
    # the candidate join runs on the dense INT vocab index, not the token:
    # 4-byte fixed-width keys keep the prefix frame narrow enough that the
    # planner broadcasts one side (string keys here were measured to tip
    # the size estimate into a sort-merge join that AQE then coalesced to
    # ONE partition — a 54s single-task fan-out)
    pref = (
        tok.join(F.broadcast(vocab), "__t")
        .select("__id", "__sz", "__ix", rn.alias("__rn"), *masks)
        .filter(F.col("__rn") <= prefix_len)
        .select("__id", "__sz", "__ix", *wcols)
        .repartition(width)
        .localCheckpoint(eager=False)
    )
    # materialize NOW and decide the join strategy from the exact row
    # count: with a lazy checkpoint the planner only sees upstream
    # ESTIMATES (the string-token upstream inflated them enough to flip
    # this join to a shuffle join, which AQE — seeing 0.8 MB and not the
    # ~100x fan-out below — coalesced to a single 54s task). The count is
    # one metadata-sized job over the checkpointed blocks; the broadcast
    # side is bounded in BYTES (row width grows with the vocab's mask
    # words), so a corpus whose prefix frame is genuinely large keeps
    # the planner's shuffle join, and the stream side always scans the
    # width-pinned checkpoint.
    pref_rows = pref.count()
    small_pref = pref_rows * (16 + 8 * n_words) <= _BITSET_BCAST_BYTES
    # scale-adaptive width (guide §2: derive partitioning from the data,
    # not a core-count constant): the join enumerates roughly
    # pref_rows^2 / V candidate rows, so the enumeration stage's task
    # count grows with the estimated candidate volume — target
    # ~_BITSET_ENUM_PER_TASK enumerations per task, floor at the pool
    # width, cap at 32x the pool so tasks never degenerate. (The r10
    # pair-dedup widening that used to live here is gone with the
    # distinct itself — the min-common-token filter below keeps the
    # post-join pipeline map-only, so there is no reduce-side hash map
    # left to OOM at any width.)
    est_enum = pref_rows * pref_rows // max(n_vocab, 1)
    fan_width = max(width, min(width * 32, est_enum // _BITSET_ENUM_PER_TASK))
    if fan_width > width:
        pref = pref.repartition(fan_width)
    a = pref.select(
        F.col("__id").alias("id_a"),
        "__ix",
        F.col("__sz").alias("__sza"),
        *[F.col(w).alias(f"__wa{j}") for j, w in enumerate(wcols)],
    )
    b = pref.select(
        F.col("__id").alias("id_b"),
        "__ix",
        F.col("__sz").alias("__szb"),
        *[F.col(w).alias(f"__wb{j}") for j, w in enumerate(wcols)],
    )
    inter = F.expr(
        " + ".join(f"bit_count(__wa{j} & __wb{j})" for j in range(n_words))
    ).cast("bigint")
    # PPJoin-style dedup-by-construction: keep only the candidate whose
    # join token __ix is the pair's MINIMUM common token — i.e. the ANDed
    # masks have no set bit strictly below __ix. Per word j the probe mask
    # is all-ones below the join token's word, the low (__ix % 64) bits in
    # its own word, and zero above; `-1 ^ shiftleft(-1, k)` builds the low
    # mask without the `(1 << 63) - 1` overflow ANSI mode would reject.
    # (See the docstring: the min common token is provably in both
    # prefixes whenever any shared prefix token is, so exactly one
    # candidate per qualifying pair passes.)
    min_common = F.expr(
        " AND ".join(
            f"((__wa{j} & __wb{j} & (CASE WHEN {j} < __ix DIV 64 "
            f"THEN CAST(-1 AS BIGINT) WHEN {j} = __ix DIV 64 "
            f"THEN (CAST(-1 AS BIGINT) ^ shiftleft(CAST(-1 AS BIGINT), "
            f"CAST(__ix % 64 AS INT))) ELSE CAST(0 AS BIGINT) END)) = 0)"
            for j in range(n_words)
        )
    )
    verified = (
        a.join(F.broadcast(b) if small_pref else b, "__ix")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(min_common)
        .filter(
            # same 1e-9 slack as the general path's length filter: purely
            # a prefilter, the exact popcount verify below decides
            F.least("__sza", "__szb").cast("double")
            >= F.lit(threshold - 1e-9) * F.greatest("__sza", "__szb").cast("double")
        )
        .withColumn("__isz", inter)
        .withColumn(
            "__usz",
            (F.col("__sza") + F.col("__szb")).cast("bigint") - F.col("__isz"),
        )
        .withColumn(
            "jaccard", F.col("__isz").cast("double") / F.col("__usz").cast("double")
        )
        .filter(F.col("jaccard") >= threshold)
    )
    out = ["id_a", "id_b", F.round("jaccard", 4).alias("jaccard")]
    if with_sizes:
        out += [F.col("__isz").alias("inter_sz"), F.col("__usz").alias("union_sz")]
    # no distinct: the min-common-token filter above admits exactly one
    # candidate row per qualifying pair, so the old corpus-pair-sized
    # dedup shuffle (and the OOM-prone reduce-side hash maps it carried
    # at scale) is gone — every output column is a function of the pair
    # and the post-join pipeline is map-only.
    return verified.select(*out)


def ngram_jaccard_prefix(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    n: int = 1,
    max_token_df: Optional[int] = None,
    with_sizes: bool = False,
    intern_tokens: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard similarity self-join via **prefix filtering**
    (the MapReduce set-similarity join of Vernica/Carey/Li, SIGMOD 2010;
    prefix bound from Chaudhuri/Ganti/Kaushik, ICDE 2006).

    Block key = shingle, but only each document's ``|d| - ceil(t*|d|) + 1``
    globally-rarest shingles generate candidates: if two sets have Jaccard
    ≥ t, their prefixes under one global (document-frequency, shingle)
    order must share an element — so recall is 100% BY CONSTRUCTION, while
    the candidate space is bounded by the document frequency of *rare*
    shingles instead of block-squared. Unlike blocking on (lang, source)
    (~25 blocks → O(n²/25) at any corpus size), block cardinality here is
    the shingle vocabulary and grows WITH the corpus; per-block pair cost
    is df(shingle)² only for shingles rare enough to be some document's
    prefix.

    Stages (all shuffles on bounded keys): shingle+explode → df count
    (map-side combinable) → per-doc rank window (partition = one doc's
    shingles, never large) → prefix self-join on shingle → distinct pairs
    → verify exact Jaccard on candidates only.

    ``max_token_df`` optionally drops candidate-generation shingles seen in
    more than that many documents (skew cap for adversarial corpora where
    some document's whole prefix is stopwords). Leave ``None`` for exact
    results — with it set, pairs whose every shared rare shingle exceeds
    the cap can be missed (documented recall trade, same spirit as
    ``max_bucket`` in the MinHash path).

    ``with_sizes=True`` appends exact BIGINT ``inter_sz``/``union_sz``
    columns so downstream consumers (e.g. ``dedup_threshold_pr``) can put
    pair similarity on an exact integer grid (``inter*1e6 DIV union``)
    instead of re-deriving it from the 4-dp-rounded double — the rounded
    double can drift up to ~50 micro from the exact ratio, flipping pairs
    whose true Jaccard sits within 5e-5 of a threshold.

    **Token interning (``intern_tokens=True``)**: shingles are replaced by
    their xxhash64 BEFORE anything shuffles, guarded by one vocabulary-wide
    collision check (``count_distinct(shingle) == count_distinct(hash)``,
    computed since r10 as a VOCABULARY-sized aggregate over the document-
    frequency frame instead of a second corpus pass; on ANY collision the
    operator silently falls back to string shingles, so the result is
    EXACT either way, never probabilistically wrong).

    **Small-vocabulary bitset verify (r10)**: when the measured vocabulary
    fits ``_BITSET_MAX_VOCAB``, the verify runs INLINE in the candidate
    join as popcounts over fixed-width token-set bitmasks — see
    :func:`_ngram_jaccard_bitset`. Decided from data, exact either way. Document frequency, prefix ranks, the
    candidate join, and the verify's array_intersect then all run on
    array<long> instead of array<string>: smaller shuffles, 64-bit compares
    instead of string hashing in the per-pair intersect. The prefix ORDER
    tiebreak becomes (df, hash) instead of (df, shingle); recall is 100%
    under ANY consistent total order, so the verified output is identical.

    **Parallelism pinning**: both checkpointed frames are repartitioned to
    ``defaultParallelism`` BEFORE the checkpoint. A localCheckpoint freezes
    the physical split count of whatever it materializes, and AQE coalesces
    the small upstream exchanges (the whole prefix frame is ~1 MB) down to
    1-2 partitions — it cannot see that the self-join FANS OUT ~7000x
    below. Measured at sf0.1 (11.7M-pair output): 54s warm with the stage
    on 2 cores, 25s warm 32-wide — and the two remaining heavy stages are
    the irreducible fan-out work (join+partial-distinct ~300s CPU, verify
    intersects ~250s CPU, both now spread across the pool).
    Repartitioning ABOVE the checkpoint instead does nothing: AQE
    coalesces that new exchange too. At 100 TB inputs already carry
    thousands of splits and the guard is a no-op.
    """
    width = df.sparkSession.sparkContext.defaultParallelism
    n_vocab = 0
    sh = shingles_expr(text_col, n)
    # materialized once (lazy localCheckpoint): the tokenized table feeds
    # candidate generation (via explode), BOTH sides of the prefix
    # self-join, and BOTH sides of the verify join — un-materialized,
    # Catalyst re-derives it from the raw text scan at every reference
    # (measured 12 scans of the source for this one query). Same move as
    # minhash_near_duplicates' signature cache: at 100 TB you persist the
    # narrow (id, shingles) projection once. localCheckpoint (not .cache())
    # so the blocks are RELEASED by the ContextCleaner once the result
    # frame is garbage-collected — .cache() entries are pinned by the
    # CacheManager forever, a slow leak in a long-lived session running
    # many queries; eager=False keeps the compute inside the first action.
    # (repartition the RAW rows, so the shingle/hash projection itself
    # runs at full width instead of on the scan's 1-2 splits)
    base = ensure_parallelism(
        df.select(F.col(id_col).alias("__id"), F.col(text_col)), width
    ).select("__id", sh.alias("__tks"))
    # STRING shingle arrays, materialized once: document frequencies, the
    # interning collision check, and both execution paths all derive from
    # this checkpoint, so the expensive tokenize/shingle HOF runs exactly
    # once per corpus (it used to run twice — once for the collision-check
    # pass over the raw scan, once for this frame; r10 folds the check
    # into the vocabulary aggregate below, saving a full corpus pass).
    toks_str = (
        base.select("__id", F.col("__tks").alias("__tk"))
        .withColumn("__sz", F.size("__tk"))
        .localCheckpoint(eager=False)
    )
    tok_str = toks_str.select("__id", "__sz", F.explode("__tk").alias("__t"))
    # vocabulary-sized (one row per distinct shingle); checkpointed so the
    # collision-check aggregate and the downstream rank join share ONE
    # explode+groupBy pass instead of re-deriving it per reference
    dfreq_str = (
        tok_str.groupBy("__t")
        .agg(F.count(F.lit(1)).alias("__df"))
        .localCheckpoint(eager=False)
    )
    interned = False
    n_vocab = 0
    if intern_tokens:
        # interning safety check + vocabulary size in one vocabulary-sized
        # aggregate (NOT a corpus pass): count_distinct(token) == |dfreq|
        # by construction, so comparing it with count_distinct(xxhash64)
        # over the dfreq frame is the same collision test the old
        # corpus-wide explode ran.
        chk = dfreq_str.agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.countDistinct(F.xxhash64("__t")).alias("n_hash"),
        ).first()
        interned = chk["n_tok"] == chk["n_hash"]
        n_vocab = int(chk["n_tok"])
    prefix_len = F.col("__sz") - F.ceil(F.lit(threshold) * F.col("__sz")) + 1
    if max_token_df is None and 0 < n_vocab <= _BITSET_MAX_VOCAB:
        # SMALL-VOCABULARY BITSET VERIFY (output-dense corpora). When the
        # measured vocabulary fits in a few 64-bit words, each document's
        # exact token SET is a fixed-width bitmask over a dense vocabulary
        # index, and the per-pair verify collapses to popcounts of ANDed
        # words — computed INLINE in the candidate join. That removes both
        # verify joins (cand ⋈ toks ⋈ toks) and their fat array payloads
        # entirely, and the PPJoin min-common-token filter (see
        # _ngram_jaccard_bitset) removes the pair-distinct too: after the
        # candidate join the plan is MAP-ONLY (sf0.1 adversarial fixture:
        # 177M raw candidate rows → the old path dedup'd all of them to
        # 48.6M pairs then hash-set-intersected each; this path decides
        # each candidate with ~12 ALU ops and shuffles nothing after the
        # join — measured 25.8s → see OPTIMIZATION_r10.md).
        # Exactness: the vocab index is a bijection
        # (tokens already collision-checked when interned), arrays are
        # distinct-element by construction, so bit_count(a&b) IS
        # |A ∩ B| and union falls out arithmetically — identical rows to
        # the array path, pair for pair. At 100 TB a natural vocabulary
        # blows the gate and the general path below runs instead; docs
        # scale freely here (the broadcast is the <=512-row vocab, never
        # the corpus). Runs directly on STRING tokens — masks replace the
        # arrays, so interning would buy nothing here.
        return _ngram_jaccard_bitset(
            tok_str, dfreq_str, n_vocab, width, threshold, prefix_len, with_sizes
        )
    if interned:
        # general path on interned tokens: the arrays re-derive from the
        # string checkpoint with a cheap per-element xxhash64 transform
        # (never re-tokenizing), and the df counts carry over by hashing
        # the vocabulary-sized dfreq frame — exact because the collision
        # check above proved token → hash is a bijection on this corpus.
        toks = toks_str.select(
            "__id",
            F.transform("__tk", lambda t: F.xxhash64(t)).alias("__tk"),
            "__sz",
        )
        dfreq = dfreq_str.select(F.xxhash64("__t").alias("__t"), "__df")
    else:
        toks = toks_str
        dfreq = dfreq_str
    if max_token_df is not None:
        dfreq = dfreq.filter(F.col("__df") <= max_token_df)
    tok = toks.select("__id", "__sz", F.explode("__tk").alias("__t"))
    ranked = tok.join(dfreq, "__t").withColumn(
        "__rn",
        F.row_number().over(Window.partitionBy("__id").orderBy("__df", "__t")),
    )
    # materialized: consumed by both sides of the candidate self-join
    # (same lazy-localCheckpoint discipline as toks above); repartition
    # BELOW the checkpoint pins the split count the fan-out stage runs at
    # (see the parallelism-pinning note in the docstring)
    pref = (
        ranked.filter(F.col("__rn") <= prefix_len)
        .select("__id", "__t")
        .repartition(width)
        .localCheckpoint(eager=False)
    )
    cand = (
        pref.select(F.col("__id").alias("id_a"), "__t")
        .join(pref.select(F.col("__id").alias("id_b"), "__t"), "__t")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # Size-ratio prefilter (Arasu/Ganti/Kaushik length filter): for sets of
    # sizes sa <= sb the best possible Jaccard is sa/sb (A ⊆ B), so any pair
    # with min_sz < ceil(t * max_sz) cannot reach the threshold. Checking two
    # cached BIGINTs is ~free; array_intersect/array_union walk both shingle
    # arrays per pair — on output-dense corpora (the sf0.1 synthetic
    # vocabulary qualifies 11.7M pairs) skipping the walk is the whole win.
    # Exactness unchanged: the condition is necessary, never sufficient —
    # every surviving pair still gets the exact verify below.
    verified = (
        cand.join(
            toks.select(
                F.col("__id").alias("id_a"),
                F.col("__tk").alias("__tka"),
                F.col("__sz").alias("__sza"),
            ),
            "id_a",
        )
        .join(
            toks.select(
                F.col("__id").alias("id_b"),
                F.col("__tk").alias("__tkb"),
                F.col("__sz").alias("__szb"),
            ),
            "id_b",
        )
        .filter(
            # 1e-9 slack: a pair at EXACTLY min/max == t must survive the
            # prefilter (the product t*max can round up by half an ulp);
            # the slack only lets borderline pairs through to the exact
            # verify — it can never add a false positive to the output.
            F.least("__sza", "__szb").cast("double")
            >= F.lit(threshold - 1e-9) * F.greatest("__sza", "__szb").cast("double")
        )
        .withColumn("__isz", F.size(F.array_intersect("__tka", "__tkb")).cast("bigint"))
        .withColumn("__usz", (F.col("__sza") + F.col("__szb")).cast("bigint") - F.col("__isz"))
        .withColumn(
            "jaccard", F.col("__isz").cast("double") / F.col("__usz").cast("double")
        )
        .filter(F.col("jaccard") >= threshold)
    )
    out = ["id_a", "id_b", F.round("jaccard", 4).alias("jaccard")]
    if with_sizes:
        out += [F.col("__isz").alias("inter_sz"), F.col("__usz").alias("union_sz")]
    return verified.select(*out)


# ------------------------------------------------------------ SimHash

def simhash_expr(text_col: str, bits: int = 64):
    """64-bit SimHash of the token multiset, as a signed long.

    Classic bit-voting: each token votes +1/-1 per bit of its xxhash64;
    signature bit = 1 iff the vote sum is positive.

    Shape: ONE pass over the hashed token array — a single ``aggregate``
    whose state is the array of 64 vote counters, updated per token with
    ``zip_with`` — then one fold packing the counters into the signature
    long. The previous form (64 separate per-bit ``aggregate`` columns
    OR'd together in a Python loop) re-walked the token array per bit and
    generated 64 independent codegen bodies; this is one compact generated
    method — measured 3x cheaper per-core (6.2s → 2.0s single-partition
    over 10k sf0.1 docs, warm) and bit-identical (``shiftleft(1L, 63)``
    wraps to the sign-bit mask exactly like the old ``-(1 << 63)``
    literal). End-to-end at sf0.1 the near-dup pipeline is shuffle-latency
    bound so the local wall-clock barely moves; at 100 TB the per-core
    signature cost is the term that scales. Written as a SQL expression
    because lambda variables can't feed the Python ``shiftright(col,
    int)`` wrapper.

    The SQL tokenizer below MUST stay equivalent to
    ``functions.text.tokens_expr`` (trim → split on \\s+ → drop empties)
    plus a ``lower()`` for case-insensitive voting — the same logical
    tokenizer expressed twice (Column API there, SQL text here); drift
    between them would make SimHash vote on different tokens than every
    other text operator.
    """
    # backtick-quote so column names needing quoting (spaces, dots) work;
    # embedded backticks are escaped by doubling, per Spark identifier rules
    quoted = f"`{text_col.replace('`', '``')}`"
    toks = f"filter(split(trim(lower({quoted})), '\\\\s+'), t -> t != '')"
    return F.expr(
        f"""
        aggregate(
          zip_with(
            aggregate(
              transform({toks}, t -> xxhash64(t)),
              array_repeat(0, {bits}),
              (acc, h) -> zip_with(acc, sequence(0, {bits - 1}),
                            (a, bit) -> a + CAST(shiftright(h, bit) & 1 AS INT) * 2 - 1)
            ),
            sequence(0, {bits - 1}),
            (v, bit) -> IF(v > 0, shiftleft(1L, bit), 0L)
          ),
          0L, (sig, m) -> sig | m)
        """
    )


def simhash_near_duplicates(
    df: DataFrame, text_col: str, id_col: str, hamming_threshold: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share one of 4 16-bit bands
    (guarantees recall for hamming distance <= 3), verified by exact
    hamming distance via ``bit_count(xor)``."""
    sh = ensure_parallelism(df).select(F.col(id_col), simhash_expr(text_col).alias("sig")).cache()
    banded = sh.select(
        F.col(id_col),
        F.col("sig"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sig"), 16 * i).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a = banded.select("band_idx", "band_val", F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    b = banded.select("band_idx", "band_val", F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= hamming_threshold)
    )


# ------------------------------------------- embedding-cosine near-dup (D2e)

def embedding_near_duplicates(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    block_col: Optional[str] = None,
) -> DataFrame:
    """Pairs (id_a < id_b) with cosine similarity >= threshold.

    With ``block_col`` (e.g. a cluster/label/LSH-bucket column) the pair
    space is restricted to same-block pairs — the scale path. Without it,
    this is an all-pairs self-join: fine for small corpora, infeasible at
    100 TB (use LSH bucketing upstream instead).
    """
    keys = [block_col] if block_col else []
    if keys:
        # pin the block join's width: the blocked self-join fans each
        # block out quadratically, but the frame is small in BYTES, so
        # AQE coalesces the join exchange to 1 partition and the cosine
        # verify runs single-task (measured 2.5s of a 2.9s wall on one
        # core at sf0.1). Explicit numPartitions is not coalescible;
        # effective width is min(pool, distinct blocks).
        df = df.repartition(
            df.sparkSession.sparkContext.defaultParallelism,
            F.col(block_col),
        )
    a = df.select(*keys, F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(*keys, F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    joined = a.join(b, keys) if keys else a.crossJoin(b)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_expr(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select(*keys, "id_a", "id_b", F.round("cosine", 5).alias("cosine"))
    )


# ------------------------------------------------------ incremental (D1-inc)

def dedup_incremental(
    batch: DataFrame, corpus: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Exact-dedup a NEW batch against an already-ingested corpus.

    Returns the batch rows that survive both checks: (a) text not already
    in the corpus (anti-join on sha2-256 of the content), (b) first
    occurrence within the batch itself (min id per content hash).

    Scale: this is the incremental-ingest shape a 100 TB pipeline actually
    runs — the corpus side reduces to a pre-computed hash column (store it
    as a bucketed/partitioned hash index table and the anti-join prunes to
    matching buckets; nothing rescans corpus text). The batch-internal
    dedup shuffles only the new data.
    """
    h = F.sha2(F.col(text_col), 256)
    b = batch.withColumn("__h", h)
    seen = corpus.select(h.alias("__h")).distinct()
    w = Window.partitionBy("__h").orderBy(F.col(id_col).asc())
    return (
        b.join(seen, "__h", "left_anti")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__h", "__rn")
    )


# --------------------------------------- repeated-span (boilerplate) mining

def repeated_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document repeated token spans: every word n-gram appearing in
    ≥ ``min_docs`` distinct documents — the detection half of exact
    substring dedup / boilerplate removal (headers, footers, license
    blocks, templated text that near-dup measures dilute away).

    Returns (gram_key, n_docs, first_doc); ``gram_key`` is the first 15
    hex chars of the span's md5 — 60 bits, portable to any SQL engine, and
    the shuffle carries the short key instead of the span text.

    Scale: positional n-grams come from one map-side HOF (``transform``
    over ``sequence`` + ``slice`` — no explode until the grams exist,
    ``array_distinct`` caps a doc's contribution at one vote per span);
    the groupBy partially aggregates before the shuffle, so wire volume is
    (distinct span, partial count) pairs, not one row per occurrence.
    Docs shorter than ``n`` tokens emit nothing (guarded — Spark's
    ``sequence(1, 0)`` DESCENDS, so the unguarded expression would emit
    bogus out-of-range grams for short docs).
    """
    toks = tokens_expr(F.lower(F.col(text_col)))
    d = df.select(F.col(id_col), toks.alias("__t"))
    k = F.size("__t") - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice("__t", i, n)),
    )
    safe = F.when(k >= 1, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )
    g = d.select(F.col(id_col), F.explode(safe).alias("__gram"))
    return (
        g.groupBy(F.substring(F.md5("__gram"), 1, 15).alias("gram_key"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("first_doc"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


# ------------------------------------ span-level dedup (C4-style removal)

def span_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    span_tokens: int = 10,
) -> DataFrame:
    """Global span-level deduplication with document reassembly — the
    C4-style curation step (Raffel et al. 2020 removed all but one
    occurrence of any repeated three-sentence span corpus-wide; this is
    the token-tiled analogue for text without sentence structure).

    Each document is tiled into consecutive ``span_tokens``-token
    segments; a segment occurring anywhere earlier in the corpus (first
    occurrence = lowest (id, position)) is REMOVED from every later
    document, and the surviving segments are rejoined in original order.
    Unlike :func:`repeated_spans` (which only *detects* boilerplate),
    this rewrites the corpus. Returns (id, n_kept, text_clean) for
    documents with at least one surviving span; fully removed documents
    drop out.

    Scale shape — span TEXT never shuffles: the dedup window shuffles
    (id, seg_idx, sha2) triples (~80 B/row regardless of span width);
    survivors collapse per doc to a sorted int array (narrow groupBy);
    the one wide shuffle is re-joining that array to the source rows on
    id, after which reassembly recomputes the segments map-side from the
    doc's own token array (same recompute-over-shuffle trade as the
    MinHash hashed-shingle frame). sha2-256 keys make the dedup
    collision-free at any corpus size, matching :func:`dedup_exact`.

    Guard: ``sequence(0, n_seg - 1)`` DESCENDS when a doc has zero
    tokens, so empty docs are masked to an empty segment array.
    """
    toks = tokens_expr(F.col(text_col))
    d = df.select(F.col(id_col), toks.alias("__tk"))
    n_seg = F.ceil(F.size("__tk") / F.lit(float(span_tokens))).cast("int")
    seq = F.when(F.size("__tk") > 0, F.sequence(F.lit(0), n_seg - 1)).otherwise(
        F.array().cast("array<int>")
    )
    segs = F.transform(
        seq,
        lambda i: F.concat_ws(
            " ", F.slice(F.col("__tk"), i * span_tokens + 1, span_tokens)
        ),
    )
    seg_hashes = d.select(
        F.col(id_col), F.posexplode(segs).alias("seg_idx", "seg")
    ).select(F.col(id_col), "seg_idx", F.sha2("seg", 256).alias("__h"))
    w = Window.partitionBy("__h").orderBy(
        F.col(id_col).asc(), F.col("seg_idx").asc()
    )
    survivors = (
        seg_hashes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("seg_idx")).alias("__keep"))
    )
    rebuilt = F.transform(
        F.col("__keep"),
        lambda i: F.concat_ws(
            " ", F.slice(F.col("__tk"), i * span_tokens + 1, span_tokens)
        ),
    )
    return d.join(survivors, id_col).select(
        F.col(id_col),
        F.size("__keep").cast("long").alias("n_kept"),
        F.array_join(rebuilt, " ").alias("text_clean"),
    )


def minhash_near_duplicates_incremental(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    num_bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicates of NEW documents against an EXISTING corpus — the
    incremental-ingest form of :func:`minhash_near_duplicates`. Returns
    (batch_id, corpus_id, jaccard ≥ threshold).

    Shape: band the batch and the corpus separately, then candidates come
    from an EQUI-join batch-bands × corpus-bands on (band_idx, band_hash)
    — the corpus never self-joins, and at 100 TB its signatures/bands are
    a precomputed stored table (store (band_idx, band_hash, id) bucketed
    on the band key and the probe is a bucket-pruned join); only the new
    batch computes signatures per ingest. Verification re-attaches hashed
    shingle sets for candidate ids only — the corpus side via a
    candidate-sized semi-join-shaped shuffle, never a corpus scan per
    batch. ``max_bucket`` caps degenerate corpus buckets exactly like the
    batch path.

    Band-hash scheme version: v2 (chained ``xxhash64`` fold over the
    band's signature slice, seeded with the band index). v1 was a flat
    ``xxhash64(slice...)`` varargs call — the two produce DIFFERENT
    band-hash values for the same signature. A stored (band_idx,
    band_hash, id) table written under one scheme yields ZERO candidates
    when probed with the other, silently; rebuild stored band tables
    whenever this scheme changes, and version the table name (e.g.
    ``bands_v2``) so a mismatch fails loudly instead.
    """
    width = num_hashes // num_bands

    def banded(df: DataFrame, side: str) -> DataFrame:
        hashed = hashed_shingles(df, text_col, id_col, shingle_n).cache()
        sigs = signatures_from_hashed(hashed, id_col, num_hashes)
        band_hashes = F.transform(
            F.sequence(F.lit(0), F.lit(num_bands - 1)),
            lambda b: F.aggregate(
                F.slice(F.col("signature"), b * width + 1, width),
                b.cast("long"),
                lambda acc, x: F.xxhash64(acc, x),
            ),
        )
        bands = sigs.select(
            F.col(id_col).alias(f"{side}_id"),
            F.posexplode(band_hashes).alias("band_idx", "band_hash"),
        )
        wb = Window.partitionBy("band_idx", "band_hash").orderBy(f"{side}_id")
        bands = bands.withColumn("__bn", F.row_number().over(wb)).filter(
            F.col("__bn") <= max_bucket
        ).drop("__bn")
        return hashed, bands

    b_hashed, b_bands = banded(ensure_parallelism(batch), "batch")
    c_hashed, c_bands = banded(ensure_parallelism(corpus), "corpus")
    cands = (
        b_bands.join(c_bands, ["band_idx", "band_hash"])
        .select("batch_id", "corpus_id")
        .distinct()
    )
    a = b_hashed.select(F.col(id_col).alias("batch_id"), F.col("__hs").alias("sh_a"))
    b = c_hashed.select(F.col(id_col).alias("corpus_id"), F.col("__hs").alias("sh_b"))
    return (
        cands.join(a, "batch_id")
        .join(b, "corpus_id")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("batch_id", "corpus_id", F.round("jaccard", 4).alias("jaccard"))
    )


def simhash60_md5_expr(text_col: str):
    """60-bit md5-basis SimHash fingerprint, as a signed long.

    Same bit-voting as :func:`simhash_expr` but the per-token hash is the
    first 15 md5 hex digits (60 bits — fits a signed long in BOTH
    engines; md5 exists in DuckDB, so fingerprints built this way are
    oracle-replayable, unlike xxhash64's). Keep xxhash64 SimHash as the
    throughput path; this variant buys cross-engine verifiability at the
    same semantics.

    Written as ONE SQL expression for the same reason as
    :func:`simhash_expr`: the Column-API HOF form (Python lambdas +
    call_function shiftright) evaluates interpreted-per-element with no
    common-subexpression elimination — measured 60s+ for 600 sf0.01 docs
    vs sub-second for this compiled form.
    """
    quoted = f"`{text_col.replace('`', '``')}`"
    toks = f"filter(split(trim(lower({quoted})), '\\\\s+'), t -> t != '')"
    return F.expr(
        f"""
        aggregate(
          zip_with(
            aggregate(
              transform({toks},
                        t -> CAST(conv(substr(md5(t), 1, 15), 16, 10) AS BIGINT)),
              array_repeat(0, 60),
              (acc, h) -> zip_with(acc, sequence(0, 59),
                            (a, bit) -> a + CAST(shiftright(h, bit) & 1 AS INT) * 2 - 1)
            ),
            sequence(0, 59),
            (v, bit) -> IF(v > 0, shiftleft(1L, bit), 0L)
          ),
          0L, (sig, m) -> sig | m)
        """
    )


def simhash_hamming_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    num_bands: int = 4,
) -> DataFrame:
    """Manku-style SimHash near-dup pairs (WWW'07): split each 60-bit
    md5-basis fingerprint into ``num_bands`` 15-bit bands; docs sharing
    ANY band become candidates (a pair within Hamming distance d < bands
    must agree exactly on at least one band — the pigeonhole guarantee, so
    recall is 100% by construction for d <= bands-1); verify with
    ``bit_count(xor)``. Returns (id_a, id_b, hamming).

    Scale: fingerprints are a map-only projection; the candidate join is
    an equi-join on (band_idx, band_value) — the pair space is bounded by
    band-bucket sizes, never |corpus|². 15-bit bands keep random
    collisions ~n²/2^15 per band; widen bands as the corpus grows.
    """
    width = 60 // num_bands
    fp_frame = (
        df.select(F.col(id_col), simhash60_md5_expr(text_col).alias("__fp"))
        # materialize: projection collapse would otherwise INLINE the
        # fingerprint expression into every downstream reference (4
        # bands x 2 self-join sides); the frame is (id, long) — tiny at
        # any corpus size relative to the text
        .localCheckpoint(eager=False)
    )
    banded = fp_frame.select(
        F.col(id_col),
        F.col("__fp"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_bands - 1)),
                lambda j: F.call_function(
                    "shiftright", F.col("__fp"), (j * width).cast("int")
                ).bitwiseAND(F.lit((1 << width) - 1)),
            )
        ).alias("__j", "__band"),
    )
    a = banded.select(
        F.col("__j"), F.col("__band"),
        F.col(id_col).alias("id_a"), F.col("__fp").alias("__fa"),
    )
    b = banded.select(
        F.col("__j"), F.col("__band"),
        F.col(id_col).alias("id_b"), F.col("__fp").alias("__fb"),
    )
    cand = (
        a.join(b, ["__j", "__band"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__fa", "__fb")
        .distinct()
    )
    ham = F.bit_count(F.col("__fa").bitwiseXOR(F.col("__fb")))
    return (
        cand.select("id_a", "id_b", ham.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


# ------------------------------------------- value-checked MinHash (D2)

#: Carter-Wegman affine family for the REPLAYABLE MinHash tier: 32 (a, b)
#: pairs from a fixed LCG, baked as literals (the "deterministic planes"
#: convention — no runtime randomness, any engine reproduces them).
def _minhash_lcg(n: int, seed: int) -> list:
    x = seed
    out = []
    for _ in range(n):
        x = (1103515245 * x + 12345) % (1 << 31)
        out.append((x % (1 << 30)) | 1)  # odd, < 2^30, never 0
    return out


MINHASH_MD5_A = _minhash_lcg(32, 7)
MINHASH_MD5_B = _minhash_lcg(32, 42)
_MH_P = 2147483647  # 2^31 - 1
_MH_M = 1 << 30     # 30-bit basis: a*m + b < 2^60 + 2^30, no BIGINT overflow


def md5_minhash_hashed_banded(df, text_col: str, id_col: str):
    """The replayable md5-basis MinHash front end, shared by the batch
    pair join (`minhash_md5_pairs`) and the streaming stream-static tier
    (`streaming/neardup.py`): returns ``(hashed, banded)`` where hashed =
    (id, __ms 60-bit md5 shingle hashes, cached — feeds signatures AND
    verification) and banded = (id, band_idx, band_key) with 8 bands x 4
    rows and plain-string band keys (engine-replayable, unlike xxhash64).
    """
    toks_sql = f"filter(split(trim(lower({text_col})), '\\\\s+'), t -> t != '')"
    sh_sql = (
        "array_distinct(CASE WHEN size(__toks) >= 3 THEN "
        "transform(sequence(0, size(__toks) - 3), "
        "i -> concat_ws(' ', __toks[i], __toks[i+1], __toks[i+2])) "
        "ELSE array(concat_ws(' ', __toks)) END)"
    )
    ms_sql = (
        "transform(__sh, s -> CAST(conv(substr(md5(s), 1, 15), 16, 10)"
        " AS BIGINT))"
    )
    a_lit = "array(" + ",".join(str(v) for v in MINHASH_MD5_A) + ")"
    b_lit = "array(" + ",".join(str(v) for v in MINHASH_MD5_B) + ")"
    sig_sql = (
        f"transform(sequence(0, 31), j -> array_min(transform(__ms, "
        f"m -> ({a_lit}[j] * (m % {_MH_M}) + {b_lit}[j]) % {_MH_P})))"
    )
    band_sql = (
        "transform(sequence(0, 7), b -> concat_ws('|', "
        "transform(slice(__sig, b * 4 + 1, 4), x -> CAST(x AS STRING))))"
    )
    hashed = (
        df.select(F.col(id_col), F.expr(toks_sql).alias("__toks"))
        .select(F.col(id_col), F.expr(sh_sql).alias("__sh"))
        .select(F.col(id_col), F.expr(ms_sql).alias("__ms"))
        .cache()
    )
    banded = hashed.select(
        F.col(id_col), F.expr(sig_sql).alias("__sig")
    ).select(
        F.col(id_col),
        F.posexplode(F.expr(band_sql)).alias("band_idx", "band_key"),
    )
    return hashed, banded


def minhash_md5_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    jaccard_threshold_micro: int = 500000,
    max_bucket: int = 200,
) -> DataFrame:
    """MinHash-LSH near-dup pairs on an md5 hash basis — the VALUE-CHECKED
    twin of ``minhash_near_duplicates`` (same pipeline shape; xxhash64 has
    no SQL replay, md5 does — the same split as ``simhash_expr`` vs
    ``simhash60_md5_expr``).

    Signatures: shingle → md5 → 60-bit int → 30-bit basis m; family j is
    the Carter-Wegman affine hash (a_j * m + b_j) mod (2^31 - 1) with the
    baked ``MINHASH_MD5_A/B`` literals; sig_j = min over shingles. Bands:
    8 bands x 4 rows, band key = the '|'-joined signature slice (a plain
    string — replayable, unlike an engine hash). Candidates: bucket
    equi-join with a ``max_bucket`` deterministic cap. Verification: exact
    Jaccard over the 60-bit md5 shingle sets, kept as an integer micro
    ratio (inter*1e6 // union) compared against the threshold WITHOUT
    division — every value in the result is integer-exact cross-engine.

    Shape mirrors the throughput tier: tokenize→shingle→hash is ONE
    compiled SQL expression projected once and cached (HOF lambdas via the
    Column API interpret per element; md5-per-shingle must not recompute
    per family reference); signatures are map-only; the only corpus-sized
    shuffles are the banded (band, key, id) exchange and the verify
    semi-join. 100 TB: identical argument to minhash_near_duplicates —
    bucketed candidates with a skew cap, no all-pairs anywhere.
    """
    hashed, banded = md5_minhash_hashed_banded(df, text_col, id_col)
    wb = Window.partitionBy("band_idx", "band_key").orderBy(F.col(id_col))
    capped = banded.withColumn("__bn", F.row_number().over(wb)).filter(
        F.col("__bn") <= max_bucket
    )
    # NOT checkpointed (r10, measured both ways): unlike the xxhash64
    # twin (minhash_lsh_candidates, where both self-join sides re-ran the
    # whole scan→signature pipeline), `hashed` is cached here so the md5
    # shingle fold is shared already — only the cheap Carter-Wegman sig
    # fold duplicates across the two sides, and a capped-band checkpoint
    # (repartition exchange + store + read per run) measured ~0.8 s
    # SLOWER warm at sf0.1 (2.3-3.0 s → 3.1-3.6 s).
    cand = (
        capped.select("band_idx", "band_key", F.col(id_col).alias("id_a"))
        .join(
            capped.select(
                "band_idx", "band_key", F.col(id_col).alias("id_b")
            ),
            ["band_idx", "band_key"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = hashed.select(F.col(id_col).alias("id_a"), F.col("__ms").alias("ms_a"))
    b = hashed.select(F.col(id_col).alias("id_b"), F.col("__ms").alias("ms_b"))
    inter = F.size(F.array_intersect("ms_a", "ms_b")).cast("bigint")
    uni = (
        F.size("ms_a").cast("bigint") + F.size("ms_b").cast("bigint") - inter
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("__i", inter)
        .withColumn("__u", uni)
        .filter(
            F.col("__i") * F.lit(1000000)
            >= F.lit(jaccard_threshold_micro) * F.col("__u")
        )
        .select(
            "id_a",
            "id_b",
            F.expr("CAST(__i * 1000000 AS BIGINT) DIV __u")
            .cast("bigint")
            .alias("jaccard_micro"),
        )
    )


def hamming_pairs_from_fp(
    fp_frame: DataFrame,
    id_col: str,
    fp_col: str,
    bits: int = 60,
    max_hamming: int = 3,
    num_bands: int = 4,
) -> DataFrame:
    """Banded Hamming pair join over PRECOMPUTED fingerprints — the
    band/verify half of `simhash_hamming_pairs`, reusable by any
    fingerprint source (SimHash text, image dHash, audio chroma hashes).
    Pigeonhole recall: a pair within Hamming d <= num_bands-1 agrees
    exactly on >= 1 band, so banding loses nothing at the default
    (d=3, 4 bands). Returns (id_a, id_b, hamming).

    Scale: the candidate join is an equi-join on (band_idx, band_value);
    pair space is bounded by band-bucket widths, never |corpus|²; the
    verify pass touches candidate id/fp rows only.
    """
    width = bits // num_bands
    banded = fp_frame.select(
        F.col(id_col),
        F.col(fp_col).alias("__fp"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_bands - 1)),
                lambda j: F.call_function(
                    "shiftright", F.col(fp_col), (j * width).cast("int")
                ).bitwiseAND(F.lit((1 << width) - 1)),
            )
        ).alias("__j", "__band"),
    )
    a = banded.select(
        F.col("__j"), F.col("__band"),
        F.col(id_col).alias("id_a"), F.col("__fp").alias("__fa"),
    )
    b = banded.select(
        F.col("__j"), F.col("__band"),
        F.col(id_col).alias("id_b"), F.col("__fp").alias("__fb"),
    )
    cand = (
        a.join(b, ["__j", "__band"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__fa", "__fb")
        .distinct()
    )
    ham = F.bit_count(F.col("__fa").bitwiseXOR(F.col("__fb")))
    return (
        cand.select("id_a", "id_b", ham.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
