"""Text expression helpers (SURVEY.md §2.11 D3) — all JVM-side built-ins.

Tokenization, token/char stats, quality scoring, language-ID heuristic and
document fingerprinting as composable Column expressions. Python never touches
the hot path; everything stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: a tiny multi-language stopword list for the quality/lang heuristics
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def tokens_expr(text: Column) -> Column:
    """Whitespace tokenization → array<string>; empty string → empty array."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != F.lit(""))


def token_count_expr(text: Column) -> Column:
    """Whitespace token count, as int."""
    return F.size(tokens_expr(text))


def bpe_ish_token_count_expr(text: Column) -> Column:
    """BPE-ish token estimate: count of word-piece / punctuation matches.

    Uses the common GPT-2-style pre-tokenizer shape (word, number, punct runs)
    approximated with a regex split — a cheap, deterministic proxy for real BPE
    (the actual tokenizer libs are not in this container).
    """
    pieces = F.filter(
        F.split(text, r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
        lambda t: F.trim(t) != F.lit(""),
    )
    return F.size(pieces)


def punct_ratio_expr(text: Column) -> Column:
    """Fraction of characters that are punctuation, as double."""
    stripped = F.regexp_replace(text, r"[^\p{Punct}]", "")
    return F.length(stripped).cast("double") / F.greatest(
        F.length(text).cast("double"), F.lit(1.0)
    )


def stopword_ratio_expr(text: Column) -> Column:
    """Fraction of whitespace tokens that are stopwords, as double."""
    toks = tokens_expr(F.lower(text))
    stops = F.filter(toks, lambda t: t.isin(*STOPWORDS))
    return F.size(stops).cast("double") / F.greatest(
        F.size(toks).cast("double"), F.lit(1.0)
    )


def quality_score_expr(text: Column) -> Column:
    """Composite quality score in [0,1]: length-normalized, penalizing
    punctuation-heavy and stopword-free (word-salad) text.

    Deliberately simple arithmetic over the ratio expressions so it is
    oracle-expressible in ANSI SQL.
    """
    length_score = F.least(F.length(text).cast("double") / F.lit(500.0), F.lit(1.0))
    return F.round(
        0.5 * length_score
        + 0.25 * (1.0 - punct_ratio_expr(text))
        + 0.25 * F.least(stopword_ratio_expr(text) * 4.0, F.lit(1.0)),
        4,
    )


#: marker stopwords per language for the n-gram/marker-count lang-ID
#: heuristic (deliberately tiny + deterministic so it is SQL-expressible)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "ist"),
    "fr": ("le", "la", "et", "est"),
}


def lang_marker_score_expr(text: Column, lang: str) -> Column:
    """Count of tokens that are marker words for ``lang``, as long."""
    toks = tokens_expr(F.lower(text))
    hits = F.filter(toks, lambda t: t.isin(*LANG_MARKERS[lang]))
    return F.size(hits).cast("long")


def lang_id_expr(text: Column) -> Column:
    """Marker-count language detector with deterministic tie-breaking
    (priority = declaration order in LANG_MARKERS; all-zero → 'und').

    A real detector would use char n-gram profiles; the *engine* surface —
    a deterministic per-row classifier expression the optimizer can
    pipeline — is identical.
    """
    scores = {lang: lang_marker_score_expr(text, lang) for lang in LANG_MARKERS}
    langs = list(LANG_MARKERS)
    expr = F.lit("und")
    # build the CASE chain back-to-front so earlier langs win ties
    for lang in reversed(langs):
        cond = scores[lang] > 0
        for other in langs:
            if other != lang and langs.index(other) < langs.index(lang):
                cond = cond & (scores[lang] > scores[other])
            elif other != lang:
                cond = cond & (scores[lang] >= scores[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def fingerprint_expr(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lower-cased text. Oracle-expressible (DuckDB md5)."""
    normalized = F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))
    return F.md5(normalized)


def chunk_text(df, text_col: str, id_col: str, width: int = 200, carry_cols=()):
    """Fixed-width character chunking: one output row per ``width``-char
    window of ``text_col``, indexed 1..ceil(len/width) as ``chunk_idx``.

    Empty/short docs still yield exactly one chunk (possibly empty) so no
    document silently disappears from the training set. ``carry_cols``
    ride along on every chunk row (metadata like lang/quality) — carried
    through the generate instead of joined back, so the op stays
    shuffle-free: a per-row generate (sequence+explode) that inherits the
    scan's partitioning. At 100 TB output size ~= input size, so pair it
    with a repartition before any downstream groupBy if chunk counts are
    skewed.
    """
    n_chunks = F.greatest(
        F.ceil(F.length(text_col) / F.lit(float(width))).cast("long"), F.lit(1)
    )
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.explode(F.sequence(F.lit(1).cast("long"), n_chunks)).alias("chunk_idx"),
        F.col(text_col),
    ).select(
        F.col(id_col),
        "chunk_idx",
        *[F.col(c) for c in carry_cols],
        F.substring(
            F.col(text_col), ((F.col("chunk_idx") - 1) * width + 1).cast("int"), width
        ).alias("chunk"),
    )


def chunk_text_overlap(
    df, text_col: str, id_col: str, width: int = 200, stride: int = 150, carry_cols=()
):
    """Strided character chunking with overlap (the RAG / context-window
    prep shape): windows start every ``stride`` chars and span ``width``,
    so consecutive chunks share ``width - stride`` characters of context.
    ``stride == width`` degenerates to :func:`chunk_text`'s disjoint
    windows. Chunks index 1..n with n = ceil((len - width) / stride) + 1
    for len > width, else 1 — every document yields at least one chunk
    (possibly empty/short) so nothing silently disappears.

    Same scale shape as :func:`chunk_text`: a per-row generate
    (sequence+explode) that inherits the scan's partitioning — zero
    shuffles; output grows by ~width/stride x relative to the corpus.
    """
    if stride < 1 or width < 1:
        raise ValueError("width and stride must be >= 1")
    ln = F.length(text_col)
    n_chunks = F.when(
        ln <= width, F.lit(1).cast("long")
    ).otherwise(F.ceil((ln - width) / F.lit(float(stride))).cast("long") + 1)
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.explode(F.sequence(F.lit(1).cast("long"), n_chunks)).alias("chunk_idx"),
        F.col(text_col),
    ).select(
        F.col(id_col),
        "chunk_idx",
        *[F.col(c) for c in carry_cols],
        F.substring(
            F.col(text_col),
            ((F.col("chunk_idx") - 1) * stride + 1).cast("int"),
            width,
        ).alias("chunk"),
    )
