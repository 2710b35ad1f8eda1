"""Text-analysis operators over document tables.

Everything here is pure Catalyst column algebra (whole-stage codegen,
no Python in the hot path): language-ID (stopword-marker heuristic),
quality scoring (length / stopword / uniqueness ratios), token
counting, document fingerprinting (content hash + min-shingle hash),
and the chunking strategies of the reference
(/root/reference/crawl4ai/chunking_strategy.py:28-256 — fixed-length
word chunks and sliding windows re-expressed as higher-order array
functions + posexplode instead of per-doc Python loops).

Portability note: the 64-bit hash used throughout is
``conv(substr(md5(x),1,15),16,10)`` — 60 bits of md5, reproducible
bit-for-bit in any engine with md5 (DuckDB, Trino, ...), unlike
engine-private hashes (xxhash64 seeds differ per engine). At scale the
cost vs xxhash64 is irrelevant next to the shuffle; where parity does
not matter (bloom seen-set) the engine uses native xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/stopword language-ID
# heuristic. Deterministic, tiny, broadcast-free (inlined literals).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "y", "es"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("de5", "shi4", "le5", "he2", "zai4"),
}

STOPWORDS = ("the", "a", "of", "and", "is", "to", "in", "on", "for", "with")


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def hash64(col, seed: int | str | None = None) -> Column:
    """Cross-engine 60-bit hash: conv(substr(md5(x),1,15),16,10)."""
    c = _c(col)
    if seed is not None:
        c = F.concat(F.lit(f"{seed}:"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def tokens(col) -> Column:
    """Whitespace tokenization (single-space corpora; BPE-ish regex
    variant below for messy text)."""
    return F.split(_c(col), " ")


def bpe_ish_tokens(col) -> Column:
    """Regex sub-word-ish tokenization: letter runs, digit runs, and
    single punctuation marks each become tokens (a cheap stand-in for
    BPE pre-tokenization)."""
    return F.expr(
        f"regexp_extract_all({_sql(col)}, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)"
    )


def _sql(col) -> str:
    # column name passthrough for expr-based builders
    return col if isinstance(col, str) else col._jc.toString()


def token_count(col) -> Column:
    return F.size(tokens(col))


def unique_token_count(col) -> Column:
    return F.size(F.array_distinct(tokens(col)))


def stopword_hits(col, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    return F.size(F.filter(tokens(col), lambda t: t.isin(*stopwords)))


def quality_score(col, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """Composite document quality in [0,1]:
       0.4 * min(1, n_tokens/100)            (enough content)
     + 0.3 * unique/total tokens             (not boilerplate/repetition)
     + 0.3 * min(1, 5 * stopword_ratio)      (natural-language-ness)
    Mirrors the reference's SEO/quality scoring style (pure arithmetic,
    deep_crawling/filters.py:576-687) applied to body text."""
    toks = tokens(col)
    n = F.size(toks).cast("double")
    uniq = F.size(F.array_distinct(toks)).cast("double")
    stop = F.size(F.filter(toks, lambda t: t.isin(*stopwords))).cast("double")
    score = (
        0.4 * F.least(F.lit(1.0), n / 100.0)
        + 0.3 * F.when(n > 0, uniq / n).otherwise(0.0)
        + 0.3 * F.least(F.lit(1.0), 5.0 * F.when(n > 0, stop / n).otherwise(0.0))
    )
    return F.round(score, 6)


def lang_id(col, markers: dict[str, tuple[str, ...]] | None = None) -> Column:
    """Stopword-marker language ID: argmax of marker hits per language,
    ties broken alphabetically, zero hits -> 'und'."""
    markers = markers or LANG_MARKERS
    toks = tokens(col)
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang in sorted(markers):  # alphabetical scan; strict > keeps first
        hits = F.size(F.filter(toks, lambda t: t.isin(*markers[lang])))
        is_better = hits > best_hits
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(is_better, hits).otherwise(best_hits)
    return best_lang


def word_ngrams(col, n: int) -> Column:
    """Word n-gram shingles as strings ('a b c' for n=3). Docs shorter
    than n yield one (short) shingle — guards Spark's descending
    sequence(1,0) edge and keeps every doc fingerprintable."""
    toks = tokens(col)
    starts = F.sequence(F.lit(1), F.greatest(F.lit(1), F.size(toks) - (n - 1)))
    return F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def content_fingerprint(col) -> Column:
    """Whole-document content hash (the reference's xxh64 content hash,
    utils.py:2701-2703, in the cross-engine hash family)."""
    return hash64(col)


def shingle_fingerprint(col, n: int = 3) -> Column:
    """Min-hash of word n-gram shingles: a 1-permutation MinHash, i.e.
    a rolling-window document fingerprint robust to local edits."""
    return F.array_min(F.transform(word_ngrams(col, n), lambda s: hash64(s)))


# -- chunking (chunking_strategy.py:28-256) ---------------------------------

def chunk_fixed_words(df: DataFrame, text_col: str, chunk_size: int,
                      out_col: str = "chunk") -> DataFrame:
    """FixedLengthWordChunking: consecutive chunk_size-word chunks.
    posexplode keeps the chunk index (chunk_id) for downstream order."""
    toks = tokens(text_col)
    starts = F.sequence(
        F.lit(1), F.greatest(F.lit(1), F.size(toks)), F.lit(chunk_size)
    )
    chunks = F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, chunk_size)))
    return df.select(
        "*", F.posexplode(chunks).alias("chunk_id", out_col)
    )


def chunk_sliding_window(df: DataFrame, text_col: str, window: int, step: int,
                         out_col: str = "chunk") -> DataFrame:
    """SlidingWindowChunking: window-size word chunks every `step` words
    (chunking_strategy.py:180-214). Short docs yield themselves whole."""
    toks = tokens(text_col)
    last_start = F.greatest(F.lit(1), F.size(toks) - (window - 1))
    starts = F.sequence(F.lit(1), last_start, F.lit(step))
    chunks = F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, window)))
    return df.select("*", F.posexplode(chunks).alias("chunk_id", out_col))


def regex_extract_tokens(df: DataFrame, text_col: str, pattern: str,
                         label: str) -> DataFrame:
    """RegexExtractionStrategy (extraction_strategy.py:1706-1865) as
    native regexp_extract_all + aggregation: (doc, label, value, n)."""
    return (
        df.select(
            F.col("doc_id"),
            # pattern as a literal Column — no SQL-string interpolation,
            # so quotes/backslashes in patterns need no caller escaping
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))
            ).alias("value"),
        )
        .groupBy("doc_id", "value")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("label", F.lit(label))
    )
