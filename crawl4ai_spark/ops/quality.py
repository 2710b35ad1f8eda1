"""Corpus-quality operators for training-data curation.

Three first-class operators a 100 TB text pipeline runs between the
crawl and the trainer, none of which the reference implements (its
quality gate stops at BM25/pruning content filters —
/root/reference/crawl4ai/content_filter_strategy.py) but which belong
to the same curation stage:

- ``gopher_signals``   repetition-based quality signals in the style of
  the Gopher rules (Rae et al. 2021, "Scaling Language Models", App. A):
  top n-gram mass fractions and duplicate-word fraction, plus a
  deterministic keep/drop decision.
- ``ngram_contamination``   benchmark decontamination: flag corpus docs
  sharing any word-n-gram with a benchmark/eval set (GPT-3 App. C
  style, n=8 here), as a hash join — never a cross join.
- ``redact_pii_expr``   deterministic PII redaction (email / phone /
  IPv4) as pure Catalyst regexp columns with match counts.

Scale posture
-------------
* n-grams are formed per row with higher-order functions
  (sequence + slice + array_join) — ZERO shuffle to build grams; the
  only exchanges are the per-(doc, gram) count (keyed by doc, no hot
  keys) and the per-doc rollup.
* contamination joins corpus grams against the (small) benchmark gram
  set on a 60-bit md5-derived hash — broadcast, so the corpus never
  shuffles; collisions are astronomically unlikely and err toward
  flagging (conservative for decontamination).
* PII redaction is whole-stage-codegen regexp — no Python, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawl4ai_spark.ops.text import hash64, spread_input, tokens

# -- Gopher-style repetition signals -----------------------------------------

# keep/drop thresholds, calibrated so both classes occur on the
# synthetic corpus (real Gopher: top-2-gram 0.20, dup-word ~0.63)
GOPHER_MAX_TOP_WORD_FRAC = 0.20
GOPHER_MAX_TOP_BIGRAM_FRAC = 0.08
GOPHER_MAX_DUP_WORD_FRAC = 0.60
GOPHER_MIN_WORDS = 30


def _grams(words: Column, n: int) -> Column:
    """All word n-grams of a token array, shuffle-free (HOF).

    ``transform`` 1-arg lambdas only (2-arg = (element, index) trap);
    the index comes from ``sequence`` instead.
    """
    if n == 1:
        return words

    # guard: sequence(1, 0) is DESCENDING [1,0] in Spark, not empty —
    # short docs must yield an empty gram array explicitly.
    # The words array is let-bound via a single-element transform (see
    # ops/text.word_ngrams): a HOF re-evaluates captured children per
    # element, so slicing the raw expression would recompute it once
    # per output gram — O(L^2) when callers pass tokens(text).
    def _of(t):
        return F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (n - 1)),
                lambda i: F.array_join(F.slice(t, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.flatten(F.transform(F.array(words), _of))


def gram_counts(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", ns: tuple = (1, 2, 3)) -> DataFrame:
    """(id, n, gram, c) — per-doc n-gram term frequencies for every n in
    ``ns``, relational: ONE posexplode of the token array, window
    ``lead``s to extend grams (stays in codegen — the HOF slice/join
    form drops to interpreted eval and is ~20x slower), one stacked
    explode, one (id, n, gram) aggregation. Both shuffles are keyed by
    doc id — no hot keys at corpus scale."""
    from pyspark.sql import Window

    w = spread_input(df, id_col).select(
        F.col(id_col).cast("long").alias("id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "word"),
    )
    win = Window.partitionBy("id").orderBy("pos")
    # leads materialized in their own projection: window expressions
    # are not allowed inside the explode's array
    w = w.select(
        "id", "word",
        *[F.lead("word", k).over(win).alias(f"w{k}")
          for k in range(1, max(ns))],
    )

    def gram_of(n: int) -> Column:
        if n == 1:
            return F.col("word")
        parts = [F.col("word")] + [F.col(f"w{k}") for k in range(1, n)]
        # null lead (doc tail) -> null gram, filtered below; concat_ws
        # would silently SKIP nulls, hence the explicit guard
        return F.when(
            F.col(f"w{n - 1}").isNotNull(), F.concat_ws(" ", *parts)
        )

    stacked = w.select(
        "id",
        F.explode(F.array(*[
            F.struct(F.lit(n).alias("n"), gram_of(n).alias("gram"))
            for n in ns
        ])).alias("g"),
    ).select("id", F.col("g.n").alias("n"), F.col("g.gram").alias("gram")) \
     .where(F.col("gram").isNotNull())
    return stacked.groupBy("id", "n", "gram").agg(F.count("*").alias("c"))


def gopher_signals(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-doc repetition/quality signals + keep decision.

    Output: (doc_id, n_words, top_word_frac, top_bigram_frac,
    top_trigram_frac, dup_word_frac, keep). Fractions are top-gram
    count mass over total grams of that size, rounded to 6dp so the
    values are engine-portable.
    """
    gc = gram_counts(df, text_col, id_col)
    per_n = gc.groupBy("id", "n").agg(
        F.max("c").alias("top_c"),
        F.sum("c").alias("total"),
        F.count("*").alias("n_distinct"),
    )

    def pick(n: int, col: str) -> Column:
        return F.max(F.when(F.col("n") == n, F.col(col)))

    frac = lambda top, tot: F.round(top.cast("double") / tot.cast("double"), 6)
    sig = per_n.groupBy("id").agg(
        pick(1, "total").cast("long").alias("n_words"),
        frac(pick(1, "top_c"), pick(1, "total")).alias("top_word_frac"),
        frac(pick(2, "top_c"), pick(2, "total")).alias("top_bigram_frac"),
        frac(pick(3, "top_c"), pick(3, "total")).alias("top_trigram_frac"),
        F.round(1.0 - pick(1, "n_distinct").cast("double")
                / pick(1, "total").cast("double"), 6).alias("dup_word_frac"),
    )
    keep = (
        (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("top_word_frac") <= GOPHER_MAX_TOP_WORD_FRAC)
        & (F.col("top_bigram_frac") <= GOPHER_MAX_TOP_BIGRAM_FRAC)
        & (F.col("dup_word_frac") <= GOPHER_MAX_DUP_WORD_FRAC)
    )
    return sig.select(
        F.col("id").alias("doc_id"), "n_words", "top_word_frac",
        "top_bigram_frac", "top_trigram_frac", "dup_word_frac",
        keep.alias("keep"),
    )


# -- benchmark decontamination ------------------------------------------------

def doc_grams(df: DataFrame, n: int, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """(id, gram_hash) — DISTINCT word-n-gram 60-bit hashes per doc."""
    return (
        spread_input(df, id_col).select(
            F.col(id_col).cast("long").alias("id"),
            F.explode(_grams(tokens(F.col(text_col)), n)).alias("gram"),
        )
        .select("id", hash64("gram").alias("gram_hash"))
        .distinct()
    )


def ngram_contamination(corpus: DataFrame, benchmark: DataFrame, n: int = 8,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Flag corpus docs sharing any word-n-gram with the benchmark set.

    Output per CORPUS doc: (doc_id, n_grams, n_hit, hit_frac,
    contaminated). The benchmark gram set is distinct + broadcast, so
    the corpus side is a map-side semi-join probe — at 100 TB the only
    shuffle is the per-doc distinct/rollup (keyed by doc_id).
    """
    cg = doc_grams(corpus, n, text_col, id_col)
    bench = F.broadcast(
        doc_grams(benchmark, n, text_col, id_col)
        .select("gram_hash").distinct()
    )
    hit = cg.join(bench, "gram_hash", "left_semi") \
            .groupBy("id").agg(F.count("*").alias("n_hit"))
    per = cg.groupBy("id").agg(F.count("*").alias("n_grams"))
    return (
        per.join(hit, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            F.col("n_grams").cast("long").alias("n_grams"),
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
            F.round(F.coalesce(F.col("n_hit"), F.lit(0)).cast("double")
                    / F.col("n_grams").cast("double"), 6).alias("hit_frac"),
            (F.coalesce(F.col("n_hit"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


# -- PII redaction -------------------------------------------------------------

# Patterns restricted to syntax that means the same thing in Java
# regex (Spark) and RE2 (DuckDB): char classes, bounded repeats, \b.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "phone": (r"\b555-[0-9]{4}\b", "[PHONE]"),
    "ip": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
}
# redaction order matters: emails first (their local parts contain
# dots/digits), then phones, then bare IPv4s
PII_ORDER = ("email", "phone", "ip")


def redact_pii(col: Column) -> dict[str, Column]:
    """{'redacted': Column, 'n_email': ..., 'n_phone': ..., 'n_ip': ...}
    — counts are measured on the ORIGINAL text, then patterns are
    replaced in PII_ORDER so overlapping classes don't double-redact."""
    out: dict[str, Column] = {}
    red = col
    for name in PII_ORDER:
        pat, rep = PII_PATTERNS[name]
        out[f"n_{name}"] = F.regexp_count(col, F.lit(pat)).cast("long")
        red = F.regexp_replace(red, pat, rep)
    out["redacted"] = red
    return out
