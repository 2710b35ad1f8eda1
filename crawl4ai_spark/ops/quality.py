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


# -- Gopher document-quality rules (the non-repetition half) -----------------

# Rae et al. 2021 App. A1.1 thresholds
GOPHER_RULE_MIN_WORDS = 50
GOPHER_RULE_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_WORD_RATIO = 0.10
GOPHER_MAX_BULLET_LINE_FRAC = 0.90
GOPHER_MAX_ELLIPSIS_LINE_FRAC = 0.30
GOPHER_MIN_ALPHA_WORD_FRAC = 0.80
GOPHER_MIN_STOP_HITS = 2
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_rules(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """The full Gopher document-quality rule set (Rae et al. 2021
    App. A1.1) — the complement of :func:`gopher_signals`'s repetition
    rules: word-count bounds, mean word length, symbol-to-word ratio
    ('#' and '...'), bullet-started and ellipsis-ended line fractions,
    alphabetic-word fraction, and the required-stop-word rule.

    One per-row projection, ZERO shuffle (the cheapest stage of the
    curation stack — run it first to shrink everything downstream).
    Expressions are engine-portable (whitespace split, substring
    counts, LIKE-style prefix/suffix tests) so the op has an exact
    DuckDB oracle. Fractions rounded to 6dp.

    Output: (doc_id, n_words, mean_word_len, symbol_word_ratio,
    bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
    n_stop_hits, keep).
    """
    t = F.col(text_col)
    # split keeps leading/trailing empty strings (split('a b\n','\s+')
    # -> ['a','b','']): a phantom zero-length "word" would skew the
    # word count past a gate boundary and dilute mean length and the
    # alpha fraction, so empties are filtered — Gopher counts words,
    # not separators
    words = F.filter(F.split(t, r"\s+"), lambda w: w != "")
    lines = F.split(t, "\n")
    n_words = F.size(words).cast("long")
    n_lines = F.size(lines).cast("double")
    mean_len = F.round(
        F.aggregate(words, F.lit(0).cast("long"),
                    lambda a, w: a + F.length(w)).cast("double")
        / n_words.cast("double"), 6)
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ellipsis = (F.length(t)
                  - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
    symbol_ratio = F.round((n_hash + n_ellipsis).cast("double")
                           / n_words.cast("double"), 6)
    bullet_frac = F.round(
        F.size(F.filter(lines, lambda l: l.startswith("- ")
                        | l.startswith("* "))).cast("double") / n_lines, 6)
    ellipsis_frac = F.round(
        F.size(F.filter(lines, lambda l: l.endswith("..."))).cast("double")
        / n_lines, 6)
    alpha_frac = F.round(
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast("double")
        / n_words.cast("double"), 6)
    # Rae et al. count stop-word OCCURRENCE, not exact token match: a
    # doc whose stop words all carry sentence punctuation ("The", "of,",
    # "to.") must still pass the >=2-hits gate, so tokens are
    # lower-cased and stripped of trailing punctuation before the test
    # (ADVICE r4: the exact-match form was stricter than the paper)
    norm_words = F.transform(
        words, lambda w: F.regexp_replace(F.lower(w), "[^a-z0-9]+$", ""))
    stop_hits = sum(
        (F.array_contains(norm_words, sw).cast("int")
         for sw in GOPHER_STOP_WORDS),
        F.lit(0),
    ).cast("long")

    out = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_word_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.alias("n_stop_hits"),
    )
    keep = (
        F.col("n_words").between(GOPHER_RULE_MIN_WORDS, GOPHER_RULE_MAX_WORDS)
        & F.col("mean_word_len").between(GOPHER_MIN_MEAN_WORD_LEN,
                                         GOPHER_MAX_MEAN_WORD_LEN)
        & (F.col("symbol_word_ratio") <= GOPHER_MAX_SYMBOL_WORD_RATIO)
        & (F.col("bullet_line_frac") <= GOPHER_MAX_BULLET_LINE_FRAC)
        & (F.col("ellipsis_line_frac") <= GOPHER_MAX_ELLIPSIS_LINE_FRAC)
        & (F.col("alpha_word_frac") >= GOPHER_MIN_ALPHA_WORD_FRAC)
        & (F.col("n_stop_hits") >= GOPHER_MIN_STOP_HITS)
    )
    return out.withColumn("keep", keep)


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
