"""N-gram language-model perplexity filter (CCNet-style, Wenzek et al.
2020 "CCNet: Extracting High Quality Monolingual Datasets from Web
Crawl Data").

CCNet's quality signal: train a small LM on a clean reference corpus,
score every crawled document's perplexity under it, and split each
language into head / middle / tail terciles — downstream pipelines
keep the head (most reference-like) and drop or down-weight the tail.
Here the LM is an add-lambda-smoothed conditional bigram model over
whitespace tokens (the container has no KenLM; the relational shape —
train counts, broadcast-able model dim, per-doc join+sum, per-language
tercile — is the part that matters at 100 TB and is identical for any
backoff order):

    P(w | prev) = (c2(prev w) + lam) / (c1(prev) + lam * V)

with V = |train vocabulary| + 1 (one OOV slot), and two backoff rungs
at score time: a bigram unseen in training but with a seen context
scores the OOV numerator ln(lam / (c1(prev) + lam*V)); a bigram whose
context is itself unseen scores the uniform ln(lam / (lam*V)) = -ln V.

Numeric determinism (the ops/dsir.py discipline): every log-prob is a
SCALED INTEGER — round(ln(p) * 1e6) as BIGINT, computed once per
DISTINCT training gram / context (model-vocabulary cardinality, not
corpus cardinality) — so each document's NLL is an exact BIGINT sum,
association-order independent and bit-equal cross-engine. The only
float ops are one ln + one round per model row.

Scale shape (100 TB posture):
  - training counts: one groupBy per pass over the clean corpus
    (map-side combined; the clean slice is a small fraction of raw);
  - the model is two dim tables (bigram lp, context OOV lp) + one
    1-row constants dim — joined onto PRE-AGGREGATED per-doc gram
    counts (doc_id x distinct-gram, far smaller than the exploded
    stream), broadcast when small, plain shuffle joins otherwise (AQE
    decides; no collect, no driver scalars — V and the unknown-context
    log-prob ride a broadcast 1-row crossJoin);
  - per-doc score: doc-keyed aggregation only;
  - terciles: ntile(3) windowed PER LANGUAGE (exactly CCNet's
    per-language buckets) — strata parallelize, each stratum sorts
    one doc-keyed row per document inside its window partition
    (the mixture_sample / pack_sequences posture; a hot language is
    the documented bound, CCNet itself runs ~100 language strata).

Reference parity: the reference engine has no LM scoring (it crawls);
this is the training-data curation layer the task brief lists as
first-class, alongside ops/quality.py (Gopher heuristics) and
ops/dsir.py (importance weighting): heuristics gate, perplexity
buckets, DSIR targets — the standard three-signal curation stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawl4ai_spark.ops.text import hash64 as _hash64  # noqa: F401 (API kin)
from crawl4ai_spark.ops.text import spread_input, tokens, word_ngrams

LM_SCALE = 1_000_000


def _lp_int(num, den):
    """round(ln(num/den) * LM_SCALE) as BIGINT — the one float op,
    applied per model row."""
    return F.round(F.log(num / den) * LM_SCALE).cast("long")


def lm_train(
    clean: DataFrame,
    text_col: str = "text",
    lam: float = 0.5,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the smoothed bigram model on the clean corpus.

    Returns (bigram_dim, context_dim, consts):
      bigram_dim:  (g STRING, lp BIGINT)        — ln P(w|prev), scaled
      context_dim: (w STRING, lp_oov BIGINT)    — unseen-bigram rung
      consts:      1 row (v DOUBLE, lp_unk BIGINT) — unseen-context rung

    Cache lifetime: the token-count frame and consts are persist()ed
    deliberately — they ARE the trained model (vocabulary-sized) and
    every returned dim reads them. The blocks release when the dims
    are garbage-collected (ContextCleaner) or the session ends;
    callers training many disjoint models in one session should drop
    the returned frames between trainings.
    """
    wide = spread_input(clean, text_col)
    # c1 is referenced three times (consts, bigram_dim's context join,
    # context_dim) and consts twice more as a broadcast side — without a
    # persist each reference re-runs the clean-corpus token explode +
    # aggregation (the ops/dsir.py extra-corpus-scans defect). Both
    # frames are model-vocabulary-sized, so caching them is free.
    c1 = (
        wide.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).cast("double").alias("c1"))
        .persist()
    )
    c2 = (
        wide.select(F.explode(word_ngrams(text_col, 2)).alias("g"))
        .groupBy("g").agg(F.count(F.lit(1)).cast("double").alias("c2"))
    )
    # V = train vocab + 1 OOV slot, as a 1-row dim (no driver count job)
    consts = c1.agg((F.count(F.lit(1)) + 1).cast("double").alias("v")).select(
        "v", _lp_int(F.lit(lam), F.lit(lam) * F.col("v")).alias("lp_unk")
    ).persist()
    # every bigram's context word is itself a training token, so the
    # join is inner and loses nothing
    c2p = c2.withColumn("prev", F.split(F.col("g"), " ").getItem(0))
    bigram_dim = (
        c2p.join(c1, c2p["prev"] == c1["w"])
        .crossJoin(F.broadcast(consts))
        .select(
            "g",
            _lp_int(F.col("c2") + lam, F.col("c1") + lam * F.col("v")).alias("lp"),
        )
    )
    context_dim = (
        c1.crossJoin(F.broadcast(consts))
        .select(
            "w",
            _lp_int(F.lit(lam), F.col("c1") + lam * F.col("v")).alias("lp_oov"),
        )
    )
    return bigram_dim, context_dim, consts


def perplexity_scores(
    corpus: DataFrame,
    bigram_dim: DataFrame,
    context_dim: DataFrame,
    consts: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every corpus doc under the trained model and bucket it.

    Output: (doc_id, lang, n_grams BIGINT, nll_scaled BIGINT,
    avg_nll_scaled BIGINT, ppl_bucket in head|middle|tail) — head =
    lowest per-token NLL (most reference-like) within its language,
    ties broken by doc_id so the split is deterministic cross-engine.
    """
    # NB: n_grams is deliberately NOT a projected column here — a
    # non-generator expression alongside an explode lands in the
    # Project ABOVE the Generate, so size(grams) would re-build the
    # gram array once per EXPLODED ROW (O(L) work x L rows = O(L^2)
    # per doc; measured 10x the whole query's cost at sf0.1). The
    # total gram count is recovered for free as SUM(nb) in the final
    # doc-keyed aggregation instead.
    dg = spread_input(corpus, text_col).select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        F.explode(word_ngrams(text_col, 2)).alias("g"),
    )
    # shrink the stream to (doc, distinct gram) BEFORE the model joins
    db = dg.groupBy("doc_id", "lang", "g").agg(
        F.count(F.lit(1)).alias("nb")
    ).withColumn("prev", F.split(F.col("g"), " ").getItem(0))
    joined = (
        db.join(bigram_dim, "g", "left")
        .join(context_dim, db["prev"] == context_dim["w"], "left")
        .crossJoin(F.broadcast(consts.select("lp_unk")))
        .select(
            "doc_id", "lang", "nb",
            F.coalesce("lp", "lp_oov", "lp_unk").alias("lp_g"),
        )
    )
    sc = joined.groupBy("doc_id", "lang").agg(
        F.sum("nb").cast("long").alias("n_grams"),
        (-F.sum(F.col("nb") * F.col("lp_g"))).alias("nll_scaled"),
    )
    avg = F.round(
        F.col("nll_scaled") / F.greatest(F.col("n_grams"), F.lit(1))
    ).cast("long")
    w = Window.partitionBy("lang").orderBy("avg_nll_scaled", "doc_id")
    return (
        sc.withColumn("avg_nll_scaled", avg)
        .withColumn(
            "ppl_bucket",
            F.element_at(
                F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
                F.ntile(3).over(w),
            ),
        )
    )


def lm_perplexity_filter(
    corpus: DataFrame,
    clean: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
    lam: float = 0.5,
) -> DataFrame:
    """Train on `clean`, score + bucket `corpus` — the one-call form."""
    bd, cd, consts = lm_train(clean, text_col=text_col, lam=lam)
    return perplexity_scores(
        corpus, bd, cd, consts,
        text_col=text_col, lang_col=lang_col, id_col=id_col,
    )
