"""DSIR-style importance-weighted data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

Scores every raw-corpus document by how target-like it is: hashed
word-n-gram features, and per-feature log-likelihood ratio between a
smoothed target unigram-over-buckets model and the raw model,

    w(b)     = ln((ct_b + lam) / (T + lam*B)) - ln((cr_b + lam) / (R + lam*B))
    score(d) = sum over gram occurrences g in d of w(bucket(g))

The paper then Gumbel-samples by the importance weights; here
selection is the deterministic part (score), composable with the
existing deterministic samplers (ops/sampling.mixture_sample takes it
from there) — which also makes the op exactly oracle-able.

Numeric determinism: per-bucket weights are SCALED INTEGERS
(round(w * 1e6) as BIGINT, the pagerank_int trick), so the per-doc
score is exact integer arithmetic — association-order independent,
no float-sum drift between engines. The only cross-engine float op
is one ln() + one round() per BUCKET (4096 of them), not per row.

Scale shape (100 TB posture):
  - bucket counts: one groupBy per corpus over (bucket) — B<<corpus
    keys, map-side combined;
  - totals: windows over the B-row weight dim (one pass over B rows,
    no extra corpus scans), never a driver job;
  - the weight dim is B rows — broadcast into the doc-side join;
  - doc side: doc-keyed aggregations only.

Reference parity: the reference engine has no corpus selection ops
(it crawls); this is part of the training-data layer the task brief
lists as first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawl4ai_spark.ops.text import hash64, spread_input, word_ngrams

DSIR_SCALE = 1_000_000


def _bucketed_grams(df: DataFrame, text_col: str, n: int,
                    n_buckets: int) -> DataFrame:
    # width guard: a compact parquet corpus scans as ONE partition and
    # would serialize the explode+hash below on a single core
    return spread_input(df, text_col).select(
        F.explode(word_ngrams(text_col, n)).alias("g")
    ).select(F.pmod(hash64(F.col("g")), F.lit(n_buckets)).alias("bucket"))


def dsir_weights(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
    n: int = 2,
    lam: float = 0.5,
) -> DataFrame:
    """The B-row weight dim: (bucket, w) with w the scaled-integer
    log-likelihood ratio. lam is add-lambda smoothing, so every bucket
    (seen or not) has a finite weight."""
    spark = raw.sparkSession
    tc = _bucketed_grams(target, text_col, n, n_buckets) \
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("ct"))
    rc = _bucketed_grams(raw, text_col, n, n_buckets) \
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    spine = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    joined = spine.join(tc, "bucket", "left").join(rc, "bucket", "left")
    # totals as windows over the B-row joined dim — NOT tc.agg()/
    # rc.agg() crossJoins, which are separate plan subtrees and cost
    # two extra full corpus scans (caught by plan review); coalesce
    # keeps an EMPTY target/raw at finite lam-smoothed weights (an
    # all-null sum is NULL, and the DuckDB oracle's COUNT(*) is 0)
    wall = Window.partitionBy()
    t_total = F.coalesce(F.sum("ct").over(wall), F.lit(0)).cast("double")
    r_total = F.coalesce(F.sum("cr").over(wall), F.lit(0)).cast("double")
    lb = float(lam) * n_buckets
    w = (
        F.log((F.coalesce("ct", F.lit(0)) + F.lit(float(lam)))
              / (t_total + F.lit(lb)))
        - F.log((F.coalesce("cr", F.lit(0)) + F.lit(float(lam)))
                / (r_total + F.lit(lb)))
    )
    return joined.select(
        "bucket",
        F.round(w * DSIR_SCALE).cast("long").alias("w"),
    )


def dsir_select(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    n: int = 2,
    lam: float = 0.5,
) -> DataFrame:
    """One-call DSIR: build the weight dim from (target, docs) and
    score every doc, with ONE n_buckets/n threaded through both stages
    — the safe entry point (see the warning on :func:`dsir_scores`)."""
    w = dsir_weights(target, docs, text_col, n_buckets, n, lam)
    return dsir_scores(docs, w, text_col, id_col, n, n_buckets)


def dsir_scores(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    n_buckets: int = 4096,
) -> DataFrame:
    """Per-doc DSIR score against a weight dim from :func:`dsir_weights`.

    WARNING: ``n_buckets`` and ``n`` must MATCH the values the weight
    dim was built with — a mismatch makes the inner bucket join
    silently drop every doc whose buckets fall outside the weight
    spine. Use :func:`dsir_select` unless you are reusing a persisted
    weight dim.

    Output: (doc_id, n_grams, score_scaled, dsir_avg, selected) —
    score_scaled is the exact BIGINT sum of per-occurrence scaled
    weights; dsir_avg normalizes by gram count (length-bias-free
    ranking); selected = score_scaled > 0 (integer compare — the doc
    is likelier under the target model than the raw model).

    dsir_avg is derived by rounding the INTEGER quotient
    score_scaled / n_grams first and dividing by the scale after: the
    quotient's exact-half values (k + 0.5 with k < 2^52) are exactly
    representable doubles, so both engines apply the same
    half-away-from-zero rule — whereas rounding (score/1e6)/n at 6 dp
    hits binary-inexact half boundaries where engines disagree (found
    by the sf0.01 oracle sweep: -15451198 / 28 = -551828.5 exactly).
    """
    base = spread_input(docs, id_col).select(
        F.col(id_col).alias("doc_id"),
        word_ngrams(text_col, n).alias("grams"),
    ).select(
        "doc_id", F.size("grams").alias("n_grams"),
        F.explode("grams").alias("g"),
    ).select(
        "doc_id", "n_grams",
        F.pmod(hash64(F.col("g")), F.lit(n_buckets)).alias("bucket"),
    )
    db = base.groupBy("doc_id", "n_grams", "bucket").agg(
        F.count(F.lit(1)).alias("nb")
    )
    return (
        db.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id", "n_grams")
        .agg(F.sum(F.col("nb") * F.col("w")).alias("score_scaled"))
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("score_scaled").cast("long").alias("score_scaled"),
            (
                F.round(
                    F.col("score_scaled") / F.greatest("n_grams", F.lit(1))
                ).cast("long") / F.lit(float(DSIR_SCALE))
            ).alias("dsir_avg"),
            (F.col("score_scaled") > 0).alias("selected"),
        )
    )
