"""Embedding-based adaptive crawling (EmbeddingStrategy) as DataFrame ops.

Re-expresses the reference's semantic-coverage strategy
(/root/reference/crawl4ai/adaptive_crawler.py, class EmbeddingStrategy)
over a vector column:

  query semantic space   n deterministic query-variation vectors with a
                         train/validation split (map_query_semantic_space,
                         adaptive_crawler.py:666-738 — the LLM variation
                         generator is twinned by hash-derived vectors,
                         the same engine-portable pattern as the IVF
                         centroids, ops/similarity.py _ivf_centroid_comps)
  coverage gaps          per query point, distance to its nearest KB
                         vector: gap = 1 - max cosine; a point is
                         covered when gap <= coverage_radius (0.2)
                         (find_coverage_gaps :779-805 + the
                         embedding_coverage_radius default :191)
  confidence             mean best-cosine over training queries
                         (calculate_confidence :925-947; the tau
                         hit-rate variant is the `tau` parameter)
  validation             held-out queries scored 1 - min_distance,
                         averaged (validate_coverage :1308-1337)
  stopping               min-confidence guard, then convergence
                         (avg |Δconfidence| < rel_improvement * conf)
                         gated by validation (should_stop :1090-1139)

Scale posture: queries are a handful of rows (broadcast); the KB is the
big side and is touched by exactly one pass — per-row norm + dot
against every query vector as higher-order array expressions (JVM-side,
codegen), then a map-side-combined max per query. best-cosine is
monotone under KB appends, so the engine maintains it INCREMENTALLY:
each adaptive check folds only the new pages' vectors into a running
(query_id, best_sim) state table — O(delta) per check, never O(corpus),
which the reference's full distance-matrix recompute (cached only until
the KB changes, :693-710) cannot do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.ops.text import hash64

COVERAGE_RADIUS = 0.2          # embedding_coverage_radius (:191)
MIN_CONFIDENCE = 0.1           # embedding_min_confidence_threshold (:187)
MIN_REL_IMPROVEMENT = 0.1      # embedding_min_relative_improvement (:210)
VALIDATION_MIN = 0.3           # embedding_validation_min_score (:214)


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(v):
    return F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def hash_embed(entity_col, dim: int = 64, seed: str = "kbvec"):
    """Deterministic pseudo-random embedding of a string column:
    component d = (hash64(seed:entity#d) % 2001 - 1000)/1000 in [-1, 1].
    Derived inside Catalyst (no model, no driver randomness) — the
    container has no embedding model, so this is the deterministic twin
    of get_text_embeddings (reference utils), exactly like the sign-LSH
    hyperplanes and IVF centroids."""
    e = entity_col if not isinstance(entity_col, str) else F.col(entity_col)
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (
            F.pmod(
                hash64(F.concat(e, F.lit("#"), d.cast("string")), seed=seed),
                F.lit(2001),
            ) - 1000
        ).cast("double") / 1000.0,
    )


def query_variations(
    spark: SparkSession,
    query: str,
    n_train: int = 5,
    n_val: int = 2,
    dim: int = 64,
    seed: str = "aq",
) -> DataFrame:
    """The query's semantic point cloud with a train/validation split
    (map_query_semantic_space :666-738: LLM variations of the query,
    ~80/20 split with at least 2 held out for validation). Variation j
    embeds the string '<query>#<j>'; ids [0, n_train) train,
    [n_train, n_train+n_val) validate. Output: (query_id, split, qv,
    qn) — a dim-sized handful of rows, always broadcast."""
    n = n_train + n_val
    q = spark.range(n).select(F.col("id").cast("int").alias("query_id"))
    ent = F.concat(F.lit(query), F.lit("#"), F.col("query_id").cast("string"))
    q = q.select(
        "query_id",
        F.when(F.col("query_id") < n_train, F.lit("train"))
        .otherwise(F.lit("val")).alias("split"),
        hash_embed(ent, dim=dim, seed=seed).alias("qv"),
    )
    return q.withColumn("qn", _norm(F.col("qv")))


def best_similarity(
    kb: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per query point, the best cosine against the KB — the k=1 slice
    of the reference's query×KB distance matrix (min distance ==
    1 - max cosine, _compute_distance_matrix :653-685 +
    find_coverage_gaps :779-805). One KB pass: per-row norm hoisted,
    dot per (row, query) as codegen'd array folds, then a
    map-side-combined MAX per query — the KB never shuffles.

    Output: (query_id, split, best_sim) — best_sim rounded to 6dp so
    downstream means are float-order-insensitive; NULL-free (a query
    with an empty KB simply yields no row; callers treat missing as
    gap 1.0, matching find_coverage_gaps' empty-KB branch :786-790)."""
    c = kb.select(F.col(vec_col).alias("v"), _norm(F.col(vec_col)).alias("vn"))
    scored = c.join(F.broadcast(queries)).select(
        "query_id", "split",
        (_dot("v", "qv") / (F.col("vn") * F.col("qn"))).alias("cos"),
    )
    return scored.groupBy("query_id", "split").agg(
        F.round(F.max("cos"), 6).alias("best_sim")
    )


def coverage_report(
    kb: DataFrame,
    query: str,
    n_train: int = 5,
    n_val: int = 2,
    dim: int = 64,
    vec_col: str = "embedding",
    radius: float = COVERAGE_RADIUS,
) -> DataFrame:
    """One row per query variation:

      (query_id, split, best_sim, gap, covered, confidence, val_score)

    gap = 1 - best_sim (cosine distance to the nearest KB vector),
    covered = gap <= radius (find_coverage_gaps :779-805), confidence =
    mean best_sim over the train split (calculate_confidence :925-947),
    val_score = mean (1 - min_distance) over the held-out split
    (validate_coverage :1308-1337). The two means ride the same 7-row
    aggregate, attached by broadcast nested-loop joins of 1-row dims."""
    queries = query_variations(
        kb.sparkSession, query, n_train=n_train, n_val=n_val, dim=dim
    )
    bs = best_similarity(kb, queries, vec_col=vec_col)
    conf = bs.where(F.col("split") == "train").agg(
        F.round(F.avg("best_sim"), 6).alias("confidence")
    )
    val = bs.where(F.col("split") == "val").agg(
        F.round(F.avg("best_sim"), 6).alias("val_score")
    )
    return (
        bs.crossJoin(F.broadcast(conf))
        .crossJoin(F.broadcast(val))
        .select(
            "query_id", "split", "best_sim",
            F.round(1.0 - F.col("best_sim"), 6).alias("gap"),
            (1.0 - F.col("best_sim") <= radius).cast("int").alias("covered"),
            "confidence", "val_score",
        )
    )


def merge_best(prev: DataFrame | None, delta_best: DataFrame) -> DataFrame:
    """Fold a delta window's per-query best into the running state:
    max is monotone under KB appends, so max(prev, delta) == best over
    the whole KB. Full-outer keeps queries the delta didn't improve and
    queries appearing for the first time."""
    if prev is None:
        return delta_best
    p = prev.select(
        "query_id", "split", F.col("best_sim").alias("__prev")
    )
    j = p.join(delta_best, ["query_id", "split"], "full_outer")
    return j.select(
        "query_id", "split",
        F.greatest(
            F.coalesce("__prev", F.lit(-1.0)),
            F.coalesce("best_sim", F.lit(-1.0)),
        ).alias("best_sim"),
    )


def should_stop_embedding(
    confidence_history: list[float],
    val_score: float,
    crawled: int,
    min_confidence: float = MIN_CONFIDENCE,
    min_rel_improvement: float = MIN_REL_IMPROVEMENT,
    validation_min: float = VALIDATION_MIN,
) -> tuple[bool, str | None]:
    """The EmbeddingStrategy stop fold (should_stop :1090-1139), pure
    driver-side over the per-check confidence history:

      1. confidence below the minimum-relevance floor (and something
         was crawled) -> stop as irrelevant (:1094-1099);
      2. fewer than 2 checks -> keep crawling (:1112-1114);
      3. avg |Δconfidence| across the history below
         min_rel_improvement * confidence -> converged; stop only if
         the held-out validation score clears validation_min
         (:1116-1137), else keep crawling ('low_validation').

    Page/link exhaustion (:1102-1103) is the engine main loop's job."""
    conf = confidence_history[-1] if confidence_history else 0.0
    if conf < min_confidence and crawled > 0:
        return True, "below_minimum_relevance_threshold"
    if len(confidence_history) < 2:
        return False, None
    pairs = list(zip(confidence_history[:-1], confidence_history[1:]))
    avg_improvement = sum(abs(b - a) for a, b in pairs) / len(pairs)
    if avg_improvement < min_rel_improvement * conf:
        if val_score > validation_min:
            return True, "converged_validated"
        return False, "low_validation"
    return False, None
