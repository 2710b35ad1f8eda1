"""BM25 relevance scoring as pure DataFrame algebra (two-pass).

Re-expresses the reference's three BM25 users without rank_bm25:
  - ContentRelevanceFilter (deep_crawling/filters.py:501-573): head-text
    BM25 vs a query with k1=1.2, b=0.75, simplified IDF;
  - BM25ContentFilter (content_filter_strategy.py:381-530): per-chunk
    scoring (chunk = doc here);
  - seeder corpus scoring (async_url_seeder.py:645-677): corpus-level
    df/avgdl statistics then a score per doc.

Shape for scale: pass 1 computes document frequencies for the (few)
query terms and the corpus avgdl with ONE aggregation over the exploded
term table (map-side partial aggs); pass 2 is a pure projection joining
the tiny stats dim (broadcast) — no per-row Python, no O(corpus) state
on the driver.

    score(d, q) = sum over t in q of
        idf(t) * tf(t,d) * (k1 + 1) / (tf(t,d) + k1 * (1 - b + b * |d|/avgdl))
    idf(t) = ln( (N - df + 0.5) / (df + 0.5) + 1 )
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawl4ai_spark.ops.text import tokens


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id_col, bm25) for every document. Deterministic: per-term
    contributions are summed in sorted(query_terms) order.

    Fully plan-side — NO driver jobs: corpus stats (N, avgdl) are a
    1-row aggregate and the per-term document frequencies a 1-row
    pivot, both broadcast into the scoring projection via nested-loop
    joins of single-row dims. One invocation = one job, so callers
    embedding this in a larger plan (head_relevance, the seeder) don't
    pay two extra collect round-trips per call."""
    toks = tokens(text_col)
    base = df.select(
        F.col(id_col), toks.alias("__toks"), F.size(toks).alias("__dl")
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.coalesce(F.avg("__dl"), F.lit(1.0)).alias("__avgdl"),
    ).withColumn("__k", F.lit(1))

    # per-term df as ONE wide row (pivot with explicit values => no
    # extra distinct job); left join keeps the stats row when no query
    # term occurs anywhere
    terms = sorted(set(query_terms))
    tdf = (
        base.select(F.col(id_col), F.explode("__toks").alias("t"))
        .where(F.col("t").isin(terms))
        .groupBy(F.lit(1).alias("__k"))
        .pivot("t", terms)
        .agg(F.countDistinct(id_col))
    )
    # positional rename (toDF): pivot output columns follow the explicit
    # values order, and renaming by position never resolves a raw query
    # term as a column name — a term containing a backtick (or any other
    # pathological character) would break name-based resolution
    dfrow = tdf.toDF("__k", *[f"__df_{i}" for i in range(len(terms))])
    dims = stats.join(F.broadcast(dfrow), "__k", "left")

    def _eq(term):
        # 1-arg lambda factory (a 2-arg lambda would become Spark's
        # (element, index) higher-order form)
        return lambda x: x == term

    score = F.lit(0.0)
    for i, t in enumerate(terms):
        dfq = F.coalesce(F.col(f"__df_{i}"), F.lit(0)).cast("double")
        idf = F.log((F.col("__n") - dfq + 0.5) / (dfq + 0.5) + 1.0)
        tf = F.size(F.filter("__toks", _eq(t))).cast("double")
        score = score + idf * tf * (k1 + 1.0) / (
            tf + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
        )
    return base.crossJoin(F.broadcast(dims)).select(
        F.col(id_col), F.round(score, 6).alias("bm25")
    )


def content_relevance_filter(
    df: DataFrame,
    query_terms: list[str],
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ContentRelevanceFilter: keep docs whose BM25 vs the query >=
    threshold (filters.py:501-573)."""
    scored = bm25_scores(df, query_terms, text_col, id_col)
    return scored.where(F.col("bm25") >= threshold)
