"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over crawl4ai_spark.queries, which holds the registry of
(Spark callable, DuckDB oracle SQL) pairs — one per implemented
operator from SURVEY.md §2 plus the training-data ops (dedup,
similarity search, text analysis, multimodal plumbing).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full BFS crawl-engine loop (canonicalize →
    politeness → fetch → extract spans → discover → seen-dedup) over
    the deterministic synthetic web corpus derived from sf0.001
    documents; returns the crawled set with lineage."""
    from crawl4ai_spark.queries import flagship

    return flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from crawl4ai_spark.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from crawl4ai_spark.queries import oracle_sql as _o

    return _o()
