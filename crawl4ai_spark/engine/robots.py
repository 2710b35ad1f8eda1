"""robots.txt gate as a broadcast dimension join — no per-URL Python.

The reference fetches robots.txt per domain with a 7-day SQLite cache
and checks `can_fetch` per URL, allowing on missing/error
(/root/reference/crawl4ai/utils.py:251-364). Here the rules are a dim
table ``robots(host, allow ARRAY<STRING>, disallow ARRAY<STRING>)``
refreshed per run and broadcast; the per-URL decision is native column
logic implementing longest-match precedence (allow wins ties), the
standard REP resolution:

    best_allow    = max(length(p) for p in allow    if path startswith p)
    best_disallow = max(length(p) for p in disallow if path startswith p)
    allowed       = best_disallow is null OR best_allow >= best_disallow

A host absent from the table ⇒ allow-all (utils.py:348-354).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _best_match_len(rules_col, path_col):
    matched = F.filter(rules_col, lambda p: path_col.startswith(p))
    return F.array_max(F.transform(matched, lambda p: F.length(p)))


def apply_robots_gate(
    frontier: DataFrame,
    robots: DataFrame | None,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Adds `robots_allowed` boolean. `robots` columns: host, allow, disallow."""
    if robots is None:
        return frontier.withColumn("robots_allowed", F.lit(True))
    r = robots.select(
        F.col("host").alias("__r_host"),
        F.col("allow").alias("__allow"),
        F.col("disallow").alias("__disallow"),
    )
    joined = frontier.join(
        F.broadcast(r), frontier[host_col] == r["__r_host"], "left"
    )
    best_allow = _best_match_len(F.col("__allow"), F.col(path_col))
    best_dis = _best_match_len(F.col("__disallow"), F.col(path_col))
    allowed = F.when(F.col("__r_host").isNull(), F.lit(True)).otherwise(
        best_dis.isNull() | (F.coalesce(best_allow, F.lit(-1)) >= best_dis)
    )
    return joined.withColumn("robots_allowed", allowed).drop(
        "__r_host", "__allow", "__disallow"
    )
