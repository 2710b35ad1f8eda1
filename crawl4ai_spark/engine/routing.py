"""Per-URL config routing — first-match config selection.

Re-expresses the reference's dispatcher-side config routing
(/root/reference/crawl4ai/async_dispatcher.py:101-125 select_config +
async_configs.py:1368-1412 CrawlerRunConfig.is_match): each config may
carry a ``url_matcher`` (fnmatch glob, or a list of globs combined with
``match_mode`` "and"/"or"; absent matcher matches everything); the FIRST
matching config wins, and a URL matching no config is SKIPPED.

Spark-first shape: the whole route table compiles into one ``when``
chain of ``rlike`` predicates — a single codegen'd projection over the
frontier, no UDFs, no joins. Python-callable matchers (the reference's
third matcher kind) have no columnar equivalent; pass a Column
predicate via ``predicate`` instead.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def glob_to_regex(pat: str) -> str:
    """fnmatch.translate semantics without the Python-only wrapper:
    * -> .*, ? -> ., [seq] passthrough, everything else escaped;
    anchored both ends ('/' is NOT special, exactly like fnmatch)."""
    out, i = [], 0
    while i < len(pat):
        c = pat[i]
        if c == "*":
            out.append(".*")
        elif c == "?":
            out.append(".")
        elif c == "[":
            j = pat.find("]", i + 1)
            if j == -1:
                out.append(re.escape(c))
            else:
                body = pat[i + 1:j]
                if body.startswith("!"):
                    body = "^" + body[1:]
                out.append("[" + body + "]")
                i = j
        else:
            out.append(re.escape(c))
        i += 1
    return "^" + "".join(out) + "$"


def _config_match(url: Column, cfg: dict) -> Column:
    matcher = cfg.get("url_matcher")
    if matcher is None and cfg.get("predicate") is None:
        return F.lit(True)
    if cfg.get("predicate") is not None:
        return cfg["predicate"](url)
    if isinstance(matcher, str):
        return url.rlike(glob_to_regex(matcher))
    # list of globs, AND/OR per match_mode (async_configs.py:1392-1412)
    parts = [url.rlike(glob_to_regex(m)) for m in matcher if isinstance(m, str)]
    if not parts:
        return F.lit(False)
    mode = (cfg.get("match_mode") or "or").lower()
    out = parts[0]
    for p in parts[1:]:
        out = (out & p) if mode == "and" else (out | p)
    return out


def route_configs(df: DataFrame, configs: list[dict],
                  url_col: str = "url_norm",
                  out_col: str = "config_id",
                  keep_unmatched: bool = False) -> DataFrame:
    """Adds `config_id` = index of the first matching config. URLs with
    no match are dropped (the reference returns None -> URL skipped,
    async_dispatcher.py:124-125) unless keep_unmatched."""
    url = F.col(url_col)
    expr = F.lit(None).cast("int")
    # build the when-chain back to front so earlier configs win
    for idx in range(len(configs) - 1, -1, -1):
        expr = F.when(_config_match(url, configs[idx]), F.lit(idx)).otherwise(expr)
    out = df.withColumn(out_col, expr)
    if not keep_unmatched:
        out = out.where(F.col(out_col).isNotNull())
    return out
