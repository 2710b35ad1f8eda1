"""In-memory reference-semantics crawler used as a traversal oracle.

A direct, sequential transcription of BFSDeepCrawlStrategy._arun_batch +
link_discovery (/root/reference/crawl4ai/deep_crawling/bfs_strategy.py:
68-192) and the best-first loop (bff_strategy.py:129-213) operating on
an extracted corpus dict — NOT Spark. Tests assert the engine's
per-depth crawled sets / seen set / parents equal this model's.
"""

from __future__ import annotations

import math

from crawl4ai_spark.extraction.html_parser import extract_page


def build_web(pages: list[dict]) -> dict:
    """corpus rows -> url_norm -> {status, links:[(url_norm, internal)], depth...}"""
    from crawl4ai_spark.functions.urlnorm import normalize_url_for_deep_crawl

    web = {}
    for p in pages:
        norm = normalize_url_for_deep_crawl(p["url"], p["url"])
        r = extract_page(norm, p["html"])
        web[norm] = {
            "status": p["status_code"],
            "links": [(l["url_norm"], l["internal"]) for l in r["links"]],
        }
    return web


def reference_bfs(
    web: dict,
    seed: str,
    max_depth: int,
    max_pages: float = math.inf,
    include_external: bool = False,
    scorer=None,
    score_threshold: float = -math.inf,
):
    """Returns (crawl_log, visited) where crawl_log rows are
    (url, depth, parent, success) in crawl order."""
    visited: set[str] = set()
    current = [(seed, None)]
    depths = {seed: 0}
    log = []
    pages_crawled = 0

    while current:
        if pages_crawled >= max_pages:
            break
        nxt = []
        results = []
        for url, parent in current:
            page = web.get(url)
            success = page is not None and page["status"] == 200
            results.append((url, parent, success))
            if success:
                pages_crawled += 1
        for url, parent, success in results:
            depth = depths.get(url, 0)
            log.append((url, depth, parent, success))
            if not success:
                continue
            # link_discovery
            next_depth = depth + 1
            if next_depth > max_depth:
                continue
            remaining = max_pages - pages_crawled
            if remaining <= 0:
                continue
            valid = []
            for link_norm, internal in web[url]["links"]:
                if not internal and not include_external:
                    continue
                if link_norm is None or link_norm in visited:
                    continue
                score = scorer(link_norm) if scorer else 0.0
                if score < score_threshold:
                    continue
                visited.add(link_norm)
                valid.append((link_norm, score))
            if len(valid) > remaining:
                valid.sort(key=lambda x: -x[1])
                valid = valid[: int(remaining)]
            for link_norm, score in valid:
                nxt.append((link_norm, url))
                depths[link_norm] = next_depth
        current = nxt
    return log, visited


def reference_dfs(
    web: dict,
    seed: str,
    max_depth: int,
    max_pages: float = math.inf,
    include_external: bool = False,
):
    """DFS intended semantics (dfs_strategy.py:15-66 with the inherited
    link_discovery's DISCOVERY-time visited.add — see engine/dfs.py's
    docstring for why the literal pop-time re-check is vacuous):
    returns crawl_log rows (url, depth, parent, success) in exact DFS
    preorder. The seed starts in `visited`, mirroring the reference's
    pop-time visited.add (dfs_strategy.py:35) which protects the seed
    from re-crawl via backlinks (BFS deliberately lacks this)."""
    visited: set[str] = {seed}
    stack = [(seed, None, 0)]
    log = []
    crawled = 0
    while stack and crawled < max_pages:
        url, parent, depth = stack.pop()
        page = web.get(url)
        success = page is not None and page["status"] == 200
        log.append((url, depth, parent, success))
        if not success:
            continue
        crawled += 1
        next_depth = depth + 1
        cap = max_pages - crawled
        if next_depth > max_depth or cap <= 0:
            continue
        valid = []
        for link_norm, internal in page["links"]:
            if link_norm is None or (not internal and not include_external):
                continue
            if link_norm in visited:
                continue
            visited.add(link_norm)
            valid.append(link_norm)
        if len(valid) > cap:
            valid = valid[: int(cap)]
        for link_norm in reversed(valid):
            stack.append((link_norm, url, next_depth))
    return log, visited
