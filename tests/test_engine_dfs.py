"""DFS compat mode vs the in-memory reference model: exact preorder
(not just set equality), max_pages truncation, and kill/resume."""

from __future__ import annotations

import pytest

from crawl4ai_spark.corpus.fakeshop import fakeshop_spark_df, generate_fakeshop
from crawl4ai_spark.engine.dfs import DFSEngine
from crawl4ai_spark.engine.fetch import CorpusFetcher
from crawl4ai_spark.engine.tables import Warehouse

from tests.reference_model import build_web, reference_dfs

SEED = "http://shop0.fakeshop.test/index.html"


@pytest.fixture(scope="module")
def corpus_pages():
    return generate_fakeshop(n_sites=1, n_categories=2, n_subcats=2, n_products=1)


@pytest.fixture(scope="module")
def web(corpus_pages):
    return build_web(corpus_pages)


def _corpus_df(spark):
    return fakeshop_spark_df(
        spark, n_sites=1, n_categories=2, n_subcats=2, n_products=1
    )


def _crawl_order(eng, spark):
    pages = eng.t_pages.read(spark)
    rows = pages.select("url_norm", "depth", "parent_url", "round").collect()
    return [(r.url_norm, r.depth, r.parent_url)
            for r in sorted(rows, key=lambda r: r["round"])]


def test_dfs_preorder_matches_reference(spark, tmp_path, web):
    eng = DFSEngine(spark, Warehouse(str(tmp_path / "a")),
                    CorpusFetcher(_corpus_df(spark)), max_depth=3, max_pages=8)
    stats = eng.run(SEED)
    log, _ = reference_dfs(web, SEED, max_depth=3, max_pages=8)
    want = [(u, d, p) for (u, d, p, _s) in log]
    assert _crawl_order(eng, spark) == want  # ORDER-sensitive
    assert stats["pages_crawled"] == sum(1 for r in log if r[3]) == 8


def test_dfs_differs_from_bfs_order(spark, tmp_path, web):
    """DFS goes deep before wide: with a branching corpus the second
    crawled page's depth-2 successor must appear before the seed's
    second child (which BFS would crawl first)."""
    eng = DFSEngine(spark, Warehouse(str(tmp_path / "b")),
                    CorpusFetcher(_corpus_df(spark)), max_depth=3)
    eng.run(SEED)
    order = _crawl_order(eng, spark)
    depths = [d for (_u, d, _p) in order]
    # deep-before-wide: some max-depth page is crawled before the walk
    # returns to a depth-1 sibling — impossible under BFS level order
    assert 3 in depths
    assert depths.index(3) < max(i for i, d in enumerate(depths) if d == 1)


def test_dfs_seed_backlink_not_recrawled(spark, tmp_path, web):
    """The seed starts in `visited` (dfs_strategy.py:35 pop-time add):
    fakeshop category pages link back to /index.html, so without the
    pre-seed the walk would re-push and re-crawl the seed, double-counting
    it toward max_pages and shifting the preorder."""
    assert any(
        SEED in (u for u, _i in page["links"]) for page in web.values()
    ), "corpus must contain a backlink to the seed for this test to bite"
    eng = DFSEngine(spark, Warehouse(str(tmp_path / "e")),
                    CorpusFetcher(_corpus_df(spark)), max_depth=3)
    eng.run(SEED)
    order = _crawl_order(eng, spark)
    assert sum(1 for (u, _d, _p) in order if u == SEED) == 1
    log, _ = reference_dfs(web, SEED, max_depth=3)
    assert sum(1 for (u, _d, _p, _s) in log if u == SEED) == 1


def test_dfs_resume_equals_uninterrupted(spark, tmp_path, web):
    full = DFSEngine(spark, Warehouse(str(tmp_path / "c")),
                     CorpusFetcher(_corpus_df(spark)), max_depth=3, max_pages=9)
    full.run(SEED)

    # interrupted: step-bounded first leg (pauses mid-walk without
    # changing discovery semantics), then resume to completion
    wh = Warehouse(str(tmp_path / "d"))
    leg1 = DFSEngine(spark, wh, CorpusFetcher(_corpus_df(spark)),
                     max_depth=3, max_pages=9, max_steps=4)
    leg1.run(SEED)
    leg2 = DFSEngine(spark, wh, CorpusFetcher(_corpus_df(spark)),
                     max_depth=3, max_pages=9)
    stats = leg2.run(SEED)
    assert stats["pages_crawled"] == 9
    assert _crawl_order(leg2, spark) == _crawl_order(full, spark)
