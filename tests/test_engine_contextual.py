"""Contextual (head-peek BM25) frontier priority, end to end.

Reference semantics: link_preview.py:380-390 (0.7*intrinsic +
0.3*min(10*contextual, 10), clamped) with the contextual half produced
by BM25 over the head text-context of the CANDIDATE set peeked each
round (async_url_seeder.py:645-677) — so corpus stats (N, avgdl, df)
are scoped to the round's deduped candidates, pre seen-anti-join.

The 12-doc synthetic graph is small enough to hand-derive every score:
  round 0 candidates {1,2,3,11}: contexts "Doc i src{i%20}", dl=3
  round 1 candidates {4..11}   : 11 is a rediscovery — it stays in the
                                 stats (peek is pre-dedup) but keeps
                                 its round-0 score (already seen)
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.corpus.webgen import build_corpus, seed_url, url_expr
from crawl4ai_spark.engine.fetch import CorpusFetcher
from crawl4ai_spark.engine.frontier import CrawlConfig, CrawlEngine
from crawl4ai_spark.engine.tables import Warehouse

N_DOCS = 12
TERMS = ["Doc", "src1", "src5"]

# intrinsic for every synthetic anchor ("go {c}" -> len>3 +1.0, 2 words
# +0.5; url depth 2 -> +1.0; https -> +0.5) = 3.0, constant by design so
# the contextual half is what differentiates candidates
INTRINSIC = 3.0


def bm25_one(tf_by_term: dict[str, int], df_by_term: dict[str, int], n: int) -> float:
    """dl == avgdl == 3 for every synthetic head context."""
    s = 0.0
    for t in sorted(set(TERMS)):
        tf = float(tf_by_term.get(t, 0))
        df = float(df_by_term.get(t, 0))
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        s += idf * tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * 1.0))
    return round(s, 6)


def expected_score(rel: float) -> float:
    return max(0.0, min(INTRINSIC * 0.7 + min(rel * 10.0, 10.0) * 0.3, 10.0))


@pytest.fixture(scope="module")
def scores(spark, tmp_path_factory):
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body "), F.col("id").cast("string")).alias("text"),
        F.concat(F.lit("src"), (F.col("id") % 20).cast("string")).alias("source"),
    )
    corpus = build_corpus(docs, n_docs=N_DOCS)
    wh = Warehouse(str(tmp_path_factory.mktemp("ctx") / "wh"))
    eng = CrawlEngine(
        spark, wh, CorpusFetcher(corpus),
        CrawlConfig(max_depth=2, mode="bfs", link_query=TERMS),
    )
    eng.run([seed_url()])
    pages = eng.t_pages.read(spark)
    rows = pages.select("url_norm", "depth", "score").collect()
    url = {i: f"https://site{i % 7}.example.com/page/{i}" for i in range(N_DOCS)}
    by_id = {}
    for r in rows:
        i = int(r.url_norm.rsplit("/", 1)[1])
        by_id[i] = (r.depth, r.score)
        assert r.url_norm == url[i]
    return by_id


def test_seed_keeps_zero_score(scores):
    assert scores[0] == (0, 0.0)


def test_round0_scores(scores):
    # candidates {1,2,3,11}: "Doc" df=4, "src1" df=1 (doc 1), "src5" df=0
    df0 = {"Doc": 4, "src1": 1}
    rel1 = bm25_one({"Doc": 1, "src1": 1}, df0, 4)
    relo = bm25_one({"Doc": 1}, df0, 4)
    assert rel1 * 10.0 > 10.0  # doc 1 caps the contextual half
    assert scores[1] == (1, pytest.approx(expected_score(rel1), abs=1e-9))
    for i in (2, 3):
        assert scores[i] == (1, pytest.approx(expected_score(relo), abs=1e-9))
    assert scores[11] == (1, pytest.approx(expected_score(relo), abs=1e-9))


def test_round1_scores_use_round_scoped_stats(scores):
    # candidates {4..11} (11 rediscovered: counted in stats, not
    # re-admitted): "Doc" df=8, "src5" df=1 (doc 5), "src1" df=0
    df1 = {"Doc": 8, "src5": 1}
    rel5 = bm25_one({"Doc": 1, "src5": 1}, df1, 8)
    relo = bm25_one({"Doc": 1}, df1, 8)
    assert scores[5] == (2, pytest.approx(expected_score(rel5), abs=1e-9))
    for i in (4, 6, 7, 8, 9, 10):
        assert scores[i] == (2, pytest.approx(expected_score(relo), abs=1e-9))
    # round-scoped stats: the no-rare-term score differs between rounds
    df0 = {"Doc": 4, "src1": 1}
    assert expected_score(relo) != expected_score(bm25_one({"Doc": 1}, df0, 4))


def test_no_corpus_fetcher_falls_back_to_intrinsic(spark, tmp_path_factory):
    """A fetcher without a head-peekable corpus table (live HTTP) must
    fall back to clamp(intrinsic) — the reference's no-head_data path."""

    class NoPeek:
        def __init__(self, inner):
            self._inner = inner

        def fetch(self, frontier):
            return self._inner.fetch(frontier)

    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.lit("body").alias("text"),
        F.concat(F.lit("src"), (F.col("id") % 20).cast("string")).alias("source"),
    )
    corpus = build_corpus(docs, n_docs=N_DOCS)
    wh = Warehouse(str(tmp_path_factory.mktemp("nopeek") / "wh"))
    eng = CrawlEngine(
        spark, wh, CorpusFetcher(corpus), CrawlConfig(max_depth=1, mode="bfs",
                                                      link_query=TERMS),
    )
    eng.fetcher = NoPeek(eng.fetcher)
    eng.run([seed_url()])
    got = {
        r.depth: r.score
        for r in eng.t_pages.read(spark).select("depth", "score").collect()
    }
    assert got == {0: 0.0, 1: INTRINSIC}
