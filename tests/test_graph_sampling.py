"""Unit tests for ops/graph.py (integer PageRank) and ops/sampling.py
(mixture sampling) — independent pure-Python recomputation as the
reference model."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from crawl4ai_spark.ops.graph import PAGERANK_R0, pagerank_int
from crawl4ai_spark.ops.sampling import mixture_sample


def py_pagerank(nodes, edges, n_iter, r0=PAGERANK_R0):
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {v: r0 for v in nodes}
    base = r0 * 15 // 100
    for _ in range(n_iter):
        s = {v: 0 for v in nodes}
        for u, v in edges:
            s[v] += r[u] // deg[u]
        r = {v: base + (85 * s[v]) // 100 for v in nodes}
    return r


def _run_pr(spark, nodes, edges, n_iter):
    ndf = spark.createDataFrame([Row(node=v) for v in nodes])
    edf = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    got = {r["node"]: r["rank_scaled"]
           for r in pagerank_int(ndf, edf, n_iter=n_iter).collect()}
    assert got == py_pagerank(nodes, edges, n_iter)


def test_pagerank_triangle_plus_dangling(spark):
    # cycle a->b->c->a plus dangling d (in-link only): mass drop variant
    _run_pr(spark, [0, 1, 2, 3],
            [(0, 1), (1, 2), (2, 0), (0, 3)], n_iter=6)


def test_pagerank_star(spark):
    # hub 0 links to 1..4; no backlinks -> leaves converge to base+share
    _run_pr(spark, list(range(5)), [(0, k) for k in range(1, 5)], n_iter=3)


def test_pagerank_zero_iterations_is_r0(spark):
    ndf = spark.createDataFrame([Row(node=0), Row(node=1)])
    edf = spark.createDataFrame([Row(src=0, dst=1)])
    got = {r["node"]: r["rank_scaled"]
           for r in pagerank_int(ndf, edf, n_iter=0).collect()}
    assert got == {0: PAGERANK_R0, 1: PAGERANK_R0}


def _h60(s: str) -> int:
    return int(hashlib.md5(f"mix:{s}".encode()).hexdigest()[:15], 16)


def test_mixture_sample_budget_boundary(spark):
    # single stratum, 4 docs x 10 tokens, pct=50 -> budget 20 tokens ->
    # exactly the first TWO docs in hash order are kept
    docs = spark.createDataFrame([
        Row(doc_id=i, source="s0", text=" ".join(["w"] * 10))
        for i in range(4)
    ])
    out = mixture_sample(docs, F.lit(50)).collect()
    order = sorted(range(4), key=lambda i: (_h60(str(i)), i))
    assert sorted(r["doc_id"] for r in out) == sorted(order[:2])
    assert all(r["budget_tokens"] == 20 and r["n_tokens"] == 10 for r in out)
    assert sorted(r["cum_tokens"] for r in out) == [10, 20]


def test_mixture_sample_per_stratum_budgets(spark):
    # two strata with different pct columns: s0 pct=100 keeps all,
    # s1 pct=0 keeps none
    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s0", text="a b c") for i in range(3)]
        + [Row(doc_id=10 + i, source="s1", text="a b c") for i in range(3)]
    )
    pct = F.when(F.col("source") == "s0", F.lit(100)).otherwise(F.lit(0))
    out = mixture_sample(docs, pct).collect()
    assert sorted(r["doc_id"] for r in out) == [0, 1, 2]
    assert all(r["source"] == "s0" for r in out)


def test_mixture_sample_deterministic(spark):
    docs = spark.createDataFrame([
        Row(doc_id=i, source=f"s{i % 2}", text=" ".join(["t"] * (5 + i)))
        for i in range(20)
    ])
    a = sorted(r["doc_id"] for r in mixture_sample(docs, F.lit(40)).collect())
    b = sorted(r["doc_id"] for r in mixture_sample(docs, F.lit(40)).collect())
    assert a == b and len(a) > 0


def test_pack_sequences_hand_checked(spark):
    from crawl4ai_spark.ops.sampling import pack_sequences

    # one stratum, tokens 6/6/6 with capacity 10 in hash order:
    # first doc fills bin 0 (offset 0), second doesn't fit -> bin 1,
    # third -> bin 2; an oversize doc (15 tokens) still gets its own bin
    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s0", text=" ".join(["w"] * 6))
         for i in range(3)]
        + [Row(doc_id=9, source="s1", text=" ".join(["w"] * 15))]
    )
    out = {r["doc_id"]: r for r in
           pack_sequences(docs, capacity=10).collect()}
    order = sorted(range(3), key=lambda i: (_h60(str(i)), i))
    for pos, i in enumerate(order):
        assert out[i]["bin_id"] == pos and out[i]["bin_offset"] == 0
    assert out[9]["bin_id"] == 0 and out[9]["bin_offset"] == 0
    assert out[9]["n_tokens"] == 15


def test_pack_sequences_offsets(spark):
    from crawl4ai_spark.ops.sampling import pack_sequences

    # tokens 4/4/4, capacity 10 -> docs 1+2 share bin 0 (offsets 0, 4),
    # doc 3 starts bin 1
    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s0", text=" ".join(["w"] * 4))
         for i in range(3)]
    )
    rows = sorted(pack_sequences(docs, capacity=10).collect(),
                  key=lambda r: (r["bin_id"], r["bin_offset"]))
    assert [(r["bin_id"], r["bin_offset"]) for r in rows] == \
        [(0, 0), (0, 4), (1, 0)]
