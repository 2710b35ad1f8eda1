"""DSIR importance-weighted selection (ops/dsir.py) semantics.

Pinned here: zero weights when target == raw (the log-ratio vanishes
bucket-wise), target-like docs scoring positive against a distinctive
target vocabulary, and the scaled-integer score matching a hand
computation of the paper's formula.
"""

from __future__ import annotations

import math

from crawl4ai_spark.ops.dsir import (
    DSIR_SCALE,
    dsir_scores,
    dsir_select,
    dsir_weights,
)


def _score_map(docs_df, weights, n_buckets):
    out = dsir_scores(docs_df, weights, n_buckets=n_buckets)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


class TestDsir:
    def test_target_equals_raw_scores_zero(self, spark):
        docs = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
            ["doc_id", "text"],
        )
        w = dsir_weights(docs, docs, n_buckets=64)
        assert w.where("w != 0").count() == 0
        sc = _score_map(docs, w, 64)
        assert all(v["score_scaled"] == 0 and v["selected"] is False
                   for v in sc.values())

    def test_empty_target_finite_weights(self, spark):
        # sum over an empty aggregation is NULL in Spark; the weights
        # must coalesce it to 0 (matching the oracle's COUNT(*)), so
        # an empty target yields finite smoothed weights, never NULLs
        docs = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
            ["doc_id", "text"],
        )
        out = dsir_select(docs, docs.where("doc_id = 999"), n_buckets=64)
        rows = out.collect()
        assert len(rows) == 2
        assert all(r["score_scaled"] is not None for r in rows)
        # empty target: every doc is LESS likely under it -> negative
        assert all(r["score_scaled"] < 0 and r["selected"] is False
                   for r in rows)

    def test_target_like_docs_selected(self, spark):
        # target speaks only "zebra quagga", raw mostly "lorem ipsum"
        raw = spark.createDataFrame(
            [(i, "lorem ipsum dolor sit amet") for i in range(10)]
            + [(100, "zebra quagga zebra quagga zebra")],
            ["doc_id", "text"],
        )
        target = raw.where("doc_id = 100")
        sc = {r["doc_id"]: r.asDict()
              for r in dsir_select(raw, target, n_buckets=256).collect()}
        assert sc[100]["selected"] is True
        assert all(sc[i]["selected"] is False for i in range(10))
        # ranking: the target-like doc strictly dominates
        assert sc[100]["dsir_avg"] > max(sc[i]["dsir_avg"] for i in range(10))

    def test_scaled_integer_score_matches_formula(self, spark):
        # one doc, one bigram occurrence per bucket: score = sum of
        # round(1e6 * (ln((ct+.5)/(T+.5B)) - ln((cr+.5)/(R+.5B))))
        raw = spark.createDataFrame(
            [(1, "aa bb"), (2, "cc dd")], ["doc_id", "text"]
        )
        target = raw.where("doc_id = 1")
        n_buckets = 32
        w = dsir_weights(target, raw, n_buckets=n_buckets)
        sc = _score_map(raw, w, n_buckets)
        # doc 1 has 1 bigram ("aa bb"); T=1 target gram, R=2 raw grams
        lam, lb = 0.5, 0.5 * n_buckets
        expect = round(
            DSIR_SCALE
            * (math.log((1 + lam) / (1 + lb)) - math.log((1 + lam) / (2 + lb)))
        )
        assert sc[1]["n_grams"] == 1
        assert sc[1]["score_scaled"] == expect
        assert sc[1]["dsir_avg"] == expect / DSIR_SCALE
