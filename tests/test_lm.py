"""CCNet-style LM perplexity filter (ops/lm.py) semantics.

Pinned here: the three scoring rungs (seen bigram, unseen bigram with
a seen context, unseen context) against a hand computation of the
add-lambda formula; per-language tercile bucketing with deterministic
tie-breaks; and head = most-reference-like ordering.
"""

from __future__ import annotations

import math

from crawl4ai_spark.ops.lm import LM_SCALE, lm_perplexity_filter, lm_train


def _lp(num: float, den: float) -> int:
    return round(math.log(num / den) * LM_SCALE)


class TestLmPerplexity:
    def test_three_rungs_match_hand_formula(self, spark):
        # clean: tokens a,b,a,c -> c1 = {a:2, b:1, c:1}, V = 3+1 = 4
        clean = spark.createDataFrame([("a b a c",)], ["text"])
        corpus = spark.createDataFrame(
            [(1, "en", "a b z q")], ["doc_id", "lang", "text"]
        )
        out = lm_perplexity_filter(corpus, clean).collect()
        assert len(out) == 1
        r = out[0].asDict()
        lam, v = 0.5, 4.0
        seen = _lp(1 + lam, 2 + lam * v)        # "a b": c2=1, c1(a)=2
        oov = _lp(lam, 1 + lam * v)             # "b z": context b seen
        unk = _lp(lam, lam * v)                 # "z q": context z unseen
        assert r["n_grams"] == 3
        assert r["nll_scaled"] == -(seen + oov + unk)
        assert r["avg_nll_scaled"] == round(-(seen + oov + unk) / 3)
        assert r["ppl_bucket"] == "head"        # only doc in its lang

    def test_repeated_gram_multiplicity(self, spark):
        # "a b a b a b": bigrams [a b, b a, a b, b a, a b] -> nb counts
        clean = spark.createDataFrame([("a b a c",)], ["text"])
        corpus = spark.createDataFrame(
            [(1, "en", "a b a b a b")], ["doc_id", "lang", "text"]
        )
        r = lm_perplexity_filter(corpus, clean).collect()[0].asDict()
        lam, v = 0.5, 4.0
        ab = _lp(1 + lam, 2 + lam * v)          # seen bigram "a b", x3
        ba = _lp(1 + lam, 1 + lam * v)          # seen bigram "b a", x2
        assert r["n_grams"] == 5
        assert r["nll_scaled"] == -(3 * ab + 2 * ba)

    def test_terciles_per_language(self, spark):
        # 6 en docs with strictly increasing OOV-ness -> 2/2/2 split;
        # 1 fr doc is its own partition -> head regardless of score
        clean = spark.createDataFrame([("a a a a a a a a",)], ["text"])
        rows = [
            (i, "en", " ".join(["a"] * (8 - i) + [f"z{i}"] * i))
            for i in range(1, 7)
        ] + [(100, "fr", "zz qq xx")]
        corpus = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
        out = {r["doc_id"]: r["ppl_bucket"]
               for r in lm_perplexity_filter(corpus, clean).collect()}
        assert [out[i] for i in range(1, 7)] == [
            "head", "head", "middle", "middle", "tail", "tail"
        ]
        assert out[100] == "head"

    def test_clean_like_docs_rank_head(self, spark):
        clean = spark.createDataFrame(
            [("the cat sat on the mat",), ("the dog sat on the rug",)],
            ["text"],
        )
        corpus = spark.createDataFrame(
            [(1, "en", "the cat sat on the mat"),
             (2, "en", "qwerty zxcvb plugh xyzzy thud frobnitz"),
             (3, "en", "the cat sat on zzz yyy")],
            ["doc_id", "lang", "text"],
        )
        sc = {r["doc_id"]: r.asDict()
              for r in lm_perplexity_filter(corpus, clean).collect()}
        assert sc[1]["avg_nll_scaled"] < sc[3]["avg_nll_scaled"] \
            < sc[2]["avg_nll_scaled"]
        assert sc[1]["ppl_bucket"] == "head"
        assert sc[2]["ppl_bucket"] == "tail"

    def test_model_dims_shapes(self, spark):
        clean = spark.createDataFrame([("a b a c",)], ["text"])
        bd, cd, consts = lm_train(clean)
        assert {r["g"]: r["lp"] for r in bd.collect()}.keys() == {
            "a b", "b a", "a c"
        }
        assert {r["w"] for r in cd.collect()} == {"a", "b", "c"}
        c = consts.collect()[0]
        assert c["v"] == 4.0
        assert c["lp_unk"] == _lp(0.5, 0.5 * 4.0)
