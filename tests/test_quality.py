"""Unit tests for ops/quality.py: Gopher repetition signals, n-gram
benchmark decontamination, and PII redaction — small hand-checked
corpora, independent Python re-computation as the reference model."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from crawl4ai_spark.ops.quality import (
    GOPHER_MAX_DUP_WORD_FRAC,
    GOPHER_MAX_TOP_BIGRAM_FRAC,
    GOPHER_MAX_TOP_WORD_FRAC,
    GOPHER_MIN_WORDS,
    gopher_signals,
    gram_counts,
    ngram_contamination,
    redact_pii,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def py_grams(text, n):
    ws = text.split(" ")
    return [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]


def test_gram_counts_matches_python(spark):
    texts = [
        "a b a b c",
        "x",                      # 1 word: no bigrams/trigrams
        "y z",                    # 2 words: no trigrams
        "r r r r r r",            # max repetition
    ]
    got = {
        (r["id"], r["n"], r["gram"]): r["c"]
        for r in gram_counts(_docs(spark, texts)).collect()
    }
    want = {}
    for i, t in enumerate(texts):
        for n in (1, 2, 3):
            for g, c in Counter(py_grams(t, n)).items():
                want[(i, n, g)] = c
    assert got == want


def test_gopher_signals_hand_checked(spark):
    # doc 0: 40 distinct words -> keep; doc 1: pathological repetition
    keep_text = " ".join(f"w{i}" for i in range(40))
    drop_text = " ".join(["spam"] * 40)
    rows = {r["doc_id"]: r for r in
            gopher_signals(_docs(spark, [keep_text, drop_text])).collect()}
    k, d = rows[0], rows[1]
    assert k["n_words"] == 40 and k["top_word_frac"] == pytest.approx(1 / 40)
    assert k["dup_word_frac"] == 0.0 and k["keep"] is True
    assert d["top_word_frac"] == 1.0 and d["top_bigram_frac"] == 1.0
    assert d["dup_word_frac"] == pytest.approx(39 / 40)
    assert d["keep"] is False


def test_gopher_short_doc_dropped(spark):
    rows = gopher_signals(_docs(spark, ["tiny doc of five words"])).collect()
    assert rows[0]["n_words"] == 5 < GOPHER_MIN_WORDS
    assert rows[0]["keep"] is False


def test_gopher_thresholds_are_reachable():
    # guards against threshold drift that would make one class empty
    assert 0 < GOPHER_MAX_TOP_BIGRAM_FRAC < GOPHER_MAX_TOP_WORD_FRAC < 1
    assert 0 < GOPHER_MAX_DUP_WORD_FRAC < 1


def test_contamination_flags_overlap_only(spark):
    shared = " ".join(f"s{i}" for i in range(8))          # one shared 8-gram
    corpus = _docs(spark, [
        shared + " tail words here",                       # contaminated
        " ".join(f"c{i}" for i in range(12)),              # clean
        "short doc",                                       # <8 words: no grams
    ])
    bench = _docs(spark, [shared + " benchmark suffix"])
    out = {r["doc_id"]: r for r in
           ngram_contamination(corpus, bench, n=8).collect()}
    assert out[0]["contaminated"] is True and out[0]["n_hit"] == 1
    assert out[1]["contaminated"] is False and out[1]["n_hit"] == 0
    assert 2 not in out                                    # gram-less doc absent
    # n_grams = distinct 8-grams: doc 0 has 11 words -> 4 grams
    assert out[0]["n_grams"] == 4
    assert out[0]["hit_frac"] == pytest.approx(0.25)


def test_redact_pii_counts_and_text(spark):
    t = ("reach me at bob.smith+x@mail.example.org or call 555-0199, "
         "server 192.168.3.44 and 10.0.0.1; not-a-phone 1234-5678")
    df = spark.createDataFrame([Row(doc_id=0, t=t)])
    cols = redact_pii(F.col("t"))
    r = df.select(
        cols["redacted"].alias("red"), cols["n_email"].alias("e"),
        cols["n_phone"].alias("p"), cols["n_ip"].alias("i"),
    ).collect()[0]
    assert r["e"] == 1 and r["p"] == 1 and r["i"] == 2
    assert r["red"] == ("reach me at [EMAIL] or call [PHONE], "
                        "server [IP] and [IP]; not-a-phone 1234-5678")


def test_redact_pii_no_match_is_identity(spark):
    df = spark.createDataFrame([Row(doc_id=0, t="plain text only")])
    cols = redact_pii(F.col("t"))
    r = df.select(cols["redacted"].alias("red"), cols["n_email"].alias("e"),
                  cols["n_phone"].alias("p"), cols["n_ip"].alias("i")
                  ).collect()[0]
    assert r["red"] == "plain text only"
    assert (r["e"], r["p"], r["i"]) == (0, 0, 0)


# -- Gopher document-quality rules (A1.1, non-repetition half) --------------

def _rules(spark, texts):
    from crawl4ai_spark.ops.quality import gopher_quality_rules
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    return {r["doc_id"]: r.asDict()
            for r in gopher_quality_rules(df).collect()}


def test_rules_good_doc_keeps(spark):
    good = " ".join(
        "the quick brown fox and that dog have gone to be of use with".split()
        * 6)  # 84 words, all alpha, stops present, no symbols/bullets
    out = _rules(spark, [good])[0]
    assert out["keep"] is True
    assert out["n_words"] == 84
    assert 3.0 <= out["mean_word_len"] <= 10.0
    assert out["n_stop_hits"] == 8


def test_rules_word_count_and_stops(spark):
    out = _rules(spark, ["too short to keep", "x " * 60])
    assert out[0]["keep"] is False          # < 50 words
    assert out[1]["n_stop_hits"] == 0       # no stop words -> drop
    assert out[1]["keep"] is False


def test_rules_bullet_and_ellipsis_lines(spark):
    body = " ".join(["the and of to"] * 15)
    bullets = "\n".join(["- item"] * 19) + "\n" + body   # 95% bullet lines
    dots = "\n".join(["cliffhanger..."] * 2) + "\n" + body  # 2/3 ellipsis
    out = _rules(spark, [bullets, dots])
    assert out[0]["bullet_line_frac"] == 0.95 and out[0]["keep"] is False
    assert abs(out[1]["ellipsis_line_frac"] - 2 / 3) < 1e-6
    assert out[1]["keep"] is False


def test_rules_symbols_and_alpha(spark):
    body = " ".join(["the and of to"] * 15)  # 60 words
    hashy = body + " " + " ".join(["#"] * 8)       # 8 symbols / 68 words
    nums = " ".join(["123 456 the and of to"] * 15)  # 1/3 non-alpha words
    out = _rules(spark, [hashy, nums])
    assert out[0]["symbol_word_ratio"] > 0.10 and out[0]["keep"] is False
    assert out[1]["alpha_word_frac"] < 0.80 and out[1]["keep"] is False
