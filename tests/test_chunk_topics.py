"""TextTiling-style TopicSegmentationChunking twin (ops/text.chunk_topics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawl4ai_spark.ops.text import chunk_topics


def _fixture(spark):
    # doc 0: two 60-token topics with disjoint vocab; doc 1: one topic
    a = " ".join(f"a{j % 17}" for j in range(60))
    b = " ".join(f"b{j % 17}" for j in range(60))
    u = " ".join(f"a{j % 17}" for j in range(120))
    return spark.createDataFrame(
        [(0, f"{a} {b}"), (1, u)], "doc_id long, text string"
    )


def test_topic_shift_splits_at_the_valley(spark):
    out = chunk_topics(_fixture(spark), w=10, k=2).collect()
    d0 = sorted((r for r in out if r["doc_id"] == 0),
                key=lambda r: r["chunk_id"])
    assert len(d0) == 2
    # the boundary lands exactly at the vocabulary shift (token 60)
    assert set(t[0] for t in d0[0]["chunk"].split()) == {"a"}
    assert set(t[0] for t in d0[1]["chunk"].split()) == {"b"}
    assert d0[0]["n_tokens"] == 60 and d0[1]["n_tokens"] == 60
    assert d0[0]["n_blocks"] == 6 and d0[1]["n_blocks"] == 6


def test_uniform_doc_stays_one_chunk(spark):
    out = chunk_topics(_fixture(spark), w=10, k=2).collect()
    d1 = [r for r in out if r["doc_id"] == 1]
    assert len(d1) == 1
    assert d1[0]["chunk_id"] == 0 and d1[0]["n_tokens"] == 120


def test_keywords_frequency_then_alphabetical(spark):
    df = spark.createDataFrame(
        [(7, "zz zz zz bb bb aa aa cc")], "doc_id long, text string"
    )
    out = chunk_topics(df, w=10, k=2, num_keywords=3).collect()
    assert len(out) == 1
    # zz(3) first, then aa/bb tie at 2 broken alphabetically
    assert out[0]["keywords"] == "zz,aa,bb"


def test_case_folding_and_short_doc(spark):
    df = spark.createDataFrame(
        [(1, "Foo FOO foo"), (2, "one")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in chunk_topics(df).collect()}
    assert out[1]["chunk"] == "foo foo foo" and out[1]["keywords"] == "foo"
    assert out[2]["n_tokens"] == 1
