"""LLM extraction/filter plumbing: the reference-exact pieces
(merge_chunks quirks, extract_xml_data, split_and_parse_json_objects,
the parse ladder, prompt variable protocol) tested independently of
the deterministic client, plus the Spark fan-out.

Reference: extraction_strategy.py:479-803 (LLMExtractionStrategy),
content_filter_strategy.py:780-1060 (LLMContentFilter),
utils.py:161-223 (merge_chunks), :706-749 (split_and_parse_json_
objects), :1708-1740 (extract_xml_data).
"""

from __future__ import annotations

import json

import pytest

from crawl4ai_spark.extraction.llm import (
    DeterministicClient,
    DeterministicFilterClient,
    LLMContentFilterSpark,
    LLMExtractionSpark,
    extract_xml_data,
    merge_chunks,
    parse_blocks,
    split_and_parse_json_objects,
)


# ---------------------------------------------------------------------------
# utility twins
# ---------------------------------------------------------------------------

def test_extract_xml_data_longest_wins():
    s = "<blocks>a</blocks> mid <blocks>longer body</blocks>"
    assert extract_xml_data(["blocks"], s) == {"blocks": "longer body"}
    assert extract_xml_data(["missing"], s) == {"missing": ""}


def test_split_and_parse_json_objects():
    parsed, unparsed = split_and_parse_json_objects(
        '[{"a": 1}, {"b": [2, 3]}, {broken}]')
    assert parsed == [{"a": 1}, {"b": [2, 3]}]
    assert unparsed == ["{broken}"]
    # unbalanced braces never close a segment -> silently dropped,
    # exactly like the reference's depth counter
    parsed, unparsed = split_and_parse_json_objects('[{"a": 1}, {open')
    assert parsed == [{"a": 1}] and unparsed == []


def test_merge_chunks_overlap_and_ratio_quirk():
    words = " ".join(f"w{i}" for i in range(30))
    # ratio=1: 30 tokens / target 10 -> exactly 3 pre-allocated chunks;
    # overlap=2 re-injects 2 tokens per boundary and the LAST chunk
    # absorbs the overflow (advancement is capped at num_chunks-1,
    # utils.py:201-218)
    chunks = merge_chunks([words], 10, overlap=2, word_token_ratio=1.0)
    assert [len(c.split()) for c in chunks] == [10, 10, 14]
    assert chunks[1].split()[:2] == chunks[0].split()[-2:]
    # the ratio inflates only the pre-allocated chunk COUNT, while
    # distribution counts every token as 1 (utils.py:193-202 quirk):
    # ratio=0.5 halves the chunk count and the tail chunk doubles
    assert [len(c.split()) for c in
            merge_chunks([words], 10, word_token_ratio=0.5)] == [10, 20]
    assert len(merge_chunks([words], 10, word_token_ratio=1.0)) == 3
    assert merge_chunks([""], 10) == []
    assert merge_chunks([], 10) == []


def test_merge_chunks_multi_doc_concatenation():
    chunks = merge_chunks(["a b c", "", "d e"], 100)
    assert chunks == ["a b c d e"]


# ---------------------------------------------------------------------------
# parse ladder
# ---------------------------------------------------------------------------

def test_parse_blocks_xml_rung():
    content = '<blocks>[{"index": 0, "tags": ["t"], "content": ["x"]}]</blocks>'
    blocks = parse_blocks(content)
    assert blocks == [{"index": 0, "tags": ["t"], "content": ["x"],
                       "error": False}]


def test_parse_blocks_force_json_single_key_unwrap():
    # {"news": [...]} unwraps to the list; a plain object wraps to [obj]
    blocks = parse_blocks('{"news": [{"index": 1}]}', force_json=True)
    assert blocks == [{"index": 1, "error": False}]
    blocks = parse_blocks('{"article_id": "1234"}', force_json=True)
    assert blocks == [{"article_id": "1234", "error": False}]


def test_parse_blocks_ragged_fallback_appends_error_row():
    content = '[{"index": 0, "tags": ["a"], "content": ["x"]}, {"index": broken}]'
    blocks = parse_blocks(content)
    assert blocks[0]["error"] is False
    assert blocks[-1] == {"index": 0, "error": True, "tags": ["error"],
                          "content": ['{"index": broken}']}


# ---------------------------------------------------------------------------
# strategies (driver-side path)
# ---------------------------------------------------------------------------

def test_extraction_chunked_vs_reference_model():
    """Chunked run against an independent pure-Python recomputation."""
    text = " ".join(f"w{i:02d}" for i in range(60))
    strat = LLMExtractionSpark(DeterministicClient(words_per_block=5),
                               chunk_token_threshold=20, overlap_rate=0.1,
                               word_token_rate=1.0)
    rows = strat.extract_doc("u", [text])
    # independent model: same merge rule, same client rule
    words = text.split()
    exp_chunks, cur, size = [[]], 0, 0
    num_chunks = (60 + 19) // 20
    chunks = [[] for _ in range(num_chunks)]
    for w in words:
        if size >= 20 and cur < num_chunks - 1:
            tail = chunks[cur][-2:]
            cur += 1
            chunks[cur].extend(tail)
            size = len(tail)
        chunks[cur].append(w)
        size += 1
    expected = []
    for ix, ch in enumerate(chunks):
        for b in range((len(ch) + 4) // 5):
            expected.append((ix, b, ch[b * 5],
                             " ".join(ch[b * 5:b * 5 + 5])))
    got = [(r["chunk_ix"], r["block_index"], r["tags"][0], r["content"][0])
           for r in rows]
    assert got == expected


def test_extraction_prompt_protocol():
    captured = []

    class Capture:
        def complete(self, prompt):
            captured.append(prompt)
            return "<blocks>[]</blocks>"

    strat = LLMExtractionSpark(Capture(), instruction="find things",
                               apply_chunking=False)
    strat.extract_doc("https://u.example", ["some words here"])
    assert "<url>https://u.example</url>" in captured[0]
    assert "<html>some words here</html>" in captured[0]
    assert "<instruction>find things</instruction>" in captured[0]

    captured.clear()
    strat2 = LLMExtractionSpark(Capture(), schema={"fields": ["a"]},
                                apply_chunking=False)
    strat2.extract_doc("u", ["x y z"])
    assert json.dumps({"fields": ["a"]}) in captured[0]


def test_filter_orders_chunks_and_drops_empties():
    strat = LLMContentFilterSpark(DeterministicFilterClient(min_len=3),
                                  chunk_token_threshold=4,
                                  overlap_rate=0.0, word_token_rate=1.0)
    rows = strat.filter_doc("aaa b ccc d eee f x y")
    assert [r["chunk_ix"] for r in rows] == sorted(r["chunk_ix"] for r in rows)
    # every chunk keeps only >=3-char words; an all-short chunk drops
    joined = " ".join(r["markdown"] for r in rows)
    assert "aaa" in joined and " b " not in f" {joined} "
    assert strat.filter_doc("") == []
    assert strat.filter_doc(None) == []


# ---------------------------------------------------------------------------
# Spark fan-out
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("spark")
def test_llm_extract_spark(spark):
    df = spark.createDataFrame(
        [("1", "alpha beta gamma delta"), ("2", "one two")],
        "doc_id string, content string")
    strat = LLMExtractionSpark(DeterministicClient(words_per_block=3),
                               apply_chunking=False)
    out = strat.run_df(df).orderBy("doc_id", "block_index").collect()
    assert [(r.doc_id, r.block_index, r.tags[0]) for r in out] == [
        ("1", 0, "alpha"), ("1", 1, "delta"), ("2", 0, "one")]
    assert out[0].content == ["alpha beta gamma"]
    assert not any(r.error for r in out)
    assert all(r.prompt_tokens > 0 and r.completion_tokens > 0 for r in out)


@pytest.mark.usefixtures("spark")
def test_llm_filter_spark(spark):
    df = spark.createDataFrame(
        [("1", "short loooong tiny words"), ("2", "a b")],
        "doc_id string, content string")
    strat = LLMContentFilterSpark(DeterministicFilterClient(min_len=5))
    out = strat.run_df(df).collect()
    # doc 2 is all-noise -> client says "no content" -> no row
    assert [(r.doc_id, r.markdown) for r in out] == [("1", "short loooong words")]


def test_backoff_client_retries_and_degrades():
    from crawl4ai_spark.extraction.llm import BackoffClient, RateLimitError

    class Flaky:
        def __init__(self, fail_n):
            self.fail_n, self.calls = fail_n, 0

        def complete(self, prompt):
            self.calls += 1
            if self.calls <= self.fail_n:
                raise RateLimitError("429")
            return '<blocks>[{"index": 0, "tags": ["t"], "content": ["ok"]}]</blocks>'

    sleeps = []
    # recovers on the 3rd attempt; delays are base*2^attempt (2, 4)
    c = BackoffClient(Flaky(2), max_attempts=3, base_delay=2.0,
                      sleep=sleeps.append)
    assert "ok" in c.complete("p")
    assert sleeps == [2.0, 4.0]

    # exhausted: RAISES into the caller's per-chunk catch (a returned
    # JSON error payload would be re-marked error=False by the
    # force-JSON parse rung — the reference's own :679 overwrite)
    c2 = BackoffClient(Flaky(99), max_attempts=3, base_delay=1.0,
                       sleep=sleeps.append)
    with pytest.raises(RateLimitError):
        c2.complete("p")

    # max_attempts below 1 still makes exactly one attempt (an
    # implicit-None return would crash the parse ladder downstream)
    c3 = BackoffClient(Flaky(0), max_attempts=0, sleep=lambda s: None)
    assert "ok" in c3.complete("p")

    # non-rate-limit errors propagate
    class Broken:
        def complete(self, prompt):
            raise ValueError("boom")

    with pytest.raises(ValueError):
        BackoffClient(Broken(), sleep=lambda s: None).complete("p")


def test_rate_limited_chunk_degrades_per_chunk_on_every_parse_path():
    """Exhausted retries must surface as error=True blocks under BOTH
    force_json_response settings (the masking the review caught), and
    the filter must drop the chunk like the reference's per-chunk
    catch."""
    from crawl4ai_spark.extraction.llm import (
        BackoffClient,
        LLMContentFilterSpark,
        LLMExtractionSpark,
        RateLimitError,
    )

    class AlwaysLimited:
        def complete(self, prompt):
            raise RateLimitError("429")

    for force in (False, True):
        strat = LLMExtractionSpark(
            client=BackoffClient(AlwaysLimited(), max_attempts=2,
                                 sleep=lambda s: None),
            force_json_response=force)
        rows = strat.extract_doc("https://x.test/", ["some words here"])
        assert len(rows) == 1 and rows[0]["error"] is True, (force, rows)
        assert "429" in rows[0]["content"][0]

    filt = LLMContentFilterSpark(
        client=BackoffClient(AlwaysLimited(), max_attempts=2,
                             sleep=lambda s: None))
    assert filt.filter_doc("<p>hello world</p>") == []
