"""Sanitization / encoding repair (reference utils.py:775-792 semantics
plus the deterministic cp1252-mojibake fix-up; applied to every body at
the top of the extract mapInPandas, like async_webcrawler.py:271,341)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawl4ai_spark.functions.sanitize import (
    MOJIBAKE_PAIRS,
    repair_mojibake,
    repair_mojibake_expr,
    sanitize_input_encode,
)


def test_sanitize_input_encode_reference_semantics():
    # falsy -> "" (the reference returns "" for None/empty)
    assert sanitize_input_encode(None) == ""
    assert sanitize_input_encode("") == ""
    # clean text passes through untouched
    assert sanitize_input_encode("plain café ⟨x⟩") == "plain café ⟨x⟩"
    # lone surrogates cannot survive utf-8: encode(errors=ignore) drops them
    assert sanitize_input_encode("a\ud800b") == "ab"
    assert sanitize_input_encode("\udfff") == ""


def test_mojibake_map_is_correct_double_decode():
    # every `bad` really is intended.encode(utf-8) mis-decoded as cp1252
    # (modulo the three C1 bytes cp1252 leaves undefined, where the
    # WHATWG map passes the byte through as the same codepoint)
    for bad, good in MOJIBAKE_PAIRS:
        if bad == "â€":  # truncated variant, by construction
            continue
        raw = good.encode("utf-8")
        redecoded = raw.decode("cp1252", errors="replace")
        # strict check where cp1252 defines every byte
        if "�" not in redecoded:
            assert redecoded == bad, (bad, good, redecoded)
        else:
            # C1-undefined byte (e.g. 0x9d): WHATWG maps it to U+009D,
            # which is exactly what our `bad` string carries
            assert bad == "".join(
                c if c != "�" else chr(b)
                for b, c in zip(raw, redecoded)
            ), (bad, good)


def test_repair_mojibake_python_fixes_planted_text():
    s = "donâ€™t say â€œcafÃ©â€ at 90Â° â€” maÃ±anaâ€¦"
    assert repair_mojibake(s) == "don’t say “café” at 90° — mañana…"
    # idempotent on already-clean text
    clean = "don’t say “café”"
    assert repair_mojibake(clean) == clean


def test_repair_mojibake_expr_matches_python(spark):
    planted = [
        "donâ€™t",
        "â€œqâ€",
        "cafÃ© maÃ±anaâ€¦",
        "90Â° â€” x",
        "already clean — ok",
        "",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(planted)], "i long, t string")
    got = {
        r["i"]: r["c"]
        for r in df.select("i", repair_mojibake_expr(F.col("t")).alias("c")).collect()
    }
    for i, s in enumerate(planted):
        assert got[i] == repair_mojibake(s), s
    # null-safe: null -> ""
    ndf = spark.createDataFrame([(0, None)], "i long, t string")
    assert ndf.select(repair_mojibake_expr(F.col("t")).alias("c")).first()["c"] == ""


def test_extract_batch_sanitizes_body():
    """The extract batch function applies sanitize_input_encode before
    parsing (reference applies it to html before aprocess_html) — a lone
    surrogate in the body is stripped, not crashed on.  Exercised at the
    batch-function level because Arrow transport already replaces
    invalid UTF-16 with U+FFFD before a worker would see it."""
    import pandas as pd

    from crawl4ai_spark.extraction.extract import _make_extractor

    fn = _make_extractor(carry=())
    pdf = pd.DataFrame(
        {
            "url": ["http://x.test/"],
            "html": ["<html><body><p>a\ud800b</p></body></html>"],
        }
    )
    (out,) = list(fn(iter([pdf])))
    assert "ab" in out["markdown"][0]
    assert "\ud800" not in out["markdown"][0]
