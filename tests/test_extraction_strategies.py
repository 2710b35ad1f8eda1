"""BM25 scoring, link scoring, and JSON-CSS structured extraction."""

from __future__ import annotations

import json
import math

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.extraction.jsoncss import extract_rows, parse_dom, select
from crawl4ai_spark.functions.linkscore import link_intrinsic_score, total_link_score
from crawl4ai_spark.ops.bm25 import bm25_scores, content_relevance_filter

HTML = """
<html><body>
  <div class="product" id="p1">
    <h2>Widget <b>A</b></h2>
    <span class="price">9.99</span>
    <a href="/p/1" title="buy">Buy now</a>
    <img src="/img/1.png" alt="w1"/>
  </div>
  <div class="product" id="p2">
    <h2>Widget B</h2>
    <span class="price">19.99</span>
  </div>
</body></html>
"""


def test_jsoncss_select_subset():
    root = parse_dom(HTML)
    assert len(select(root, ".product")) == 2
    assert len(select(root, "div.product")) == 2
    assert select(root, "#p2")[0].attrs["id"] == "p2"
    assert len(select(root, "div.product span.price")) == 2
    assert len(select(root, "[src]")) == 1
    assert len(select(root, "h2, span")) == 4


def test_jsoncss_extract_rows():
    schema = {
        "baseSelector": "div.product",
        "fields": [
            {"name": "name", "selector": "h2", "type": "text"},
            {"name": "price", "selector": ".price", "type": "text"},
            {"name": "img", "selector": "img", "type": "attribute",
             "attribute": "src", "default": None},
            {"name": "link_title", "selector": "a", "type": "attribute",
             "attribute": "title", "default": None},
        ],
    }
    rows = [json.loads(r) for r in extract_rows(HTML, schema)]
    # None-valued fields are omitted, mirroring _extract_item
    # (extraction_strategy.py:984-1009)
    assert rows == [
        {"name": "Widget A", "price": "9.99", "img": "/img/1.png",
         "link_title": "buy"},
        {"name": "Widget B", "price": "19.99"},
    ]


def test_jsoncss_nested_list_and_list():
    schema = {
        "baseSelector": "body",
        "fields": [
            {"name": "products", "type": "nested_list", "selector": "div.product",
             "fields": [
                 {"name": "name", "selector": "h2", "type": "text"},
                 {"name": "buy", "selector": "a", "type": "text"},
             ]},
            {"name": "prices", "type": "list", "selector": ".price",
             "fields": [{"name": "v", "type": "text"}]},
        ],
    }
    rows = [json.loads(r) for r in extract_rows(HTML, schema)]
    assert rows == [{
        "products": [
            {"name": "Widget A", "buy": "Buy now"},
            {"name": "Widget B"},          # no <a> -> field omitted
        ],
        "prices": [{"v": "9.99"}, {"v": "19.99"}],
    }]


def test_jsonxpath_selectors():
    from crawl4ai_spark.extraction.jsoncss import select_xpath

    root = parse_dom(HTML)
    assert len(select_xpath(root, "//div")) == 2
    assert select_xpath(root, "//div[@id='p2']")[0].attrs["id"] == "p2"
    assert len(select_xpath(root, "//div/h2")) == 2
    assert select_xpath(root, "//div[2]/h2")[0].text() == "Widget B"
    assert len(select_xpath(root, "//body//span")) == 2
    assert select_xpath(root, ".//img")[0].attrs["src"] == "/img/1.png"

    schema = {
        "baseSelector": "//div[@class='product']",
        "fields": [
            {"name": "name", "selector": ".//h2", "type": "text"},
            {"name": "img", "selector": ".//img", "type": "attribute",
             "attribute": "src"},
        ],
    }
    rows = [json.loads(r) for r in extract_rows(HTML, schema, engine="xpath")]
    assert rows == [
        {"name": "Widget A", "img": "/img/1.png"},
        {"name": "Widget B"},
    ]


def test_jsoncss_regex_and_nested():
    schema = {
        "baseSelector": "div.product",
        "fields": [
            {"name": "cents", "selector": ".price", "type": "regex",
             "pattern": r"\.(\d+)"},
            # nested requires a selector (the reference's _extract_field
            # does field["selector"] unconditionally; missing -> default)
            {"name": "meta", "type": "nested", "selector": "h2", "fields": [
                {"name": "n", "type": "text"},
            ]},
            {"name": "nosel", "type": "nested", "fields": [
                {"name": "n", "selector": "h2", "type": "text"},
            ]},
        ],
    }
    rows = [json.loads(r) for r in extract_rows(HTML, schema)]
    assert rows[0]["cents"] == "99" and rows[0]["meta"] == {"n": "Widget A"}
    assert "nosel" not in rows[0]


def test_bm25_matches_formula(spark):
    rows = [
        (1, "spark spark join"),
        (2, "join hash table"),
        (3, "unrelated words only"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.bm25 for r in bm25_scores(df, ["spark"]).collect()}
    # N=3, df=1, avgdl=3; idf = ln((3-1+0.5)/(1+0.5)+1)
    idf = math.log((3 - 1 + 0.5) / (1 + 0.5) + 1)
    tf = 2.0
    expect = idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * 3 / 3))
    assert out[1] == round(expect, 6)
    assert out[3] == 0.0
    kept = content_relevance_filter(df, ["spark"], threshold=0.1).collect()
    assert [r.doc_id for r in kept] == [1]


def test_link_intrinsic_score_components(spark):
    rows = [
        # generic text penalty + http + depth<=2
        ("click here", "http://x.test/a", "", "", ""),
        # docs path + https + title + multiword text
        ("API reference guide here", "https://x.test/docs/a", "long title", "nav-menu", "next"),
        # admin path + ad class + nofollow
        ("x", "https://x.test/admin/login/cart/deep/very/deep/a", "", "ad-banner", "nofollow"),
    ]
    df = spark.createDataFrame(
        rows, "text string, url string, title string, cls string, rel string")
    out = df.select(
        F.round(link_intrinsic_score("text", "url", "title", "cls", "rel"), 2)
        .alias("s")).collect()
    # row0: +1 depth, +1 len>3 ('click here'), +0.5 two words, -1 generic = 1.5
    assert out[0].s == 1.5
    # row1: +1 title, +1.5 nav, +1 rel-next, +2 docs, +1 depth, +0.5 https,
    #       +1 len, +0.5 2w, +0.5 4w = 9.0
    assert out[1].s == 9.0
    # row2: -1 ad, -0.5 nofollow, -1.5 admin, -0.5 depth>5, +0.5 https = 0 (clamped)
    assert out[2].s == 0.0


def test_total_link_score_modes(spark):
    df = spark.createDataFrame([(6.0, 0.5)], "i double, c double")
    r = df.select(
        total_link_score(None, None, score_links_enabled=False).alias("none"),
        total_link_score(F.col("i"), None, True, False).alias("intr"),
        total_link_score(F.col("i"), F.col("c"), True, True).alias("both"),
    ).collect()[0]
    assert r.none == 5.0
    assert r.intr == 6.0
    assert r.both == pytest.approx(6.0 * 0.7 + 5.0 * 0.3)
