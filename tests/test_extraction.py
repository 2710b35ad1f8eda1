"""Span-sequence golden tests.

The per-row invariant (BASELINE.json input_hint): span-sequence
equality on (kind, text, media_ref, order). Expected spans here are
hand-derived from the documented markdown conventions, mirroring how
the reference interleaves text and inline media tokens
(markdown_generation_strategy.py:11; content_scraping_strategy.py:474).
"""

from __future__ import annotations

from crawl4ai_spark.extraction.html_parser import extract_page

PAGE = """<!doctype html>
<html><head>
  <title>Product P11 &amp; Co</title>
  <meta name="description" content="A fine product">
  <meta property="og:type" content="product">
  <script>var x = "<p>junk</p>";</script>
  <style>p { color: red }</style>
</head>
<body>
  <h1>Product P11</h1>
  <p>Great <strong>quality</strong> item. See <a href="/specs.html" title="Specs">the specs</a>.</p>
  <img src="/img/p11.jpg" alt="P11 front" width="400" height="300">
  <p>More details below.</p>
  <ul><li>Fast</li><li>Cheap</li></ul>
  <video src="/vid/p11.mp4" title="Demo"></video>
  <table summary="spec table"><caption>Specs</caption>
    <tr><th>Key</th><th>Value</th></tr>
    <tr><td>Weight</td><td>3kg</td></tr>
  </table>
  <p>Buy from <a href="http://partner.example.org/buy">partner</a> or
     <a href="/buy?utm_source=self&x=1#top">here</a>.</p>
  <noscript>no js</noscript>
</body></html>"""


def test_span_sequence():
    r = extract_page("http://shop.test/p/p11.html", PAGE)
    seq = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
    assert seq == [
        ("text",
         "# Product P11\n\nGreat **quality** item. See [the specs](http://shop.test/specs.html).",
         None, 0),
        ("image", "P11 front", "http://shop.test/img/p11.jpg", 1),
        ("text", "More details below.\n\n* Fast\n* Cheap", None, 2),
        ("video", "Demo", "http://shop.test/vid/p11.mp4", 3),
        ("table", "Specs: Key | Value", None, 4),
        ("text",
         "Buy from [partner](http://partner.example.org/buy) or "
         "[here](http://shop.test/buy?utm_source=self&x=1#top).",
         None, 5),
    ]


def test_links_internal_external_and_norm():
    r = extract_page("http://shop.test/p/p11.html", PAGE)
    by_href = {l["href"]: l for l in r["links"]}
    assert by_href["http://shop.test/specs.html"]["internal"] is True
    assert by_href["http://shop.test/specs.html"]["text"] == "the specs"
    assert by_href["http://shop.test/specs.html"]["title"] == "Specs"
    assert by_href["http://partner.example.org/buy"]["internal"] is False
    # canonicalization applied for frontier identity: utm dropped, fragment dropped
    assert by_href["http://shop.test/buy?utm_source=self&x=1#top"]["url_norm"] == \
        "http://shop.test/buy?x=1"


def test_media_and_tables():
    r = extract_page("http://shop.test/p/p11.html", PAGE)
    imgs = [m for m in r["media"] if m["type"] == "image"]
    assert len(imgs) == 1
    # width>150 +1, height>150 +1, alt +1, known format +1 => 4
    assert imgs[0]["score"] == 4
    assert imgs[0]["group_id"] == 0
    vids = [m for m in r["media"] if m["type"] == "video"]
    assert vids[0]["src"] == "http://shop.test/vid/p11.mp4"
    assert r["tables"] == [
        {"headers": ["Key", "Value"], "rows": [["Weight", "3kg"]],
         "caption": "Specs", "summary": "spec table"}
    ]


def test_metadata():
    r = extract_page("http://shop.test/p/p11.html", PAGE)
    assert r["metadata"]["title"] == "Product P11 & Co"
    assert r["metadata"]["description"] == "A fine product"
    assert r["metadata"]["og:type"] == "product"


def test_script_style_dropped_and_base_href():
    html = """<html><head><base href="http://cdn.test/root/"></head>
    <body><p>x</p><a href="rel.html">r</a><img src="i.png" alt="a"></body></html>"""
    r = extract_page("http://orig.test/page", html)
    assert r["links"][0]["href"] == "http://cdn.test/root/rel.html"
    assert r["media"][0]["src"] == "http://cdn.test/root/i.png"
    assert "junk" not in extract_page("http://a.b/c", PAGE)["markdown"]


def test_hidden_image_skipped_and_srcset_fallback():
    html = """<body>
      <img src="x.png" style="display: none" alt="hidden">
      <img srcset="a-2x.png 2x, a-1x.png 1x" alt="s">
      <img data-src="lazy.png" alt="lazy">
    </body>"""
    r = extract_page("http://h.test/", html)
    srcs = [m["src"] for m in r["media"]]
    assert srcs == ["http://h.test/a-2x.png", "http://h.test/lazy.png"]


def test_malformed_html_never_raises():
    for bad in ["<div><p>unclosed", "<<<>>>", "<a href=>x</a>", "", None,
                "<table><tr><td>only cell", "<video><source src='v.mp4'>"]:
        r = extract_page("http://m.test/", bad)
        assert isinstance(r["spans"], list)


def test_duplicate_links_first_wins():
    html = '<body><a href="/a">one</a><a href="/a">two</a></body>'
    r = extract_page("http://d.test/", html)
    assert len(r["links"]) == 1
    assert r["links"][0]["text"] == "one"


def test_offsets_are_dense_and_ordered():
    r = extract_page("http://shop.test/p/p11.html", PAGE)
    assert [s["offset"] for s in r["spans"]] == list(range(len(r["spans"])))
