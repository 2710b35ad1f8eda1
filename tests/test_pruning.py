"""PruningContentFilter: boilerplate subtrees pruned, content kept."""

from __future__ import annotations

from crawl4ai_spark.extraction.pruning import fit_markdown, fit_pages

HTML = """
<html><head><title>T</title></head><body>
<nav class="nav-main"><a href="/a">Home</a><a href="/b">About</a><a href="/c">Shop</a></nav>
<article class="post-content">
  <h1>Real Title</h1>
  <p>This is the actual article body with a good amount of running text
  that carries the information a reader came for, sentence after sentence
  of real content that should clearly survive pruning.</p>
  <p>Second paragraph with more substantive material and details.</p>
</article>
<aside class="sidebar ad-box"><a href="/x">Ad one</a><a href="/y">Ad two</a></aside>
<footer class="footer">(c) 2026 links <a href="/p">privacy</a> <a href="/t">terms</a></footer>
</body></html>
"""


def test_fit_markdown_prunes_boilerplate():
    fit = fit_markdown(HTML)
    assert "actual article body" in fit
    assert "# Real Title" in fit
    assert "Second paragraph" in fit
    assert "Home" not in fit          # nav dropped (always-drop tag)
    assert "Ad one" not in fit        # link-dense ad-class aside dropped
    assert "privacy" not in fit       # footer dropped


def test_fit_pages_stage(spark):
    df = spark.createDataFrame([("u1", HTML)], "url string, html string")
    out = fit_pages(df).collect()
    assert len(out) == 1 and "actual article body" in out[0].fit_markdown
