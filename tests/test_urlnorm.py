"""Canonicalization oracle tests.

Cases derived from the reference's own unit suite
(/root/reference/tests/test_normalize_url.py:6-88 — urljoin resolution
semantics) plus the deep-crawl normalizer's specific behaviors
(/root/reference/crawl4ai/utils.py:2228-2273): fragment drop, tracking
params, query re-encode via parse_qs/urlencode(doseq), trailing slash,
netloc lowercasing.
"""

from __future__ import annotations

import pandas as pd
import pytest

from crawl4ai_spark.functions.urlnorm import (
    can_process_url,
    get_base_domain,
    is_external_url,
    normalize_url_for_deep_crawl,
    normalize_urls_udf,
)

BASE = "http://example.com/base/"

# (href, base, expected canonical) — expected values computed by applying
# the reference algorithm by hand (urljoin + lower netloc + no fragment +
# tracking-param drop + parse_qs re-encode + rstrip('/')).
CASES = [
    # urljoin resolution semantics (reference tests/test_normalize_url.py)
    ("path/to/page.html", BASE, "http://example.com/base/path/to/page.html"),
    ("page.html", "http://example.com/base/", "http://example.com/base/page.html"),
    ("page.html", "http://example.com/base", "http://example.com/page.html"),
    ("http://another.com/page.html", "http://example.com/", "http://another.com/page.html"),
    ("  page.html  ", "http://example.com/", "http://example.com/page.html"),
    ("../otherpage.html", "http://example.com/base/current/", "http://example.com/base/otherpage.html"),
    ("/otherpage.html", "http://example.com/base/current/", "http://example.com/otherpage.html"),
    ("page.html", "http://example.com", "http://example.com/page.html"),
    ("./P02.xlsx", "http://example.com/a/b/t19.shtml", "http://example.com/a/b/P02.xlsx"),
    ("another.doc", "http://example.com/a/b/t19.shtml", "http://example.com/a/b/another.doc"),
    ("path/file.html", "http://example.com:8080/base/", "http://example.com:8080/base/path/file.html"),
    ("path%20with%20spaces/file.html", "http://example.com/", "http://example.com/path%20with%20spaces/file.html"),
    # deep-crawl normalizer specifics (utils.py:2228-2273)
    ("page.html#section", "http://example.com/", "http://example.com/page.html"),        # fragment dropped
    ("#fragment", "http://example.com/page.html", "http://example.com/page.html"),
    ("HTTP://EXAMPLE.COM/Page.html", "http://example.com/", "http://example.com/Page.html"),  # netloc lowered, path kept
    ("page/", "http://example.com/", "http://example.com/page"),                          # trailing slash stripped
    ("http://example.com/", "http://example.com/", "http://example.com"),                 # root '/' also stripped (path.rstrip)
    ("p?utm_source=x&utm_medium=y&id=3", BASE, "http://example.com/base/p?id=3"),         # tracking dropped
    ("p?ref=abc", BASE, "http://example.com/base/p"),                                      # all params tracking -> no query
    ("p?b=2&a=1", BASE, "http://example.com/base/p?b=2&a=1"),                             # parse_qs preserves dict order (insertion)
    ("p?a=1&a=2", BASE, "http://example.com/base/p?a=1&a=2"),                             # multi-value re-encoded via doseq
    ("p?a=", BASE, "http://example.com/base/p"),                                           # blank values dropped by parse_qs
    ("p?fbclid=zzz&q=spark", BASE, "http://example.com/base/p?q=spark"),
    ("", BASE, None),
    (None, BASE, None),
]


@pytest.mark.parametrize("href,base,expected", CASES)
def test_normalize_python(href, base, expected):
    assert normalize_url_for_deep_crawl(href, base) == expected


def test_normalize_udf_matches_python(spark):
    rows = [(h, b) for h, b, _ in CASES if h]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["href", "base"]))
    out = df.select(normalize_urls_udf("href", "base").alias("u")).collect()
    expected = [normalize_url_for_deep_crawl(h, b) for h, b in rows]
    assert [r.u for r in out] == expected


def test_base_domain():
    assert get_base_domain("http://www.example.com/x") == "example.com"
    assert get_base_domain("https://sub.example.co.uk/") == "example.co.uk"
    assert get_base_domain("http://example.com:8080/x") == "example.com"
    assert get_base_domain("http://deep.sub.example.com") == "example.com"
    assert get_base_domain("not a url") == ""


def test_is_external():
    assert is_external_url("mailto:x@y.com", "example.com") is True
    assert is_external_url("javascript:void(0)", "example.com") is True
    assert is_external_url("/relative/path", "example.com") is False
    assert is_external_url("http://other.com/x", "example.com") is True
    assert is_external_url("http://sub.example.com/x", "example.com") is False
    assert is_external_url("http://www.example.com/x", "example.com") is False


def test_can_process_url():
    assert can_process_url("http://example.com/x")
    assert can_process_url("https://a.b/x")
    assert not can_process_url("ftp://example.com/x")
    assert not can_process_url("http://localhost/x")  # no dot in netloc
    assert not can_process_url("nonsense")


def test_efficient_normalize_variant():
    """utils.py:2276-2302: only lowercase-netloc / fragment-drop /
    trailing-slash-strip — query params untouched (incl. tracking)."""
    from crawl4ai_spark.functions.urlnorm import (
        efficient_normalize_url_for_deep_crawl as en,
    )
    assert en("/A b/?utm_source=x#f", "https://Host.EX.com/base/") == \
        "https://host.ex.com/A b?utm_source=x"
    assert en("page/", "https://a.b/c/") == "https://a.b/c/page"
    assert en(None, "https://a.b/") is None
