"""Hypothesis property tests over the pure-Python operator cores.

These run WITHOUT a SparkSession (the pandas-UDF wrappers vectorize the
same functions), so hundreds of generated examples cost milliseconds.
The Spark-side twins are pinned separately by the DuckDB value oracles;
what properties add is coverage of the input space between the
hand-picked fixtures: idempotence, containment, and cross-engine hash
agreement on arbitrary strings.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from crawl4ai_spark.functions.sanitize import (
    repair_mojibake,
    sanitize_input_encode,
)
from crawl4ai_spark.functions.urlnorm import (
    get_base_domain,
    is_external_url,
    normalize_url_extended,
    normalize_url_for_deep_crawl,
)

# --- structured URL generator (arbitrary text through urljoin tests ----
# --- urllib, not our semantics) ----------------------------------------

_label = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1, max_size=8).filter(
    lambda s: not s.startswith("-") and not s.endswith("-")
)
_host = st.lists(_label, min_size=2, max_size=4).map(".".join)
_seg = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789._~%20", min_size=1, max_size=10)
_path = st.lists(_seg, min_size=0, max_size=4).map(lambda xs: "/" + "/".join(xs))
_key = st.one_of(_label, st.sampled_from(["utm_source", "ref", "fbclid", "gclid", "q"]))
_query = st.lists(st.tuples(_key, _label), min_size=0, max_size=4).map(
    lambda kvs: "&".join(f"{k}={v}" for k, v in kvs)
)
_frag = st.one_of(st.just(""), _label)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https"]))
    host = draw(_host)
    path = draw(_path)
    q = draw(_query)
    f = draw(_frag)
    u = f"{scheme}://{host}{path}"
    if q:
        u += "?" + q
    if f:
        u += "#" + f
    return u


@settings(max_examples=300, deadline=None)
@given(urls())
def test_deep_crawl_normalize_idempotent(u):
    once = normalize_url_for_deep_crawl(u, u)
    again = normalize_url_for_deep_crawl(once, once)
    assert again == once


@settings(max_examples=300, deadline=None)
@given(urls())
def test_extended_normalize_idempotent(u):
    once = normalize_url_extended(u, u)
    again = normalize_url_extended(once, once)
    assert again == once


@settings(max_examples=300, deadline=None)
@given(urls())
def test_normalized_has_no_tracking_or_fragment(u):
    out = normalize_url_for_deep_crawl(u, u)
    assert "#" not in out
    from urllib.parse import parse_qs, urlparse

    q = parse_qs(urlparse(out).query)
    assert not ({"utm_source", "utm_medium", "utm_campaign", "ref", "fbclid"} & q.keys())


@settings(max_examples=300, deadline=None)
@given(urls())
def test_url_internal_to_its_own_base_domain(u):
    base = get_base_domain(u)
    assert base  # generated URLs always have >= 2 labels
    assert ":" not in base  # never keeps a port
    assert not is_external_url(u, base)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_sanitize_idempotent(s):
    once = sanitize_input_encode(s)
    assert sanitize_input_encode(once) == once


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(max_codepoint=127), max_size=200))
def test_mojibake_repair_never_touches_ascii(s):
    assert repair_mojibake(s) == s


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=1, max_size=80).filter(lambda s: "\x00" not in s))
def test_hash64_contract_matches_duckdb(s):
    """The cross-engine hash contract every exact oracle leans on:
    int(md5(x)[:15], 16) == DuckDB ('0x'||substr(md5(x),1,15))::BIGINT.
    (The Spark side — conv(substr(md5,1,15),16,10) — is pinned against
    DuckDB by all 67 value oracles.)"""
    expected = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
    got = duckdb.execute(
        "SELECT CAST('0x' || substr(md5(?), 1, 15) AS BIGINT)", [s]
    ).fetchone()[0]
    assert got == expected
