"""Link intrinsic + total scoring as native Column expressions.

Re-expresses /root/reference/crawl4ai/utils.py:3143-3255
(calculate_link_intrinsic_score) and utils.py:3258-3303
(calculate_total_score) as Catalyst column algebra over (link_text,
url, title_attr, class_attr, rel_attr) columns plus broadcastable page
context — no Python in the hot path, so scoring 10^9 discovered links
per round is a projection, not a UDF stage.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

_NAV_CLASSES = ("nav", "menu", "primary", "main", "important")
_BAD_CLASSES = ("ad", "sponsor", "track", "promo", "banner")
_GOOD_RELS = ("canonical", "next", "prev", "chapter")
_BAD_RELS = ("nofollow", "sponsored", "ugc")
_GOOD_PATHS = ("/docs/", "/api/", "/guide/", "/tutorial/", "/reference/", "/manual/")
_MED_PATHS = ("/blog/", "/article/", "/post/", "/news/")
_BAD_PATHS = ("/admin/", "/login/", "/cart/", "/checkout/", "/track/", "/click/")
_GENERIC_TEXTS = ("click here", "read more", "more info", "link", "here")
# context sections (utils.py:3231-3249): the strip charset is Python's
# word.strip('.,!?;:"()[]{}') — both-end repeated strip == this regex
_PUNCT_STRIP_RE = r'^[.,!?;:"()\[\]{}]+|[.,!?;:"()\[\]{}]+$'
_DOC_KEYWORDS = ("api", "reference", "guide", "tutorial", "example")
_DOCS_DOMAIN_MARKS = ("docs.", "api.", "developer.", "reference.")


def _any_contains(col: Column, needles: tuple[str, ...]) -> Column:
    return reduce(lambda a, n: a | col.contains(n), needles, F.lit(False))


def _term_set(text: Column) -> Column:
    """set(word.strip(PUNCT).lower() for word in s.split() if
    len(word.strip(PUNCT)) > 2) as an array<string> column — the exact
    tokenization of extract_page_context / the intrinsic overlap term
    (utils.py:3131-3135, 3233-3235). str.split() drops empty tokens,
    hence the \\s+ split + non-empty filter."""
    toks = F.split(F.trim(text), r"\s+")
    stripped = F.transform(
        toks, lambda w: F.lower(F.regexp_replace(w, _PUNCT_STRIP_RE, ""))
    )
    return F.array_distinct(F.filter(stripped, lambda w: F.length(w) > 2))


def page_context_terms(
    page_title=None, headlines_text=None, meta_description=None
) -> Column:
    """extract_page_context (utils.py:3098-3141) term-set half: the
    distinct >2-char punctuation-stripped tokens of lower(title + ' ' +
    headlines + ' ' + meta), as an array<string> — broadcast-joinable
    page context for context-exact intrinsic scoring. None inputs are
    empty strings, matching the reference's `or ''` coalescing."""
    def _c(c):
        if c is None:
            return F.lit("")
        return F.col(c) if isinstance(c, str) else c

    parts = [F.coalesce(_c(c), F.lit("")) for c in
             (page_title, headlines_text, meta_description)]
    return _term_set(F.lower(F.concat_ws(" ", *parts)))


def page_is_docs_site(base_url) -> Column:
    """extract_page_context's is_docs_site flag (utils.py:3124-3126):
    urlparse(base_url).netloc.lower() contains any of docs./api./
    developer./reference. — netloc extracted scheme-relatively, so a
    schemeless string yields false exactly like urlparse's empty
    netloc."""
    u = F.col(base_url) if isinstance(base_url, str) else base_url
    dom = F.lower(F.regexp_extract(
        F.coalesce(u, F.lit("")), r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1
    ))
    return _any_contains(dom, _DOCS_DOMAIN_MARKS)


def link_intrinsic_score(
    link_text, url, title_attr=None, class_attr=None, rel_attr=None,
    page_terms=None, is_docs_site=None,
) -> Column:
    """0-10 link quality score (utils.py:3143-3255). With the default
    None context this is the reference called with an empty
    page_context (the engine's crawl path carries query relevance in
    the contextual/BM25 column instead). Pass `page_terms` (array
    column from page_context_terms) and/or `is_docs_site` (bool column
    from page_is_docs_site) for the context-EXACT score: the ×2
    term-overlap section (utils.py:3231-3240) and the docs-site
    keyword bonus (utils.py:3243-3249), both applied BEFORE the final
    [0, 10] clamp, byte-equal to the reference
    (tests/test_reference_equality.py)."""
    def _col(c):
        if c is None:
            return F.lit("")
        return F.col(c) if isinstance(c, str) else c

    text = F.coalesce(_col(link_text), F.lit(""))
    u = _col(url)
    ul = F.lower(u)
    title = F.coalesce(_col(title_attr), F.lit(""))
    cls = F.lower(F.coalesce(_col(class_attr), F.lit("")))
    rel = F.lower(F.coalesce(_col(rel_attr), F.lit("")))

    score = F.lit(0.0)
    # 1. attribute quality
    score = score + F.when(F.length(F.trim(title)) > 3, 1.0).otherwise(0.0)
    score = score + F.when(_any_contains(cls, _NAV_CLASSES), 1.5).otherwise(0.0)
    score = score - F.when(_any_contains(cls, _BAD_CLASSES), 1.0).otherwise(0.0)
    score = score + F.when(_any_contains(rel, _GOOD_RELS), 1.0).otherwise(0.0)
    score = score - F.when(_any_contains(rel, _BAD_RELS), 0.5).otherwise(0.0)
    # 2. URL structure
    score = score + (
        F.when(_any_contains(ul, _GOOD_PATHS), 2.0)
        .when(_any_contains(ul, _MED_PATHS), 1.0)
        .otherwise(0.0)
    )
    score = score - F.when(_any_contains(ul, _BAD_PATHS), 1.5).otherwise(0.0)
    url_depth = F.length(u) - F.length(F.replace(u, F.lit("/"), F.lit(""))) - 2
    score = score + (
        F.when(url_depth <= 2, 1.0).when(url_depth > 5, -0.5).otherwise(0.0)
    )
    score = score + F.when(u.startswith("https://"), 0.5).otherwise(0.0)
    # 3. text quality
    tclean = F.trim(text)
    words = F.size(F.filter(F.split(tclean, r"\s+"), lambda w: w != ""))
    score = score + F.when(F.length(tclean) > 3, 1.0).otherwise(0.0)
    score = score + F.when(words >= 2, 0.5).otherwise(0.0)
    score = score + F.when(words >= 4, 0.5).otherwise(0.0)
    score = score - F.when(F.lower(tclean).isin(*_GENERIC_TEXTS), 1.0).otherwise(0.0)
    # 4. contextual relevance: guard chain is the reference's
    #    `page_context.get('terms') and link_text` + `if link_words`
    #    + `if overlap > 0` (utils.py:3231-3240)
    if page_terms is not None:
        terms = page_terms if not isinstance(page_terms, str) else F.col(page_terms)
        link_words = _term_set(text)
        overlap = F.size(F.array_intersect(link_words, terms))
        score = score + F.when(
            (F.size(terms) > 0) & (F.length(text) > 0)
            & (F.size(link_words) > 0) & (overlap > 0),
            overlap.cast("double")
            / F.least(F.size(link_words), F.lit(10)).cast("double") * 2.0,
        ).otherwise(0.0)
    # 5. docs-site keyword bonus (utils.py:3243-3249)
    if is_docs_site is not None:
        docs = (F.col(is_docs_site) if isinstance(is_docs_site, str)
                else is_docs_site)
        score = score + F.when(
            F.coalesce(docs, F.lit(False)) & (F.length(text) > 0)
            & _any_contains(F.lower(text), _DOC_KEYWORDS),
            1.0,
        ).otherwise(0.0)
    return F.greatest(F.lit(0.0), F.least(score, F.lit(10.0)))


def total_link_score(
    intrinsic: Column | None,
    contextual: Column | None,
    score_links_enabled: bool = True,
    query_provided: bool = False,
) -> Column:
    """calculate_total_score (utils.py:3258-3303): no scoring -> 5.0;
    intrinsic-only -> clamp(intrinsic); both -> 0.7*intrinsic +
    0.3*min(10*contextual, 10), clamped to [0, 10]. A per-row NULL
    contextual takes the intrinsic-only branch, exactly like the
    reference's `contextual_score is None` check — not contextual=0."""
    if not score_links_enabled:
        return F.lit(5.0)
    intr = F.coalesce(intrinsic if intrinsic is not None else F.lit(None), F.lit(0.0))
    intr_only = F.greatest(F.lit(0.0), F.least(intr, F.lit(10.0)))
    if not query_provided or contextual is None:
        return intr_only
    ctx = F.least(contextual * 10.0, F.lit(10.0))
    weighted = F.greatest(
        F.lit(0.0), F.least(intr * 0.7 + ctx * 0.3, F.lit(10.0))
    )
    return F.when(contextual.isNull(), intr_only).otherwise(weighted)
