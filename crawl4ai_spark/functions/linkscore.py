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


def _any_contains(col: Column, needles: tuple[str, ...]) -> Column:
    return reduce(lambda a, n: a | col.contains(n), needles, F.lit(False))


def link_intrinsic_score(
    link_text, url, title_attr=None, class_attr=None, rel_attr=None
) -> Column:
    """0-10 link quality score (utils.py:3143-3255), contextual-overlap
    term omitted (that term needs page-term sets; see bm25/adaptive)."""
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
    return F.greatest(F.lit(0.0), F.least(score, F.lit(10.0)))


def total_link_score(
    intrinsic: Column | None,
    contextual: Column | None,
    score_links_enabled: bool = True,
    query_provided: bool = False,
) -> Column:
    """calculate_total_score (utils.py:3258-3303): no scoring -> 5.0;
    intrinsic-only -> clamp(intrinsic); both -> 0.7*intrinsic +
    0.3*min(10*contextual, 10), clamped to [0, 10]."""
    if not score_links_enabled:
        return F.lit(5.0)
    intr = F.coalesce(intrinsic if intrinsic is not None else F.lit(None), F.lit(0.0))
    if not query_provided or contextual is None:
        return F.greatest(F.lit(0.0), F.least(intr, F.lit(10.0)))
    ctx = F.least(F.coalesce(contextual, F.lit(0.0)) * 10.0, F.lit(10.0))
    return F.greatest(F.lit(0.0), F.least(intr * 0.7 + ctx * 0.3, F.lit(10.0)))
