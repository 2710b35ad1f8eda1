"""preprocess_html_for_schema -> the `fit_html` column.

Re-expresses the reference's schema-generation preprocessor
(/root/reference/crawl4ai/utils.py:2883-3026): shrink a page to its
structural skeleton so a schema builder (or an LLM) sees selectors, not
prose — drop <head> and non-content tags, keep only the selector-bearing
attributes (id/class/name/type/value + data-*), truncate long text and
attribute values, drop repeated class-signature elements (first kept),
cap total size.

Differences from the reference, by container necessity: the DOM is the
stdlib tree (no lxml), which stores an element's direct text pieces
without tail interleaving — text truncation applies per piece and
serialization emits text before children. The selector skeleton (tags,
ids, classes, structure) is preserved identically.

Runs as one mapInPandas stage (``fit_html_pages``) — per-page pure
function, embarrassingly parallel at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawl4ai_spark.extraction.jsoncss import _Node, parse_dom
from crawl4ai_spark.ops.text import hash64  # noqa: F401  (cross-engine family)

REMOVE_TAGS = {"head", "script", "style", "noscript", "iframe", "canvas",
               "svg", "video", "audio", "source", "track", "map", "area"}
KEEP_ATTRS = {"id", "class", "name", "type", "value"}
VOID_TAGS = {"img", "br", "hr", "input", "meta", "link", "col", "wbr", "embed"}


def _subtree_text(node: _Node) -> str:
    parts = list(node.texts)
    for c in node.children:
        parts.append(_subtree_text(c))
    return "".join(parts)


def _clean(node: _Node, text_threshold: int, attr_value_threshold: int) -> None:
    node.children = [c for c in node.children if c.tag not in REMOVE_TAGS]
    # attribute policy (utils.py:2928-2944)
    node.attrs = {
        k: (v[:attr_value_threshold] + "..."
            if v is not None and len(v) > attr_value_threshold else v)
        for k, v in node.attrs.items()
        if k in KEEP_ATTRS or k.startswith("data-")
    }
    # text truncation (utils.py:2946-2952): stripped-length test,
    # truncated pieces are stripped, short pieces stay verbatim
    node.texts = [
        (t.strip()[:text_threshold] + "...")
        if len(t.strip()) > text_threshold else t
        for t in node.texts
    ]
    for c in node.children:
        _clean(c, text_threshold, attr_value_threshold)


def _dedup_by_class_sig(root: _Node) -> None:
    """First-seen-wins removal of repeated (tag, class, subtree-text)
    elements (utils.py:2956-2976)."""
    seen: set[tuple] = set()

    def walk(node: _Node) -> None:
        kept = []
        for c in node.children:
            cls = c.attrs.get("class")
            if cls:
                sig = (c.tag, cls, hash(_subtree_text(c)))
                if sig in seen:
                    continue
                seen.add(sig)
            kept.append(c)
        node.children = kept
        for c in node.children:
            walk(c)

    walk(root)


def _serialize(node: _Node) -> str:
    if node.tag == "#root":
        return "".join(_serialize(c) for c in node.children)
    a = "".join(
        f' {k}="{v}"' for k, v in node.attrs.items() if v is not None
    )
    if node.tag in VOID_TAGS and not node.children and not any(
        t.strip() for t in node.texts
    ):
        return f"<{node.tag}{a}/>"
    inner = "".join(node.texts) + "".join(_serialize(c) for c in node.children)
    return f"<{node.tag}{a}>{inner}</{node.tag}>"


def preprocess_html_for_schema(html: str, text_threshold: int = 100,
                               attr_value_threshold: int = 200,
                               max_size: int = 100_000) -> str:
    try:
        root = parse_dom(html)
        _clean(root, text_threshold, attr_value_threshold)
        _dedup_by_class_sig(root)
        out = _serialize(root)
        if len(out) > max_size:
            return out[:max_size] + "..."
        return out
    except Exception:
        return html[:max_size] if html and len(html) > max_size else (html or "")


def fit_html_pages(df: DataFrame, url_col: str = "url",
                   html_col: str = "html", **kw) -> DataFrame:
    """mapInPandas stage: (url, html) -> (url, fit_html)."""
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("fit_html", T.StringType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "url": pdf[url_col],
                "fit_html": [preprocess_html_for_schema(h, **kw)
                             for h in pdf[html_col]],
            })

    return df.select(F.col(url_col), F.col(html_col)).mapInPandas(run, schema)
