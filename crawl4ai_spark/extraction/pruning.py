"""PruningContentFilter -> fit_markdown.

Re-expresses the reference's DOM-pruning content filter
(/root/reference/crawl4ai/content_filter_strategy.py:533-777): each
element gets a composite score

    0.4 * text_density  +  0.2 * (1 - link_density)
  + 0.2 * tag_weight    +  0.1 * class/id signal
  + 0.1 * text_length signal

and subtrees scoring under the threshold (default 0.48, the reference's
fixed mode) are pruned bottom-up; what survives is the "fit" content.
DOM comes from the same stdlib tree as jsoncss (no lxml in container);
density/length signals are squashed with x/(x+k) instead of the
reference's corpus-free min/max normalization — documented simplification,
same monotonicity.

Runs inside the extraction mapInPandas stage or standalone via
``fit_pages`` — per-page pure function, no cross-row state, so it
parallelizes embarrassingly at 100 TB.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawl4ai_spark.extraction.jsoncss import _Node, parse_dom

# tag importance (content_filter_strategy.py dynamic-threshold tag tiers)
TAG_WEIGHTS = {
    "article": 1.5, "main": 1.4, "section": 1.2, "p": 1.0,
    "h1": 1.2, "h2": 1.1, "h3": 1.0, "h4": 0.9, "h5": 0.9, "h6": 0.9,
    "blockquote": 1.0, "pre": 1.0, "code": 0.9, "td": 0.8, "th": 0.8,
    "li": 0.8, "ul": 0.8, "ol": 0.8, "table": 0.9, "div": 0.7,
    "span": 0.6, "a": 0.5,
    "nav": 0.2, "aside": 0.2, "footer": 0.2, "header": 0.3,
    "form": 0.2, "button": 0.1,
}
_NEG_CLASS_RE = re.compile(
    r"nav|menu|sidebar|footer|header|banner|ad[-_s]|sponsor|promo|comment|share|social|cookie",
    re.I,
)
_POS_CLASS_RE = re.compile(r"content|article|main|body|post|text|entry", re.I)
_ALWAYS_DROP = {"script", "style", "noscript", "template", "nav", "form", "button"}


def _metrics(node: _Node) -> tuple[int, int, int]:
    """(text_len, link_text_len, element_count) over the subtree."""
    own = sum(len(t.strip()) for t in node.texts)
    text, link_text, elems = own, 0, 1
    for c in node.children:
        t, lt, e = _metrics(c)
        text += t
        link_text += lt + (t if c.tag == "a" else 0)
        elems += e
    return text, link_text, elems


def node_score(node: _Node) -> float:
    """Composite score, content_filter_strategy.py:533-777 semantics."""
    text_len, link_len, elems = _metrics(node)
    text_density = text_len / max(1, elems)
    link_density = min(1.0, link_len / max(1, text_len))
    tag_w = TAG_WEIGHTS.get(node.tag, 0.5)
    cls = f"{node.attrs.get('class', '')} {node.attrs.get('id', '')}"
    cls_sig = 0.5
    if _NEG_CLASS_RE.search(cls):
        cls_sig = 0.0
    elif _POS_CLASS_RE.search(cls):
        cls_sig = 1.0
    return (
        0.4 * (text_density / (text_density + 20.0))
        + 0.2 * (1.0 - link_density)
        + 0.2 * tag_w
        + 0.1 * cls_sig
        + 0.1 * (text_len / (text_len + 100.0))
    )


def prune_tree(node: _Node, threshold: float = 0.48) -> bool:
    """Bottom-up prune; returns True if the node survives."""
    if node.tag in _ALWAYS_DROP:
        return False
    node.children = [c for c in node.children if prune_tree(c, threshold)]
    if node.tag in ("#root", "html", "body", "head", "title"):
        return True
    text_len, _, _ = _metrics(node)
    if text_len == 0 and not node.children and node.tag not in ("img", "br", "hr"):
        return False
    return node_score(node) >= threshold


_BLOCK = {"p", "div", "section", "article", "main", "li", "blockquote",
          "pre", "table", "tr", "h1", "h2", "h3", "h4", "h5", "h6"}


def _emit_text(node: _Node, out: list[str]) -> None:
    own = " ".join(t.strip() for t in node.texts if t.strip())
    if own:
        if node.tag.startswith("h") and len(node.tag) == 2 and node.tag[1].isdigit():
            own = "#" * int(node.tag[1]) + " " + own
        out.append(own)
    for c in node.children:
        _emit_text(c, out)


def fit_markdown(html: str, threshold: float = 0.48) -> str:
    """html -> pruned 'fit' markdown-ish text (block-joined)."""
    root = parse_dom(html)
    prune_tree(root, threshold)
    out: list[str] = []
    _emit_text(root, out)
    # drop the <title> echo if present as first line duplicate
    return "\n\n".join(x for x in out if x)


def fit_pages(df: DataFrame, threshold: float = 0.48,
              url_col: str = "url", html_col: str = "html") -> DataFrame:
    """mapInPandas stage: (url, html) -> (url, fit_markdown)."""
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("fit_markdown", T.StringType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "url": pdf[url_col],
                "fit_markdown": [fit_markdown(h, threshold) for h in pdf[html_col]],
            })

    return df.select(F.col(url_col), F.col(html_col)).mapInPandas(run, schema)
