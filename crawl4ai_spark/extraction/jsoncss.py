"""Schema-driven structured extraction (JsonCssExtractionStrategy).

Re-expresses the reference's JSON-CSS/XPath extraction family
(/root/reference/crawl4ai/extraction_strategy.py:804-1705): a schema
  {"baseSelector": "...", "fields": [
     {"name": ..., "selector": ..., "type": "text"|"attribute"|"html"|
      "regex"|"list"|"nested", "attribute": ..., "pattern": ...,
      "transform": "lower"|"upper"|"strip", "default": ...}, ...]}
selects row elements and extracts typed fields from each.

The container has no lxml/cssselect, so this builds a small DOM from
stdlib html.parser and supports the practical selector subset the
reference's own tests use: `tag`, `.class`, `#id`, `tag.class`,
`[attr]`, `[attr=value]`, descendant combinators (spaces), and `,`
alternation. Spark surface: one Arrow-batched mapInPandas stage
returning `ARRAY<STRING>` of JSON rows -> `from_json` downstream, the
same IR as the reference (JSON string per row).
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_VOID = {"img", "br", "hr", "meta", "link", "input", "source", "base", "area", "col", "embed", "param", "track", "wbr"}


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent", "texts")

    def __init__(self, tag, attrs, parent):
        self.tag = tag
        self.attrs = attrs
        self.parent = parent
        self.children: list[_Node] = []
        self.texts: list[str] = []  # direct text pieces, interleaved order lost

    def text(self) -> str:
        parts = list(self.texts)
        for c in self.children:
            parts.append(c.text())
        return re.sub(r"\s+", " ", " ".join(p for p in parts if p)).strip()

    def iter(self):
        yield self
        for c in self.children:
            yield from c.iter()

    def outer_html(self) -> str:
        a = "".join(f' {k}="{v}"' for k, v in self.attrs.items() if v is not None)
        if self.tag in _VOID:
            return f"<{self.tag}{a}/>"
        inner = "".join(t for t in self.texts) + "".join(
            c.outer_html() for c in self.children
        )
        return f"<{self.tag}{a}>{inner}</{self.tag}>"


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {}, None)
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs), self.cur)
        self.cur.children.append(node)
        if tag not in _VOID:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        self.cur.children.append(_Node(tag, dict(attrs), self.cur))

    def handle_endtag(self, tag):
        n = self.cur
        while n is not None and n.tag != tag:
            n = n.parent
        if n is not None and n.parent is not None:
            self.cur = n.parent

    def handle_data(self, data):
        if data:
            self.cur.texts.append(data)


def parse_dom(html: str) -> _Node:
    b = _TreeBuilder()
    try:
        b.feed(html or "")
        b.close()
    except Exception:
        pass
    return b.root


_SIMPLE_RE = re.compile(
    r"^(?P<tag>[a-zA-Z][a-zA-Z0-9]*)?"
    r"(?P<cls>(?:\.[\w-]+)*)"
    r"(?P<id>#[\w-]+)?"
    r"(?P<attr>\[[^\]]+\])?$"
)


def _match_simple(node: _Node, sel: str) -> bool:
    m = _SIMPLE_RE.match(sel)
    if not m:
        return False
    if m.group("tag") and node.tag != m.group("tag").lower():
        return False
    if m.group("cls"):
        classes = set((node.attrs.get("class") or "").split())
        for c in m.group("cls").lstrip(".").split("."):
            if c and c not in classes:
                return False
    if m.group("id") and node.attrs.get("id") != m.group("id")[1:]:
        return False
    if m.group("attr"):
        inner = m.group("attr")[1:-1]
        if "=" in inner:
            k, v = inner.split("=", 1)
            if node.attrs.get(k.strip()) != v.strip().strip("'\""):
                return False
        elif inner.strip() not in node.attrs:
            return False
    return True


def select(root: _Node, selector: str) -> list[_Node]:
    """Descendant-combinator CSS subset; ',' = alternation (document
    order, deduped)."""
    out, seen = [], set()
    for alt in selector.split(","):
        parts = alt.strip().split()
        if not parts:
            continue
        cur = [root]
        for p in parts:
            nxt = []
            for base in cur:
                for n in base.iter():
                    if n is not base and _match_simple(n, p):
                        nxt.append(n)
            cur = nxt
        for n in cur:
            if id(n) not in seen:
                seen.add(id(n))
                out.append(n)
    return out


def _apply_transform(v, transform):
    if v is None or not transform:
        return v
    if transform == "lower":
        return v.lower()
    if transform == "upper":
        return v.upper()
    if transform == "strip":
        return v.strip()
    return v


def extract_field(node: _Node, field: dict):
    sel = field.get("selector")
    targets = select(node, sel) if sel else [node]
    ftype = field.get("type", "text")
    if ftype == "list":
        sub = field.get("fields")
        if sub:
            return [
                {f["name"]: extract_field(t, f) for f in sub} for t in targets
            ]
        return [
            _apply_transform(t.text(), field.get("transform")) for t in targets
        ]
    if ftype == "nested":
        if not targets:
            return field.get("default")
        return {f["name"]: extract_field(targets[0], f) for f in field.get("fields", [])}
    if not targets:
        return field.get("default")
    t = targets[0]
    if ftype == "text":
        return _apply_transform(t.text(), field.get("transform"))
    if ftype == "attribute":
        return _apply_transform(
            t.attrs.get(field.get("attribute")), field.get("transform")
        )
    if ftype == "html":
        return t.outer_html()
    if ftype == "regex":
        m = re.search(field.get("pattern", ""), t.text())
        return m.group(1) if (m and m.groups()) else (m.group(0) if m else field.get("default"))
    return field.get("default")


def extract_rows(html: str, schema: dict) -> list[str]:
    """One page -> JSON string per schema row (the reference's IR:
    extraction_strategy.py returns a JSON list)."""
    root = parse_dom(html)
    base = schema.get("baseSelector")
    row_nodes = select(root, base) if base else [root]
    rows = []
    for n in row_nodes:
        rows.append(json.dumps(
            {f["name"]: extract_field(n, f) for f in schema.get("fields", [])},
            sort_keys=True,
        ))
    return rows


def json_css_extract(df: DataFrame, schema: dict,
                     url_col: str = "url", html_col: str = "html") -> DataFrame:
    """mapInPandas stage: (url, html) -> exploded (url, row_json)."""
    out_schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("rows", T.ArrayType(T.StringType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "url": pdf[url_col],
                "rows": [extract_rows(h, schema) for h in pdf[html_col]],
            })

    ex = df.select(F.col(url_col), F.col(html_col)).mapInPandas(run, out_schema)
    return ex.select("url", F.explode("rows").alias("row_json"))
