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


# ---------------------------------------------------------------------------
# XPath selector subset (JsonXPathExtractionStrategy,
# extraction_strategy.py:1630-1705): //tag, /tag, .//tag, *, predicates
# [@attr='v'], [@attr], [N] (per-parent position, 1-based)
# ---------------------------------------------------------------------------

_XSTEP_RE = re.compile(r"^(?P<tag>[\w*-]+)(?P<preds>(?:\[[^\]]*\])*)$")
_XPRED_RE = re.compile(r"\[([^\]]*)\]")


def _xpath_steps(xpath: str) -> list[tuple[str, str, list[str]]]:
    s = xpath.strip()
    if s.startswith("./"):
        s = s[1:]
    steps, i = [], 0
    while i < len(s):
        axis = "child"
        if s.startswith("//", i):
            axis, i = "desc", i + 2
        elif s.startswith("/", i):
            i += 1
        j = s.find("/", i)
        # don't split inside a predicate
        while j != -1 and s.count("[", i, j) != s.count("]", i, j):
            j = s.find("/", j + 1)
        step = s[i:] if j == -1 else s[i:j]
        i = len(s) if j == -1 else j
        m = _XSTEP_RE.match(step)
        if not m:
            return []
        steps.append((axis, m.group("tag"),
                      _XPRED_RE.findall(m.group("preds") or "")))
    return steps


def _xpath_node_match(node: _Node, tag: str, preds: list[str]) -> bool:
    if tag != "*" and node.tag != tag.lower():
        return False
    for p in preds:
        p = p.strip()
        if p.isdigit():
            continue  # positional, handled per parent group
        if p.startswith("@"):
            if "=" in p:
                k, v = p[1:].split("=", 1)
                if node.attrs.get(k.strip()) != v.strip().strip("'\""):
                    return False
            elif p[1:].strip() not in node.attrs:
                return False
        else:
            return False
    return True


def select_xpath(root: _Node, xpath: str) -> list[_Node]:
    steps = _xpath_steps(xpath)
    cur = [root]
    for axis, tag, preds in steps:
        pos = next((int(p) for p in preds if p.strip().isdigit()), None)
        nxt, seen = [], set()
        for base in cur:
            pool = base.children if axis == "child" else [
                n for n in base.iter() if n is not base
            ]
            matched = [n for n in pool if _xpath_node_match(n, tag, preds)]
            if pos is not None:
                matched = matched[pos - 1:pos]
            for n in matched:
                if id(n) not in seen:
                    seen.add(id(n))
                    nxt.append(n)
        cur = nxt
    return cur


def _get_elements(node: _Node, selector: str, engine: str) -> list[_Node]:
    if engine == "xpath":
        return select_xpath(node, selector)
    return select(node, selector)


def extract_field(node: _Node, field: dict, engine: str = "css"):
    """Reference-exact field dispatch (_extract_field,
    extraction_strategy.py:909-932): nested -> first match as an item
    ({} when absent), list -> _extract_list_item per match (single
    fields only), nested_list -> full item per match; anything else is
    a single field. Errors fall back to the field default."""
    try:
        ftype = field.get("type", "text")
        if ftype == "nested":
            targets = _get_elements(node, field["selector"], engine)
            return extract_item(targets[0], field["fields"], engine) if targets else {}
        if ftype == "list":
            targets = _get_elements(node, field["selector"], engine)
            return [_extract_list_item(t, field["fields"], engine) for t in targets]
        if ftype == "nested_list":
            targets = _get_elements(node, field["selector"], engine)
            return [extract_item(t, field["fields"], engine) for t in targets]
        return _extract_single_field(node, field, engine)
    except Exception:
        return field.get("default")


def _extract_single_field(node: _Node, field: dict, engine: str):
    """_extract_single_field (extraction_strategy.py:934-974): first
    selector match or the element itself; regex is group(1)-only."""
    if "selector" in field:
        selected = _get_elements(node, field["selector"], engine)
        if not selected:
            return field.get("default")
        t = selected[0]
    else:
        t = node
    ftype = field.get("type", "text")
    value = None
    if ftype == "text":
        value = t.text()
    elif ftype == "attribute":
        value = t.attrs.get(field.get("attribute"))
    elif ftype == "html":
        value = t.outer_html()
    elif ftype == "regex":
        m = re.search(field["pattern"], t.text())
        value = m.group(1) if m else None
    if "transform" in field:
        value = _apply_transform(value, field["transform"])
    return value if value is not None else field.get("default")


def _extract_list_item(node: _Node, fields: list[dict], engine: str) -> dict:
    item = {}
    for f in fields:
        v = _extract_single_field(node, f, engine)
        if v is not None:
            item[f["name"]] = v
    return item


def extract_item(node: _Node, fields: list[dict], engine: str = "css") -> dict:
    """_extract_item (extraction_strategy.py:984-1009): None-valued
    fields are OMITTED from the item, exactly like the reference."""
    item = {}
    for f in fields:
        v = extract_field(node, f, engine)
        if v is not None:
            item[f["name"]] = v
    return item


def extract_rows(html: str, schema: dict, engine: str = "css") -> list[str]:
    """One page -> JSON string per schema row (the reference's IR:
    extraction_strategy.py returns a JSON list)."""
    root = parse_dom(html)
    base = schema.get("baseSelector")
    row_nodes = _get_elements(root, base, engine) if base else [root]
    return [
        json.dumps(extract_item(n, schema.get("fields", []), engine), sort_keys=True)
        for n in row_nodes
    ]


def json_schema_extract(df: DataFrame, schema: dict, engine: str = "css",
                        url_col: str = "url", html_col: str = "html") -> DataFrame:
    """mapInPandas stage: (url, html) -> exploded (url, row_json).
    `engine` = "css" (JsonCssExtractionStrategy) or "xpath"
    (JsonXPathExtractionStrategy, extraction_strategy.py:1630-1705)."""
    out_schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("rows", T.ArrayType(T.StringType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "url": pdf[url_col],
                "rows": [extract_rows(h, schema, engine) for h in pdf[html_col]],
            })

    ex = df.select(F.col(url_col), F.col(html_col)).mapInPandas(run, out_schema)
    return ex.select("url", F.explode("rows").alias("row_json"))


def json_css_extract(df: DataFrame, schema: dict,
                     url_col: str = "url", html_col: str = "html") -> DataFrame:
    return json_schema_extract(df, schema, "css", url_col, html_col)


def json_xpath_extract(df: DataFrame, schema: dict,
                       url_col: str = "url", html_col: str = "html") -> DataFrame:
    return json_schema_extract(df, schema, "xpath", url_col, html_col)
