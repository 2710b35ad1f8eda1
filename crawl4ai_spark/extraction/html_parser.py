"""HTML -> (markdown spans, links, media, tables, metadata) extraction.

Re-expresses the reference's scrape + markdown pipeline
(/root/reference/crawl4ai/content_scraping_strategy.py:590-893 scrape,
/root/reference/crawl4ai/markdown_generation_strategy.py:148-260 markdown,
/root/reference/crawl4ai/utils.py:1496-1580 metadata) as one pure
function ``extract_page(url, html) -> dict`` designed to run inside an
Arrow-batched ``mapInPandas`` stage (see extract.py). No lxml/html2text
in this environment — a single-pass stdlib ``html.parser`` walk emits
the markdown token stream directly.

Canonical output is the *interleaved span document*: text and media
kept in document order, exactly the information the reference keeps by
emitting inline ``![alt](src)`` tokens in raw_markdown
(markdown_generation_strategy.py:11 LINK_PATTERN) plus media items with
``group_id`` = DOM index (content_scraping_strategy.py:474). A span is
``(kind, text, media_ref, offset)`` with kind in
``text|image|video|audio|table``; the per-row invariant is
span-sequence equality on those four fields.

Markdown conventions (html2text-compatible subset, body_width=0,
single_line_break semantics for our corpus):
  h1..h6 -> '#'*n prefix; p/div/section -> paragraph breaks;
  a -> [text](resolved_href); img -> media span (token excluded from
  the text span, it IS the span); ul li -> '* '; ol li -> '1.' numbered;
  strong/b -> **x**; em/i -> _x_; code -> `x`; pre -> fenced block;
  blockquote -> '> '; script/style/noscript/template/comments dropped
  (content_scraping_strategy.py:695-698).
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser
from urllib.parse import urljoin

from crawl4ai_spark.functions.urlnorm import (
    get_base_domain,
    is_external_url,
    normalize_url_for_deep_crawl,
)

_SKIP_TAGS = {"script", "style", "noscript", "template", "link", "meta_skip"}
_H_RE = re.compile(r"^h([1-6])$")
_WS_RE = re.compile(r"[ \t\r\f\v]+")
_WSNL_RE = re.compile(r"[ \t\r\f\v\n]+")
_NL3_RE = re.compile(r"\n{3,}")

_VOID_MEDIA = {"img"}


class _Walker(HTMLParser):
    def __init__(self, base_url: str):
        super().__init__(convert_charrefs=True)
        # Parallel mini-DOM for the image ancestor-desc walk
        # (content_scraping_strategy.py:376-392): driven by THIS parse's
        # callbacks, so the page is tokenized once instead of re-parsed
        # by _closest_ancestor_descs (which was ~30% of extract_page on
        # image-bearing pages). Same builder class as jsoncss.parse_dom,
        # same convert_charrefs, same event stream -> identical tree.
        from crawl4ai_spark.extraction.jsoncss import _TreeBuilder

        self._tree = _TreeBuilder()
        self.base = base_url
        self.segments: list[tuple] = []  # ("text", str) | (kind, alt, src, desc)
        self.links: list[dict] = []
        self._seen_hrefs: set[str] = set()
        self.media: list[dict] = []
        self.tables: list[dict] = []
        self.metadata: dict[str, str] = {}
        # text capture: stack of buffers; top receives character data
        self._buf_stack: list[list[str]] = [[]]
        self._skip_depth = 0
        self._pre_depth = 0
        self._list_stack: list[tuple[str, int]] = []  # (kind, counter)
        self._link_stack: list[dict] = []
        self._in_title = False
        self._media_pending: dict | None = None
        self._dom_index = 0
        # table capture state
        self._table_stack: list[dict] = []
        self.base_domain = get_base_domain(base_url)

    # -- buffer helpers ---------------------------------------------------
    def _emit(self, s: str) -> None:
        self._buf_stack[-1].append(s)

    def _flush_text_segment(self) -> None:
        """Move the root buffer into a text segment (media boundary)."""
        if len(self._buf_stack) == 1 and self._buf_stack[0]:
            self.segments.append(("text", "".join(self._buf_stack[0])))
            self._buf_stack[0] = []

    def _resolve(self, href: str | None) -> str | None:
        if not href:
            return None
        try:
            return urljoin(self.base, href.strip())
        except Exception:
            return href

    # -- tag handling -----------------------------------------------------
    def handle_starttag(self, tag, attrs):
        self._tree.handle_starttag(tag, attrs)
        a = dict(attrs)
        if tag in ("script", "style", "noscript", "template"):
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "base" and a.get("href"):
            # <base href> re-roots relative resolution
            # (content_scraping_strategy.py:246-253)
            self.base = a["href"].strip()
            return
        if tag == "meta":
            self._handle_meta(a)
            return
        if tag == "title":
            self._in_title = True
            self._buf_stack.append([])
            return
        if tag == "img":
            self._handle_img(a)
            return
        if tag in ("video", "audio"):
            self._media_pending = {
                "tag": tag,
                "src": self._resolve(a.get("src")),
                "alt": a.get("alt") or a.get("title") or "",
                "desc": a.get("aria-label") or "",
            }
            self._buf_stack.append([])  # swallow fallback text inside the element
            return
        if tag == "source" and self._media_pending:
            if not self._media_pending["src"] and a.get("src"):
                self._media_pending["src"] = self._resolve(a.get("src"))
            return
        if tag == "a":
            self._link_stack.append(
                {"href": a.get("href"), "title": a.get("title") or ""}
            )
            self._buf_stack.append([])
            return
        if tag == "table":
            self._flush_text_segment()
            self._table_stack.append(
                {"caption": "", "summary": a.get("summary") or "", "rows": [],
                 "row": None, "header_rows": []}
            )
            return
        if self._table_stack:
            t = self._table_stack[-1]
            if tag == "tr":
                t["row"] = {"cells": [], "is_header": False}
            elif tag in ("td", "th"):
                if t["row"] is None:
                    t["row"] = {"cells": [], "is_header": False}
                if tag == "th":
                    t["row"]["is_header"] = True
                self._buf_stack.append([])
            elif tag == "caption":
                self._buf_stack.append([])
            return
        m = _H_RE.match(tag)
        if m:
            self._emit("\n\n" + "#" * int(m.group(1)) + " ")
            return
        if tag in ("p", "div", "section", "article", "header", "footer",
                   "main", "aside", "figure", "figcaption"):
            self._emit("\n\n")
            return
        if tag == "br":
            self._emit("\n")
            return
        if tag == "hr":
            self._emit("\n\n---\n\n")
            return
        if tag in ("ul", "ol"):
            self._list_stack.append((tag, 0))
            self._emit("\n")
            return
        if tag == "li":
            indent = "  " * max(0, len(self._list_stack) - 1)
            if self._list_stack and self._list_stack[-1][0] == "ol":
                kind, n = self._list_stack[-1]
                self._list_stack[-1] = (kind, n + 1)
                self._emit(f"\n{indent}{n + 1}. ")
            else:
                self._emit(f"\n{indent}* ")
            return
        if tag in ("strong", "b"):
            self._emit("**")
            return
        if tag in ("em", "i"):
            self._emit("_")
            return
        if tag == "code" and not self._pre_depth:
            self._emit("`")
            return
        if tag == "pre":
            self._pre_depth += 1
            self._emit("\n\n```\n")
            return
        if tag == "blockquote":
            self._emit("\n\n> ")
            return

    def handle_startendtag(self, tag, attrs):
        if tag in ("img", "br", "hr", "base", "meta", "source"):
            # handle_starttag forwards to the tree (all six are _VOID,
            # so starttag == startendtag for the builder)
            self.handle_starttag(tag, attrs)
        else:
            self._tree.handle_startendtag(tag, attrs)

    def handle_endtag(self, tag):
        self._tree.handle_endtag(tag)
        if tag in ("script", "style", "noscript", "template"):
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "title":
            if self._in_title:
                self._in_title = False
                txt = _clean_inline("".join(self._buf_stack.pop()))
                self.metadata.setdefault("title", txt)
            return
        if tag in ("video", "audio"):
            pend = self._media_pending
            if pend and pend["tag"] == tag:
                self._buf_stack.pop()
                self._add_media(
                    kind=tag, src=pend["src"], alt=pend["alt"], desc=pend["desc"]
                )
                self._media_pending = None
            return
        if tag == "a":
            if self._link_stack:
                link = self._link_stack.pop()
                text = _clean_inline("".join(self._buf_stack.pop()))
                resolved = self._resolve(link["href"])
                if resolved:
                    self._emit(f"[{text}]({resolved})")
                    self._record_link(resolved, text, link["title"])
                else:
                    self._emit(text)
            return
        if tag == "table":
            if self._table_stack:
                self._finish_table(self._table_stack.pop())
            return
        if self._table_stack:
            t = self._table_stack[-1]
            if tag == "tr" and t["row"] is not None:
                (t["header_rows"] if t["row"]["is_header"] else t["rows"]).append(
                    t["row"]["cells"]
                )
                t["row"] = None
            elif tag in ("td", "th"):
                if t["row"] is not None:
                    t["row"]["cells"].append(
                        _clean_inline("".join(self._buf_stack.pop()))
                    )
                else:
                    self._buf_stack.pop()
            elif tag == "caption":
                t["caption"] = _clean_inline("".join(self._buf_stack.pop()))
            return
        if _H_RE.match(tag) or tag in (
            "p", "div", "section", "article", "header", "footer", "main",
            "aside", "figure", "figcaption", "blockquote",
        ):
            self._emit("\n\n")
            return
        if tag in ("ul", "ol"):
            if self._list_stack:
                self._list_stack.pop()
            self._emit("\n")
            return
        if tag in ("strong", "b"):
            self._emit("**")
            return
        if tag in ("em", "i"):
            self._emit("_")
            return
        if tag == "code" and not self._pre_depth:
            self._emit("`")
            return
        if tag == "pre":
            self._pre_depth = max(0, self._pre_depth - 1)
            self._emit("\n```\n\n")
            return

    def handle_data(self, data):
        self._tree.handle_data(data)
        if self._skip_depth:
            return
        if self._pre_depth:
            self._emit(data)
            return
        # source newlines are inline whitespace in HTML; block breaks come
        # only from tags
        txt = _WSNL_RE.sub(" ", data)
        if txt:
            self._emit(txt)

    # -- element-specific -------------------------------------------------
    def _handle_meta(self, a: dict) -> None:
        # metadata extraction semantics: utils.py:1496-1580 (title, meta
        # name=description/keywords/author, og:*, twitter:*)
        name = (a.get("name") or a.get("property") or "").lower()
        content = a.get("content") or ""
        if not name or not content:
            return
        if name in ("description", "keywords", "author") or name.startswith(
            ("og:", "twitter:", "article:")
        ):
            self.metadata.setdefault(name, content)

    def _handle_img(self, a: dict) -> None:
        style = (a.get("style") or "").replace(" ", "").lower()
        if "display:none" in style:
            return  # content_scraping_strategy.py:406 skips hidden images
        src = a.get("src") or a.get("data-src")
        if not src and a.get("srcset"):
            src = a["srcset"].split(",")[0].strip().split(" ")[0]
        if not src:
            return
        self._add_media(
            kind="image",
            src=self._resolve(src),
            alt=a.get("alt") or "",
            desc=a.get("title") or "",
            score=self._image_score(a),
        )

    def _image_score(self, a: dict) -> int:
        # image relevance score (content_scraping_strategy.py:406-511):
        # width>150 +1, height>150 +1, alt +1, known format +1, srcset +1
        score = 0
        for dim in ("width", "height"):
            v = a.get(dim) or ""
            digits = "".join(c for c in v if c.isdigit())
            if digits and int(digits) > 150:
                score += 1
        if a.get("alt"):
            score += 1
        src = (a.get("src") or "").lower()
        if any(src.endswith(e) for e in (".jpg", ".jpeg", ".png", ".webp", ".avif", ".gif")):
            score += 1
        if a.get("srcset"):
            score += 1
        return score

    def _add_media(self, kind: str, src: str | None, alt: str, desc: str = "", score: int = 0) -> None:
        self._flush_text_segment()
        self.segments.append((kind, alt, src, desc))
        self.media.append(
            {
                "src": src,
                "alt": alt,
                "desc": desc,
                "type": kind,
                "group_id": self._dom_index,
                "score": score,
            }
        )
        self._dom_index += 1

    def _record_link(self, resolved: str, text: str, title: str) -> None:
        # dedup by href per page, first wins
        # (content_scraping_strategy.py:299-303)
        if resolved in self._seen_hrefs:
            return
        self._seen_hrefs.add(resolved)
        norm = normalize_url_for_deep_crawl(resolved, self.base)
        self.links.append(
            {
                "href": resolved,
                "url_norm": norm,
                "text": text,
                "title": title,
                "internal": not is_external_url(resolved, self.base_domain),
            }
        )

    def _finish_table(self, t: dict) -> None:
        headers = t["header_rows"][0] if t["header_rows"] else []
        rows = t["rows"]
        if not headers and rows:
            headers, rows = rows[0], rows[1:]
        table = {
            "headers": headers,
            "rows": rows,
            "caption": t["caption"],
            "summary": t["summary"],
        }
        self.tables.append(table)
        text = " | ".join(headers)
        if t["caption"]:
            text = t["caption"] + ": " + text
        self.segments.append(("table", text, None, ""))
        self.media.append(
            {
                "src": None,
                "alt": text,
                "desc": t["summary"],
                "type": "table",
                "group_id": self._dom_index,
                "score": 0,
            }
        )
        self._dom_index += 1


def _clean_inline(s: str) -> str:
    return _WS_RE.sub(" ", s.replace("\n", " ")).strip()


def _clean_block(s: str) -> str:
    # collapse intra-line spaces, then squeeze 3+ newlines to 2, trim lines
    lines = [_WS_RE.sub(" ", ln).rstrip() for ln in s.split("\n")]
    out = _NL3_RE.sub("\n\n", "\n".join(lines)).strip()
    return out


def _closest_ancestor_descs(html: str, min_words: int = 1) -> list[str | None]:
    """find_closest_parent_with_useful_text
    (content_scraping_strategy.py:376-392) via a standalone re-parse.
    The hot path uses _ancestor_descs_from_root over the tree the
    _Walker pass already built (same builder, same events — equivalence
    pinned by tests); this re-parsing form remains as the fallback for
    pages whose parse raised mid-stream."""
    from crawl4ai_spark.extraction.jsoncss import parse_dom

    return _ancestor_descs_from_root(parse_dom(html), min_words)


def _ancestor_descs_from_root(root, min_words: int = 1) -> list[str | None]:
    """For each kept <img>, in document order, the nearest ancestor that
    has direct text AND whose subtree text reaches min_words yields its
    subtree text."""
    out: list[str | None] = []

    def walk(node, ancestors):
        for c in node.children:
            if c.tag in ("script", "style", "noscript", "template"):
                continue
            if c.tag == "img":
                a = c.attrs
                style = (a.get("style") or "").replace(" ", "").lower()
                if "display:none" in style:
                    continue
                src = a.get("src") or a.get("data-src") or a.get("srcset")
                if not src:
                    continue
                desc = None
                for anc in reversed(ancestors + [node]):
                    if any(t.strip() for t in anc.texts):
                        txt = anc.text()
                        if len(txt.split()) >= min_words:
                            desc = txt
                            break
                out.append(desc)
            else:
                walk(c, ancestors + [node])

    walk(root, [])
    return out


def extract_page(url: str, html: str) -> dict:
    """Pure extraction: one page -> spans/links/media/tables/metadata.

    Returns a plain dict (Arrow-friendly) with keys:
      spans:    [(kind, text, media_ref, offset)]
      markdown: raw markdown incl. inline media tokens (reference
                raw_markdown analogue)
      links, media, tables, metadata
    """
    w = _Walker(url)
    parse_ok = True
    try:
        w.feed(html or "")
        w.close()
    except Exception:
        parse_ok = False  # stdlib parser is tolerant; never fail a page
    w._flush_text_segment()

    # ancestor-walk description fallback for images lacking title/aria
    # (content_scraping_strategy.py:376-392) over the tree this parse
    # already built; only a mid-stream parse failure (which would leave
    # the in-pass tree truncated differently from a fresh parse) pays
    # the standalone re-parse
    imgs = [m for m in w.media if m["type"] == "image"]
    if any(not m["desc"] for m in imgs):
        try:
            if parse_ok:
                descs = _ancestor_descs_from_root(w._tree.root)
            else:
                descs = _closest_ancestor_descs(html)
            if len(descs) == len(imgs):
                for m, d in zip(imgs, descs):
                    if not m["desc"] and d:
                        m["desc"] = d
        except Exception:
            pass

    spans: list[dict] = []
    md_parts: list[str] = []
    for seg in w.segments:
        if seg[0] == "text":
            text = _clean_block(seg[1])
            if text:
                spans.append(
                    {"kind": "text", "text": text, "media_ref": None,
                     "offset": len(spans)}
                )
                md_parts.append(text)
        else:
            kind, alt, src, desc = seg
            spans.append(
                {"kind": kind, "text": alt or desc or "", "media_ref": src,
                 "offset": len(spans)}
            )
            if kind == "image":
                md_parts.append(f"![{alt}]({src})")
            elif kind in ("video", "audio"):
                md_parts.append(f"[{kind}:{alt}]({src})")
            else:  # table
                md_parts.append(f"[table:{alt}]")
    return {
        "spans": spans,
        "markdown": "\n\n".join(md_parts),
        "links": w.links,
        "media": w.media,
        "tables": w.tables,
        "metadata": {k: unescape(v) for k, v in w.metadata.items()},
    }
