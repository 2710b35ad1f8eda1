"""Markdown link -> citation rewriting (DefaultMarkdownGenerator's
``markdown_with_citations`` / ``references_markdown``).

Reference semantics (markdown_generation_strategy.py:82-146):

* every markdown link ``[text](url "title")`` or image ``![alt](url)``
  is replaced in place — links become ``text⟨n⟩`` (the brackets and the
  URL disappear), images become ``![alt⟨n⟩]``;
* ``n`` numbers distinct URLs by first occurrence, starting at 1;
* relative URLs are joined against ``base_url`` (absolute / mailto //
  pass through, markdown_generation_strategy.py:14-23) BEFORE the
  dedup, so ``/a`` and ``https://host/a`` share one citation number;
* a references section is appended:
  ``\\n\\n## References\\n\\n`` then one ``⟨n⟩ url: title - text\\n``
  line per URL in citation order (title first when present, link text
  appended when it differs from the title, ``: `` omitted when both
  are empty).

Runs inside the extract ``mapInPandas`` batch (one Python pass per
page, Arrow-batched) — never as a row-at-a-time UDF.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

# Same grammar the reference scans for
# (markdown_generation_strategy.py:11).
_MD_LINK = re.compile(r'!?\[([^\]]+)\]\(([^)]+?)(?:\s+"([^"]*)")?\)')

_ABSOLUTE = ("http://", "https://", "mailto:", "//")


def _join(base: str, url: str) -> str:
    if not base or url.startswith(_ABSOLUTE):
        return url
    if url.startswith("/"):
        return (base[:-1] if base.endswith("/") else base) + url
    return urljoin(base, url)


def convert_links_to_citations(markdown: str, base_url: str = "") -> tuple[str, str]:
    """Return (markdown_with_citations, references_markdown)."""
    numbers: dict[str, int] = {}
    descs: dict[str, str] = {}
    out: list[str] = []
    pos = 0
    for m in _MD_LINK.finditer(markdown):
        out.append(markdown[pos:m.start()])
        pos = m.end()
        text, url, title = m.group(1), m.group(2), m.group(3)
        url = _join(base_url, url)
        if url not in numbers:
            numbers[url] = len(numbers) + 1
            parts = [p for p in (title, text if text != title else None) if p]
            descs[url] = (": " + " - ".join(parts)) if parts else ""
        n = numbers[url]
        is_image = markdown[m.start()] == "!"
        out.append(f"![{text}⟨{n}⟩]" if is_image else f"{text}⟨{n}⟩")
    out.append(markdown[pos:])
    refs = ["\n\n## References\n\n"]
    refs += [f"⟨{numbers[u]}⟩ {u}{descs[u]}\n"
             for u in sorted(numbers, key=numbers.get)]
    return "".join(out), "".join(refs)
