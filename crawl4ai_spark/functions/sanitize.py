"""Input sanitization / encoding repair.

Two layers, mirroring what the reference applies to every fetched body:

* ``sanitize_input_encode`` (utils.py:775-792, applied at
  async_webcrawler.py:271,341): falsy -> "", then a UTF-8
  encode/decode round-trip with ``errors="ignore"`` — strips lone
  surrogates and anything else that cannot survive UTF-8. Runs inside
  the extract ``mapInPandas`` batch (Python semantics are the spec).

* mojibake repair — the deterministic fix-up a large-scale text
  pipeline needs on top: UTF-8 bytes that were once mis-decoded as
  cp1252/latin-1 leave unambiguous two/three-byte signatures
  ("â€™" for RIGHT SINGLE QUOTE, "Ã©" for "é", ...). The repair is a
  pure longest-first string substitution, expressed as a chain of
  Catalyst ``replace`` expressions (whole-stage codegen, no UDF) and
  reproduced verbatim in the DuckDB oracle (`sanitize_text`).
  ftfy generalizes this with heuristics; the fixed map below keeps the
  operation deterministic and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (mojibake, intended) — cp1252-mis-decoded UTF-8 signatures. Order
# matters: longer sequences first so "â€™" wins over any single-char
# rule, and "Ã©"-class pairs are disjoint from the "â€"-class.
MOJIBAKE_PAIRS: list[tuple[str, str]] = [
    ("\u00e2\u20ac\u2122", "\u2019"),  # right single quote
    ("\u00e2\u20ac\u02dc", "\u2018"),  # left single quote
    ("\u00e2\u20ac\u0153", "\u201c"),  # left double quote
    ("\u00e2\u20ac\u201d", "\u2014"),  # em dash
    ("\u00e2\u20ac\u201c", "\u2013"),  # en dash
    ("\u00e2\u20ac\u00a6", "\u2026"),  # ellipsis
    ("\u00e2\u20ac\u009d", "\u201d"),  # right double quote (C1 kept)
    # right double quote with the C1 byte dropped -- MUST come after
    # every longer rule it prefixes
    ("\u00e2\u20ac", "\u201d"),
    ("\u00c3\u00a9", "\u00e9"),  # e acute
    ("\u00c3\u00a8", "\u00e8"),  # e grave
    ("\u00c3\u00a1", "\u00e1"),  # a acute
    ("\u00c3\u00b3", "\u00f3"),  # o acute
    ("\u00c3\u00b1", "\u00f1"),  # n tilde
    ("\u00c3\u00bc", "\u00fc"),  # u umlaut
    ("\u00c3\u00b6", "\u00f6"),  # o umlaut
    ("\u00c3\u00a4", "\u00e4"),  # a umlaut
    ("\u00c2\u00a0", "\u00a0"),  # stray cp1252 prefix + nbsp -> nbsp
    ("\u00c2\u00ab", "\u00ab"),  # left guillemet
    ("\u00c2\u00bb", "\u00bb"),  # right guillemet
    ("\u00c2\u00b0", "\u00b0"),  # degree sign
]


def sanitize_input_encode(text) -> str:
    """Reference-exact body sanitization (utils.py:775-792)."""
    if not text:
        return ""
    return text.encode("utf-8", errors="ignore").decode("utf-8")


def repair_mojibake(text: str) -> str:
    """Python twin of `repair_mojibake_expr` for Arrow batches."""
    for bad, good in MOJIBAKE_PAIRS:
        if bad in text:
            text = text.replace(bad, good)
    return text


def repair_mojibake_expr(col) -> Column:
    """Catalyst chain: null-safe, then the ordered substitution map —
    pure `replace` expressions, stays inside whole-stage codegen."""
    c = F.coalesce(col if isinstance(col, Column) else F.col(col), F.lit(""))
    for bad, good in MOJIBAKE_PAIRS:
        c = F.replace(c, F.lit(bad), F.lit(good))
    return c
