"""Deterministic synthetic web corpus derived from the `documents`
table — the engine's test/bench "web".

Every page is a pure function of (doc_id, text, source, N):

  url(i)       https://site{i%7}.example.com/page/{i}
  children(i)  [3i+1, 3i+2, 3i+3, 7i+11] ∩ [0, N)   (a link DAG with
               multi-parent rediscoveries but no cycles — BFS depth is
               well-defined and SQL-derivable by a recursive CTE)
  html(i)      title + h1 + body paragraph + one image + tail paragraph
               + <ul> of child links  ->  the extractor yields exactly
               three spans: (text, image, text), the interleaved
               text+media shape of the north rule.

The same formulas are re-stated in ANSI SQL by queries.py's oracles, so
crawl traversal, span extraction, and link discovery all have exact
DuckDB cross-checks. Modeled on the reference's deterministic site
fixture (tests/general/generate_dummy_site.py:1-335 "FakeShop").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHILD_FACTORS = ((3, 1), (3, 2), (3, 3), (7, 11))
N_HOSTS = 7


def url_expr(i):
    """url(i) as a Column; i is a long Column."""
    return F.format_string(
        "https://site%d.example.com/page/%d", F.pmod(i, F.lit(N_HOSTS)), i
    )


def children_expr(i, n_docs):
    """Array of child ids < n_docs, in CHILD_FACTORS order. n_docs may
    be a Python int or a Column (e.g. a broadcast scalar count, so
    callers need no driver-side count job)."""
    from pyspark.sql import Column

    n = n_docs if isinstance(n_docs, Column) else F.lit(n_docs)
    return F.filter(
        F.array(*[i * a + b for a, b in CHILD_FACTORS]),
        lambda c: c < n,
    )


def build_corpus(docs: DataFrame, n_docs: int | None = None) -> DataFrame:
    """documents(doc_id, text, source, ...) -> corpus(url_norm, html,
    status_code, fetch_ms) for CorpusFetcher.

    When ``n_docs`` is not supplied it rides a broadcast 1-row count
    dim instead of a driver-side ``docs.count()`` job (the queries.py
    scalar-subquery idiom — no extra driver job per corpus build)."""
    i = F.col("doc_id").cast("long")
    if n_docs is None:
        cnt = docs.select(F.count(F.lit(1)).alias("__n_docs"))
        docs = docs.crossJoin(F.broadcast(cnt))
        kids = children_expr(i, F.col("__n_docs"))
    else:
        kids = children_expr(i, n_docs)
    links_html = F.array_join(
        F.transform(
            kids,
            lambda c: F.format_string(
                '<li><a href="%s">go %d</a></li>', url_expr(c), c
            ),
        ),
        "",
    )
    html = F.concat(
        F.format_string(
            '<html><head><title>Doc %d</title>'
            '<meta name="description" content="%s"/></head>'
            "<body><h1>Doc %d</h1><p>", i, F.col("source"), i,
        ),
        F.col("text"),
        F.format_string(
            '</p><img src="https://cdn.example.com/img/%d.png" '
            'alt="image %d" width="200"/><p>tail %d</p><ul>', i, i, i,
        ),
        links_html,
        F.lit("</ul></body></html>"),
    )
    out = docs.select(
        url_expr(i).alias("url_norm"),
        html.alias("html"),
        F.lit(200).alias("status_code"),
        (F.pmod(i, F.lit(20)) + 1).cast("int").alias("fetch_ms"),
    )
    # Co-partition + pre-sort on the fetch-join key. A cached corpus is
    # re-joined every round, and ProjectExec is alias-aware, so the
    # cached HashPartitioning/ordering satisfies the join's required
    # distribution through CorpusFetcher's rename: the per-round plan
    # then shuffles only the ~100 B/row frontier side — the corpus
    # reads straight from InMemoryTableScan with NO Exchange and NO
    # Sort (PLANS.md fetch-join section). At archive scale that
    # per-round corpus shuffle is GB-to-TB of disk-bound, core-count-
    # blind I/O; this is the bucketing prescription in CorpusFetcher's
    # docstring (engine/fetch.py), applied at build time.
    return out.repartition(F.col("url_norm")).sortWithinPartitions("url_norm")


def url_of(i: int) -> str:
    """Pure-Python twin of url_expr (same formula, driver/server side)."""
    return f"https://site{i % N_HOSTS}.example.com/page/{i}"


def page_html(i: int, text: str, source: str, n_docs: int) -> str:
    """Pure-Python twin of build_corpus's html(i) — byte-identical by
    construction (tests/test_http_fetch.py asserts equality against the
    Spark-built corpus). Used by the loopback HTTP server
    (sources/loopback.py) so live-fetch parity checks never read the
    Spark corpus they are meant to verify."""
    kids = [a * i + b for a, b in CHILD_FACTORS if a * i + b < n_docs]
    links = "".join(
        f'<li><a href="{url_of(c)}">go {c}</a></li>' for c in kids
    )
    return (
        f'<html><head><title>Doc {i}</title>'
        f'<meta name="description" content="{source}"/></head>'
        f"<body><h1>Doc {i}</h1><p>{text}"
        f'</p><img src="https://cdn.example.com/img/{i}.png" '
        f'alt="image {i}" width="200"/><p>tail {i}</p><ul>'
        f"{links}</ul></body></html>"
    )


def seed_url() -> str:
    return "https://site0.example.com/page/0"


def replicate_docs(docs: DataFrame, replicas: int, n_docs: int | None = None) -> DataFrame:
    """Deterministically scale the doc table: replica k shifts doc_id by
    k*n, so the graph formulas stay pure functions of the id space."""
    from pyspark.sql import functions as F

    if n_docs is None:
        # broadcast 1-row count dim, not a driver-side count job
        cnt = docs.select(F.count(F.lit(1)).alias("__n_docs"))
        docs = docs.crossJoin(F.broadcast(cnt))
        n_col = F.col("__n_docs")
    else:
        n_col = F.lit(n_docs)
    reps = docs.sparkSession.range(replicas).select(F.col("id").alias("k"))
    return docs.crossJoin(reps).select(
        (F.col("doc_id").cast("long") + F.col("k") * n_col).alias("doc_id"),
        "text", "source",
    )
