"""Live-HTTP fetch path against the loopback corpus server.

The reference benches its fetch path against a local HTTP server
(reference tests/memory/run_benchmark.py); these tests are the Spark
twin: real sockets through HttpFetcher's thread pool, parity against
CorpusFetcher, and the pure-Python page_html twin pinned byte-identical
to the Spark-built corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.corpus.webgen import build_corpus, page_html, url_expr, url_of
from crawl4ai_spark.engine.fetch import CorpusFetcher, HttpFetcher
from crawl4ai_spark.sources.loopback import CorpusHTTPServer, make_rewrite

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def server():
    srv = CorpusHTTPServer.from_parquet(SF).start()
    yield srv
    srv.stop()


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_page_html_twin_matches_spark_corpus(spark):
    docs = _docs(spark)
    n = docs.count()
    corpus = {r["url_norm"]: r["html"] for r in build_corpus(docs, n).collect()}
    rows = docs.select(
        F.col("doc_id").cast("long").alias("i"), "text", "source"
    ).collect()
    assert len(corpus) == n
    for r in rows:
        assert corpus[url_of(r["i"])] == page_html(r["i"], r["text"], r["source"], n)


def test_http_fetcher_parity_with_corpus_fetcher(spark, server):
    docs = _docs(spark)
    n = docs.count()
    i = F.col("doc_id").cast("long")
    frontier = docs.where(i % 7 < 3).select(url_expr(i).alias("url_norm"))
    corpus = build_corpus(docs, n)
    via_corpus = {
        (r["url_norm"], r["html"], r["status_code"], r["success"])
        for r in CorpusFetcher(corpus).fetch(frontier).select(
            "url_norm", "html", "status_code", "success").collect()
    }
    via_http = {
        (r["url_norm"], r["html"], r["status_code"], r["success"])
        for r in HttpFetcher(
            timeout_s=30.0, max_session_permit=8,
            url_rewrite=make_rewrite(server.port),
        ).fetch(frontier).select(
            "url_norm", "html", "status_code", "success").collect()
    }
    assert via_http == via_corpus


def test_http_fetcher_order_and_statuses(spark, server):
    # rows keep frontier order inside a partition; dead ids -> 404 rows,
    # unroutable hosts -> status 0 — never task failures
    n = _docs(spark).count()
    urls = [url_of(0), url_of(n + 50), url_of(1),
            "https://site0.example.com/nosuch/path"]
    frontier = spark.createDataFrame(
        [(u,) for u in urls], "url_norm string"
    ).coalesce(1)
    out = HttpFetcher(
        timeout_s=30.0, max_session_permit=4,
        url_rewrite=make_rewrite(server.port),
    ).fetch(frontier).select("url_norm", "status_code", "html").collect()
    assert [r["url_norm"] for r in out] == urls
    assert [r["status_code"] for r in out] == [200, 404, 200, 404]
    assert out[0]["html"].startswith("<html><head><title>Doc 0</title>")
    assert out[1]["html"] == ""


def test_http_fetcher_transport_error_is_row_level(spark):
    # no server on this port: connection refused -> status 0
    frontier = spark.createDataFrame(
        [("http://127.0.0.1:9/page/0",)], "url_norm string"
    )
    out = HttpFetcher(timeout_s=2.0, max_session_permit=2).fetch(frontier).collect()
    assert out[0]["status_code"] == 0 and out[0]["html"] == ""


def test_serial_and_concurrent_results_identical(spark, server):
    docs = _docs(spark)
    i = F.col("doc_id").cast("long")
    frontier = docs.where(i < 40).select(url_expr(i).alias("url_norm"))
    rw = make_rewrite(server.port)

    def rows(permits):
        return sorted(
            (r["url_norm"], r["html"], r["status_code"])
            for r in HttpFetcher(
                timeout_s=30.0, max_session_permit=permits, url_rewrite=rw
            ).fetch(frontier).collect()
        )

    assert rows(1) == rows(16)


def test_http_fetcher_honors_response_charset(spark):
    """The reference decodes with response.charset from the Content-Type
    header, utf-8 as the last resort, errors='replace' (async_crawler_
    strategy.py:2330-2336). Serve the same accented text as latin-1
    (with charset), utf-8 (with charset), and charset-less utf-8 — all
    three rows must decode to the identical string."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    text = "café über façade ÷ naïve résumé"

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path == "/latin1":
                body, ct = text.encode("latin-1"), \
                    "text/html; charset=iso-8859-1"
            elif self.path == "/utf8":
                body, ct = text.encode("utf-8"), "text/html; charset=utf-8"
            elif self.path == "/nocharset":
                body, ct = text.encode("utf-8"), "text/html"
            elif self.path == "/badcharset":
                body, ct = text.encode("utf-8"), \
                    "text/html; charset=not-a-codec"
            else:
                body, ct = b"", "text/html"
            self.send_response(200 if body else 404)
            self.send_header("Content-Type", ct)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        frontier = spark.createDataFrame(
            [(f"http://127.0.0.1:{port}/{p}",)
             for p in ("latin1", "utf8", "nocharset", "badcharset")],
            "url_norm string",
        )
        rows = HttpFetcher(timeout_s=10).fetch(frontier).collect()
        assert all(r.status_code == 200 for r in rows)
        for r in rows:
            assert r.html == text, (r.url_norm, r.html)
    finally:
        httpd.shutdown()
        httpd.server_close()
