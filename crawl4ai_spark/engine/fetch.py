"""Fetch stage — frontier rows -> (html, status_code).

The reference's fetch is aiohttp GET with charset/redirect handling
(/root/reference/crawl4ai/async_crawler_strategy.py:2289-2362). In a
cluster engine the fetcher is pluggable:

  CorpusFetcher  joins the frontier against a synthetic/warehoused web
                 corpus table on canonical URL — the deterministic path
                 used for tests, benchmarks, and re-crawls of archived
                 HTML (Common-Crawl-style WARC-to-table workflows).
  HttpFetcher    real HTTP via stdlib urllib inside mapInPandas, one
                 Arrow batch per partition; per-host batching relies on
                 the politeness window having already capped per-host
                 rows. Network-off environments get the plumbing + a
                 deterministic failure row, never a crash.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class CorpusFetcher:
    """Fetch = left join frontier ⟕ corpus(url_norm -> html, status).

    URLs missing from the corpus become status 404 / empty html —
    matching a dead link on the live web. Join strategy is left to
    AQE: at test scale the corpus broadcasts; at archive scale this is
    a sort-merge join that benefits from bucketing the corpus table by
    xxhash64(url_norm) so re-crawl rounds co-locate with frontier
    partitioning and skip the corpus-side shuffle.
    """

    def __init__(self, corpus: DataFrame, dedupe: bool = False):
        """``dedupe=True`` collapses a multi-snapshot archive to one
        row per URL (prefer status 200, then longest body, then lowest
        fetch_ms — deterministic, unlike dropDuplicates) so the left
        join cannot fan frontier rows out. Off by default: the built
        corpora are unique by construction and the window would be
        pure overhead on the hot path (over a co-partitioned corpus it
        adds no exchange, only the sort)."""
        self.corpus = corpus.select(
            F.col("url_norm").alias("__c_url"),
            F.col("html").alias("html"),
            F.col("status_code").alias("status_code"),
            F.col("fetch_ms").alias("fetch_ms"),
        )
        if dedupe:
            from pyspark.sql import Window

            w = Window.partitionBy("__c_url").orderBy(
                F.when(F.col("status_code") == 200, 0).otherwise(1).asc(),
                F.length("html").desc(), F.col("fetch_ms").asc(),
                F.col("html").asc(),
            )
            self.corpus = (
                self.corpus.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1).drop("__rn")
            )

    def fetch(self, frontier: DataFrame) -> DataFrame:
        out = frontier.join(
            self.corpus, frontier["url_norm"] == self.corpus["__c_url"], "left"
        ).drop("__c_url")
        return out.withColumn(
            "status_code", F.coalesce(F.col("status_code"), F.lit(404))
        ).withColumn("html", F.coalesce(F.col("html"), F.lit(""))).withColumn(
            "fetch_ms", F.coalesce(F.col("fetch_ms"), F.lit(0))
        ).withColumn("success", F.col("status_code") == 200)


_HTTP_SCHEMA_EXTRA = [
    T.StructField("html", T.StringType()),
    T.StructField("status_code", T.IntegerType()),
    T.StructField("fetch_ms", T.IntegerType()),
]


class HttpFetcher:
    """Real HTTP GET per frontier row, Arrow-batched (stdlib urllib),
    with bounded intra-batch concurrency.

    The reference fetches with an aiohttp session whose parallelism is
    capped by `max_session_permit` (default 20) in the dispatcher
    (/root/reference/crawl4ai/async_dispatcher.py:402-458 arun_many →
    SemaphoreDispatcher; async_crawler_strategy.py:2289-2362 the GET
    itself). Here each Arrow batch fans its URLs over a thread pool of
    `max_session_permit` workers — network I/O releases the GIL, so
    threads give true overlap — and results are re-assembled IN ORDER
    (executor.map), keeping the stage deterministic. Aggregate crawl
    concurrency = executor-cores × max_session_permit with no global
    coordination point; the politeness window has already capped
    per-host rows, so the pool never hammers one origin.

    Row-level error semantics: HTTP error responses keep their real
    status code (and body); transport failures (DNS, refused, timeout)
    -> status 0, empty html. A cluster job never dies on one bad URL.

    `url_rewrite` (optional, picklable fn url->url) redirects the
    physical request while the row keeps its canonical URL — the
    recording-proxy / loopback-harness shape used by the http_fetch
    oracle and tools/http_bench.py.
    """

    def __init__(
        self,
        timeout_s: float = 10.0,
        user_agent: str = "crawl4ai-spark/0.1",
        max_session_permit: int = 20,
        url_rewrite=None,
    ):
        self.timeout_s = timeout_s
        self.user_agent = user_agent
        self.max_session_permit = max(1, int(max_session_permit))
        self.url_rewrite = url_rewrite

    def fetch(self, frontier: DataFrame) -> DataFrame:
        timeout, ua = self.timeout_s, self.user_agent
        permits, rewrite = self.max_session_permit, self.url_rewrite
        schema = T.StructType(list(frontier.schema.fields) + _HTTP_SCHEMA_EXTRA)

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import time
            import urllib.error
            import urllib.request
            from concurrent.futures import ThreadPoolExecutor

            # import once per worker batch, not per URL: a FAILED
            # import is not cached by Python, so an in-call `import
            # chardet` would re-scan sys.path for every charset-less
            # response
            try:
                import chardet
            except ImportError:
                chardet = None

            def decode(body: bytes, headers) -> str:
                # the reference's charset ladder (async_crawler_strategy
                # .py:2330-2336): response charset from the Content-Type
                # header, else chardet detection (import-gated — absent
                # in this container), else utf-8; errors='replace'
                enc = None
                try:
                    enc = headers.get_content_charset()
                except Exception:
                    pass
                if not enc and chardet is not None:
                    try:
                        # detection over a bounded prefix — chardet on a
                        # full 8 MB body costs seconds per page
                        enc = chardet.detect(body[:64 * 1024])["encoding"]
                    except Exception:
                        enc = None
                try:
                    return body.decode(enc or "utf-8", errors="replace")
                except LookupError:  # unknown charset token in the header
                    return body.decode("utf-8", errors="replace")

            def one(u: str):
                t0 = time.monotonic()
                try:
                    # inside the try: a malformed authority (e.g. an
                    # unclosed IPv6 bracket) raises from urlsplit in
                    # the rewrite — that is a status-0 ROW, never a
                    # task death
                    target = rewrite(u) if rewrite is not None else u
                    req = urllib.request.Request(
                        target, headers={"User-Agent": ua}
                    )
                    with urllib.request.urlopen(req, timeout=timeout) as resp:
                        body = resp.read(8 * 1024 * 1024)
                        html, status = decode(body, resp.headers), int(resp.status)
                except urllib.error.HTTPError as e:
                    try:
                        body = e.read(8 * 1024 * 1024)
                    except Exception:
                        body = b""
                    html, status = decode(body, e.headers), int(e.code)
                except Exception:
                    html, status = "", 0
                return html, status, int((time.monotonic() - t0) * 1000)

            for pdf in batches:
                urls = list(pdf["url_norm"])
                if not urls:
                    continue
                if permits == 1 or len(urls) == 1:
                    results = [one(u) for u in urls]
                else:
                    with ThreadPoolExecutor(
                        max_workers=min(permits, len(urls))
                    ) as pool:
                        results = list(pool.map(one, urls))
                out = pdf.copy()
                out["html"] = [r[0] for r in results]
                out["status_code"] = [r[1] for r in results]
                out["fetch_ms"] = [r[2] for r in results]
                yield out

        fetched = frontier.mapInPandas(run, schema)
        return fetched.withColumn("success", F.col("status_code") == 200)


class SchemeFetcher:
    """file:// and raw:/raw:// scheme dispatch
    (async_crawler_strategy.py:438-492 _handle_file/_handle_raw):

      raw://X or raw:X -> X IS the html (status 200) — raw:// tested
                          first so its slashes aren't kept (the
                          reference documents exactly this pitfall)
      file:///p        -> read the local file (status 200; missing ->
                          status 404, empty html — row-level error, a
                          cluster job must not die on one bad path)
      anything else    -> delegated to the inner fetcher

    file/raw rows are handled in one Arrow-batched pass; at scale
    file:// is the archive-replay path where paths point at a shared
    filesystem mounted on every executor.
    """

    def __init__(self, inner):
        self.inner = inner

    def fetch(self, frontier: DataFrame) -> DataFrame:
        is_scheme = F.col("url_norm").startswith("raw:") | \
            F.col("url_norm").startswith("file://")
        other = frontier.where(~is_scheme)
        local = frontier.where(is_scheme)

        schema = T.StructType(list(frontier.schema.fields) + _HTTP_SCHEMA_EXTRA)

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                htmls, statuses = [], []
                for u in pdf["url_norm"]:
                    if u.startswith("raw://"):
                        htmls.append(u[6:]); statuses.append(200)
                    elif u.startswith("raw:"):
                        htmls.append(u[4:]); statuses.append(200)
                    else:
                        path = u[7:]
                        try:
                            with open(path, encoding="utf-8", errors="replace") as f:
                                htmls.append(f.read())
                            statuses.append(200)
                        except (OSError, ValueError):
                            # ValueError: embedded NUL in a decoded
                            # path — row-level 404, not a task death
                            htmls.append(""); statuses.append(404)
                out = pdf.copy()
                out["html"], out["status_code"] = htmls, statuses
                out["fetch_ms"] = 0
                yield out

        fetched_local = local.mapInPandas(run, schema).withColumn(
            "success", F.col("status_code") == 200
        )
        fetched_other = self.inner.fetch(other)
        return fetched_other.unionByName(
            fetched_local.select(*fetched_other.columns)
        )


class CachedFetcher:
    """Result-cache read gate around any fetcher (CacheMode semantics,
    /root/reference/crawl4ai/cache_context.py:59-87 + result cache read
    async_database.py:288-379): frontier rows whose canonical URL is
    already in the cache table are served from it (left-semi/anti join
    split); only misses reach the inner fetcher. The cache WRITE side is
    the engine's pages append itself (async_webcrawler.py:393-394).

    `cache` is any DataFrame with (url_norm, html, status_code) — in
    practice the pages table of a previous crawl, so re-crawls are
    incremental for free.
    """

    def __init__(self, inner, cache: DataFrame | None, read_enabled: bool = True):
        self.inner = inner
        self.cache = cache
        self.read_enabled = read_enabled

    def fetch(self, frontier: DataFrame) -> DataFrame:
        if not self.read_enabled or self.cache is None:
            return self.inner.fetch(frontier)
        # deterministic pick when the cache holds several rows per URL
        # (a pages table spanning rounds/crawls): latest round wins when
        # a round column exists, else an arbitrary-but-stable tiebreak —
        # never dropDuplicates, whose survivor depends on task order
        from pyspark.sql import Window

        # success rows outrank everything (a plain status asc would put
        # a transport-failure status 0 — or a NULL — ahead of 200 and
        # serve a permanent empty hit), then best status, then body
        order = (
            [F.col("round").desc()] if "round" in self.cache.columns else []
        ) + [
            F.when(F.col("status_code") == 200, 0).otherwise(1).asc(),
            F.coalesce(F.col("status_code"), F.lit(2 ** 31 - 1)).asc(),
            F.length("html").desc(), F.col("html").asc(),
        ]
        w = Window.partitionBy("__c_url").orderBy(*order)
        c = (
            self.cache.select(
                F.col("url_norm").alias("__c_url"),
                F.col("html").alias("html"),
                F.col("status_code").alias("status_code"),
                *(["round"] if "round" in self.cache.columns else []),
            )
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("__c_url", "html", "status_code")
        )
        hits = (
            frontier.join(c, frontier["url_norm"] == c["__c_url"], "inner")
            .drop("__c_url")
            .withColumn("fetch_ms", F.lit(0))
            .withColumn("success", F.col("status_code") == 200)
            .withColumn("from_cache", F.lit(True))
        )
        misses = frontier.join(
            c.select("__c_url"), frontier["url_norm"] == c["__c_url"], "left_anti"
        )
        fetched = self.inner.fetch(misses).withColumn("from_cache", F.lit(False))
        return fetched.unionByName(hits.select(*fetched.columns))
