"""In-process loopback HTTP server serving the synthetic corpus.

The reference benchmarks its own live-fetch path against a *local* HTTP
server rather than the live web (reference tests/memory/run_benchmark.py
+ tests/memory/README.md:85-93 — "Start local test server" then
`arun_many` against http://localhost URLs, 17.09 URLs/s over 100 URLs).
This module is that harness for the Spark engine: it serves exactly the
deterministic pages of corpus/webgen.py, regenerated per request from
the documents parquet via the pure-Python `page_html` twin, so

  HttpFetcher over the loopback  ==  CorpusFetcher over build_corpus()

is an end-to-end parity check of the REAL network path (sockets, HTTP
status handling, charset decode, timeouts) — the only part of the fetch
stage the sandbox's network-off policy otherwise leaves pytest-only.

`delay_ms` injects a fixed per-request service latency to emulate a
real RTT, which is what makes the `max_session_permit` concurrency A/B
in tools/http_bench.py meaningful (at 0 ms latency a serial fetcher is
already socket-bound).

Scale note: this server is a TEST/bench fixture. In production the
fetch stage talks to the actual web; every executor core runs its own
`max_session_permit`-bounded connection pool (engine/fetch.py), so
aggregate concurrency = cores × permits without any coordination point
like this single server.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import urlsplit

from crawl4ai_spark.corpus.webgen import page_html


class CorpusHTTPServer:
    """Loopback server: GET /page/{i} -> webgen page_html(i).

    Unknown paths / out-of-range ids -> 404 with an empty body (the
    dead-link shape CorpusFetcher produces for missing corpus rows).
    """

    def __init__(self, docs: dict, n_docs: int, delay_ms: int = 0):
        self.docs = docs  # {i: (text, source)}
        self.n_docs = n_docs
        self.delay_ms = delay_ms
        self._httpd: ThreadingHTTPServer | None = None
        self.port: int | None = None

    @classmethod
    def from_parquet(cls, sf_dir: str, delay_ms: int = 0) -> "CorpusHTTPServer":
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text", "source"])
        ids = [int(x) for x in t.column("doc_id").to_pylist()]
        texts = t.column("text").to_pylist()
        sources = t.column("source").to_pylist()
        docs = {i: (tx, sr) for i, tx, sr in zip(ids, texts, sources)}
        return cls(docs, n_docs=len(docs), delay_ms=delay_ms)

    def start(self) -> "CorpusHTTPServer":
        docs, n_docs, delay_ms = self.docs, self.n_docs, self.delay_ms

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # keep executor logs clean
                pass

            def do_GET(self):
                if delay_ms:
                    import time

                    time.sleep(delay_ms / 1000.0)
                path = urlsplit(self.path).path
                body = b""
                status = 404
                if "/page/" in path:
                    tail = path.rsplit("/page/", 1)[1]
                    if tail.isdigit() and int(tail) in docs:
                        i = int(tail)
                        text, source = docs[i]
                        body = page_html(i, text, source, n_docs).encode()
                        status = 200
                self.send_response(status)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        class Server(ThreadingHTTPServer):
            # cores × max_session_permit connects can land in one burst;
            # the stdlib default backlog of 5 makes the kernel drop SYNs
            # and the clients crawl through 1s/2s/4s retransmit timers
            request_queue_size = 1024
            daemon_threads = True

        self._httpd = Server(("127.0.0.1", 0), Handler)
        self.port = self._httpd.server_address[1]
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        return self

    def stop(self):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        # purge the singleton registry: a later corpus_server() call
        # must start a fresh server, not hand back this dead one with
        # a stale port (every fetch would come back status 0)
        for key, srv in list(_SERVERS.items()):
            if srv is self:
                del _SERVERS[key]

    def rewrite(self):
        """Picklable url_rewrite for HttpFetcher: keep the canonical URL
        as the row identity, fetch its path from the loopback — the
        same shape as routing a crawl through a recording proxy."""
        return make_rewrite(self.port)


def make_rewrite(port: int):
    base = f"http://127.0.0.1:{port}"

    def rewrite(url: str) -> str:
        s = urlsplit(url)
        return base + s.path + (f"?{s.query}" if s.query else "")

    return rewrite


_SERVERS: dict = {}
_LOCK = threading.Lock()


def corpus_server(sf_dir: str, delay_ms: int = 0) -> CorpusHTTPServer:
    """Process-wide singleton per (sf_dir, delay): queries and tests
    reuse one server; daemon threads die with the driver process."""
    key = (sf_dir, delay_ms)
    with _LOCK:
        srv = _SERVERS.get(key)
        if srv is None:
            srv = CorpusHTTPServer.from_parquet(sf_dir, delay_ms).start()
            _SERVERS[key] = srv
        return srv
