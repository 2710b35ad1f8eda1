"""HTTP fetch throughput A/B: max_session_permit 1 vs 20 over the
loopback corpus server, on the reference's own bench shape.

The reference's only published end-to-end number is 17.09 URLs/s for
arun_many over 100 URLs served by a local HTTP server
(reference tests/memory/README.md). This script reproduces that shape
(100 URLs, loopback server) plus a larger leg, with a fixed per-request
service latency emulating a real RTT — which is exactly what makes the
concurrency knob matter: at `delay_ms` RTT a serial fetcher is bounded
by cores/delay, a pooled one by cores*permits/delay.

Usage: python tools/http_bench.py [sf_dir]
Prints one JSON line per leg.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import functions as F

    from crawl4ai_spark.engine.fetch import HttpFetcher
    from crawl4ai_spark.corpus.webgen import url_expr
    from crawl4ai_spark.session import build_session
    from crawl4ai_spark.sources.loopback import corpus_server

    spark = build_session(app_name="http-bench")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    i = F.col("doc_id").cast("long")

    legs = [
        # (n_urls, partitions, delay_ms, permits) — 100/1part/serial is
        # the closest analogue of the reference's single-process
        # arun_many bench; the wide legs are the cluster shape.
        (100, 1, 20, 1),
        (100, 1, 20, 20),
        (2000, 32, 20, 1),
        (2000, 32, 20, 20),
    ]
    results = []
    for n_urls, parts, delay_ms, permits in legs:
        n_urls = min(n_urls, n_docs)
        srv = corpus_server(sf_dir, delay_ms=delay_ms)
        frontier = (
            docs.where(i < n_urls)
            .select(url_expr(i).alias("url_norm"))
            .repartition(parts)
            .cache()
        )
        frontier.count()  # materialize: time only the fetch stage
        fetcher = HttpFetcher(
            timeout_s=30.0, max_session_permit=permits,
            url_rewrite=srv.rewrite(),
        )
        # warm the Python workers once so the A/B isn't spinup noise
        fetcher.fetch(frontier.limit(parts)).count()
        t0 = time.monotonic()
        out = fetcher.fetch(frontier)
        n_ok = out.where("status_code = 200").count()
        wall = time.monotonic() - t0
        frontier.unpersist()
        leg = {
            "n_urls": n_urls, "partitions": parts, "delay_ms": delay_ms,
            "max_session_permit": permits, "fetched_ok": n_ok,
            "wall_sec": round(wall, 3),
            "urls_per_sec": round(n_urls / wall, 1),
        }
        results.append(leg)
        print(json.dumps(leg), flush=True)

    print(json.dumps({
        "metric": "loopback_http_urls_per_sec",
        "reference_urls_per_sec": 17.09,
        "legs": results,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
