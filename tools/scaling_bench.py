"""Two-parallelism-level scaling bench (the sandbox stand-in for the
north rule's N vs 4N executor criterion).

Runs the SAME frontier-processing job — one engine round over a large
frontier: canonicalized URLs -> politeness windows -> corpus fetch ->
mapInPandas span extraction -> pages append -> link discovery +
seen-set anti-join — at local[N] and local[4N] on the same input, and
reports frontier URLs/sec at both plus scaling efficiency
(tp_4N / tp_N / 4).

The frontier is made CPU-bound (REPLICAS x documents synthetic pages)
so per-round driver overhead doesn't mask executor scaling; that
mirrors production, where a round processes millions of URLs and the
job-submit cost is noise.

Usage: python tools/scaling_bench.py [N] [REPLICAS] [sf_dir]
Writes results to stdout (JSON) — BENCH.md records them.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(cores: int, replicas: int, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from crawl4ai_spark.corpus.webgen import build_corpus, url_expr
    from crawl4ai_spark.engine.fetch import CorpusFetcher
    from crawl4ai_spark.engine.frontier import CrawlConfig, CrawlEngine
    from crawl4ai_spark.engine.tables import Warehouse
    from crawl4ai_spark.session import build_session

    spark = build_session(
        app_name=f"scaling-bench-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = docs.count()
        # replicate deterministically: doc_id' = doc_id + k*n
        reps = spark.range(replicas).select(F.col("id").alias("k"))
        big = docs.crossJoin(reps).select(
            (F.col("doc_id").cast("long") + F.col("k") * n).alias("doc_id"),
            "text", "source",
        )
        n_big = n * replicas
        corpus = build_corpus(big, n_docs=n_big).repartition(max(cores * 2, 8))
        corpus = corpus.persist()
        corpus.count()  # materialize input outside the timed section

        wh = Warehouse(tempfile.mkdtemp(prefix=f"c4as_scale_{cores}_"))
        eng = CrawlEngine(
            spark, wh, CorpusFetcher(corpus),
            CrawlConfig(max_depth=0, mode="bfs", use_bloom=True,
                        # politeness budget sized so the whole frontier
                        # clears in one round but both window stages +
                        # the winners join run for real
                        base_host_budget=n_big // 7 + 1,
                        max_rounds=1),
        )
        seeds = [r.u for r in big.select(
            url_expr(F.col("doc_id")).alias("u")).collect()]

        t0 = time.monotonic()
        stats = eng.run(seeds)
        wall = time.monotonic() - t0
        return {
            "cores": cores,
            "frontier_urls": n_big,
            "pages_crawled": stats["pages_crawled"],
            "wall_s": round(wall, 2),
            "urls_per_sec": round(n_big / wall, 1),
        }
    finally:
        spark.stop()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    lo = run_once(n, replicas, sf_dir)
    hi = run_once(n * 4, replicas, sf_dir)
    eff = hi["urls_per_sec"] / lo["urls_per_sec"] / 4.0
    print(json.dumps({
        "job": "one frontier round: politeness -> fetch -> extract -> "
               "persist -> discover -> seen anti-join",
        "low": lo, "high": hi,
        "core_ratio": 4,
        "scaling_efficiency": round(eff, 3),
    }, indent=2))


if __name__ == "__main__":
    main()
