"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "crawl_urls_per_sec": ...}

Each query is forced end-to-end with the noop sink (full computation,
no collect-to-driver, no column pruning of the measured work).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def bench_crawl(spark, sf_dir: str, max_depth: int = 6) -> tuple[float, int]:
    """The engine loop itself: BFS to depth 6 with bloom seen-set +
    politeness budgets on. Returns (seconds, pages_crawled). This
    measures ROUND LATENCY (7 mostly-small rounds), not throughput."""
    from crawl4ai_spark.corpus.webgen import build_corpus, seed_url
    from crawl4ai_spark.engine.fetch import CorpusFetcher
    from crawl4ai_spark.engine.frontier import CrawlConfig, CrawlEngine
    from crawl4ai_spark.engine.tables import Warehouse

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = build_corpus(docs).cache()
    wh = Warehouse(tempfile.mkdtemp(prefix="c4as_bench_"))
    eng = CrawlEngine(
        spark, wh, CorpusFetcher(corpus),
        CrawlConfig(max_depth=max_depth, mode="bfs", use_bloom=True,
                    base_host_budget=4000, n_salts=8),
    )
    t0 = time.monotonic()
    stats = eng.run([seed_url()])
    wall = time.monotonic() - t0
    corpus.unpersist()
    return wall, stats["pages_crawled"]


def bench_crawl_mass(spark, sf_dir: str, replicas: int = 4) -> tuple[float, int]:
    """Frontier THROUGHPUT (the north-star metric's shape): one round
    over a replicated corpus as frontier — politeness windows,
    robots-free fetch join, span extraction, pages persist, discovery +
    seen anti-join all run on a full-size frontier, the way production
    rounds do. Returns (seconds, urls_processed)."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.corpus.webgen import build_corpus, replicate_docs, url_expr
    from crawl4ai_spark.engine.fetch import CorpusFetcher
    from crawl4ai_spark.engine.frontier import CrawlConfig, CrawlEngine
    from crawl4ai_spark.engine.tables import Warehouse

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = replicate_docs(base, replicas)
    n = base.count() * replicas
    corpus = build_corpus(docs, n_docs=n).cache()
    corpus.count()  # materialize outside the timed section
    # seeds are INPUT (a production seed table is already materialized)
    seed_df = docs.select(
        url_expr(F.col("doc_id").cast("long")).alias("url")
    ).repartition(32).persist()
    seed_df.count()
    wh = Warehouse(tempfile.mkdtemp(prefix="c4as_mass_"))
    eng = CrawlEngine(
        spark, wh, CorpusFetcher(corpus),
        CrawlConfig(max_depth=0, mode="bfs", use_bloom=True,
                    base_host_budget=n // 7 + 1, n_salts=8, max_rounds=1),
    )
    t0 = time.monotonic()
    eng.run(seed_df=seed_df)
    wall = time.monotonic() - t0
    corpus.unpersist()
    seed_df.unpersist()
    return wall, n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from crawl4ai_spark.session import build_session

    spark = build_session(
        app_name="crawl4ai-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from crawl4ai_spark import queries as Q

    headline = [
        "crawl_spans",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "embedding_cosine_topk",
        "ann_signlsh_topk",
        "tpch_q1_pricing",
        "tpch_q3_revenue",
        "events_tumbling",
        "events_sessionize",
        "events_topk",
        "text_stats",
        "chunks_fixed",
        "url_canonicalize",
        "quality_gopher",
        "decontaminate",
    ]

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    # The two crawl benches run minutes-long on a SHARED host whose
    # noisy-neighbor bursts routinely inflate a single sample 2-7x
    # (BENCH.md documents the variance model); two samples with min
    # reported — and BOTH disclosed in the `samples` field — keeps one
    # unlucky burst from masquerading as a regression.
    mass_runs = [bench_crawl_mass(spark, sf_dir) for _ in range(2)]
    mass_s, mass_urls = min(mass_runs, key=lambda r: r[0])
    timings["crawl_mass_round"] = round(mass_s, 3)
    samples["crawl_mass_round"] = [round(s, 3) for s, _ in mass_runs]
    crawl_runs = [bench_crawl(spark, sf_dir) for _ in range(2)]
    crawl_s, crawl_pages = min(crawl_runs, key=lambda r: r[0])
    timings["crawl_bfs_d6"] = round(crawl_s, 3)
    samples["crawl_bfs_d6"] = [round(s, 3) for s, _ in crawl_runs]
    # the crawl benches cache corpora and leave shuffle/GC residue; a
    # clean cache keeps the per-query timings below independent of them
    spark.catalog.clearCache()

    for name in headline:
        fn = Q.QUERIES[name]
        t0 = time.monotonic()
        _force(fn(spark, sf_dir))
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "samples": samples,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "crawl_pages": crawl_pages,
        "crawl_urls_per_sec": round(mass_urls / mass_s, 2) if mass_s else None,
        "crawl_loop_urls_per_sec": round(crawl_pages / crawl_s, 2) if crawl_s else None,
        "cpus": int(cpus),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
