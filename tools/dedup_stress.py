"""Degenerate-input scale-stress for the round-4 dedup granularities.

The line-level and substring-span ops claim LINEAR behavior on hot
keys ("a boilerplate line/gram in 10^6 docs is 10^6 window rows,
never a join blowup" — ops/dedup.py docstrings). This tool synthesizes
exactly that degenerate shape and measures it:

  1. dedup_lines: N docs, EVERY doc carrying the same boilerplate
     line (one line-hash partition of N rows) plus unique body lines.
     A pair-join formulation would be O(N^2) = 10^12 at N=10^6; the
     window path must finish in seconds and keep exactly one copy.
  2. duplicate_token_spans: every doc shares one boilerplate 8-gram
     run (one gram-hash window partition of N rows). Same linearity
     claim; every doc must report the correct partial span.
  3. semantic_dedup hot cell: K identical vectors co-located in one
     IVF cell. The UNCAPPED pair join IS quadratic (that is the
     documented hazard) — the stress shows max_cell_df excising the
     cell while keeping every member (conservative), at a K where the
     uncapped form would materialize K^2/2 pairs.

Usage:
  python tools/dedup_stress.py [n_docs] [k_hot_vectors] [cpus]
Defaults: 1_000_000 20_000 $SPARK_GRAFT_CPUS|32

Prints one JSON line (machine-readable; BENCH.md quotes it).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k_hot = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    cpus = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from crawl4ai_spark.ops.dedup import dedup_lines, duplicate_token_spans
    from crawl4ai_spark.ops.similarity import semantic_dedup
    from crawl4ai_spark.session import build_session

    spark = build_session(
        app_name="dedup-stress", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    report: dict = {"n_docs": n_docs, "k_hot_vectors": k_hot,
                    "cpus": int(cpus)}

    # -- 1. dedup_lines: one boilerplate line in EVERY doc ------------------
    boiler = "SUBSCRIBE TO OUR NEWSLETTER FOR THE LATEST UPDATES"
    docs = (
        spark.range(n_docs).repartition(int(cpus))
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                "\n",
                F.lit(boiler),
                F.concat(F.lit("unique body line for document "),
                         F.col("id").cast("string")),
            ).alias("text"),
        )
    )
    t0 = time.monotonic()
    out = dedup_lines(docs)
    agg = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_lines").alias("lines"),
        F.sum("n_kept").alias("kept"),
    ).collect()[0]
    t_lines = time.monotonic() - t0
    # exactly ONE boilerplate copy survives corpus-wide
    assert agg["docs"] == n_docs, agg
    assert agg["lines"] == 2 * n_docs, agg
    assert agg["kept"] == n_docs + 1, agg
    report["dedup_lines"] = {
        "hot_line_occurrences": n_docs,
        "seconds": round(t_lines, 2),
        "rows_per_sec": round(2 * n_docs / t_lines),
        "kept_total": int(agg["kept"]),
        "pair_join_equivalent_rows": n_docs * n_docs,
    }

    # -- 2. duplicate spans: one boilerplate 8-gram run in EVERY doc --------
    span_docs = (
        spark.range(n_docs).repartition(int(cpus))
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("one two three four five six seven eight "),
                F.concat_ws(
                    " ",
                    *[(F.col("id") * (i + 1)).cast("string")
                      for i in range(8)],
                ),
            ).alias("text"),
        )
    )
    t0 = time.monotonic()
    sp = duplicate_token_spans(span_docs, n=8)
    sagg = sp.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum((F.col("n_spans") == 1).cast("long")).alias("one_span"),
        F.min("dup_tokens").alias("min_dup"),
        F.max("dup_tokens").alias("max_dup"),
    ).collect()[0]
    t_spans = time.monotonic() - t0
    assert sagg["docs"] == n_docs, sagg
    # every doc: exactly one span covering the shared 8-token head
    assert sagg["one_span"] == n_docs, sagg
    assert sagg["min_dup"] == 8 and sagg["max_dup"] == 8, sagg
    report["dedup_spans"] = {
        "hot_gram_occurrences": n_docs,
        "seconds": round(t_spans, 2),
        "gram_rows_per_sec": round(9 * n_docs / t_spans),
    }

    # -- 3. semantic_dedup hot cell: K identical vectors --------------------
    dim = 16
    hot = (
        spark.range(k_hot).repartition(int(cpus))
        .select(
            F.col("id").alias("vec_id"),
            F.array(*[F.lit(1.0)] * dim).alias("embedding"),
        )
    )
    t0 = time.monotonic()
    capped = semantic_dedup(hot, dim=dim, threshold=0.9, max_cell_df=1000)
    kept_capped = capped.where("keep").count()
    t_capped = time.monotonic() - t0
    assert kept_capped == k_hot, kept_capped  # conservative: all kept
    report["semantic_hot_cell"] = {
        "identical_vectors": k_hot,
        "uncapped_pair_rows": k_hot * (k_hot - 1) // 2,
        "capped_seconds": round(t_capped, 2),
        "capped_kept": int(kept_capped),
    }

    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
