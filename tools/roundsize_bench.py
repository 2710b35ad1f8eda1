"""Round-size amortization ladder for the frontier mass round.

The two-cluster-size legs (BENCH.md round 4) fit the crawl round as
wall = s + P/cores with s ~ 14.6 s of per-ROUND fixed cost (driver
planning, AQE stage barriers, scheduler RPC) and concluded that s
amortizes to noise at production round sizes — an Amdahl argument
made from two points at ONE round size. This tool measures the claim
directly: the same single-round mass bench (bench.bench_crawl_mass,
the north-rule metric's shape) at a ladder of round sizes on fixed
parallelism. If the fixed-cost model is right, URLs/s must RISE with
round size and approach the parallel-term bound; if some hidden
superlinear cost (skew, memory pressure, lineage growth) lurked, the
big rounds would fall off instead.

Usage:
  python tools/roundsize_bench.py [replica_list] [cpus]
Defaults: 4,16,64,256 $SPARK_GRAFT_CPUS|32   (sf0.1 docs x replicas
= 20k/80k/320k/1.28M-URL rounds)

Prints one JSON line per rung plus a summary line (BENCH.md quotes
them).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    replicas = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1
                                 else "4,16,64,256").split(",")]
    cpus = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import bench_crawl_mass
    from crawl4ai_spark.session import build_session

    spark = build_session(
        app_name="roundsize-bench", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # untimed warmup round: JIT, codegen cache, parquet footer cache —
    # without it the first rung pays ~10 s of one-time cost and the
    # fit misreads it as fixed per-round cost
    bench_crawl_mass(spark, sf_dir, replicas=1)
    spark.catalog.clearCache()

    rungs = []
    for r in replicas:
        runs = [bench_crawl_mass(spark, sf_dir, replicas=r)
                for _ in range(2)]
        wall, n = min(runs, key=lambda t: t[0])
        rung = {
            "replicas": r,
            "round_urls": n,
            "seconds": round(wall, 2),
            "samples": [round(w, 2) for w, _ in runs],
            "urls_per_sec": round(n / wall, 1),
        }
        rungs.append(rung)
        print(json.dumps(rung), flush=True)
        spark.catalog.clearCache()

    # least-squares fit of wall = s + P/cores over the min samples
    import numpy as np

    ns = np.array([g["round_urls"] for g in rungs], dtype=float)
    ws = np.array([g["seconds"] for g in rungs], dtype=float)
    a = np.vstack([np.ones_like(ns), ns]).T
    (s_fixed, per_url), *_ = np.linalg.lstsq(a, ws, rcond=None)
    print(json.dumps({
        "metric": "roundsize_ladder",
        "cpus": int(cpus),
        "fit_fixed_seconds_per_round": round(float(s_fixed), 2),
        "fit_core_seconds_per_url": round(float(per_url) * int(cpus), 6),
        "throughput_smallest": rungs[0]["urls_per_sec"],
        "throughput_largest": rungs[-1]["urls_per_sec"],
        "amortization_gain": round(
            rungs[-1]["urls_per_sec"] / rungs[0]["urls_per_sec"], 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
