"""Dispatcher-fold scale evidence: many independent dispatcher jobs
folding in parallel, at two parallelism levels.

The MemoryAdaptiveDispatcher twin's scale axis is the number of
concurrent dispatcher jobs (engine/dispatcher.py docstring): one
reference process holds ONE asyncio queue; a fleet of them is a
groupBy(job_id) fold where every job is an independent pandas group.
This leg runs N_JOBS x TASKS_PER_JOB tasks through a TICKS-interval
pressure-wave timeline and reports tasks/sec at local[N] and
local[4N] plus the scaling efficiency — the fold has no cross-job
state, so it should scale near-linearly until the group count runs
out.

Usage: python tools/dispatcher_stress.py [n_jobs] [tasks_per_job] [N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TICKS = 48


def run_once(cores: int, n_jobs: int, tasks_per_job: int) -> dict:
    from pyspark.sql import functions as F

    from crawl4ai_spark.engine.dispatcher import dispatch_memory_adaptive
    from crawl4ai_spark.session import build_session

    spark = build_session(master=f"local[{cores}]",
                          shuffle_partitions=2 * cores,
                          app_name=f"disp-stress-{cores}")
    spark.sparkContext.setLogLevel("ERROR")
    # AQE coalescing is byte-based and blind to per-row PYTHON cost —
    # it would narrow the ~60 B/row cogroup shuffle to a handful of
    # partitions and serialize the pandas fold (the same reason the
    # engine loop pins it off, engine/frontier.py run()).
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    n = n_jobs * tasks_per_job
    i = F.col("id")
    tasks = spark.range(n).select(
        (i % n_jobs).cast("int").alias("job_id"),
        i.alias("task_id"),
        F.format_string("https://site%d.example.com/p/%d",
                        (i % 997).cast("int"), i).alias("url"),
        (i % 8).cast("int").alias("enqueue_tick"),
        (F.lit(1) + i % 3).cast("int").alias("service_ticks"),
    )
    j, t = F.col("job_id"), F.col("tick")
    # per-job phase-shifted pressure wave: every job sees calm, a
    # PRESSURE run, a CRITICAL spike, and recovery at different ticks
    mem = (
        F.when((t + j) % 16 == 6, 96.0)
        .when(((t + j) % 16 >= 7) & ((t + j) % 16 <= 9), 91.0)
        .when((t + j) % 16 == 10, 84.0)
        .otherwise(50.0)
    )
    timeline = (
        spark.range(n_jobs).select(F.col("id").cast("int").alias("job_id"))
        .crossJoin(spark.range(N_TICKS)
                   .select(F.col("id").cast("int").alias("tick")))
        .select("job_id", "tick", mem.cast("double").alias("mem_percent"))
    )
    # warmup (plan compile + python worker spinup), then timed run
    out = dispatch_memory_adaptive(tasks, timeline, max_session_permit=8,
                                   fairness_timeout_ticks=6,
                                   wait_timeout_ticks=None)
    out.limit(1).count()
    t0 = time.monotonic()
    by_status = {r["status"]: r["n"] for r in
                 out.groupBy("status").agg(F.count("*").alias("n")).collect()}
    wall = time.monotonic() - t0
    spark.stop()
    return {"cores": cores, "n_jobs": n_jobs, "tasks": n,
            "wall_s": round(wall, 2),
            "tasks_per_sec": round(n / wall, 1),
            "by_status": by_status}


def main() -> None:
    n_jobs = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    per_job = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    lo = run_once(n, n_jobs, per_job)
    print(json.dumps(lo), flush=True)
    hi = run_once(4 * n, n_jobs, per_job)
    print(json.dumps(hi), flush=True)
    eff = hi["tasks_per_sec"] / lo["tasks_per_sec"] / 4.0
    print(json.dumps({"metric": "dispatcher_fold_scaling",
                      "N": n, "eff_N_to_4N": round(eff, 3)}), flush=True)


if __name__ == "__main__":
    main()
