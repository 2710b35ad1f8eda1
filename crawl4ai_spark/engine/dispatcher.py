"""MemoryAdaptiveDispatcher twin — hysteresis memory gate + priority
intake fold.

The reference's default dispatcher (/root/reference/crawl4ai/
async_dispatcher.py:148-470) wraps the crawl in a memory governor:

  monitor (async_dispatcher.py:176-216, every check_interval seconds):
    mem >= memory_threshold (90%)   -> enter PRESSURE mode; remember
                                       when this high-memory run began
    mem <= recovery_threshold (85%) -> leave PRESSURE mode
    85 < mem < 90                   -> keep the previous mode
                                       (hysteresis); a dip below 90
                                       resets the run clock even while
                                       the mode stays PRESSURE
    mem >= critical_threshold (95%) -> CRITICAL status
    run >= memory_wait_timeout      -> raise MemoryError (:194-198)

  scheduler loop (run_urls, :400-458, one iteration per interval):
    not PRESSURE -> greedily fill max_session_permit slots from a
                    priority queue; priority per task
                    (_get_priority_score, :217-226):
                      wait > fairness_timeout -> -wait   (jump queue)
                      else                    -> retry_count
                    ties break on the queue tuple's next element, the
                    URL string (asyncio.PriorityQueue heap order)
    PRESSURE     -> no intake; active tasks drain
    CRITICAL at task start (crawl_url, :288-317) -> the task is NOT
                    run: it is requeued with retry_count+1 and a fresh
                    enqueue time, and its slot is released

In this engine time is round-granular, so the monitor's check_interval
becomes one `tick`:

  memory_pressure_states   the whole monitor state machine as plain
                           window functions over a (job_id, tick,
                           mem_percent) timeline — `last(event)` for
                           the enter/exit hysteresis, a last-below-
                           threshold window for the run clock. Zero
                           recursion, zero shuffle beyond the job
                           partitioning, exact.
  dispatch_memory_adaptive the scheduler loop as a per-job fold
                           (groupBy(job_id).applyInPandas): thousands
                           of independent dispatcher jobs fold in
                           parallel, one pass over ticks each. The
                           single-job queue is inherently sequential
                           state (exactly as in the reference — one
                           process-level PriorityQueue); the CLUSTER
                           path for intake remains the politeness
                           budget window (engine/politeness.py), which
                           this gate composes with in the crawl loop
                           (CrawlConfig.memory_adaptive).

Determinism pins (cross-engine checkable, like streaming/ratelimit.py):
wall-clock is tick-granular, service time is a per-task input column,
and queue ties break on (priority, url) — the reference's heap order
with unique URLs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEMORY_THRESHOLD = 90.0      # async_dispatcher.py:151
CRITICAL_THRESHOLD = 95.0    # :152
RECOVERY_THRESHOLD = 85.0    # :153
MAX_SESSION_PERMIT = 20      # :155


def memory_pressure_states(
    timeline: DataFrame,
    memory_threshold: float = MEMORY_THRESHOLD,
    critical_threshold: float = CRITICAL_THRESHOLD,
    recovery_threshold: float = RECOVERY_THRESHOLD,
    wait_timeout_ticks: Optional[int] = None,
) -> DataFrame:
    """Monitor state per tick (async_dispatcher.py:176-216) as window
    functions. ``timeline``: (job_id, tick, mem_percent); ticks are the
    check_interval grid, contiguous from each job's first observation.

    Returns per tick: pressure_mode, status (NORMAL/PRESSURE/CRITICAL),
    run_ticks (ticks since the current contiguous >=threshold run
    began; 0 outside a run AND at a run's first tick — the monitor sets
    the clock on entry and only compares on later passes), abort (this
    tick raises MemoryError), aborted (this or any earlier tick did).
    """
    j = ["job_id"] if "job_id" in timeline.columns else []
    w = Window.partitionBy(*j).orderBy("tick")
    wall = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    hi = F.col("mem_percent") >= F.lit(memory_threshold)
    # hysteresis: state = last enter/exit event; dips into the
    # (recovery, threshold) band carry the previous state forward
    event = (
        F.when(hi, F.lit(True))
        .when(F.col("mem_percent") <= F.lit(recovery_threshold), F.lit(False))
    )
    out = timeline.withColumn(
        "pressure_mode",
        F.coalesce(F.last(event, ignorenulls=True).over(wall), F.lit(False)),
    )
    # run clock: the monitor resets _high_memory_start_time whenever
    # mem < threshold (:206-207, even inside PRESSURE mode), so the run
    # is the current contiguous >=threshold streak
    last_below = F.last(
        F.when(~hi, F.col("tick")), ignorenulls=True
    ).over(wall)
    first_tick = F.min("tick").over(w.rowsBetween(Window.unboundedPreceding,
                                                  Window.unboundedFollowing))
    out = out.withColumn(
        "run_ticks",
        F.when(hi, F.col("tick") - F.coalesce(last_below, first_tick - 1) - 1)
        .otherwise(F.lit(0)),
    )
    out = out.withColumn(
        "status",
        F.when(F.col("mem_percent") >= F.lit(critical_threshold), F.lit("CRITICAL"))
        .when(F.col("pressure_mode"), F.lit("PRESSURE"))
        .otherwise(F.lit("NORMAL")),
    )
    if wait_timeout_ticks is None:
        out = out.withColumns(
            {"abort": F.lit(False), "aborted": F.lit(False)}
        )
    else:
        # the entering pass sets the clock and does not compare
        # (:181-185), so a run's first tick never aborts: run_ticks>0
        out = out.withColumn(
            "abort",
            hi & (F.col("run_ticks") >= F.lit(wait_timeout_ticks))
            & (F.col("run_ticks") > 0),
        ).withColumn(
            "aborted",
            F.coalesce(
                F.max(F.col("abort").cast("int")).over(wall) == 1, F.lit(False)
            ),
        )
    return out


_DISPATCH_SCHEMA = T.StructType([
    T.StructField("job_id", T.IntegerType()),
    T.StructField("task_id", T.LongType()),
    T.StructField("url", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("first_dispatch_tick", T.IntegerType()),
    T.StructField("start_tick", T.IntegerType()),
    T.StructField("end_tick", T.IntegerType()),
    T.StructField("retry_count", T.IntegerType()),
    T.StructField("wait_ticks", T.IntegerType()),
])


@dataclass
class _Task:
    task_id: int
    url: str
    enq: int          # current enqueue tick (refreshed on requeue)
    enq0: int         # original enqueue tick
    service: int
    retry: int = 0
    fdisp: Optional[int] = None   # first time it reached the head
    start: Optional[int] = None   # tick it actually began running
    end: Optional[int] = None     # tick its service completed
    aborted: bool = False


def _fold_job(tasks: pd.DataFrame, states: pd.DataFrame,
              max_session_permit: int,
              fairness_timeout_ticks: int) -> pd.DataFrame:
    """One dispatcher job's scheduler loop, tick by tick (run_urls,
    async_dispatcher.py:400-458). Pure function of its inputs."""
    ts = [
        _Task(task_id=int(r.task_id), url=str(r.url),
              enq=int(r.enqueue_tick), enq0=int(r.enqueue_tick),
              service=max(1, int(r.service_ticks)))
        for r in tasks.itertuples()
    ]
    st = states.sort_values("tick")
    # the scheduler and monitor interleave: slots are filled under the
    # PREVIOUS interval's pressure state (run_urls :411 reads the flag
    # the monitor last wrote), and the started task's critical check
    # reads the CURRENT interval's memory (crawl_url :288) — that lag
    # is precisely what makes the requeue path reachable, so the tick
    # pin keeps it: intake gates on lag(pressure_mode), critical on now
    pressure_prev = False
    for row in st.itertuples():
        t = int(row.tick)
        if bool(row.abort):
            # MemoryError: active tasks are cancelled, queued ones
            # never run (:403-408)
            for k in ts:
                if k.end is None or k.end >= t:
                    k.aborted = True
                    k.end = None
            break
        pressure_now = bool(row.pressure_mode)
        if not pressure_prev:
            active = sum(1 for k in ts if k.start is not None
                         and k.end is not None and k.end >= t)
            slots = max_session_permit - active
            if slots <= 0:
                # saturated: skip the queue scan+sort entirely — on a
                # long timeline with thousands queued this is the
                # fold's dominant cost and selects nothing
                pressure_prev = pressure_now
                continue
            queued = [k for k in ts
                      if k.start is None and not k.aborted and k.enq <= t]

            def prio(k: _Task):
                wait = t - k.enq
                p = -float(wait) if wait > fairness_timeout_ticks \
                    else float(k.retry)
                return (p, k.url)

            for k in sorted(queued, key=prio)[:slots]:
                if k.fdisp is None:
                    k.fdisp = t
                if row.status == "CRITICAL":
                    # crawl_url's critical check (:288-317): requeue
                    # with retry+1 and a fresh enqueue time
                    k.retry += 1
                    k.enq = t
                else:
                    k.start = t
                    k.end = t + k.service - 1
        pressure_prev = pressure_now
    last_tick = int(st["tick"].max()) if len(st) else -1
    out = []
    for k in ts:
        if k.aborted:
            status = "aborted"
        elif k.start is None:
            status = "pending"
        elif k.end is not None and k.end <= last_tick:
            status = "completed"
        else:
            status = "in_flight"
        out.append((
            int(tasks["job_id"].iloc[0]), k.task_id, k.url, status,
            k.fdisp, k.start, k.end if status == "completed" else None,
            k.retry,
            (k.start - k.enq0) if k.start is not None else None,
        ))
    return pd.DataFrame(out, columns=[f.name for f in _DISPATCH_SCHEMA])


def dispatch_memory_adaptive(
    tasks: DataFrame,
    timeline: DataFrame,
    max_session_permit: int = MAX_SESSION_PERMIT,
    fairness_timeout_ticks: int = 600,
    wait_timeout_ticks: Optional[int] = None,
    memory_threshold: float = MEMORY_THRESHOLD,
    critical_threshold: float = CRITICAL_THRESHOLD,
    recovery_threshold: float = RECOVERY_THRESHOLD,
) -> DataFrame:
    """Folds each job's task queue through its memory timeline.

    ``tasks``: (job_id, task_id, url, enqueue_tick, service_ticks);
    ``timeline``: (job_id, tick, mem_percent). Jobs fold independently
    and in parallel (one applyInPandas group per job) — the scale axis
    is the number of concurrent dispatcher jobs, exactly as a fleet of
    reference dispatchers scales by process, while inside one job the
    queue is the same sequential state the reference holds in its
    asyncio loop.

    Returns one row per task: status (completed / pending / in_flight /
    aborted), first_dispatch_tick (first time it reached the queue
    head), start_tick / end_tick, retry_count (critical-pressure
    requeues), wait_ticks (start - original enqueue).
    """
    states = memory_pressure_states(
        timeline, memory_threshold, critical_threshold,
        recovery_threshold, wait_timeout_ticks,
    ).select("job_id", "tick", "pressure_mode", "status", "abort")

    def fold(task_pdf, state_pdf):
        if not len(task_pdf):
            return pd.DataFrame(columns=[f.name for f in _DISPATCH_SCHEMA])
        return _fold_job(task_pdf, state_pdf, max_session_permit,
                         fairness_timeout_ticks)

    return tasks.groupBy("job_id").cogroup(
        states.groupBy("job_id")
    ).applyInPandas(fold, _DISPATCH_SCHEMA)


class MemoryGate:
    """Round-granular memory governor for the crawl loop
    (CrawlConfig.memory_adaptive): the monitor state machine above,
    folded one round at a time against a live memory provider.

    Under PRESSURE the round's intake is paused (global_budget=0 —
    every frontier row defers, wait_rounds+1 keeps fairness honest);
    a >=threshold run older than wait_timeout_rounds raises
    MemoryError like the reference monitor (:194-198). State is
    ephemeral by design: on job resume it re-derives from fresh
    observations (a restarted process has fresh memory too).
    """

    def __init__(self, provider=None,
                 memory_threshold: float = MEMORY_THRESHOLD,
                 critical_threshold: float = CRITICAL_THRESHOLD,
                 recovery_threshold: float = RECOVERY_THRESHOLD,
                 wait_timeout_rounds: Optional[int] = None):
        self.provider = provider or jvm_heap_percent
        self.memory_threshold = memory_threshold
        self.critical_threshold = critical_threshold
        self.recovery_threshold = recovery_threshold
        self.wait_timeout_rounds = wait_timeout_rounds
        self.pressure_mode = False
        self.run_rounds = 0          # ticks since the current run began
        self.events: list[dict] = []

    def check(self, spark, rnd: int) -> bool:
        """One monitor pass. Returns True when intake must pause."""
        mem = float(self.provider(spark) if callable(self.provider)
                    else self.provider)
        if mem >= self.memory_threshold:
            if self.run_rounds > 0 and self.wait_timeout_rounds is not None \
                    and self.run_rounds >= self.wait_timeout_rounds:
                self.events.append(
                    {"round": rnd, "mem": mem, "status": "ABORT"})
                raise MemoryError(
                    f"Memory usage exceeded threshold for "
                    f"{self.wait_timeout_rounds} rounds")
            self.pressure_mode = True
            self.run_rounds += 1
        else:
            self.run_rounds = 0
            if mem <= self.recovery_threshold:
                self.pressure_mode = False
        status = ("CRITICAL" if mem >= self.critical_threshold
                  else "PRESSURE" if self.pressure_mode else "NORMAL")
        self.events.append({"round": rnd, "mem": mem, "status": status})
        return self.pressure_mode


def jvm_heap_percent(spark) -> float:
    """Driver-JVM heap occupancy percent via java.lang.Runtime — the
    stand-in for the reference's psutil.virtual_memory() (:176). On a
    cluster the same gate would read executor memory metrics from the
    status tracker; in local mode driver == executor JVM."""
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    used = rt.totalMemory() - rt.freeMemory()
    return 100.0 * used / rt.maxMemory()
