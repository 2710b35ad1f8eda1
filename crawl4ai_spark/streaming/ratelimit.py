"""Per-host RateLimiter state — the reference's literal delay recurrence.

Re-expresses RateLimiter.update_delay (/root/reference/crawl4ai/
async_dispatcher.py:65-85) exactly, minus the random jitter (jitter
factors pinned to 1.0 and the base-delay draw to base_lo, so the
recurrence is a deterministic fold and cross-engine checkable):

    rate-limited (429/503): fail_count += 1
        fail_count > max_retries -> gave_up (host dropped)
        else delay = min(delay * 2, max_delay)
    success: delay = max(base_lo, delay * 0.75); fail_count = 0

Two surfaces over one fold:
  rate_limiter_fold      batch: groupBy(host).applyInPandas, events
                         folded in (ts, status) order -> final state per
                         host. This is what a round-boundary recompute
                         or a backfill does.
  rate_limiter_stream    streaming: applyInPandasWithState (GroupState)
                         — the same fold continued across micro-batches,
                         state persisted by the streaming checkpoint.
                         This is the brief's custom-stateful-operator
                         shape (per-host politeness state that survives
                         restarts).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RATE_LIMIT_CODES = (429, 503)

STATE_SCHEMA = T.StructType([
    T.StructField("delay", T.DoubleType()),
    T.StructField("fail_count", T.IntegerType()),
    T.StructField("gave_up", T.BooleanType()),
    T.StructField("n_total", T.LongType()),
])

OUT_SCHEMA = T.StructType([
    T.StructField("host", T.StringType()),
    T.StructField("delay", T.DoubleType()),
    T.StructField("fail_count", T.IntegerType()),
    T.StructField("gave_up", T.BooleanType()),
    T.StructField("n_events", T.LongType()),
])


def fold_statuses(statuses, delay: float, fail_count: int, gave_up: bool,
                  base_lo: float = 1.0, max_delay: float = 60.0,
                  max_retries: int = 3):
    """The deterministic update_delay fold (async_dispatcher.py:65-85,
    jitter pinned). Applied in event order; a host that gave up stays
    given up (the dispatcher stops scheduling it)."""
    for sc in statuses:
        if gave_up:
            break
        if delay == 0.0:
            delay = base_lo  # first wait_if_needed draw, pinned to lo
        if sc in RATE_LIMIT_CODES:
            fail_count += 1
            if fail_count > max_retries:
                gave_up = True
                continue
            delay = min(delay * 2.0, max_delay)
        else:
            delay = max(base_lo, delay * 0.75)
            fail_count = 0
    return delay, fail_count, gave_up


def rate_limiter_fold(events: DataFrame, base_lo: float = 1.0,
                      max_delay: float = 60.0, max_retries: int = 3,
                      host_col: str = "host", ts_col: str = "ts",
                      status_col: str = "status_code") -> DataFrame:
    """(host, ts, status_code) -> final per-host limiter state.
    One shuffle by host; each group folds its events in (ts, status)
    order inside an Arrow batch."""
    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, status_col], kind="mergesort")
        delay, fc, gu = fold_statuses(
            pdf[status_col].tolist(), 0.0, 0, False,
            base_lo, max_delay, max_retries,
        )
        return pd.DataFrame({
            "host": [pdf[host_col].iloc[0]], "delay": [delay],
            "fail_count": [fc], "gave_up": [gu], "n_events": [len(pdf)],
        })

    return (
        events.select(host_col, ts_col, status_col)
        .groupBy(host_col)
        .applyInPandas(run, OUT_SCHEMA)
    )


def rate_limiter_stream(events: DataFrame, base_lo: float = 1.0,
                        max_delay: float = 60.0, max_retries: int = 3,
                        host_col: str = "host", ts_col: str = "ts",
                        status_col: str = "status_code") -> DataFrame:
    """Streaming twin: the same fold continued across micro-batches via
    applyInPandasWithState. Emits the post-batch state row per host per
    micro-batch; the state store (and therefore the limiter memory)
    rides the streaming checkpoint, so a restarted job resumes its
    per-host delays exactly."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def run(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            delay, fc, gu, n = state.get
        else:
            delay, fc, gu, n = 0.0, 0, False, 0
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, status_col], kind="mergesort")
            delay, fc, gu = fold_statuses(
                pdf[status_col].tolist(), delay, fc, gu,
                base_lo, max_delay, max_retries,
            )
            n += len(pdf)
        state.update((delay, fc, gu, n))
        # n_events is CUMULATIVE: the latest state row per host is the
        # one with the highest count, batch-order independent
        yield pd.DataFrame({
            "host": [key[0]], "delay": [delay], "fail_count": [fc],
            "gave_up": [gu], "n_events": [n],
        })

    return (
        events.select(host_col, ts_col, status_col)
        .groupBy(host_col)
        .applyInPandasWithState(
            run, OUT_SCHEMA, STATE_SCHEMA, "update",
            GroupStateTimeout.NoTimeout,
        )
    )
