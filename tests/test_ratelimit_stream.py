"""RateLimiter state: batch fold vs streaming applyInPandasWithState.

The streaming op must continue the SAME per-host recurrence across
micro-batches (state in the streaming checkpoint), matching the batch
fold over the concatenated event log and an independent Python model.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from crawl4ai_spark.streaming.ratelimit import (
    rate_limiter_fold,
    rate_limiter_stream,
)

EVENTS_B1 = [  # (host, ts, status)
    ("a.test", 1, 200), ("a.test", 2, 429), ("a.test", 3, 429),
    ("b.test", 1, 429), ("b.test", 2, 429),
]
EVENTS_B2 = [
    ("a.test", 4, 200), ("a.test", 5, 503),
    ("b.test", 3, 429), ("b.test", 4, 429),  # 4th fail -> give up
    ("c.test", 1, 200),
]


def model(events, base_lo=1.0, max_delay=60.0, max_retries=3):
    st = {}
    for h, _ts, sc in sorted(events, key=lambda e: (e[0], e[1], e[2])):
        delay, fc, gu = st.get(h, (0.0, 0, False))
        if gu:
            continue
        if delay == 0.0:
            delay = base_lo
        if sc in (429, 503):
            fc += 1
            if fc > max_retries:
                gu = True
            else:
                delay = min(delay * 2.0, max_delay)
        else:
            delay = max(base_lo, delay * 0.75)
            fc = 0
        st[h] = (delay, fc, gu)
    return st


def test_batch_fold_matches_model(spark):
    df = spark.createDataFrame(EVENTS_B1 + EVENTS_B2,
                               "host string, ts long, status_code int")
    got = {r.host: (r.delay, r.fail_count, r.gave_up)
           for r in rate_limiter_fold(df).collect()}
    want = model(EVENTS_B1 + EVENTS_B2)
    assert got == want
    assert got["b.test"][2] is True  # gave up after the 4th 429


def test_streaming_state_continues_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # two files -> two micro-batches in order (maxFilesPerTrigger=1)
    for name, events in [("b1.json", EVENTS_B1), ("b2.json", EVENTS_B2)]:
        with open(src / name, "w") as f:
            for h, ts, sc in events:
                f.write(json.dumps({"host": h, "ts": ts, "status_code": sc}) + "\n")
        os.utime(src / name, (1_000_000_000 + int(name[1]), ) * 2)

    stream = (
        spark.readStream.schema("host string, ts long, status_code int")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    out = rate_limiter_stream(stream)
    q = (
        out.writeStream.format("memory").queryName("rl_states")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM rl_states").collect()
    # n_events is cumulative: the max-count row per host is its final state
    last = {}
    for r in sorted(rows, key=lambda r: r.n_events):
        last[r.host] = (r.delay, r.fail_count, r.gave_up)
    want = model(EVENTS_B1 + EVENTS_B2)
    assert last == want
    # two micro-batches really happened for hosts present in both
    assert sum(1 for r in rows if r.host == "a.test") == 2
