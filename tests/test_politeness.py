"""Politeness window: budget enforcement, deferral retention (the
two-stage salted top-k must never DROP frontier rows), fairness."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawl4ai_spark.engine.politeness import select_fetch_batch, update_host_state


def _frontier(spark, n=40, hosts=2):
    rows = [
        (f"https://h{i % hosts}.test/p/{i}", f"h{i % hosts}.test",
         i % 3, float(i % 7), 0, 0, i % 4)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "url_norm string, host string, depth int, priority double, "
        "retry_count int, wait_rounds int, salt int",
    )


def test_budget_enforced_and_rows_retained(spark):
    f = _frontier(spark, n=40, hosts=2)
    marked = select_fetch_batch(f, None, base_budget=5)
    assert marked.count() == 40, "non-selected rows must be retained (deferred)"
    per_host = (
        marked.where("selected").groupBy("host").count().collect()
    )
    assert all(r["count"] == 5 for r in per_host)


def test_selection_is_exact_topk(spark):
    f = _frontier(spark, n=40, hosts=2)
    marked = select_fetch_batch(f, None, base_budget=3)
    got = {
        r.url_norm
        for r in marked.where("selected").collect()
    }
    rows = f.collect()
    want = set()
    for h in {r.host for r in rows}:
        hs = sorted(
            (r for r in rows if r.host == h),
            key=lambda r: (r.priority + r.retry_count, r.depth, r.url_norm),
        )
        want |= {r.url_norm for r in hs[:3]}
    assert got == want


def test_global_budget_caps_total(spark):
    f = _frontier(spark, n=40, hosts=4)
    marked = select_fetch_batch(f, None, base_budget=5, global_budget=7)
    assert marked.where("selected").count() == 7
    assert marked.count() == 40


def test_fairness_jump(spark):
    f = _frontier(spark, n=20, hosts=1).withColumn(
        "wait_rounds", F.when(F.col("url_norm").endswith("/19"), 99).otherwise(0)
    )
    marked = select_fetch_batch(f, None, base_budget=1, fairness_rounds=5)
    sel = [r.url_norm for r in marked.where("selected").collect()]
    assert sel == ["https://h0.test/p/19"]


def test_host_state_backoff_and_recovery(spark):
    fetched = spark.createDataFrame(
        [("a.test", 429), ("a.test", 200), ("b.test", 200)],
        "host string, status_code int",
    )
    hs = update_host_state(fetched, None, base_budget=8, max_budget=8)
    out = {r.host: r for r in hs.collect()}
    assert out["a.test"].budget == 4 and out["a.test"].fail_count == 1
    assert out["b.test"].budget == 8 and out["b.test"].fail_count == 0


def test_duplicate_key_rows_do_not_multiply(spark):
    """A url can appear twice in the frontier (deferred seed + same-round
    rediscovery, the seed-quirk path): the winners flag-join must stay
    distinct-on-key — rows are retained and flagged, never multiplied."""
    base = _frontier(spark, n=10, hosts=1)
    dup = base.where(F.col("url_norm") == "https://h0.test/p/0")
    f = base.unionByName(dup)

    marked = select_fetch_batch(f, None, base_budget=3)
    assert marked.count() == 11, "row multiplication through winners join"
    # the dup key is a winner (priority 0): both its rows get selected,
    # any other winner occupies one slot each — bounded, no blow-up
    assert marked.where("selected").count() <= 4

    marked2 = select_fetch_batch(f, None, base_budget=3, global_budget=2)
    assert marked2.count() == 11
    assert marked2.where("selected").count() <= 3
