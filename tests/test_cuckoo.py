"""Cuckoo-filter seen-set (engine/cuckoo.py) — the deletion-capable
twin of the bloom shards (north rule: "bloom/cuckoo URL-seen").

Contract pinned here, mirroring tests/test_bloom_scale.py:
  - NO FALSE NEGATIVES, even past capacity: a failed eviction chain
    stashes a sentinel that keeps the displaced key's membership.
  - FP budget: 16-bit fingerprints put design FP around 2*4/2^16
    (~1.2e-4); the test allows 1e-3.
  - deletion removes membership without touching other keys.
  - blobs never ride through the driver (static check, as for bloom).
  - determinism: same deltas in the same order -> byte-identical blobs.
  - engine equivalence: a crawl with seen_filter="cuckoo" crawls
    exactly the set a bloom run and a filter-free run crawl.
"""

from __future__ import annotations

import inspect

import numpy as np
from pyspark.sql import functions as F

from crawl4ai_spark.engine import cuckoo as cuckoo_mod
from crawl4ai_spark.engine.cuckoo import (
    SLOTS,
    TARGET_LOAD,
    CuckooSeenSet,
    insert_keys,
    probe_keys,
    size_buckets,
)
from crawl4ai_spark.engine.tables import SnapshotTable


def _hashes(spark, start, n):
    return spark.range(start, start + n).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash")
    )


def test_size_buckets_gives_capacity():
    for n in (1_000, 100_000, 10_000_000):
        m = size_buckets(n, n_shards=32)
        assert 32 * m * SLOTS * TARGET_LOAD >= n
        assert m & (m - 1) == 0


def test_no_false_negatives_and_fp_budget(spark, tmp_path):
    n_keys, n_probe, n_shards = 20_000, 20_000, 8
    t = SnapshotTable(str(tmp_path / "ck"))
    c = CuckooSeenSet(t, n_shards=n_shards)
    keys = _hashes(spark, 0, n_keys)
    c.build(spark, keys, expected_n=n_keys, headroom=1.0)
    assert c.capacity() >= n_keys

    probed = c.probe(spark, keys)
    assert probed.where(~F.col("maybe_seen")).count() == 0

    fresh = _hashes(spark, n_keys, n_probe)
    fp = c.probe(spark, fresh).where(F.col("maybe_seen")).count()
    assert fp / n_probe < 1e-3, fp

    extra = _hashes(spark, 10**6, 500)
    c.add_hashes(spark, extra)
    assert c.probe(spark, extra).where(~F.col("maybe_seen")).count() == 0


def test_delete_removes_membership(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "ck"))
    c = CuckooSeenSet(t, n_shards=4)
    keys = _hashes(spark, 0, 5_000)
    c.build(spark, keys, expected_n=5_000)

    gone = keys.where(F.xxhash64(F.col("url_hash").cast("string")) % 10 == 0)
    kept = keys.subtract(gone)
    n_gone = gone.count()
    assert 0 < n_gone < 5_000
    c.delete_hashes(spark, gone)

    # deleted keys drop out (allowing the filter's own FP rate on the
    # re-probe); untouched keys never lose membership
    still = c.probe(spark, gone).where(F.col("maybe_seen")).count()
    assert still <= max(2, int(n_gone * 1e-2)), still
    assert c.probe(spark, kept).where(~F.col("maybe_seen")).count() == 0


def test_overflow_stash_prevents_false_negatives():
    """Force eviction-chain failure by overfilling one tiny table far
    past capacity; every inserted key must still probe true."""
    rng = np.random.RandomState(7)
    h = rng.randint(-2**63, 2**63 - 1, size=600, dtype=np.int64)
    m = 64  # capacity 64*4*0.95 = 243 << 600
    table = np.zeros((m, SLOTS), dtype=np.uint16)
    stash: list[int] = []
    overflow = insert_keys(table, stash, h, m)
    assert overflow > 0 and len(stash) == overflow
    hit = probe_keys(table, np.asarray(stash, dtype=np.int64), h, m)
    assert hit.all()


def test_deterministic_blobs(spark, tmp_path):
    def run(sub):
        t = SnapshotTable(str(tmp_path / sub))
        c = CuckooSeenSet(t, n_shards=4)
        c.build(spark, _hashes(spark, 0, 3_000), expected_n=3_000)
        c.add_hashes(spark, _hashes(spark, 50_000, 700))
        c.delete_hashes(spark, _hashes(spark, 100, 200))
        return sorted(
            (r.shard_id, bytes(r.table), bytes(r.stash))
            for r in c.table.read(spark).collect()
        )

    assert run("a") == run("b")


def test_no_driver_blob_hops():
    src = inspect.getsource(cuckoo_mod)
    for banned in ("toPandas", "collect()", "broadcast"):
        assert banned not in src, banned


def test_cuckoo_engine_run_matches_bloom_and_exact(spark, tmp_path):
    """A crawl with seen_filter='cuckoo' (engaged from round 0) crawls
    exactly the set of the bloom run and the filter-free run — the
    pre-filter is semantics-free in every backend."""
    from crawl4ai_spark.corpus.fakeshop import fakeshop_spark_df
    from crawl4ai_spark.engine.fetch import CorpusFetcher
    from crawl4ai_spark.engine.frontier import CrawlConfig, CrawlEngine
    from crawl4ai_spark.engine.tables import Warehouse

    corpus = fakeshop_spark_df(spark, n_sites=1, n_categories=3,
                               n_subcats=2, n_products=2)
    seed = ["http://shop0.fakeshop.test/index.html"]

    def crawl(subdir, **kw):
        eng = CrawlEngine(
            spark, Warehouse(str(tmp_path / subdir)), CorpusFetcher(corpus),
            CrawlConfig(max_depth=3, n_shards=4, bloom_sync_rounds=1, **kw),
        )
        eng.run(seed)
        return eng, sorted(
            (r.url_norm, r.depth)
            for r in eng.t_pages.read(spark).select("url_norm", "depth").collect()
        )

    eng_ck, got_ck = crawl("ck", use_bloom=True, seen_filter="cuckoo",
                           bloom_min_seen=5)
    assert eng_ck._bloom_built
    assert isinstance(eng_ck.bloom, CuckooSeenSet)
    assert eng_ck.t_bloom.read(spark).count() > 0
    _, got_bl = crawl("bl", use_bloom=True, bloom_min_seen=5)
    _, got_off = crawl("off", use_bloom=False)
    assert got_ck == got_bl == got_off


def test_add_hashes_bootstraps_empty_table(spark, tmp_path):
    """add_hashes with no prior shards falls back to build(expected_n=1);
    size_buckets must not crash on tiny expected counts (the 1<<ceil(
    log2(x<1)) negative-shift hazard) and membership must hold."""
    assert size_buckets(1, 32) >= 1 << 10
    assert size_buckets(4, 32) >= 1 << 10
    t = SnapshotTable(str(tmp_path / "ck"))
    c = CuckooSeenSet(t, n_shards=4)
    keys = _hashes(spark, 0, 50)
    c.add_hashes(spark, keys)  # empty-table bootstrap path
    assert c.probe(spark, keys).where(~F.col("maybe_seen")).count() == 0


def test_m_bits_setter_rounds_to_power_of_two():
    t = object()
    c = CuckooSeenSet(t, n_shards=4)
    c.m_bits = 3000 * SLOTS * 16  # a non-pow2 checkpoint value
    assert c.m_buckets == 4096    # rounded UP, involution-safe
    c.m_bits = 1024 * SLOTS * 16
    assert c.m_buckets == 1024    # pow2 passes through unchanged


def test_resume_across_filter_backend_switch(spark, tmp_path):
    """Resuming a bloom-built warehouse with seen_filter='cuckoo' must
    NOT trust the checkpoint's bloom_built flag against the (empty)
    cuckoo table — that would mark every synced URL definitely-new and
    mass re-crawl. The guard falls back to exact-only dedup, so the
    final crawled multiset equals a straight-through run's."""
    import dataclasses

    from crawl4ai_spark.corpus.fakeshop import fakeshop_spark_df
    from crawl4ai_spark.engine.fetch import CorpusFetcher
    from crawl4ai_spark.engine.frontier import CrawlConfig, CrawlEngine
    from crawl4ai_spark.engine.tables import Warehouse

    corpus = fakeshop_spark_df(spark, n_sites=1, n_categories=3,
                               n_subcats=2, n_products=2)
    seed = ["http://shop0.fakeshop.test/index.html"]
    bloom_cfg = CrawlConfig(max_depth=3, n_shards=4, bloom_sync_rounds=1,
                            bloom_min_seen=5, use_bloom=True)

    def pages_of(eng):
        return sorted((r.url_norm, r.depth) for r in
                      eng.t_pages.read(spark)
                      .select("url_norm", "depth").collect())

    straight = CrawlEngine(spark, Warehouse(str(tmp_path / "s")),
                           CorpusFetcher(corpus), bloom_cfg)
    straight.run(seed)
    want = pages_of(straight)

    part = CrawlEngine(spark, Warehouse(str(tmp_path / "x")),
                       CorpusFetcher(corpus),
                       dataclasses.replace(bloom_cfg, max_rounds=2))
    part.run(seed)
    assert part._bloom_built  # the checkpoint really says bloom_built

    switched = CrawlEngine(
        spark, Warehouse(str(tmp_path / "x")), CorpusFetcher(corpus),
        dataclasses.replace(bloom_cfg, seen_filter="cuckoo"))
    switched.run(seed)
    assert pages_of(switched) == want  # no duplicates, nothing lost
