"""The batch-iterative crawl loop — the engine core.

One round == one set of pure DataFrame jobs (the Spark re-expression of
BFSDeepCrawlStrategy._arun_batch, /root/reference/crawl4ai/deep_crawling/
bfs_strategy.py:142-192, and BestFirstCrawlingStrategy._arun_best_first,
bff_strategy.py:129-213):

    mark      politeness/fairness windows select this round's fetch set
    gate      robots broadcast-join filter (denied -> 403 page rows)
    fetch     corpus join or HTTP mapInPandas
    extract   html -> spans/links/media/metadata (one Arrow pass)
    persist   append round rows to `pages` (materializes the round once)
    discover  explode links -> canonicalize -> filter chain -> score ->
              threshold -> capacity cap -> bloom pre-filter + exact
              anti-join vs seen -> first-wins parent
    advance   frontier_{r+1} = deferred + rate-limit retries + new
              candidates; seen += new candidates (enqueue-time add,
              bfs_strategy.py:107,121); host_state backoff recurrence
    commit    atomic round-manifest entry recording every table's
              snapshot -> kill anywhere, resume exactly

Determinism contract (SURVEY §2.2): per-depth crawled sets equal the
reference's; ties broken by (priority, depth, url_norm); first-discovery
parent refined to min(parent_url) among same-round discoverers.

Scale posture: frontier and seen are hash-distributed on xxhash64(url);
politeness windows are salted two-stage to survive hub-host skew; the
seen-set anti-join is bloom-pre-filtered so only (dups + FP) rows
shuffle; robots/host budgets broadcast; AQE handles residual skew.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawl4ai_spark.engine.bloom import BloomSeenSet
from crawl4ai_spark.engine.politeness import (
    RATE_LIMIT_CODES,
    select_fetch_batch,
    update_host_state,
)
from crawl4ai_spark.engine.robots import apply_robots_gate
from crawl4ai_spark.engine.tables import Warehouse
from crawl4ai_spark.extraction.extract import extract_pages
from crawl4ai_spark.functions.urlnorm import url_host, url_hash


@dataclass
class CrawlConfig:
    max_depth: int = 3
    max_pages: Optional[int] = None          # successful fetches cap (bfs_strategy.py:87-91)
    mode: str = "bfs"                        # "bfs" | "best_first"
    batch_size: int = 10                     # best-first per-round cap (bff_strategy.py:19)
    include_external: bool = False
    score_threshold: float = float("-inf")
    # politeness
    base_host_budget: Optional[int] = None   # None -> unlimited per host
    max_host_budget: Optional[int] = None
    max_retries: int = 3                     # async_dispatcher.py:33
    fairness_rounds: int = 5
    n_salts: int = 8
    # seen set
    use_bloom: bool = True
    n_shards: int = 32
    bloom_m_bits: int = 1 << 20
    bloom_k: int = 7
    # bloom engages only once the exact seen set crosses this size (it
    # is a PRE-filter for a big anti-join; below this the anti-join is
    # already cheap and shard maintenance would be pure overhead). On
    # crossing, shards are bulk-built from the seen table once. Tests
    # set 0 to exercise the bloom path from round 0.
    bloom_min_seen: int = 50_000
    # loop control
    max_rounds: int = 1000
    # scoring/filtering: url Column -> Column
    scorer: Optional[Callable] = None
    url_filter: Optional[Callable] = None
    shuffle_partitions: Optional[int] = None


FRONTIER_FIELDS = [
    ("url_norm", "string"),
    ("url_hash", "bigint"),
    ("host", "string"),
    ("path", "string"),
    ("depth", "int"),
    ("parent_url", "string"),
    ("score", "double"),
    ("priority", "double"),
    ("retry_count", "int"),
    ("wait_rounds", "int"),
    ("salt", "int"),
]


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        warehouse: Warehouse,
        fetcher,
        config: CrawlConfig | None = None,
        robots: DataFrame | None = None,
    ):
        self.spark = spark
        self.wh = warehouse
        self.fetcher = fetcher
        self.cfg = config or CrawlConfig()
        self.robots = robots
        self.t_frontier = warehouse.table("frontier")
        self.t_seen = warehouse.table("seen")
        self.t_pages = warehouse.table("pages")
        self.t_host = warehouse.table("host_state")
        self.t_metrics = warehouse.table("metrics")
        self.t_bloom = warehouse.table("seen_bloom")
        self.bloom = BloomSeenSet(
            self.t_bloom, self.cfg.n_shards, self.cfg.bloom_m_bits, self.cfg.bloom_k
        )
        self._seen_count = 0
        self._bloom_built = False

    # ------------------------------------------------------------------
    def _frontier_row(self, df: DataFrame) -> DataFrame:
        """Project a candidate df (url_norm, depth, parent_url, score)
        into the full frontier schema."""
        return (
            df.withColumn("url_hash", url_hash(F.col("url_norm")))
            .withColumn("host", url_host(F.col("url_norm")))
            .withColumn(
                "path", F.coalesce(F.parse_url(F.col("url_norm"), F.lit("PATH")), F.lit("/"))
            )
            .withColumn(
                "priority", F.col("depth").cast("double") + F.col("score")
            )
            .withColumn("retry_count", F.coalesce(F.col("retry_count"), F.lit(0)))
            .withColumn("wait_rounds", F.coalesce(F.col("wait_rounds"), F.lit(0)))
            .withColumn(
                "salt",
                F.pmod(F.xxhash64(F.col("url_norm"), F.lit(7)), F.lit(self.cfg.n_salts)).cast("int"),
            )
            .select(*[f for f, _ in FRONTIER_FIELDS])
        )

    def init_from_seeds(self, seeds: list[str]) -> None:
        """Small seed lists (the reference's entry shape)."""
        self.init_from_seed_df(
            self.spark.createDataFrame([(u,) for u in seeds], "url string")
        )

    def init_from_seed_df(self, seed_df: DataFrame, url_col: str = "url") -> None:
        """Seed-table path: canonicalization runs distributed via the
        vectorized UDF — a 10^10-URL seed list never exists driver-side
        (the reference's seeder feeds arun_many the same way,
        async_url_seeder.py -> async_webcrawler.py:653)."""
        from crawl4ai_spark.functions.urlnorm import normalize_urls_udf

        self._seen_count = 0
        self._bloom_built = False
        # spread seeds before the normalize UDF: seed tables often arrive
        # in few partitions (one sitemap file, one export), which would
        # serialize canonicalization into one task
        seed_df = seed_df.repartition(
            self.spark.sparkContext.defaultParallelism, F.col(url_col)
        )
        df = (
            seed_df.select(
                normalize_urls_udf(F.col(url_col), F.col(url_col)).alias("url_norm")
            )
            .where(F.col("url_norm").isNotNull())
            # seed tables routinely contain raw-URL duplicates that
            # canonicalize to one url_norm; without this the duplicate
            # frontier rows are all selected by the winners join and
            # per-host budgets overshoot in round 0
            .dropDuplicates(["url_norm"])
            .withColumn("depth", F.lit(0))
            .withColumn("parent_url", F.lit(None).cast("string"))
            .withColumn("score", F.lit(0.0))
            .withColumn("retry_count", F.lit(0))
            .withColumn("wait_rounds", F.lit(0))
        )
        frontier = self._frontier_row(df)
        self.t_frontier.overwrite(frontier)
        # reference quirk kept: `visited` starts EMPTY — seeds enter the
        # seen set only when (re)discovered by link_discovery
        # (bfs_strategy.py:152-156), so a seed linked from a deeper page
        # is re-crawled once, exactly like the reference.
        seen = frontier.select(
            "url_hash", "url_norm", "depth", "parent_url"
        ).withColumn("round", F.lit(-1)).limit(0)
        self.t_seen.overwrite(seen)

    # ------------------------------------------------------------------
    def resume_or_init(self, seeds: list[str] | None,
                       seed_df: DataFrame | None = None) -> tuple[int, int]:
        """Returns (next_round, pages_crawled_so_far); rolls tables back
        to the last committed round checkpoint if a crash left them
        ahead."""
        rounds = self.wh.read_rounds()
        committed = [r for r in rounds if r.get("committed")]
        if not committed:
            if seed_df is not None:
                self.init_from_seed_df(seed_df)
            else:
                self.init_from_seeds(seeds or [])
            return 0, 0
        last = max(committed, key=lambda r: r["round"])
        self._seen_count = last.get("seen_count", 0)
        self._bloom_built = last.get("bloom_built", False)
        for name, tbl in [
            ("frontier", self.t_frontier), ("seen", self.t_seen),
            ("pages", self.t_pages), ("host_state", self.t_host),
            ("metrics", self.t_metrics), ("seen_bloom", self.t_bloom),
        ]:
            want = last["tables"].get(name)
            if want is not None and tbl.snapshot_data() != want:
                tbl.rollback_to(want)
        return last["round"] + 1, last["pages_crawled"]

    # ------------------------------------------------------------------
    def run(self, seeds: list[str] | None = None,
            seed_df: DataFrame | None = None) -> dict:
        cfg = self.cfg
        start_round, crawled = self.resume_or_init(seeds, seed_df)
        stats = {"rounds": 0, "pages_crawled": crawled}
        for rnd in range(start_round, cfg.max_rounds):
            if cfg.max_pages is not None and crawled >= cfg.max_pages:
                break
            frontier = self.t_frontier.read(self.spark)
            if frontier is None or frontier.isEmpty():
                break
            crawled = self._run_round(rnd, frontier, crawled)
            stats["rounds"] += 1
            stats["pages_crawled"] = crawled
        return stats

    # ------------------------------------------------------------------
    def _run_round(self, rnd: int, frontier: DataFrame, crawled_before: int) -> int:
        cfg = self.cfg
        t0 = time.monotonic()

        # -- mark: politeness + fairness + retry-drop ----------------------
        live = frontier.where(F.col("retry_count") <= cfg.max_retries)
        host_state = self.t_host.read(self.spark)
        # best-first: batch = min(BATCH_SIZE, remaining) (bff_strategy.py:150-156);
        # BFS fetches whole levels — max_pages caps *discovery*, not the level
        # (bfs_strategy.py:160-174)
        global_budget = None
        if cfg.mode == "best_first":
            global_budget = cfg.batch_size
            if cfg.max_pages is not None:
                global_budget = min(global_budget, max(0, cfg.max_pages - crawled_before))
        marked = select_fetch_batch(
            live,
            host_state,
            base_budget=cfg.base_host_budget,
            global_budget=global_budget,
            fairness_rounds=cfg.fairness_rounds,
        )
        # drop hosts that exhausted retries entirely (RateLimiter gives up,
        # async_dispatcher.py:70-72)
        marked = marked.where(F.coalesce(F.col("fail_count"), F.lit(0)) <= cfg.max_retries)
        # scratch state: cache (recompute-on-loss is fine, it's derived
        # from the committed frontier) — a parquet round-trip here costs
        # two extra jobs per round
        marked = marked.persist()

        batch = marked.where("selected")
        deferred = marked.where(~F.col("selected")).withColumn(
            "wait_rounds", F.col("wait_rounds") + 1
        )

        # -- gate + fetch + extract ---------------------------------------
        carry = ["url_norm", "host", "depth", "parent_url", "score",
                 "priority", "retry_count", "status_code", "fetch_ms", "success"]
        if self.robots is None:
            to_fetch, denied = batch, None
        else:
            gated = apply_robots_gate(batch, self.robots)
            to_fetch = gated.where("robots_allowed")
            denied = gated.where(~F.col("robots_allowed"))

        fetched = self.fetcher.fetch(
            to_fetch.select("url_norm", "host", "depth", "parent_url",
                            "score", "priority", "retry_count")
        ).withColumn("url", F.col("url_norm"))

        pages = extract_pages(fetched, keep_cols=carry).drop("url")

        round_pages = pages
        if denied is not None:
            denied_pages = (
                denied.select("url_norm", "host", "depth", "parent_url", "score",
                              "priority", "retry_count")
                .withColumn("status_code", F.lit(403))
                .withColumn("fetch_ms", F.lit(0))
                .withColumn("success", F.lit(False))
                .withColumn("spans", F.lit(None).cast(pages.schema["spans"].dataType))
                .withColumn("markdown", F.lit(None).cast("string"))
                .withColumn("links", F.lit(None).cast(pages.schema["links"].dataType))
                .withColumn("media", F.lit(None).cast(pages.schema["media"].dataType))
                .withColumn("tables", F.lit(None).cast(pages.schema["tables"].dataType))
                .withColumn("metadata", F.lit(None).cast(pages.schema["metadata"].dataType))
            )
            round_pages = pages.unionByName(denied_pages.select(*pages.columns))
        round_pages = round_pages.withColumn("round", F.lit(rnd))

        # materialize the round once; everything downstream re-reads parquet
        self.t_pages.append(round_pages)
        round_df = self.t_pages.read(self.spark).where(F.col("round") == rnd)

        # one aggregation yields both the per-partition metrics rows and
        # the round's success count (no separate count job)
        metric_rows = (
            round_df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(
                F.count(F.lit(1)).alias("urls_processed"),
                F.sum(F.when(~F.col("success"), 1).otherwise(0)).alias("urls_failed"),
                F.expr("percentile_approx(fetch_ms, 0.5)").alias("fetch_ms_p50"),
            )
            .collect()
        )
        n_success = sum(r.urls_processed - r.urls_failed for r in metric_rows)
        crawled = crawled_before + n_success

        # -- discover ------------------------------------------------------
        new_frontier = self._discover(round_df, crawled, rnd)

        # -- retries: rate-limited rows stay in the frontier ----------------
        retries = (
            round_df.where(F.col("status_code").isin(*RATE_LIMIT_CODES))
            .where(F.col("retry_count") < cfg.max_retries)
            .select(
                "url_norm", "depth", "parent_url", "score",
                (F.col("retry_count") + 1).alias("retry_count"),
                F.lit(0).alias("wait_rounds"),
            )
        )

        next_frontier = self._frontier_row(retries)
        next_frontier = next_frontier.unionByName(
            deferred.select(*[f for f, _ in FRONTIER_FIELDS])
        )
        if new_frontier is not None:
            next_frontier = next_frontier.unionByName(new_frontier)
        self.t_frontier.overwrite(next_frontier)
        marked.unpersist()
        if new_frontier is not None:
            new_frontier.unpersist()

        # -- host_state + metrics ------------------------------------------
        if cfg.base_host_budget is not None:
            hs = update_host_state(
                round_df.select("host", "status_code"),
                self.t_host.read(self.spark),
                base_budget=cfg.base_host_budget,
                max_budget=cfg.max_host_budget,
            )
            self.t_host.overwrite(hs)

        wall = time.monotonic() - t0
        metrics = self.spark.createDataFrame(
            [
                (int(r.partition_id), int(r.urls_processed), int(r.urls_failed),
                 int(r.fetch_ms_p50 or 0), rnd, wall)
                for r in metric_rows
            ],
            "partition_id int, urls_processed long, urls_failed long, "
            "fetch_ms_p50 long, round int, wall_s double",
        )
        self.t_metrics.append(metrics)

        # -- commit ----------------------------------------------------------
        self.wh.commit_round(
            {
                "round": rnd,
                "pages_crawled": crawled,
                "n_success": n_success,
                "seen_count": self._seen_count,
                "bloom_built": self._bloom_built,
                "wall_s": time.monotonic() - t0,
                "tables": {
                    "frontier": self.t_frontier.snapshot_data(),
                    "seen": self.t_seen.snapshot_data(),
                    "pages": self.t_pages.snapshot_data(),
                    "host_state": self.t_host.snapshot_data(),
                    "metrics": self.t_metrics.snapshot_data(),
                    "seen_bloom": self.t_bloom.snapshot_data(),
                },
            }
        )
        return crawled

    # ------------------------------------------------------------------
    def _discover(self, round_df: DataFrame, crawled: int, rnd: int = 0) -> DataFrame | None:
        """link_discovery (bfs_strategy.py:68-140) as DataFrame ops."""
        cfg = self.cfg
        if cfg.max_pages is not None and crawled >= cfg.max_pages:
            return None
        if cfg.max_depth <= 0:
            # every frontier row is at depth >= 0, so discovery can never
            # admit a candidate — skip the pages re-scan entirely
            return None

        links = (
            round_df.where("success")
            .where(F.col("depth") + 1 <= cfg.max_depth)
            .select(
                F.col("url_norm").alias("parent_url"),
                (F.col("depth") + 1).alias("depth"),
                F.explode("links").alias("l"),
            )
        )
        if not cfg.include_external:
            links = links.where(F.col("l.internal"))
        cands = links.select(
            F.col("l.url_norm").alias("url_norm"), "depth", "parent_url"
        ).where(F.col("url_norm").isNotNull())

        # URL validity (bfs_strategy.py:46-61): scheme + dotted host, native
        cands = cands.where(
            F.col("url_norm").rlike(r"^https?://[^/]*\.")
        )
        if cfg.url_filter is not None:
            cands = cands.where(cfg.url_filter(F.col("url_norm")))

        # intra-batch first-wins parent: deterministic refinement
        # min(depth, parent_url) as a PAIR (SURVEY §7.4) — independent
        # mins could pair min-depth with a parent from a deeper
        # discoverer in mixed-depth (best-first) rounds
        cands = (
            cands.groupBy("url_norm")
            .agg(F.min(F.struct("depth", "parent_url")).alias("dp"))
            .select("url_norm", F.col("dp.depth").alias("depth"),
                    F.col("dp.parent_url").alias("parent_url"))
        )

        # score + threshold (bfs_strategy.py:112-119)
        score = cfg.scorer(F.col("url_norm")) if cfg.scorer else F.lit(0.0)
        cands = cands.withColumn("score", score.cast("double"))
        if cfg.score_threshold != float("-inf"):
            cands = cands.where(F.col("score") >= cfg.score_threshold)

        # seen dedup: bloom pre-filter shrinks the exact anti-join.
        # The bloom engages adaptively: below bloom_min_seen the exact
        # anti-join is cheap and shard maintenance would be pure
        # overhead; on crossing the threshold the shards are bulk-built
        # from the seen table ONCE, then maintained incrementally.
        cands = cands.withColumn("url_hash", url_hash(F.col("url_norm")))
        seen = self.t_seen.read(self.spark)
        if cfg.use_bloom and not self._bloom_built \
                and self._seen_count >= cfg.bloom_min_seen:
            if seen is not None:
                self.bloom.add_hashes(self.spark, seen.select("url_hash"))
            self._bloom_built = True
        if cfg.use_bloom and self._bloom_built:
            probed = self.bloom.probe(self.spark, cands)
            fresh = probed.where(~F.col("maybe_seen")).drop("maybe_seen")
            maybe = probed.where(F.col("maybe_seen")).drop("maybe_seen")
            if seen is not None:
                maybe = maybe.join(seen.select("url_hash"), "url_hash", "left_anti")
            cands = fresh.unionByName(maybe)
        elif seen is not None:
            cands = cands.join(seen.select("url_hash"), "url_hash", "left_anti")

        # capacity cap by score desc (bfs_strategy.py:124-131)
        if cfg.max_pages is not None:
            remaining = cfg.max_pages - crawled
            cands = cands.orderBy(
                F.col("score").desc(), F.col("depth").asc(), F.col("url_norm").asc()
            ).limit(max(0, remaining))

        cands = cands.withColumn("retry_count", F.lit(0)).withColumn(
            "wait_rounds", F.lit(0)
        )
        # cache once, then seen/bloom/frontier all reuse the same rows
        # instead of recomputing probe+anti-join (scratch — derived state)
        new_frontier = self._frontier_row(cands).persist()

        # enqueue-time seen add (bfs_strategy.py:107,121)
        add = new_frontier.select(
            "url_hash", "url_norm", "depth", "parent_url"
        ).withColumn("round", F.lit(rnd))
        self.t_seen.append(add)
        self._seen_count += new_frontier.count()  # cached df — cheap
        if cfg.use_bloom and self._bloom_built:
            self.bloom.add_hashes(self.spark, new_frontier.select("url_hash"))
        return new_frontier
