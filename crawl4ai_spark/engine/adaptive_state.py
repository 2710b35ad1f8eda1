"""Incrementally-maintained adaptive-crawl statistics.

The reference recomputes coverage/consistency/saturation over its whole
in-memory knowledge base on every ``digest`` iteration
(adaptive_crawler.py:287-389) — fine for hundreds of pages, O(corpus)
per check at crawl scale. Round 2 of this engine mirrored that shape
(full pages re-read + re-tokenize per check); this module replaces it
with per-round-delta maintenance of exactly the state tables the
metrics need, so a confidence check costs O(new pages this window) +
O(vocabulary merge), never O(corpus re-tokenization):

  a_terms(term, first_round, tf, df)   merged per check window
  a_rounds(round, new_terms, new_docs) appended per check window
  a_sample(doc_id, text)               running min-K doc sample
  a_kb(url_hash)                       keys already in the knowledge
                                       base (dedups seed re-crawls)
  a_qbest(query_id, split, best_sim)   EmbeddingStrategy: running best
                                       cosine per query variation
  a_conf(check_idx, confidence)        EmbeddingStrategy: per-check
                                       confidence history

Metric parity with the one-shot ``ops.adaptive.confidence_metrics`` is
exact (tests/test_adaptive_stop.py pins both against an independent
model):

* tf/df accumulate only over each doc's FIRST successful crawl (the
  knowledge base keys by URL; a_kb anti-join drops re-fetches, and the
  in-window dedup keeps the earliest (round, text) like the one-shot
  ``min(struct(round, text))``);
* a term's first_round is monotone under min, so incremental min ==
  global min;
* the new-terms histogram only ever has rows with new_terms >= 1 (like
  the one-shot first-seen GROUP BY), so saturation's first/last rows
  match; new_docs rides the same table but is filtered out of the
  saturation read;
* the consistency sample is min-K by doc_id, and min-K of a union is
  min-K of (previous min-K ∪ delta) — the running sample is exact.

All six tables are SnapshotTables in the crawl warehouse: they commit
with the round checkpoint and roll back with it on resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.ops.text import tokens


class AdaptiveState:
    def __init__(self, warehouse, sample_k: int = 40):
        self.t_terms = warehouse.table("a_terms")
        self.t_rounds = warehouse.table("a_rounds")
        self.t_sample = warehouse.table("a_sample")
        self.t_kb = warehouse.table("a_kb")
        # EmbeddingStrategy state (ops/adaptive_embedding.py): running
        # per-query best cosine vs the KB, and the per-check confidence
        # history the convergence fold reads
        self.t_qbest = warehouse.table("a_qbest")
        self.t_conf = warehouse.table("a_conf")
        self.sample_k = sample_k

    @property
    def tables(self) -> list[tuple[str, object]]:
        return [("a_terms", self.t_terms), ("a_rounds", self.t_rounds),
                ("a_sample", self.t_sample), ("a_kb", self.t_kb),
                ("a_qbest", self.t_qbest), ("a_conf", self.t_conf)]

    # ------------------------------------------------------------------
    def update(self, spark: SparkSession, delta_docs: DataFrame) -> None:
        """Fold a window of newly-crawled docs into the state.

        ``delta_docs``: (doc_id, url_hash, text, round) — the successful
        pages of the rounds since the last check, possibly with repeats
        (seed re-crawl quirk).
        """
        # in-window dedup: earliest (round, text) per doc wins, exactly
        # like the one-shot KB projection
        delta = (
            delta_docs.groupBy("doc_id")
            .agg(F.min(F.struct("round", "text")).alias("rt"),
                 F.first("url_hash").alias("url_hash"))
            .select("doc_id", "url_hash", F.col("rt.round").alias("round"),
                    F.col("rt.text").alias("text"))
        )
        # cross-window dedup: docs already in the KB contribute nothing.
        # The KB side is a single 8-byte column; AQE broadcasts whichever
        # side is small (early crawl: the KB; late crawl: the delta), so
        # this never re-reads page text. At warehouse scale the a_kb
        # table would be bucketed on url_hash for a storage-partitioned
        # join.
        kb = self.t_kb.read(spark)
        if kb is not None:
            delta = delta.join(kb, "url_hash", "left_anti")
        delta = delta.persist()
        try:
            toks = delta.select(
                "doc_id", "round", F.explode(tokens("text")).alias("term")
            )
            dstats = toks.groupBy("term").agg(
                F.count(F.lit(1)).alias("tf_d"),
                F.countDistinct("doc_id").alias("df_d"),
                F.min("round").alias("r0_d"),
            )
            old = self.t_terms.read(spark)
            if old is None:
                merged = dstats.select(
                    "term", F.col("r0_d").alias("first_round"),
                    F.col("tf_d").alias("tf"), F.col("df_d").alias("df"),
                )
                fresh = dstats.select("r0_d")
            else:
                j = old.join(dstats, "term", "full_outer")
                merged = j.select(
                    "term",
                    F.coalesce("first_round", "r0_d").alias("first_round"),
                    (F.coalesce("tf", F.lit(0)) + F.coalesce("tf_d", F.lit(0))).alias("tf"),
                    (F.coalesce("df", F.lit(0)) + F.coalesce("df_d", F.lit(0))).alias("df"),
                )
                fresh = j.where(F.col("first_round").isNull()).select("r0_d")
            hist = fresh.groupBy(F.col("r0_d").alias("round")).agg(
                F.count(F.lit(1)).alias("new_terms")
            )
            docs_per_round = delta.groupBy("round").agg(
                F.count(F.lit(1)).alias("new_docs")
            )
            rounds_delta = hist.join(docs_per_round, "round", "full_outer").select(
                "round",
                F.coalesce("new_terms", F.lit(0)).alias("new_terms"),
                F.coalesce("new_docs", F.lit(0)).alias("new_docs"),
            )

            # running min-K sample: min-K(old ∪ delta) == min-K overall
            prev = self.t_sample.read(spark)
            pool = delta.select("doc_id", "text")
            if prev is not None:
                pool = prev.select("doc_id", "text").unionByName(pool)
            sample = pool.orderBy("doc_id").limit(self.sample_k)

            # term merge must materialize before the overwrite replaces
            # the dirs it reads (same for the sample)
            self.t_terms.overwrite(merged)
            self.t_rounds.append(rounds_delta)
            self.t_sample.overwrite(sample)
            self.t_kb.append(delta.select("url_hash"))
        finally:
            delta.unpersist()

    # ------------------------------------------------------------------
    def metrics(self, spark: SparkSession, query_terms: list[str]) -> dict:
        """coverage/consistency/saturation/confidence from the state
        tables alone — no corpus access."""
        from crawl4ai_spark.ops.adaptive import (
            consistency_score,
            saturation_from_rounds,
        )

        rounds = self.t_rounds.read(spark)
        terms = self.t_terms.read(spark)
        if rounds is None or terms is None:
            return {"coverage": 0.0, "consistency": 0.0,
                    "saturation": 0.0, "confidence": 0.0}
        agg = rounds.agg(F.sum("new_docs").alias("n")).first()
        n_docs = int(agg["n"] or 0)
        if n_docs == 0:
            return {"coverage": 0.0, "consistency": 0.0,
                    "saturation": 0.0, "confidence": 0.0}

        # coverage from the (pushdown-pruned) query-term rows
        q = terms.where(F.col("term").isin(query_terms)).select(
            ((F.col("df") / F.lit(float(n_docs)))
             * (1.0 + 0.5 * F.log10(1.0 + F.col("tf") / F.lit(float(n_docs))))
             ).alias("s")
        )
        cov_row = q.agg(
            F.round(F.sqrt(F.sum("s") / F.lit(float(len(query_terms)))), 6)
        ).first()
        cov = float(cov_row[0] or 0.0)

        sample = self.t_sample.read(spark)
        cons_row = consistency_score(sample).first()
        cons = float(cons_row[0] or 0.0)

        hist = rounds.where(F.col("new_terms") > 0).select("round", "new_terms")
        sat_row = saturation_from_rounds(hist).first()
        sat = float(sat_row[0]) if sat_row and sat_row[0] is not None else 0.0

        conf = 0.4 * cov + 0.3 * cons + 0.3 * sat
        return {"coverage": cov, "consistency": cons,
                "saturation": sat, "confidence": conf}

    # -- EmbeddingStrategy state (ops/adaptive_embedding.py) ------------
    def update_embedding(
        self, spark: SparkSession, delta_docs: DataFrame,
        queries: DataFrame, dim: int = 64,
    ) -> None:
        """Fold a window of newly-crawled docs into the running
        per-query best-similarity table. best cosine is monotone under
        KB appends, so max(previous best, best over the delta) is exact
        — the check costs O(new pages this window), never O(corpus)
        (the reference recomputes its full query x KB distance matrix
        whenever the KB changes, adaptive_crawler.py:693-710).

        ``delta_docs``: (doc_id, url_hash, text, round), repeats
        possible — same contract as :meth:`update`.
        """
        from crawl4ai_spark.ops import adaptive_embedding as ae

        # in-window + cross-window dedup, exactly like update(): the
        # KB keys by url_hash, re-fetches contribute nothing
        delta = (
            delta_docs.groupBy("doc_id")
            .agg(F.min(F.struct("round", "text")).alias("rt"),
                 F.first("url_hash").alias("url_hash"))
            .select("doc_id", "url_hash", F.col("rt.text").alias("text"))
        )
        kb = self.t_kb.read(spark)
        if kb is not None:
            delta = delta.join(kb, "url_hash", "left_anti")
        delta = delta.persist()
        try:
            vecs = delta.select(
                ae.hash_embed(F.col("text"), dim=dim).alias("embedding")
            )
            delta_best = ae.best_similarity(vecs, queries)
            merged = ae.merge_best(self.t_qbest.read(spark), delta_best)
            # overwrite() writes the new dir before the commit, so the
            # read of the previous snapshot inside merge_best is safe
            self.t_qbest.overwrite(merged)
            self.t_kb.append(delta.select("url_hash"))
        finally:
            delta.unpersist()

    def embedding_metrics(self, spark: SparkSession) -> dict:
        """confidence / validation / gap summary from the running
        per-query best table alone (a handful of rows), appending this
        check's confidence to the history the convergence fold reads
        (should_stop_embedding). Returns {'confidence', 'val_score',
        'history', 'n_covered', 'n_queries'}."""
        import pyarrow as pa

        from crawl4ai_spark.ops.adaptive_embedding import COVERAGE_RADIUS

        bs = self.t_qbest.read(spark)
        if bs is None:
            return {"confidence": 0.0, "val_score": 0.0, "history": [0.0],
                    "n_covered": 0, "n_queries": 0}
        # n_train + n_val rows by construction; query_id order makes the
        # python mean's summation order deterministic
        rows = sorted(bs.collect(), key=lambda r: r.query_id)
        train = [r.best_sim for r in rows if r.split == "train"]
        val = [r.best_sim for r in rows if r.split == "val"]
        conf = round(sum(train) / len(train), 6) if train else 0.0
        val_score = round(sum(val) / len(val), 6) if val else 0.0
        n_cov = sum(1 for r in rows if 1.0 - r.best_sim <= COVERAGE_RADIUS)

        prev = self.t_conf.read(spark)
        hist = ([float(r.confidence) for r in
                 prev.orderBy("check_idx").collect()] if prev is not None
                else [])
        self.t_conf.append_rows(
            [(len(hist), conf)],
            pa.schema([("check_idx", pa.int64()),
                       ("confidence", pa.float64())]),
        )
        hist.append(conf)
        return {"confidence": conf, "val_score": val_score,
                "history": hist, "n_covered": n_cov, "n_queries": len(rows)}
