"""Storage-partitioned incremental dedup: the bucketed index layout
write_minhash_index prescribes must (a) return exactly the same
statuses as the in-memory index and (b) join exchange-free on the
history side — only the delta shuffles. This is the executable proof
behind the 100 TB claim in ops/dedup.py (history is never reshuffled).
"""

from __future__ import annotations

import uuid
from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.ops.dedup import (
    incremental_dedup,
    minhash_index,
    read_minhash_index,
    write_minhash_index,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def _sentence(seed: int, n: int = 60) -> str:
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet"]
    # (seed,position)-tagged tokens: any two distinct seeds < 1009 share
    # ZERO tokens (31 is invertible mod the prime), so cross-seed docs
    # are fully dissimilar, while a one-token edit of one doc leaves
    # Jaccard ~0.9 (a real near-dup)
    return " ".join(
        f"{words[(seed * 7 + k * 3) % 10]}{(seed * 31 + k) % 1009}"
        for k in range(n)
    )


@pytest.fixture(scope="module")
def corpus(spark):
    hist = _docs(spark, [(f"h{i:03d}", _sentence(i)) for i in range(40)])
    new = _docs(spark, (
        # exact dup of history, near dup of history (one word changed),
        # within-batch exact pair, fresh docs
        [("n000", _sentence(3))]
        + [("n001", _sentence(5).replace("alpha", "zulu", 1))]
        + [("n002", " ".join(f"fresh{k} pair{k * 3}" for k in range(40))),
           ("n003", " ".join(f"fresh{k} pair{k * 3}" for k in range(40)))]
        + [(f"n{i:03d}", _sentence(1000 + i)) for i in range(4, 20)]
    ))
    return hist, new


@contextmanager
def _no_broadcast(spark):
    keys = ["spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold"]
    old = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    try:
        yield
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)


def _result(df):
    return sorted((r["doc_id"], r["status"], r["max_sim"])
                  for r in df.collect())


def test_bucketed_index_same_answer_and_no_history_exchange(spark, corpus, tmp_path):
    hist, new = corpus
    name = f"t_c4as_idx_{uuid.uuid4().hex[:8]}"
    idx = minhash_index(hist)
    write_minhash_index(idx, name, n_buckets=8)
    # plain-parquet twin of the same index (unbucketed layout)
    plain_path = str(tmp_path / "plain_idx")
    idx.write.mode("overwrite").parquet(plain_path)
    try:
        bands, hashes = read_minhash_index(spark, name)
        plain = spark.read.parquet(plain_path)

        with _no_broadcast(spark):
            got_b = incremental_dedup(new, bands, hash_index=hashes,
                                      threshold=0.35)
            got_p = incremental_dedup(new, plain, threshold=0.35)
            assert _result(got_b) == _result(got_p)

            res = _result(got_b)
            statuses = dict((d, s) for d, s, _ in res)
            assert statuses["n000"] == "exact_dup"
            assert statuses["n001"] == "near_dup"
            assert statuses["n002"] == "kept" and statuses["n003"] == "exact_dup"
            assert statuses["n010"] == "kept"

            # end-to-end: the bucketed layout strictly reduces shuffles
            pb = got_b._jdf.queryExecution().executedPlan().toString()
            pp = got_p._jdf.queryExecution().executedPlan().toString()
            assert pb.count("Exchange") < pp.count("Exchange")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}_bands")
        spark.sql(f"DROP TABLE IF EXISTS {name}_hashes")


def _n_shuffles(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count(
        "Exchange hashpartitioning"
    )


def test_history_side_joins_are_exchange_free(spark, corpus, tmp_path):
    """The two history probes of incremental_dedup, in isolation: with
    the bucketed layout each join plan carries exactly ONE shuffle (the
    delta); the plain-parquet twin carries two. History is never
    reshuffled — the storage-partitioned-join property the 100 TB
    incremental path rests on."""
    hist, new = corpus
    name = f"t_c4as_idx_{uuid.uuid4().hex[:8]}"
    idx = minhash_index(hist)
    write_minhash_index(idx, name, n_buckets=8)
    plain_path = str(tmp_path / "plain_idx2")
    idx.write.mode("overwrite").parquet(plain_path)
    try:
        bands, hashes = read_minhash_index(spark, name)
        plain = spark.read.parquet(plain_path)
        delta_hashes = spark.range(100).select(
            F.xxhash64("id").alias("content_hash"), F.col("id").alias("nid"))
        delta_bands = spark.range(100).select(
            (F.col("id") % 4).cast("int").alias("band"),
            F.md5(F.col("id").cast("string")).alias("key"),
            F.col("id").alias("nid"))
        with _no_broadcast(spark):
            # exact-membership probe on content_hash
            jb = delta_hashes.join(hashes, "content_hash")
            jp = delta_hashes.join(plain.where(F.col("band") == 0)
                                   .select("content_hash"), "content_hash")
            pjb = jb._jdf.queryExecution().executedPlan().toString()
            assert _n_shuffles(jb) == 1, pjb
            assert "Bucketed: true" in pjb  # scan exploits the layout
            assert _n_shuffles(jp) == 2
            # near-dup candidate probe on (band, key)
            kb = delta_bands.join(bands, ["band", "key"])
            kp = delta_bands.join(plain, ["band", "key"])
            pkb = kb._jdf.queryExecution().executedPlan().toString()
            assert _n_shuffles(kb) == 1, pkb
            assert "Bucketed: true" in pkb
            assert _n_shuffles(kp) == 2
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}_bands")
        spark.sql(f"DROP TABLE IF EXISTS {name}_hashes")


