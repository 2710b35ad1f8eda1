"""Partitioned Bloom-filter URL-seen shards (the 10^10-URL scale path).

Reimagines the reference's single-process BloomFilter (mmh3 + bitarray,
optimal m/k, /root/reference/crawl4ai/deep_crawling/crazy.py:102-165)
as N_SHARDS independent bit arrays keyed by ``pmod(xxhash64(url_norm),
n_shards)`` and persisted as BINARY blobs in a snapshot table.

Key differences from the reference, by design:
  - The 64-bit identity hash is computed JVM-side (built-in xxhash64,
    whole-stage codegen); Python only sees int64 arrays.
  - k bit positions are derived via Kirsch-Mitzenmacher double hashing
    (h1 + i*h2 mod m) — numpy-vectorized over whole Arrow batches, no
    per-row Python.
  - Bloom answers are only a PRE-filter: "definitely new" candidates
    skip the exact-seen anti-join entirely; "maybe seen" candidates
    (true dups + FP fraction) fall through to an exact anti-join
    against the seen table. False positives therefore cost a join row,
    never a dropped URL — the reference's exact-set semantics are
    preserved (bfs_strategy.py:153 `visited: Set[str]`).

At 10^10 seen URLs with mostly-new candidates per round, the exact
anti-join input shrinks by ~(1 - dup_rate - fpp), which is the whole
point: the big shuffle happens on a tiny fraction of the frontier.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SHARD_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.IntegerType()),
        T.StructField("bloom", T.BinaryType()),
        T.StructField("n_items", T.LongType()),
    ]
)


def _split_hash(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    u = h.astype(np.uint64)
    h1 = (u & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    h2 = ((u >> np.uint64(32)) | np.uint64(1)).astype(np.uint64)  # odd -> full cycle
    return h1, h2


def set_bits(bits: np.ndarray, hashes: np.ndarray, m_bits: int, k: int) -> None:
    h1, h2 = _split_hash(hashes)
    m = np.uint64(m_bits)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % m
        np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                         np.left_shift(np.uint8(1), (idx & np.uint64(7)).astype(np.uint8)))


def probe_bits(bits: np.ndarray, hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    h1, h2 = _split_hash(hashes)
    m = np.uint64(m_bits)
    maybe = np.ones(len(hashes), dtype=bool)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % m
        byte = bits[(idx >> np.uint64(3)).astype(np.int64)]
        bit = np.left_shift(np.uint8(1), (idx & np.uint64(7)).astype(np.uint8))
        maybe &= (byte & bit) != 0
    return maybe


class BloomSeenSet:
    """Sharded bloom state over a SnapshotTable of (shard_id, bloom, n_items)."""

    def __init__(self, table, n_shards: int = 32, m_bits: int = 1 << 23, k: int = 7):
        self.table = table  # SnapshotTable
        self.n_shards = n_shards
        self.m_bits = m_bits
        self.k = k
        self._cached: tuple[int, dict] | None = None  # (table version, shard map)

    def _shard_map(self, spark: SparkSession) -> dict:
        """Blob map keyed by shard id, cached per table version so each
        round pays at most one driver collect."""
        v = self.table.version
        if self._cached is not None and self._cached[0] == v:
            return self._cached[1]
        prev = self.table.read(spark)
        m = {} if prev is None else {
            int(r.shard_id): (bytes(r.bloom), int(r.n_items))
            for r in prev.toPandas().itertuples()
        }
        self._cached = (v, m)
        return m

    def shard_col(self, hash_col):
        return F.pmod(hash_col, F.lit(self.n_shards)).cast("int")

    # -- update: OR the new hashes into the shard blobs --------------------
    def add_hashes(self, spark: SparkSession, hashes_df: DataFrame) -> None:
        """hashes_df: single column `url_hash` (int64). One shuffle by
        shard_id; each shard's bits are rebuilt by OR-ing new bits into
        the previous blob (applyInPandas per shard group)."""
        m_bits, k, n_shards = self.m_bits, self.k, self.n_shards
        prev = self.table.read(spark)
        new = hashes_df.select(
            self.shard_col(F.col("url_hash")).alias("shard_id"),
            F.col("url_hash"),
        )

        prev_map = self._shard_map(spark)
        bc_prev = spark.sparkContext.broadcast(prev_map)

        def merge_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            sid = int(pdf["shard_id"].iloc[0])
            old = bc_prev.value.get(sid)
            if old is not None:
                bits = np.frombuffer(old[0], dtype=np.uint8).copy()
                n = old[1]
            else:
                bits = np.zeros(m_bits // 8, dtype=np.uint8)
                n = 0
            h = pdf["url_hash"].to_numpy(dtype=np.int64)
            set_bits(bits, h, m_bits, k)
            return pd.DataFrame(
                {"shard_id": [sid], "bloom": [bits.tobytes()], "n_items": [n + len(h)]}
            )

        updated = new.groupBy("shard_id").applyInPandas(merge_shard, SHARD_SCHEMA)
        # carry forward untouched shards
        if prev is not None:
            untouched = prev.join(
                new.select("shard_id").distinct(), "shard_id", "left_anti"
            )
            updated = updated.unionByName(untouched)
        self.table.overwrite(updated)
        self._cached = None  # next probe reloads the new version

    # -- probe: split candidates into definitely-new vs maybe-seen ---------
    def probe(self, spark: SparkSession, cands: DataFrame, hash_col: str = "url_hash") -> DataFrame:
        """Adds a boolean `maybe_seen` column. Shards are broadcast to
        executors (total size n_shards * m_bits/8 — a few hundred MB at
        10^10 scale, well within executor memory); probing is a
        grouped-by-shard Arrow pass."""
        shard_map = {
            sid: blob for sid, (blob, _n) in self._shard_map(spark).items()
        }
        if not shard_map:
            return cands.withColumn("maybe_seen", F.lit(False))
        bc = spark.sparkContext.broadcast(shard_map)
        m_bits, k, n_shards = self.m_bits, self.k, self.n_shards

        @F.pandas_udf(T.BooleanType())
        def probe_udf(h: pd.Series) -> pd.Series:
            hv = h.to_numpy(dtype=np.int64)
            sid = (hv % n_shards + n_shards) % n_shards
            out = np.zeros(len(hv), dtype=bool)
            for s in np.unique(sid):
                blob = bc.value.get(int(s))
                if blob is None:
                    continue
                mask = sid == s
                bits = np.frombuffer(blob, dtype=np.uint8)
                out[mask] = probe_bits(bits, hv[mask], m_bits, k)
            return pd.Series(out)

        return cands.withColumn("maybe_seen", probe_udf(F.col(hash_col)))
