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

Scale posture (both fixes from the 10^10-URL review):
  - ``m_bits`` is SIZED FROM STATE, not fixed: ``build()`` derives it
    from the expected seen count at ~1e-3 FP (m/n = 14.4 bits/key for
    k=7) with growth headroom, and the engine rebuilds with a larger m
    at a round boundary when the seen count outgrows capacity — the FP
    rate can never silently saturate toward 1.0.
  - Probe and update NEVER move blobs through the driver: both are
    cogroup joins on shard_id (``applyInPandas`` over cogrouped
    candidates x shard rows), so blobs stay executor-side parquet and
    only 8-byte hashes shuffle. A properly-sized 10^10-key bloom
    (~17 GiB at 1e-3 FP) is just n_shards modest tasks.
"""

from __future__ import annotations

import math

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
        T.StructField("m_bits", T.LongType()),
    ]
)

# bits per key for ~1e-3 false-positive rate at the optimal k
BITS_PER_KEY = 14.4
DEFAULT_HEADROOM = 4.0


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


def size_m_bits(expected_n: int, n_shards: int, floor_bits: int = 1 << 16) -> int:
    """Per-shard m for ~1e-3 FP at expected_n total keys, power of two,
    byte-aligned, never below floor_bits."""
    per_shard = max(1.0, expected_n / max(1, n_shards)) * BITS_PER_KEY
    return max(floor_bits, 1 << math.ceil(math.log2(per_shard)))


class BloomSeenSet:
    """Sharded bloom state over a SnapshotTable of
    (shard_id, bloom, n_items, m_bits)."""

    def __init__(self, table, n_shards: int = 32, m_bits: int = 1 << 20, k: int = 7):
        self.table = table  # SnapshotTable
        self.n_shards = n_shards
        self.m_bits = m_bits  # current per-shard size; reset by build()
        self.k = k

    def shard_col(self, hash_col):
        return F.pmod(hash_col, F.lit(self.n_shards)).cast("int")

    def capacity(self) -> int:
        """Total keys this bloom holds at the target FP budget."""
        return int(self.n_shards * self.m_bits / BITS_PER_KEY)

    # -- build: (re)create every shard from scratch, sized from state ------
    def build(self, spark: SparkSession, hashes_df: DataFrame,
              expected_n: int, headroom: float = DEFAULT_HEADROOM) -> None:
        """Bulk-(re)build all shards from the full seen set. Called when
        the bloom first engages and again whenever seen outgrows
        capacity (the round boundary is the natural rebuild point).
        Shards with zero keys get NO row (see the nullable/float64 note
        below); probe/add cogroup by shard_id and treat an absent shard
        as all-zeros."""
        self.m_bits = size_m_bits(int(expected_n * headroom), self.n_shards)
        m_bits, k = self.m_bits, self.k

        # IMPORTANT: never union nullable placeholder rows into the hash
        # column — Arrow hands a nullable int64 to pandas as float64 and
        # hashes above 2^53 silently lose low bits (set_bits would then
        # disagree with probe's exact int64 path). Shards with zero keys
        # simply don't get a row; probe/add cogroups handle absence.
        new = hashes_df.select(
            self.shard_col(F.col("url_hash")).alias("shard_id"),
            F.col("url_hash"),
        )

        def build_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            sid = int(pdf["shard_id"].iloc[0])
            h = pdf["url_hash"].to_numpy(dtype=np.int64)
            bits = np.zeros(m_bits // 8, dtype=np.uint8)
            set_bits(bits, h, m_bits, k)
            return pd.DataFrame({
                "shard_id": [sid], "bloom": [bits.tobytes()],
                "n_items": [len(h)], "m_bits": [m_bits],
            })

        shards = new.groupBy("shard_id").applyInPandas(build_shard, SHARD_SCHEMA)
        self.table.overwrite(shards)

    # -- update: OR new hashes into shard blobs, executor-side -------------
    def add_hashes(self, spark: SparkSession, hashes_df: DataFrame) -> None:
        """hashes_df: single column `url_hash` (int64). One shuffle of
        the 8-byte hashes by shard_id; previous blobs are cogrouped in
        from the shard table — they never visit the driver."""
        k = self.k
        prev = self.table.read(spark)
        if prev is None:
            self.build(spark, hashes_df, expected_n=1)
            return
        new = hashes_df.select(
            self.shard_col(F.col("url_hash")).alias("shard_id"),
            F.col("url_hash"),
        )

        cur_m = self.m_bits

        def merge_shard(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            h = left["url_hash"].to_numpy(dtype=np.int64) if not left.empty \
                else np.empty(0, dtype=np.int64)
            if right.empty:
                # first keys for a shard that had none at build time
                sid = int(left["shard_id"].iloc[0])
                m_bits, n_prev = cur_m, 0
                bits = np.zeros(m_bits // 8, dtype=np.uint8)
            else:
                sid = int(right["shard_id"].iloc[0])
                m_bits = int(right["m_bits"].iloc[0])
                n_prev = int(right["n_items"].iloc[0])
                bits = np.frombuffer(right["bloom"].iloc[0], dtype=np.uint8).copy()
            set_bits(bits, h, m_bits, k)
            return pd.DataFrame({
                "shard_id": [sid], "bloom": [bits.tobytes()],
                "n_items": [n_prev + len(h)],
                "m_bits": [m_bits],
            })

        updated = (
            new.groupBy("shard_id")
            .cogroup(prev.groupBy("shard_id"))
            .applyInPandas(merge_shard, SHARD_SCHEMA)
        )
        self.table.overwrite(updated)

    # -- probe: split candidates into definitely-new vs maybe-seen ---------
    def probe(self, spark: SparkSession, cands: DataFrame,
              hash_col: str = "url_hash") -> DataFrame:
        """Adds a boolean `maybe_seen` column via a cogroup join on
        shard id: candidates shuffle (8-byte hashes + their columns),
        blobs are read executor-side from the shard table's parquet —
        no driver collect, no whole-filter broadcast."""
        prev = self.table.read(spark)
        if prev is None:
            return cands.withColumn("maybe_seen", F.lit(False))
        k = self.k
        out_schema = T.StructType(
            list(cands.schema.fields) + [T.StructField("maybe_seen", T.BooleanType())]
        )
        tagged = cands.withColumn("__shard", self.shard_col(F.col(hash_col)))
        cand_cols = cands.columns

        def probe_shard(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if left.empty:
                return pd.DataFrame(columns=cand_cols + ["maybe_seen"])
            out = left[cand_cols].copy()
            if right.empty:
                out["maybe_seen"] = False
                return out
            m_bits = int(right["m_bits"].iloc[0])
            bits = np.frombuffer(right["bloom"].iloc[0], dtype=np.uint8)
            h = left[hash_col].to_numpy(dtype=np.int64)
            out["maybe_seen"] = probe_bits(bits, h, m_bits, k)
            return out

        return (
            tagged.groupBy("__shard")
            .cogroup(prev.groupBy("shard_id"))
            .applyInPandas(probe_shard, out_schema)
        )
