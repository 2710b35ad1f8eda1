"""Cuckoo seen-set stress: build / add / probe / delete throughput at
millions of keys, plus the measured FP rate — the honest-cost record
for the per-key insert loop (engine/cuckoo.py module docstring).

Usage: python tools/cuckoo_stress.py [n_keys] [n_shards] [cores]
"""

from __future__ import annotations

import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from crawl4ai_spark.engine.cuckoo import CuckooSeenSet  # noqa: E402
from crawl4ai_spark.engine.bloom import BloomSeenSet  # noqa: E402
from crawl4ai_spark.engine.tables import SnapshotTable  # noqa: E402
from crawl4ai_spark.session import build_session  # noqa: E402


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    spark = build_session(app_name="cuckoo-stress", master=f"local[{cores}]",
                          shuffle_partitions=cores)

    def hashes(start, n):
        return spark.range(start, start + n).select(
            F.xxhash64(F.col("id").cast("string")).alias("url_hash"))

    for name, mk in (("cuckoo", lambda t: CuckooSeenSet(t, n_shards)),
                     ("bloom", lambda t: BloomSeenSet(t, n_shards))):
        t = SnapshotTable(tempfile.mkdtemp(prefix=f"stress_{name}_"))
        f = mk(t)
        keys = hashes(0, n_keys)

        t0 = time.time()
        f.build(spark, keys, expected_n=n_keys, headroom=1.2)
        build_s = time.time() - t0

        delta = hashes(10**9, n_keys // 10)
        t0 = time.time()
        f.add_hashes(spark, delta)
        add_s = time.time() - t0

        probe = hashes(0, n_keys)  # all members
        t0 = time.time()
        neg = f.probe(spark, probe).where(~F.col("maybe_seen")).count()
        probe_s = time.time() - t0

        fresh = hashes(2 * 10**9, n_keys)
        fp = f.probe(spark, fresh).where(F.col("maybe_seen")).count()

        line = (f"{name}: build {n_keys/build_s:,.0f} keys/s ({build_s:.1f}s) | "
                f"add {n_keys // 10 / add_s:,.0f} keys/s | "
                f"probe {n_keys/probe_s:,.0f} keys/s | "
                f"false_neg {neg} | fp_rate {fp/n_keys:.2e}")
        if hasattr(f, "delete_hashes"):
            dele = hashes(0, n_keys // 10)
            t0 = time.time()
            f.delete_hashes(spark, dele)
            line += f" | delete {n_keys // 10 / (time.time() - t0):,.0f} keys/s"
        print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
