"""Atomic snapshot tables — the engine's state layer.

Production target is Iceberg (`MERGE INTO pages`, snapshot ids in a
round manifest, partition pruning on round/host-hash); this module is a
dependency-free stand-in with the same commit semantics so the engine
code is connector-agnostic: a table is a directory of immutable parquet
data dirs plus a JSON manifest that is swapped atomically
(``os.replace``). Readers only ever see committed manifests, a killed
writer leaves at worst orphan data dirs (never a torn table), and
resume = read the last committed manifest — mirroring the reference's
SQLite cache + adaptive-state JSON checkpointing
(/root/reference/crawl4ai/async_database.py:227-248,
adaptive_crawler.py:53-110) with Iceberg-style atomicity.

Layout:
    <warehouse>/<table>/manifest.json      {"version": k, "data": [relpaths]}
    <warehouse>/<table>/d-<uuid>/...       immutable parquet dirs
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def _nullable(schema):
    """Nullable-normalized copy: file sources treat user-supplied
    schemas as nullable anyway, and cast/lit nullability noise must not
    flap the read-schema cache."""
    from pyspark.sql import types as T

    return T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in schema]
    )


class SnapshotTable:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)
        # Schema cache: an engine table's schema is fixed for its
        # lifetime (STATE_FIELDS / the pages schema), but a bare
        # spark.read.parquet re-reads parquet footers on EVERY read to
        # infer it (~100-300 ms of driver time per call — the engine
        # reads tables several times per round, so this is a real slice
        # of the per-round serial floor). First read infers and caches;
        # later reads pass the schema and skip footer I/O entirely.
        # Every write path keeps the cache honest: overwrite() re-pins
        # it to the new data's schema, append()/adopt_dirs() invalidate
        # on mismatch (or on undeclared external data), and
        # rollback_to()/append_rows() invalidate outright — so a schema
        # evolution within the instance's lifetime (e.g. resuming a
        # pre-upgrade warehouse, then appending new-schema rows) never
        # reads through a stale schema that would silently drop the new
        # columns.
        self._schema = None

    # -- manifest ----------------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.path, "manifest.json")

    def _read_manifest(self) -> dict:
        try:
            with open(self._manifest_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"version": 0, "data": []}

    def _commit(self, manifest: dict) -> None:
        tmp = self._manifest_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path)  # atomic commit point

    @property
    def version(self) -> int:
        return self._read_manifest()["version"]

    def exists(self) -> bool:
        return bool(self._read_manifest()["data"])

    # -- io ------------------------------------------------------------------
    def _write_datadir(self, df: DataFrame) -> str:
        rel = f"d-{uuid.uuid4().hex[:12]}"
        df.write.mode("overwrite").parquet(os.path.join(self.path, rel))
        return rel

    def read(self, spark: SparkSession) -> DataFrame | None:
        m = self._read_manifest()
        if not m["data"]:
            return None
        dirs = [os.path.join(self.path, d) for d in m["data"]]
        if self._schema is not None:
            return spark.read.schema(self._schema).parquet(*dirs)
        # re-infer path (no declared/cached schema — e.g. right after a
        # mixed-schema append invalidated the cache): merge footers, or
        # inference would take ONE arbitrary file's schema and silently
        # drop columns the other dirs carry
        df = spark.read.option("mergeSchema", "true").parquet(*dirs)
        self._schema = _nullable(df.schema)
        return df

    def overwrite(self, df: DataFrame) -> int:
        """Replace table contents (new snapshot). Returns new version.

        Old data dirs are NOT deleted here — the round checkpoint needs
        them for exact rollback on resume; the engine vacuums dirs no
        committed round references (Iceberg expire_snapshots analogue).
        """
        m = self._read_manifest()
        rel = self._write_datadir(df)
        m = {"version": m["version"] + 1, "data": [rel]}
        self._commit(m)
        self._schema = _nullable(df.schema)  # table now holds exactly this data
        return m["version"]

    def vacuum(self, keep: set[str]) -> None:
        keep = keep | set(self._read_manifest()["data"])
        for d in os.listdir(self.path):
            if d.startswith("d-") and d not in keep:
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)

    def append(self, df: DataFrame) -> int:
        """Append-only fast path (Iceberg AppendFiles): no rewrite."""
        if self._schema is not None and _nullable(df.schema) != self._schema:
            self._schema = None  # mixed-schema dirs: re-infer on next read
        m = self._read_manifest()
        rel = self._write_datadir(df)
        m = {"version": m["version"] + 1, "data": m["data"] + [rel]}
        self._commit(m)
        return m["version"]

    def adopt_dirs(
        self, abs_dirs: list[str], mode: str = "append", schema=None
    ) -> int:
        """Commit externally-written parquet dirs (e.g. one tag subtree of
        a shared partitioned write) as this table's next snapshot without
        rewriting any data — the Iceberg AppendFiles/ReplaceFiles analogue
        that lets one Spark job feed several tables.

        `schema` declares the adopted dirs' parquet schema so the read
        cache stays warm (the engine's tagged state write has a fixed
        one); without a declaration the cache is invalidated — a footer
        re-read beats a silently stale schema."""
        if mode == "overwrite":
            self._schema = _nullable(schema) if schema is not None else None
        elif self._schema is not None and (
            schema is None or _nullable(schema) != self._schema
        ):
            self._schema = None
        rels = [os.path.relpath(d, self.path) for d in abs_dirs]
        m = self._read_manifest()
        data = rels if mode == "overwrite" else m["data"] + rels
        m = {"version": m["version"] + 1, "data": data}
        self._commit(m)
        return m["version"]

    def append_rows(self, rows: list[tuple], schema: "pa.Schema") -> int:
        """Driver-side append of a handful of rows (round metrics) via
        pyarrow — no Spark job for dim-sized bookkeeping writes."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        rel = f"d-{uuid.uuid4().hex[:12]}"
        d = os.path.join(self.path, rel)
        os.makedirs(d, exist_ok=True)
        cols = list(zip(*rows)) if rows else [[] for _ in schema]
        table = pa.table(
            {f.name: pa.array(list(c), type=f.type) for f, c in zip(schema, cols)}
        )
        pq.write_table(table, os.path.join(d, "part-0.parquet"))
        m = self._read_manifest()
        m = {"version": m["version"] + 1, "data": m["data"] + [rel]}
        self._commit(m)
        self._schema = None  # arrow-written dir: re-infer on next read
        return m["version"]

    def merge_on_key(self, spark: SparkSession, df: DataFrame,
                     key: str | list[str]) -> int:
        """Upsert semantics (Iceberg `MERGE INTO ... ON key`): new rows win.

        Test-scale implementation rewrites the table; at 100 TB this is
        a real MERGE with partition-level pruning — the engine only
        calls it for dimension-sized tables (host_state, robots).
        """
        keys = [key] if isinstance(key, str) else list(key)
        cur = self.read(spark)
        if cur is None:
            return self.overwrite(df)
        merged = cur.join(df.select(*keys), keys, "left_anti").unionByName(df)
        # safe ordering: overwrite() writes the new data dir (reading the
        # old dirs, still present) before the commit+cleanup
        return self.overwrite(merged)

    def drop_dirs(self, rel_dirs: list[str]) -> int:
        """Remove data dirs from the manifest — the Iceberg DeleteFiles /
        drop-partition analogue: a constant-time metadata commit, no
        data rewrite, no Spark job. Files stay on disk so committed
        round checkpoints can still roll back; vacuum reclaims them
        once no checkpoint references them."""
        gone = set(rel_dirs)
        m = self._read_manifest()
        m = {"version": m["version"] + 1,
             "data": [d for d in m["data"] if d not in gone]}
        self._commit(m)
        return m["version"]

    def rollback_to(self, version_data: list[str]) -> None:
        self._commit({"version": self.version + 1, "data": version_data})
        self._schema = None  # restored dirs may predate the cached schema

    def snapshot_data(self) -> list[str]:
        return list(self._read_manifest()["data"])


class Warehouse:
    """A directory of SnapshotTables plus the crawl round manifest."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def table(self, name: str) -> SnapshotTable:
        return SnapshotTable(os.path.join(self.root, name))

    # -- shared per-round state dirs (one tagged write feeds N tables) -----
    def state_dir(self, rnd: int) -> str:
        return os.path.join(self.root, "state", f"r{rnd:06d}")

    @staticmethod
    def existing_tag_dirs(state_dir: str) -> dict[str, str]:
        """tag -> abs path for the tag=... subdirs a partitioned write
        actually produced (empty branches produce no subdir)."""
        out = {}
        if os.path.isdir(state_dir):
            for d in os.listdir(state_dir):
                if d.startswith("tag="):
                    out[d.split("=", 1)[1]] = os.path.join(state_dir, d)
        return out

    # -- round manifest (checkpoint/resume unit) ---------------------------
    @property
    def _rounds_path(self) -> str:
        return os.path.join(self.root, "round_manifest.json")

    def read_rounds(self) -> list[dict]:
        try:
            with open(self._rounds_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return []

    def commit_round(self, entry: dict) -> None:
        rounds = self.read_rounds()
        rounds = [r for r in rounds if r["round"] != entry["round"]]
        rounds.append(dict(entry, committed=True))
        rounds.sort(key=lambda r: r["round"])
        tmp = self._rounds_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(rounds, f)
        os.replace(tmp, self._rounds_path)

    def last_committed_round(self) -> int:
        rounds = [r["round"] for r in self.read_rounds() if r.get("committed")]
        return max(rounds) if rounds else -1
