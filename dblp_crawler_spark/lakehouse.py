"""Snapshot-committed table store with Iceberg semantics.

The engine's state contract is Iceberg's: atomic snapshot commits,
MERGE-style upserts, and time travel so a killed crawl resumes from
the last committed wave with bit-identical results (SURVEY.md O1/O7;
reference analog: the filesystem XML cache downloader.py:53-66 plus
all-in-memory sets graph.py:14-16, which are neither atomic nor
resumable).

This container ships no Iceberg runtime jar, so `Lakehouse` provides
the same contract over parquet:

  * every write lands in a fresh immutable snapshot directory
    `<table>/snap-<n>/` (parquet files written by Spark),
  * a manifest `<table>/snap-<n>.json` records row count and schema,
  * the table HEAD is a single pointer file updated via atomic
    `os.replace` — readers only ever see fully-committed snapshots,
  * `merge_upsert` / `append_new` implement MERGE INTO ... WHEN
    [NOT] MATCHED via anti-join + union (what Iceberg MoR does
    logically), keyed exactly like the reference's Neo4j MERGE
    (summarizer/neo4j.py:13-41).

On a real cluster the same call sites bind to an Iceberg catalog
(`spark.sql("MERGE INTO ...")`); the interface is deliberately the
Iceberg verb set so the swap is config, not code.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class Lakehouse:
    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- pointers ---------------------------------------------------------
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _head_path(self, table: str) -> str:
        return os.path.join(self._tdir(table), "HEAD")

    def current_snapshot(self, table: str) -> int | None:
        try:
            with open(self._head_path(table)) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def _data_dir(self, table: str, snap: int) -> str:
        return os.path.join(self._tdir(table), f"data-{snap:06d}")

    def exists(self, table: str) -> bool:
        return self.current_snapshot(table) is not None

    def _commit(self, table: str, files: list[str], snap: int, meta: dict) -> None:
        manifest = {"snapshot": snap, "committed_at": time.time(), "files": files, **meta}
        mpath = os.path.join(self._tdir(table), f"snap-{snap:06d}.json")
        with open(mpath, "w") as f:
            json.dump(manifest, f)
        # atomic HEAD swap — the commit point
        fd, tmp = tempfile.mkstemp(dir=self._tdir(table))
        with os.fdopen(fd, "w") as f:
            f.write(str(snap))
        os.replace(tmp, self._head_path(table))

    # -- reads --------------------------------------------------------------
    def read(self, table: str, snapshot: int | None = None) -> DataFrame:
        snap = self.current_snapshot(table) if snapshot is None else snapshot
        if snap is None:
            raise FileNotFoundError(f"table {table} has no committed snapshot")
        m = self.manifest(table, snap)
        if not m["files"]:  # empty snapshot: schema lives in the manifest
            return self.spark.createDataFrame([], StructType.fromJson(json.loads(m["schema_json"])))
        return self.spark.read.parquet(*[os.path.join(self._tdir(table), f) for f in m["files"]])

    def read_or_empty(self, table: str, schema: StructType) -> DataFrame:
        if self.exists(table):
            return self.read(table)
        return self.spark.createDataFrame([], schema)

    def manifest(self, table: str, snapshot: int | None = None) -> dict:
        snap = self.current_snapshot(table) if snapshot is None else snapshot
        with open(os.path.join(self._tdir(table), f"snap-{snap:06d}.json")) as f:
            return json.load(f)

    def snapshots(self, table: str) -> list[int]:
        tdir = self._tdir(table)
        if not os.path.isdir(tdir):
            return []
        out = []
        for name in os.listdir(tdir):
            if name.startswith("snap-") and name.endswith(".json"):
                out.append(int(name[5:-5]))
        return sorted(out)

    # -- writes --------------------------------------------------------------
    def _next_snap(self, table: str) -> int:
        os.makedirs(self._tdir(table), exist_ok=True)
        head = self.current_snapshot(table)
        # data dirs are keyed by max existing snapshot file to stay
        # unique even after a rollback re-forked history
        snaps = self.snapshots(table)
        base = max(snaps) if snaps else -1
        return max(base, -1 if head is None else head) + 1

    def overwrite(self, table: str, df: DataFrame, meta: dict | None = None) -> int:
        """Full-replace commit (Iceberg: REPLACE TABLE ... AS SELECT)."""
        snap = self._next_snap(table)
        out = self._data_dir(table, snap)
        df.write.mode("overwrite").parquet(out)
        self._commit(table, [os.path.basename(out)], snap, meta or {})
        return snap

    def create_empty(self, table: str, schema: StructType, meta: dict | None = None) -> int:
        """Commit an empty snapshot without running a Spark job —
        a metadata-only truncate (Iceberg: TRUNCATE TABLE). The
        schema is recorded in the manifest so reads stay typed."""
        snap = self._next_snap(table)
        self._commit(
            table, [], snap, {**(meta or {}), "schema_json": json.dumps(schema.jsonValue())}
        )
        return snap

    def append(self, table: str, df: DataFrame, schema: StructType, meta: dict | None = None) -> int:
        """Fast append: write ONLY the new rows; the manifest unions
        the previous snapshot's file list (Iceberg fast-append —
        metadata-only, no data rewrite). Old snapshots stay readable."""
        head = self.current_snapshot(table)
        if head is None:
            return self.overwrite(table, df, meta)
        snap = self._next_snap(table)
        out = self._data_dir(table, snap)
        df.write.mode("overwrite").parquet(out)
        files = self.manifest(table, head)["files"] + [os.path.basename(out)]
        self._commit(table, files, snap, meta or {})
        return snap

    def append_new(
        self, table: str, df: DataFrame, keys: list[str], schema: StructType, meta: dict | None = None
    ) -> int:
        """MERGE ... WHEN NOT MATCHED THEN INSERT (insert-only merge).

        Reference analog: the existence-check-before-write pattern of
        summarizer/neo4j.py:62-68,76-83 and every seen-set guard.
        """
        old = self.read_or_empty(table, schema)
        fresh = df.dropDuplicates(keys).join(old.select(*keys), on=keys, how="left_anti")
        return self.overwrite(table, old.unionByName(fresh), meta)

    def merge_upsert(
        self, table: str, df: DataFrame, keys: list[str], schema: StructType, meta: dict | None = None
    ) -> int:
        """MERGE ... WHEN MATCHED THEN UPDATE WHEN NOT MATCHED INSERT.

        Logical plan: old rows not matched by key survive; every key
        in `df` takes the new row (last-writer-wins within `df` is
        the caller's responsibility — pass pre-deduped input)."""
        old = self.read_or_empty(table, schema)
        kept = old.join(df.select(*keys).dropDuplicates(keys), on=keys, how="left_anti")
        return self.overwrite(table, kept.unionByName(df.select(*[c.name for c in schema])), meta)

    def rollback(self, table: str, snapshot: int) -> None:
        """Time-travel the HEAD pointer back (Iceberg: rollback_to_snapshot)."""
        if snapshot not in self.snapshots(table):
            raise ValueError(f"unknown snapshot {snapshot} for {table}")
        fd, tmp = tempfile.mkstemp(dir=self._tdir(table))
        with os.fdopen(fd, "w") as f:
            f.write(str(snapshot))
        os.replace(tmp, self._head_path(table))
