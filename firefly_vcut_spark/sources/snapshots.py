"""Crash-safe versioned parquet snapshots: the write-new-then-swap
sink the reference's in-place Postgres mutations map onto without a
transactional table format (reference db/recording.py:241-300,
db/occurrence.py:22-51 mutate rows under a DB transaction; here the
unit of atomicity is a version-directory pointer flip).

Layout per table::

    <root>/<table>/v1/...parquet
    <root>/<table>/v2/...parquet
    <root>/<table>/_LATEST        <- contains "2"

Protocol:
- ``write`` materializes the FULL next version directory first, then
  commits it by atomically replacing ``_LATEST`` (``os.replace`` after
  an fsync'd temp write — atomic on POSIX).
- ``read`` resolves through ``_LATEST`` only. A crash between the
  parquet write and the pointer flip leaves an orphan ``vN+1``
  directory that no reader ever sees; the old snapshot stays readable
  (kill-tested in tests/test_snapshots.py).
- Old versions are pruned AFTER the flip (keep >= 1 prior version for
  in-flight readers; at scale this is the lakehouse vacuum).

On a real deployment this slots behind the same interface as a Delta
or Iceberg MERGE-writing table: ``write`` becomes the transactional
commit, and nothing upstream changes (the merge recipes in
operators/merge.py are already the MERGE join semantics).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_LATEST"


class SnapshotStore:
    def __init__(self, spark: SparkSession, root: str, keep: int = 2) -> None:
        self.spark = spark
        self.root = root
        self.keep = max(1, keep)

    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest(self, table: str) -> str:
        return os.path.join(self._table_dir(table), _MANIFEST)

    def current_version(self, table: str) -> int | None:
        """The last COMMITTED version — never a half-written one."""
        try:
            with open(self._manifest(table)) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def exists(self, table: str) -> bool:
        return self.current_version(table) is not None

    def path(self, table: str) -> str:
        v = self.current_version(table)
        if v is None:
            raise FileNotFoundError(f"no committed snapshot for {table!r}")
        return os.path.join(self._table_dir(table), f"v{v}")

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    def write(self, table: str, df: DataFrame) -> int:
        """Write the next version and commit it atomically. Returns the
        committed version number."""
        cur = self.current_version(table) or 0
        nxt = cur + 1
        tdir = self._table_dir(table)
        target = os.path.join(tdir, f"v{nxt}")
        # an orphan vN+1 from a previous crash is overwritten here
        df.write.mode("overwrite").parquet(target)
        self._commit(table, nxt)
        self._vacuum(table, nxt)
        return nxt

    def _commit(self, table: str, version: int) -> None:
        manifest = self._manifest(table)
        tmp = f"{manifest}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(str(version))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, manifest)  # POSIX-atomic pointer flip

    def tables(self) -> list[str]:
        """Tables with at least one committed snapshot."""
        if not os.path.isdir(self.root):
            return []
        return sorted(
            t
            for t in os.listdir(self.root)
            if os.path.isdir(self._table_dir(t)) and self.current_version(t) is not None
        )

    def _vacuum(self, table: str, committed: int) -> None:
        """Drop versions older than the ``keep`` most recent (never the
        committed one). Runs after the flip, so a vacuum crash leaves
        only extra garbage, never a missing snapshot."""
        tdir = self._table_dir(table)
        for name in os.listdir(tdir):
            if not (name.startswith("v") and name[1:].isdigit()):
                continue
            if int(name[1:]) <= committed - self.keep:
                shutil.rmtree(os.path.join(tdir, name), ignore_errors=True)
