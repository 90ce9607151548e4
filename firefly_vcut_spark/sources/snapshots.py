"""Crash-safe versioned parquet snapshots: the write-new-then-swap
sink the reference's in-place Postgres mutations map onto without a
transactional table format (reference db/recording.py:241-300,
db/occurrence.py:22-51 mutate rows under a DB transaction; here the
unit of atomicity is a manifest pointer flip).

Layout per table::

    <root>/<table>/v1/...parquet        <- full base snapshots
    <root>/<table>/v2/...parquet
    <root>/<table>/s000001/...parquet   <- appended segments (optional)
    <root>/<table>/_LATEST              <- "2\ns000001\n..." (see below)

Manifest format: first line = committed base version; each following
line = a committed segment directory, in append order. The committed
view of a table is ``vN UNION s... UNION s...`` — one file, one
``os.replace``, so a base-version bump and a segment-list reset commit
atomically together.

Protocol:
- ``write`` materializes the FULL next version directory first, then
  commits it by atomically replacing ``_LATEST`` (``os.replace`` after
  an fsync'd temp write — atomic on POSIX). Durability: every data
  file in the new directory is fsync'd, then the manifest temp file,
  then the table directory itself after the replace — so the pointer
  flip survives power loss, not just process kill.
- ``append_segment`` writes ONLY the new rows as a segment directory
  and commits it by rewriting the manifest — O(batch) bytes per
  append, never O(table) (the Delta/Iceberg append analog). Segments
  auto-compact into the next base version once ``compact_segments``
  accumulate; the compaction itself is one atomic flip (new base +
  empty segment list in the same manifest).
- ``read`` resolves through ``_LATEST`` only and verifies Spark's
  ``_SUCCESS`` marker in every referenced directory. A crash between
  a parquet write and the pointer flip leaves an orphan ``vN+1`` or
  segment directory that no reader ever sees; the old snapshot stays
  readable (kill-tested in tests/test_snapshots.py).
- Old versions are pruned AFTER the flip (keep >= 1 prior version for
  in-flight readers; at scale this is the lakehouse vacuum). Segments
  folded into version M are recorded in ``_RETIRED.M`` and pruned only
  once every base version that referenced them is itself pruned.

Concurrency: SINGLE WRITER per table. Two concurrent writers can both
claim vN+1 / the same segment slot and clobber each other mid-write;
the store serializes streaming micro-batches (foreachBatch is already
sequential per query) but does not arbitrate independent processes —
a real deployment gets that from Delta/Iceberg optimistic commits.

On a real deployment this slots behind the same interface as a Delta
or Iceberg MERGE-writing table: ``write`` / ``append_segment`` become
the transactional commit, and nothing upstream changes (the merge
recipes in operators/merge.py are already the MERGE join semantics).
"""

from __future__ import annotations

import os
import re
import shutil
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_LATEST"
_RETIRED = "_RETIRED"
_TAG_RE = re.compile(r"^[A-Za-z0-9_]+$")


def _seg_num(name: str) -> int | None:
    """s000003 or s000003-<tag> -> 3; None if not a segment dir name."""
    if not name.startswith("s"):
        return None
    digits = name[1:].split("-", 1)[0]
    return int(digits) if digits.isdigit() else None


def _fsync_path(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _fsync_tree(path: str) -> None:
    """fsync every file under ``path`` plus the directories themselves,
    bottom-up — Spark's committer renames task files into place but
    does not fsync them, so without this a power loss can leave the
    manifest pointing at torn data."""
    for dirpath, _dirnames, filenames in os.walk(path, topdown=False):
        for name in filenames:
            _fsync_path(os.path.join(dirpath, name))
        _fsync_path(dirpath)


class SnapshotStore:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        keep: int = 2,
        compact_segments: int = 16,
    ) -> None:
        self.spark = spark
        self.root = root
        self.keep = max(1, keep)
        self.compact_segments = max(2, compact_segments)

    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest(self, table: str) -> str:
        return os.path.join(self._table_dir(table), _MANIFEST)

    def _state(self, table: str) -> tuple[int | None, list[str]]:
        """(committed base version | None, committed segment names)."""
        try:
            with open(self._manifest(table)) as f:
                lines = [ln.strip() for ln in f.read().splitlines() if ln.strip()]
            if not lines:
                return None, []
            return int(lines[0]), lines[1:]
        except (FileNotFoundError, ValueError):
            return None, []

    def current_version(self, table: str) -> int | None:
        """The last COMMITTED base version — never a half-written one."""
        return self._state(table)[0]

    def segments(self, table: str) -> list[str]:
        """Committed segment names, in append order."""
        return self._state(table)[1]

    def exists(self, table: str) -> bool:
        return self.current_version(table) is not None

    def _verified(self, path: str) -> str:
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            raise FileNotFoundError(
                f"committed snapshot dir {path!r} has no _SUCCESS marker "
                "(torn write? manifest should never reference it)"
            )
        return path

    def path(self, table: str) -> str:
        """The committed BASE version directory. Raises if uncompacted
        segments exist — the base alone is not the committed view then;
        use ``read`` (or ``compact`` first)."""
        version, segs = self._state(table)
        if version is None:
            raise FileNotFoundError(f"no committed snapshot for {table!r}")
        if segs:
            raise ValueError(
                f"table {table!r} has {len(segs)} uncompacted segments; "
                "read() unions them — a single path cannot"
            )
        return self._verified(os.path.join(self._table_dir(table), f"v{version}"))

    def read(self, table: str) -> DataFrame:
        """The committed view: base version unioned with every
        committed segment (all verified via _SUCCESS)."""
        version, segs = self._state(table)
        if version is None:
            raise FileNotFoundError(f"no committed snapshot for {table!r}")
        tdir = self._table_dir(table)
        paths = [self._verified(os.path.join(tdir, f"v{version}"))]
        paths += [self._verified(os.path.join(tdir, s)) for s in segs]
        return self.spark.read.parquet(*paths)

    def versions(self, table: str) -> list[int]:
        """Readable base versions, ascending: the committed version
        plus any retained (not-yet-vacuumed, _SUCCESS-verified)
        predecessors — the time-travel window (``keep`` controls its
        depth)."""
        version, _ = self._state(table)
        if version is None:
            return []
        tdir = self._table_dir(table)
        out = []
        for name in os.listdir(tdir):
            if not name.startswith("v"):
                continue
            try:
                n = int(name[1:])
            except ValueError:
                continue
            if n <= version and os.path.exists(
                os.path.join(tdir, name, "_SUCCESS")
            ):
                out.append(n)
        return sorted(out)

    def read_version(self, table: str, version: int) -> DataFrame:
        """Time travel (Delta's VERSION AS OF): the table as committed
        at base ``version``. Only base commits are addressable —
        segment appends between commits fold into the next base.
        Raises if the version was never committed or has been
        vacuumed past the ``keep`` window."""
        avail = self.versions(table)
        if version not in avail:
            raise FileNotFoundError(
                f"version {version} of {table!r} not readable; "
                f"retained versions: {avail}"
            )
        return self.spark.read.parquet(
            self._verified(os.path.join(self._table_dir(table), f"v{version}"))
        )

    def write(self, table: str, df: DataFrame) -> int:
        """Write the next FULL base version and commit it atomically
        (resetting the segment list). Returns the committed version."""
        version, segs = self._state(table)
        cur = version or 0
        nxt = cur + 1
        tdir = self._table_dir(table)
        target = os.path.join(tdir, f"v{nxt}")
        # an orphan vN+1 from a previous crash is overwritten here
        df.write.mode("overwrite").parquet(target)
        _fsync_tree(target)
        if segs:
            self._retire(table, nxt, segs)
        self._commit(table, nxt, [])
        self._vacuum(table, nxt)
        return nxt

    def append_segment(
        self,
        table: str,
        df: DataFrame,
        tag: str | None = None,
        merge_keys: list[str] | None = None,
    ) -> str:
        """Append ``df`` as a new segment — O(batch) bytes written, the
        base is never rewritten. The table must already exist (write an
        empty/base snapshot first: appends need a schema-bearing base).
        Auto-compacts once ``compact_segments`` segments accumulate
        (with ``merge_keys`` resolution if given — pass the same keys a
        ``read_last_wins`` reader would use, or compaction loses the
        segment-recency ordering).

        ``tag`` makes the append idempotent: if a committed segment
        already carries the tag, the call is a no-op returning that
        segment (the Delta txnAppId/txnVersion pattern for exactly-once
        foreachBatch sinks — tag with a per-query id + batch id).
        Returns the committed segment name."""
        version, segs = self._state(table)
        if version is None:
            raise FileNotFoundError(
                f"append_segment needs a committed base for {table!r}; "
                "write() the first batch as v1"
            )
        if tag is not None:
            if not _TAG_RE.match(tag):
                raise ValueError(f"segment tag must be [A-Za-z0-9_]+, got {tag!r}")
            done = [s for s in segs if s.endswith(f"-{tag}")]
            if done:
                return done[0]
        tdir = self._table_dir(table)
        # orphan segment dirs from crashes may exist uncommitted: pick
        # max(on-disk, committed) + 1 so we never adopt one silently
        on_disk = [n for n in os.listdir(tdir) if _seg_num(n) is not None]
        nxt = max((_seg_num(n) for n in on_disk), default=0) + 1
        name = f"s{nxt:06d}" + (f"-{tag}" if tag else "")
        target = os.path.join(tdir, name)
        df.write.mode("overwrite").parquet(target)
        _fsync_tree(target)
        self._commit(table, version, segs + [name])
        if len(segs) + 1 >= self.compact_segments:
            self.compact(table, merge_keys=merge_keys)
        return name

    def read_last_wins(self, table: str, keys: list[str]) -> DataFrame:
        """The committed view under UPSERT semantics: rows in later
        segments supersede same-key rows in earlier segments / the
        base (merge-on-read, the Hudi-MOR / Delta-CDF resolution
        pattern). Each segment is assumed key-unique (the writer
        dedups in-batch); resolution cost grows with segment count,
        which auto-compaction bounds at ``compact_segments``."""
        version, segs = self._state(table)
        if version is None:
            raise FileNotFoundError(f"no committed snapshot for {table!r}")
        tdir = self._table_dir(table)
        parts = [os.path.join(tdir, f"v{version}")] + [
            os.path.join(tdir, s) for s in segs
        ]
        dfs = [
            self.spark.read.parquet(self._verified(p)).withColumn(
                "_seq", F.lit(i)
            )
            for i, p in enumerate(parts)
        ]
        u = reduce(DataFrame.unionByName, dfs)
        cols = [c for c in u.columns if c != "_seq"]
        val_cols = [c for c in cols if c not in keys]
        return (
            u.groupBy(*keys)
            .agg(
                F.max_by(
                    F.struct(*val_cols), F.struct("_seq", *val_cols)
                ).alias("_v")
            )
            .select(*keys, *[F.col(f"_v.{c}").alias(c) for c in val_cols])
            .select(*cols)
        )

    def compact(self, table: str, merge_keys: list[str] | None = None) -> int:
        """Fold base + segments into the next base version in ONE
        atomic manifest flip (new version line + empty segment list).
        With ``merge_keys``, folding applies last-wins resolution (so
        an upsert table compacts to its resolved view); without, plain
        union (append-only tables). Folded segments are retired, not
        deleted: in-flight readers of the prior view still reference
        them; _vacuum removes them once every base version that used
        them is pruned."""
        version, segs = self._state(table)
        if version is None:
            raise FileNotFoundError(f"no committed snapshot for {table!r}")
        if not segs:
            return version
        merged = (
            self.read_last_wins(table, merge_keys)
            if merge_keys
            else self.read(table)
        )
        nxt = version + 1
        target = os.path.join(self._table_dir(table), f"v{nxt}")
        merged.write.mode("overwrite").parquet(target)
        _fsync_tree(target)
        self._retire(table, nxt, segs)
        self._commit(table, nxt, [])
        self._vacuum(table, nxt)
        return nxt

    def _retire(self, table: str, folded_into: int, segs: list[str]) -> None:
        """Record segments folded into base ``folded_into`` so _vacuum
        can prune them once no retained base version predates it.
        Written (fsync'd) BEFORE the commit flip: a crash in between
        leaves a retire-record for a compaction that never committed —
        harmless, since _vacuum only acts on it after versions advance."""
        path = os.path.join(self._table_dir(table), f"{_RETIRED}.{folded_into}")
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write("\n".join(segs))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def _commit(self, table: str, version: int, segs: list[str]) -> None:
        manifest = self._manifest(table)
        tmp = f"{manifest}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write("\n".join([str(version), *segs]))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, manifest)  # POSIX-atomic pointer flip
        # fsync the directory so the rename itself survives power loss
        _fsync_path(self._table_dir(table))

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
        """Drop base versions older than the ``keep`` most recent
        (never the committed one), plus segments whose every consumer
        version is gone. Runs after the flip, so a vacuum crash leaves
        only extra garbage, never a missing snapshot."""
        tdir = self._table_dir(table)
        cutoff = committed - self.keep  # versions <= cutoff go
        for name in os.listdir(tdir):
            if name.startswith("v") and name[1:].isdigit():
                if int(name[1:]) <= cutoff:
                    shutil.rmtree(os.path.join(tdir, name), ignore_errors=True)
            elif name.startswith(f"{_RETIRED}."):
                # segments folded into M served versions < M: deletable
                # once the oldest retained version (cutoff+1) >= M
                folded_into = name.rsplit(".", 1)[1]
                if folded_into.isdigit() and int(folded_into) <= cutoff + 1:
                    retired = os.path.join(tdir, name)
                    try:
                        with open(retired) as f:
                            segs = [s.strip() for s in f if s.strip()]
                    except FileNotFoundError:
                        continue
                    for seg in segs:
                        shutil.rmtree(os.path.join(tdir, seg), ignore_errors=True)
                    os.remove(retired)
