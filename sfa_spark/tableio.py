"""TableIO — snapshot + lineage-manifest table layer (Iceberg-shaped).

The north rule requires Iceberg tables with snapshot checkpoints,
per-partition lineage manifests, and resume. This sandbox bundles no
Iceberg runtime jar (SURVEY.md §7.0 check: 0 of 287 jars) and has no
network to fetch one, so TableIO implements the same *semantics* over
parquet + JSON manifests, behind an interface an Iceberg-backed
implementation can satisfy drop-in (`try_iceberg()` probes for the
runtime and would return an Iceberg-backed TableIO when present):

  table root/
    snap-000001/              one directory per snapshot (immutable)
      part-<partition>.parquet
    _manifests/
      snap-000001.json        {snapshot_id, parent, created_by_job,
                               partitions: {pk: {rows, files, metrics}}}
    _current                  name of the live snapshot (atomic pointer)

Resume semantics: a writer lists the target snapshot's manifest, diffs
the partition keys it plans to produce against those already recorded,
and processes only the missing ones (`missing_partitions`). Commit is
atomic: data + manifest are fully written before `_current` flips.
"""

from __future__ import annotations

import contextlib
import fcntl
import json
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


def try_iceberg(spark: SparkSession) -> bool:
    """Probe for an Iceberg runtime on the classpath."""
    try:
        spark._jvm.org.apache.iceberg.Snapshot  # noqa: B018
        return True
    except Exception:
        return False


class TableIO:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)

    # -- snapshot bookkeeping ------------------------------------------
    def current_snapshot(self) -> str | None:
        p = os.path.join(self.root, "_current")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return f.read().strip()

    def manifest(self, snapshot: str | None = None) -> dict | None:
        snap = snapshot or self.current_snapshot()
        if snap is None:
            return None
        p = os.path.join(self.root, "_manifests", f"{snap}.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _next_snapshot_id(self) -> str:
        cur = self.current_snapshot()
        n = int(cur.split("-")[1]) + 1 if cur else 1
        return f"snap-{n:06d}"

    def _claim_snapshot_id(self) -> str:
        """Allocate the next snapshot id UNDER the commit lock, reaping
        any orphan data dir a crashed writer left under that id (it
        renamed its stage to snap-N but died before the pointer flip;
        ids advance monotonically with the pointer, so a dir numbered
        past ``_current`` was never committed and no live manifest
        references it). Every commit path — data, drop, metadata-only —
        must claim through here, or an orphan claimed by a metadata-only
        commit would leak forever (its stale ``_manifests/snap-N.json``
        is overwritten by the new commit, but the data dir would not
        be)."""
        snap = self._next_snapshot_id()
        target = os.path.join(self.root, snap)
        if os.path.exists(target):
            import shutil

            shutil.rmtree(target)
        return snap

    @contextlib.contextmanager
    def _commit_lock(self):
        """Serialize the metadata commit section across concurrent
        writers on this table (streaming sink + batch refresh +
        retention can overlap in time — the north rule's multi-writer
        shape). The parent read, snapshot-id allocation, manifest write
        and pointer flip all happen under one exclusive flock, so a
        writer always rebases its carry-forward onto the *actual*
        current snapshot and two writers can never both claim snap-N+1
        (the Iceberg optimistic-commit CAS, degenerate-but-correct as a
        blocking lock: data files are written OUTSIDE the lock, only
        cheap metadata inside). On a real object store this section is
        the catalog's atomic swap (e.g. Iceberg REST catalog commit)."""
        fd = os.open(os.path.join(self.root, "_commit.lock"), os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)

    def _commit_manifest(self, manifest: dict) -> None:
        """Write the manifest then atomically flip the pointer. Must be
        called with the commit lock held."""
        snap = manifest["snapshot_id"]
        mpath = os.path.join(self.root, "_manifests", f"{snap}.json")
        with open(mpath, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        fd, tmp = tempfile.mkstemp(dir=self.root)
        with os.fdopen(fd, "w") as f:
            f.write(snap)
        os.replace(tmp, os.path.join(self.root, "_current"))

    # -- write / commit -------------------------------------------------
    def write_snapshot(
        self,
        df: DataFrame,
        partition_col: str,
        job: str = "",
        metrics: dict | None = None,
        carry_forward: bool = True,
        merge_partitions: bool = False,
        precondition=None,
        metrics_fn=None,
    ) -> str | None:
        """Write ``df`` partitioned by ``partition_col`` as a new snapshot.

        With ``carry_forward`` the new manifest inherits the parent's
        partitions that this write did not touch (their files are
        referenced, not rewritten — incremental refresh shape).

        With ``merge_partitions`` a partition present in BOTH the parent
        and this write keeps the parent's files too (``paths`` list) —
        append semantics (the word index's SFATrie.mergeTrees analogue)
        instead of the default replace semantics.

        ``precondition`` (manifest-dict -> bool) is evaluated UNDER the
        commit lock against the then-current manifest; returning False
        aborts the commit (staged data is discarded, returns None). This
        is how conditional fences — e.g. the streaming sink's
        exactly-once batch-id check — stay atomic against concurrent
        writers: a check done before the lock could pass in two racers.

        ``metrics_fn`` (current-metrics -> dict) is likewise evaluated
        UNDER the lock, for metrics whose merge rule must see the
        then-current value rather than a pre-read one (e.g. an append's
        MBR/count union — two concurrent appends would otherwise both
        merge into the same stale parent and the loser's contribution
        would vanish from the bookkeeping). Keys it returns override
        both the carried metrics and ``metrics``.
        """
        # data files are written to a writer-private staging dir OUTSIDE
        # the commit lock (the long part — minutes at scale); the
        # snapshot id is allocated only once the lock is held, so it
        # reflects the table state at commit time, not write-start time
        stage = os.path.join(self.root, f".stage-{uuid.uuid4().hex}")
        df.write.mode("overwrite").partitionBy(partition_col).parquet(stage)

        staged: dict = {}
        for name in os.listdir(stage):
            if not name.startswith(f"{partition_col}="):
                continue
            pk = name.split("=", 1)[1]
            pdir = os.path.join(stage, name)
            files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
            staged[pk] = {
                "name": name,
                "files": len(files),
                "bytes": sum(
                    os.path.getsize(os.path.join(pdir, f)) for f in files
                ),
            }

        with self._commit_lock():
            # CAS section: re-read the current pointer under the lock —
            # a concurrent writer that committed while our data was
            # being written becomes our parent (rebase), never a victim
            parent = self.current_snapshot()
            if precondition is not None and not precondition(
                self.manifest(parent) or {}
            ):
                import shutil

                shutil.rmtree(stage, ignore_errors=True)
                return None
            snap = self._claim_snapshot_id()
            target = os.path.join(self.root, snap)
            os.rename(stage, target)
            parts = {
                pk: {
                    "path": os.path.join(snap, meta["name"]),
                    "files": meta["files"],
                    "bytes": meta["bytes"],
                }
                for pk, meta in staged.items()
            }
            if carry_forward and parent:
                parent_manifest = self.manifest(parent) or {"partitions": {}}
                for pk, meta in parent_manifest["partitions"].items():
                    if pk not in parts:
                        parts[pk] = meta
                    elif merge_partitions:
                        old_paths = meta.get("paths") or [meta["path"]]
                        new = parts[pk]
                        parts[pk] = {
                            "paths": old_paths + [new["path"]],
                            "files": meta["files"] + new["files"],
                            "bytes": meta["bytes"] + new["bytes"],
                        }

            # metrics CARRY FORWARD across commits, like partitions:
            # several writers share one table (batch refresh, streaming
            # sink, retention, encoded-tier refresh), and each one's
            # bookkeeping (input_fp_by_day, stream_batch_id,
            # fp_by_bucket, …) must survive the others' commits — a
            # writer overrides only the keys it owns
            parent_metrics = {}
            if parent:
                parent_metrics = (self.manifest(parent) or {}).get("metrics", {})
            self._commit_manifest({
                "snapshot_id": snap,
                "parent": parent,
                "job": job,
                "partition_col": partition_col,
                "partitions": parts,
                "metrics": {
                    **parent_metrics,
                    **(metrics or {}),
                    **((metrics_fn(parent_metrics) if metrics_fn else {})),
                },
            })
        return snap

    # -- read / resume ----------------------------------------------------
    def read(self, spark: SparkSession, snapshot: str | None = None) -> DataFrame:
        m = self.manifest(snapshot)
        if m is None:
            raise FileNotFoundError(f"no snapshot in {self.root}")
        # carried-forward partitions live in ancestor snapshot dirs; read
        # each snapshot group with its own basePath (so hive-style
        # partition values are recovered) and union
        from functools import reduce

        by_snap: dict[str, list[str]] = {}
        for p in m["partitions"].values():
            for path in p.get("paths") or [p["path"]]:
                snap_dir = path.split("/", 1)[0]
                by_snap.setdefault(snap_dir, []).append(os.path.join(self.root, path))
        dfs = [
            spark.read.option("basePath", os.path.join(self.root, s)).parquet(*ps)
            for s, ps in sorted(by_snap.items())
        ]
        return reduce(lambda a, b: a.unionByName(b), dfs)

    def done_partitions(self, snapshot: str | None = None) -> set[str]:
        m = self.manifest(snapshot)
        return set() if m is None else set(m["partitions"])

    def missing_partitions(self, planned: list[str]) -> list[str]:
        """Resume diff: which planned partition keys have no committed data."""
        done = self.done_partitions()
        return [p for p in map(str, planned) if p not in done]

    def drop_partitions(
        self,
        keys: list[str],
        job: str = "retention",
        metrics: dict | None = None,
        metrics_fn=None,
    ) -> str | None:
        """Commit a snapshot WITHOUT the named partitions — a pure
        metadata delete (the Iceberg expire shape). No data is read or
        rewritten: the new manifest simply stops referencing the dropped
        partitions' files, which remain in their ancestor snapshot dirs
        for time travel via ``read(snapshot=...)``. Returns the new
        snapshot id, or None if nothing matched (no empty commits)."""
        with self._commit_lock():
            parent = self.current_snapshot()
            m = self.manifest(parent)
            if m is None:
                return None
            drop = {str(k) for k in keys} & set(m["partitions"])
            if not drop:
                return None
            snap = self._claim_snapshot_id()
            # parent metrics carry forward (other writers' bookkeeping
            # must survive a retention commit); per-partition metric
            # maps — any dict keyed by partition keys, e.g.
            # input_fp_by_day — follow their partitions out
            carried = {}
            for k, v in (m.get("metrics") or {}).items():
                if isinstance(v, dict) and set(v) & drop:
                    carried[k] = {pk: pv for pk, pv in v.items() if pk not in drop}
                else:
                    carried[k] = v
            self._commit_manifest({
                "snapshot_id": snap,
                "parent": parent,
                "job": job,
                "partition_col": m.get("partition_col"),
                "partitions": {
                    pk: meta for pk, meta in m["partitions"].items() if pk not in drop
                },
                "metrics": {
                    **carried,
                    **(metrics or {}),
                    # metrics_fn sees the carried (= then-current, pruned)
                    # metrics UNDER the lock — for values whose merge rule
                    # must not race other writers (e.g. a monotone max)
                    **((metrics_fn(carried) if metrics_fn else {})),
                    "dropped_partitions": sorted(drop),
                },
            })
        return snap

    def commit_metrics(
        self, metrics: dict | None = None, job: str = "metadata", metrics_fn=None
    ) -> str:
        """Commit a METADATA-ONLY snapshot: partitions unchanged (or
        empty if the table has none yet), only the metrics map updated.
        Needed when durable bookkeeping must advance without any data
        motion — e.g. a retention cutoff that found nothing to drop but
        must still fence future refreshes from resurrecting expired days
        (expire-before-first-refresh, or the cutoff sweeping past days
        that were never committed). ``metrics_fn`` (current-metrics →
        dict) is evaluated UNDER the commit lock for merge rules that
        must not race concurrent writers (a monotone max, a counter)."""
        with self._commit_lock():
            parent = self.current_snapshot()
            m = self.manifest(parent) or {
                "partition_col": None,
                "partitions": {},
                "metrics": {},
            }
            cur = m.get("metrics") or {}
            snap = self._claim_snapshot_id()
            self._commit_manifest({
                "snapshot_id": snap,
                "parent": parent,
                "job": job,
                "partition_col": m.get("partition_col"),
                "partitions": m["partitions"],
                "metrics": {
                    **cur,
                    **(metrics or {}),
                    **((metrics_fn(cur) if metrics_fn else {})),
                },
            })
        return snap

    def gc_stale_staging(self, max_age_seconds: float = 24 * 3600) -> list[str]:
        """Remove ``.stage-*`` directories older than ``max_age_seconds``
        — the data a writer staged but never committed (killed between
        the parquet write and the commit lock). Committed snapshots are
        never touched: commit RENAMES the stage dir away, so anything
        still named ``.stage-*`` is by construction unreferenced. The
        age guard keeps a live writer's in-flight staging safe (pass 0
        only when no writer can be running); age is judged by the NEWEST
        mtime anywhere under the stage tree, not the root dir's — Spark
        creates partition subdirs early and keeps writing parts under
        them, so a single parquet write legitimately running longer
        than ``max_age_seconds`` would look stale by root mtime alone
        and be reaped mid-write. Returns removed paths."""
        import shutil
        import time

        def newest_mtime(path: str) -> float:
            newest = os.path.getmtime(path)
            for dirpath, dirnames, filenames in os.walk(path):
                for n in dirnames + filenames:
                    try:
                        newest = max(
                            newest, os.path.getmtime(os.path.join(dirpath, n))
                        )
                    except FileNotFoundError:
                        pass  # writer/GC raced us mid-walk
            return newest

        removed = []
        now = time.time()
        for name in os.listdir(self.root):
            if not name.startswith(".stage-"):
                continue
            p = os.path.join(self.root, name)
            try:
                if now - newest_mtime(p) >= max_age_seconds:
                    shutil.rmtree(p)
                    removed.append(p)
            except FileNotFoundError:
                pass  # another GC raced us — already gone
        return removed

    def lineage(self) -> list[dict]:
        """Snapshot chain, newest first."""
        out, cur = [], self.current_snapshot()
        while cur:
            m = self.manifest(cur)
            if m is None:
                break
            out.append(m)
            cur = m.get("parent")
        return out
