"""Manifest-based SNAPSHOT TABLE over parquet: the Iceberg table
semantics the triple sink needs — atomic commits, snapshot isolation,
time travel, append/overwrite — on plain files.

WHY THIS EXISTS (explicit re-scope of SURVEY.md §2.2's Iceberg sink,
round-4): the sandbox cannot execute the real Iceberg path — the image
ships no iceberg-spark-runtime jar, has no ~/.ivy2 / ~/.m2 cache, and
has no network (maven.org DNS resolution fails, curl exit 6 — verified
rounds 2-4), so `write_triples_iceberg` (operators/triples.py) stays a
classpath-probed dormant path.  This module implements the SEMANTICS
the north star wants from Iceberg, with the same commit protocol shape
Iceberg itself uses (write data files invisibly, then an atomic
metadata swap):

* data files land under ``data/<commit-uuid>/`` — INVISIBLE to readers
  until a manifest references them (a writer that dies mid-write leaves
  only orphans; readers never see partial commits);
* a manifest (``manifests/v{N}.json``) lists the data directories that
  make up snapshot N; it is created with O_EXCL (``open(..., "x")``)
  so two concurrent committers CANNOT both claim version N — the loser
  gets FileExistsError and retries on the new parent (optimistic
  concurrency, exactly Iceberg's commit model);
* ``CURRENT`` is a write-temp + ``os.rename`` atomic pointer — readers
  see the old or the new snapshot, never a torn state;
* ``read_snapshot(..., snapshot_id=k)`` is time travel: any committed
  snapshot stays readable until explicitly expired;
* append = parent's file list + the new directory; overwrite = just
  the new directory (the parent snapshot remains readable — overwrite
  is a metadata operation, not a delete).

At 100 TB the manifest lists thousands of directories, not billions of
rows — commit cost is O(1) in data size; the subject-bucketed layout
inside each data directory is identical to write_triples, so scan-side
pruning/pushdown behaves the same.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "manifests"
_DATA_DIR = "data"
_CURRENT = "CURRENT"


class SnapshotConflictError(RuntimeError):
    """A commit that REQUIRED a specific parent lost to a concurrent
    committer: the table advanced past the snapshot the caller's
    read-modify-write was derived from.  Blindly retrying would
    clobber the concurrent commit (lost update) — the caller must
    re-read CURRENT and re-derive the change (Iceberg's validation-
    conflict model)."""


def _manifest_path(table_dir: str, snapshot_id: int) -> str:
    return os.path.join(table_dir, _MANIFEST_DIR, f"v{snapshot_id:05d}.json")


def current_snapshot_id(table_dir: str) -> int:
    """0 = empty table (no committed snapshot)."""
    try:
        with open(os.path.join(table_dir, _CURRENT)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return 0


def _read_manifest(table_dir: str, snapshot_id: int) -> dict:
    with open(_manifest_path(table_dir, snapshot_id)) as f:
        return json.load(f)


def _max_claimed_id(table_dir: str) -> int:
    """Highest version any writer has CLAIMED (manifest file exists),
    whether or not CURRENT was swapped to it.  A writer that crashed
    between the O_EXCL claim and the pointer swap leaves a fully-valid
    manifest (its data directories were written before the claim) with
    a stale CURRENT; committing against CURRENT alone would collide on
    that claimed id forever (round-5 advice: liveness gap)."""
    best = 0
    try:
        names = os.listdir(os.path.join(table_dir, _MANIFEST_DIR))
    except FileNotFoundError:
        return 0
    for name in names:
        if name.startswith("v") and name.endswith(".json"):
            try:
                best = max(best, int(name[1:-5]))
            except ValueError:
                continue
    return best


def snapshots(table_dir: str) -> list[dict]:
    """Commit history, oldest first (ids contiguous from 1; expired
    snapshots are skipped)."""
    out = []
    for i in range(1, current_snapshot_id(table_dir) + 1):
        try:
            out.append(_read_manifest(table_dir, i))
        except FileNotFoundError:
            continue  # expired
    return out


def commit_snapshot(
    df: DataFrame,
    table_dir: str,
    operation: str = "append",
    max_retries: int = 10,
    require_parent: int | None = None,
) -> int:
    """Write ``df`` as a new snapshot and atomically commit it.

    Returns the committed snapshot id.  ``operation``: "append" keeps
    the parent snapshot's data files; "overwrite" replaces them (in
    metadata only — prior snapshots stay readable).  Safe under
    concurrent committers: version claiming is O_EXCL, so exactly one
    writer wins each id and the loser retries on the new parent.

    Crash liveness: the parent is the highest CLAIMED manifest, not
    just CURRENT — a writer that died between its O_EXCL claim and the
    pointer swap left a valid manifest that later committers build on
    (and the next successful swap rolls CURRENT past it), instead of
    colliding on the orphaned version forever.  Losers back off
    (linear + jitter) so a live concurrent committer cannot burn every
    retry inside the winner's claim→swap window.

    ``require_parent``: optimistic-concurrency validation for
    READ-MODIFY-WRITE commits (SPARQL Update's overwrite of "current
    minus deleted plus inserted"): raise :class:`SnapshotConflictError`
    instead of retrying when the observed parent differs — a blind
    retry would commit state derived from a stale snapshot and
    silently discard the concurrent commit (lost update).  Plain
    appends (INSERT DATA) need no validation and keep the retry loop."""
    import random
    import time as _time

    if operation not in ("append", "overwrite"):
        raise ValueError(f"unknown operation {operation!r}")
    os.makedirs(os.path.join(table_dir, _MANIFEST_DIR), exist_ok=True)
    data_rel = os.path.join(_DATA_DIR, uuid.uuid4().hex)
    df.write.mode("overwrite").parquet(os.path.join(table_dir, data_rel))
    for attempt in range(max_retries):
        if attempt:
            _time.sleep(0.02 * attempt + random.uniform(0, 0.02))
        parent = max(current_snapshot_id(table_dir), _max_claimed_id(table_dir))
        if require_parent is not None and parent != require_parent:
            raise SnapshotConflictError(
                f"commit requires parent snapshot {require_parent} but the "
                f"table is at {parent}: a concurrent commit landed — re-read "
                "and re-derive the update"
            )
        files = []
        if operation == "append" and parent:
            files = list(_read_manifest(table_dir, parent)["files"])
        files.append(data_rel)
        snap = parent + 1
        manifest = {
            "snapshot_id": snap,
            "parent": parent,
            "operation": operation,
            "files": files,
        }
        # atomic claim: write the manifest COMPLETE to a temp file, then
        # os.link it into place — link(2) fails with EEXIST if another
        # committer claimed the version, and a process crash at any
        # point leaves either no claim or a fully-written one, never a
        # torn JSON that would brick every later _read_manifest
        # (round-5 review: the previous open('x') + json.dump exposed a
        # mid-write window).  Directory fsyncs after the link and the
        # CURRENT swap make the claim/pointer durable against POWER
        # loss too, not just process death; temp residue from crashes
        # is reclaimed by expire_snapshots.
        mtmp = os.path.join(
            table_dir, _MANIFEST_DIR, f".claim.{uuid.uuid4().hex}.tmp"
        )
        try:
            with open(mtmp, "w") as f:
                json.dump(manifest, f)
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(mtmp, _manifest_path(table_dir, snap))
            except FileExistsError:
                continue  # lost the race — re-read parent and retry
        finally:
            try:
                os.unlink(mtmp)
            except FileNotFoundError:
                pass
        _fsync_dir(os.path.join(table_dir, _MANIFEST_DIR))
        tmp = os.path.join(table_dir, f"{_CURRENT}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            f.write(str(snap))
            f.flush()
            os.fsync(f.fileno())
        # only-advance guard: a committer that stalled between its claim
        # and this swap must not regress CURRENT past a newer committed
        # snapshot (the check-then-replace window is best-effort — a
        # regression slipping through is healed by the next commit's
        # max-claimed roll-forward, and validated commits pin their
        # reads to the max-claimed parent, not CURRENT)
        if current_snapshot_id(table_dir) < snap:
            os.replace(tmp, os.path.join(table_dir, _CURRENT))  # atomic swap
            _fsync_dir(table_dir)
        else:
            os.unlink(tmp)
        return snap
    raise RuntimeError(f"lost {max_retries} commit races on {table_dir!r}")


def _fsync_dir(path: str) -> None:
    """fsync a DIRECTORY so a just-created/renamed entry survives power
    loss (dirent updates in different directories have no ordering
    guarantee otherwise)."""
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def read_snapshot(
    spark: SparkSession, table_dir: str, snapshot_id: int | None = None
) -> DataFrame:
    """Scan a committed snapshot (default: CURRENT).  Orphan data
    directories from crashed writers are never read — only what a
    manifest references (snapshot isolation)."""
    snap = current_snapshot_id(table_dir) if snapshot_id is None else snapshot_id
    if snap < 1:
        raise ValueError(f"no committed snapshot in {table_dir!r}")
    m = _read_manifest(table_dir, snap)
    paths = [os.path.join(table_dir, rel) for rel in m["files"]]
    return spark.read.parquet(*paths)


def expire_snapshots(
    table_dir: str, keep_last: int = 1, min_orphan_age_s: float = 3600.0
) -> dict:
    """Iceberg-style maintenance: drop manifests older than the newest
    ``keep_last`` snapshots, then garbage-collect every data directory
    no SURVIVING manifest references — including crashed-writer
    orphans.  An unreferenced directory younger than
    ``min_orphan_age_s`` is kept: it may belong to an IN-FLIGHT commit
    whose manifest hasn't landed yet (the same age-threshold guard
    Iceberg's remove-orphan-files uses).  Time travel to an expired id
    raises; CURRENT and the kept history stay readable."""
    import shutil
    import time as _time

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    # claimed-but-unswapped manifests (crashed writer's head) count as
    # committed here: commit_snapshot builds on the highest CLAIMED id,
    # so GC'ing such a manifest's data while the manifest survives
    # would hand a future committer a parent referencing deleted dirs
    current = current_snapshot_id(table_dir)
    cur = max(current, _max_claimed_id(table_dir))
    keep = set(range(max(1, cur - keep_last + 1), cur + 1))
    # CURRENT must ALWAYS survive, even when a claimed-but-unswapped
    # head pushes the keep window past it (round-5 review: keep_last=1
    # with a crashed v5 claim would otherwise expire v4 — the snapshot
    # CURRENT still points at — and break every default read)
    if current >= 1:
        keep.add(current)
    live: set[str] = set()
    for i in keep:
        live |= set(_read_manifest(table_dir, i)["files"])
    expired: list[int] = []
    for i in range(1, cur + 1):
        if i in keep:
            continue
        try:
            os.remove(_manifest_path(table_dir, i))
            expired.append(i)
        except FileNotFoundError:
            continue  # already expired
    removed_dirs: list[str] = []
    now = _time.time()
    # reclaim crashed writers' temp residue (.claim.*.tmp in manifests/,
    # CURRENT.*.tmp in the table root) — age-guarded like orphan data
    # dirs so an IN-FLIGHT commit's temps survive
    for d, prefix in (
        (os.path.join(table_dir, _MANIFEST_DIR), ".claim."),
        (table_dir, f"{_CURRENT}."),
    ):
        try:
            names = os.listdir(d)
        except FileNotFoundError:
            continue
        for name in names:
            full = os.path.join(d, name)
            if (
                name.startswith(prefix)
                and name.endswith(".tmp")
                and now - os.path.getmtime(full) >= min_orphan_age_s
            ):
                try:
                    os.unlink(full)
                except FileNotFoundError:
                    pass
    data_root = os.path.join(table_dir, _DATA_DIR)
    if os.path.isdir(data_root):
        for d in sorted(os.listdir(data_root)):
            rel = os.path.join(_DATA_DIR, d)
            full = os.path.join(data_root, d)
            if rel in live:
                continue
            if now - os.path.getmtime(full) < min_orphan_age_s:
                continue  # possibly an in-flight commit's data
            shutil.rmtree(full, ignore_errors=True)
            removed_dirs.append(rel)
    return {
        "expired_snapshots": expired,
        "removed_data_dirs": removed_dirs,
        "kept": sorted(keep),
    }


def compact_snapshot(spark: SparkSession, table_dir: str) -> int:
    """Rewrite the newest snapshot's (possibly many) data directories
    as ONE overwrite commit — the small-file compaction every
    append-heavy table needs.  Prior snapshots remain readable until
    expire_snapshots reclaims them.  Read-modify-write: the read is
    PINNED to the parent the commit validates (require_parent), so a
    concurrent append landing mid-compaction raises
    SnapshotConflictError instead of being silently dropped from the
    compacted overwrite (round-5 review)."""
    parent = max(current_snapshot_id(table_dir), _max_claimed_id(table_dir))
    return commit_snapshot(
        read_snapshot(spark, table_dir, snapshot_id=parent),
        table_dir, operation="overwrite", require_parent=parent,
    )


def write_triples_snapshot(
    triples: DataFrame, table_dir: str, operation: str = "append",
    n_buckets: int = 64, require_parent: int | None = None,
) -> int:
    """Triple-table snapshot sink: identical salted/subject-bucketed
    layout to operators.triples.write_triples, committed atomically."""
    from jsonld_ex_spark.operators.triples import bucket_clustered

    w = bucket_clustered(triples, n_buckets)
    return commit_snapshot(
        w, table_dir, operation=operation, require_parent=require_parent
    )
