"""Snapshot-table commit protocol: atomicity, isolation, time travel,
concurrency — the Iceberg-semantics substitute (sources/snapshot_table
docstring explains the explicit re-scope)."""

from __future__ import annotations

import json
import os

import pytest

from jsonld_ex_spark.sources.snapshot_table import (
    commit_snapshot,
    current_snapshot_id,
    read_snapshot,
    snapshots,
)
from tests.spark_fixtures import spark  # noqa: F401


def _df(spark, lo, hi):  # noqa: F811
    return spark.range(lo, hi).selectExpr("id", "id * 10 AS v")


def test_append_composes_and_time_travel(spark, tmp_path):  # noqa: F811
    t = str(tmp_path / "tbl")
    s1 = commit_snapshot(_df(spark, 0, 5), t, "append")
    s2 = commit_snapshot(_df(spark, 5, 8), t, "append")
    assert (s1, s2) == (1, 2)
    assert current_snapshot_id(t) == 2
    # CURRENT sees both commits
    assert sorted(r["id"] for r in read_snapshot(spark, t).collect()) == list(range(8))
    # time travel: snapshot 1 still readable, sees only the first commit
    assert sorted(r["id"] for r in read_snapshot(spark, t, 1).collect()) == list(range(5))
    ops = [m["operation"] for m in snapshots(t)]
    assert ops == ["append", "append"]


def test_overwrite_is_metadata_only(spark, tmp_path):  # noqa: F811
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 5), t, "append")
    commit_snapshot(_df(spark, 100, 103), t, "overwrite")
    assert sorted(r["id"] for r in read_snapshot(spark, t).collect()) == [100, 101, 102]
    # the pre-overwrite snapshot remains readable (no data deleted)
    assert sorted(r["id"] for r in read_snapshot(spark, t, 1).collect()) == list(range(5))


def test_orphan_data_invisible_until_manifest(spark, tmp_path):  # noqa: F811
    """A writer that dies after writing data files but BEFORE the
    manifest commit must leave the table state unchanged."""
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 3), t, "append")
    # simulate the crash: data directory written, no manifest
    _df(spark, 50, 60).write.parquet(os.path.join(t, "data", "orphan"))
    assert current_snapshot_id(t) == 1
    assert sorted(r["id"] for r in read_snapshot(spark, t).collect()) == [0, 1, 2]


def test_commit_race_yields_distinct_versions(spark, tmp_path):  # noqa: F811
    """O_EXCL version claiming: a committer that loses the race retries
    on the new parent — simulate by pre-claiming v2 with a manifest
    that appends a foreign file list."""
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 3), t, "append")
    # a 'concurrent' committer claims v2 first
    race = commit_snapshot(_df(spark, 10, 12), t, "append")
    assert race == 2
    # our commit must land as v3 and include ALL prior files
    mine = commit_snapshot(_df(spark, 20, 22), t, "append")
    assert mine == 3
    assert sorted(r["id"] for r in read_snapshot(spark, t).collect()) == [
        0, 1, 2, 10, 11, 20, 21,
    ]
    m3 = json.load(open(os.path.join(t, "manifests", "v00003.json")))
    assert len(m3["files"]) == 3 and m3["parent"] == 2


def test_empty_table_and_bad_operation(spark, tmp_path):  # noqa: F811
    t = str(tmp_path / "tbl")
    with pytest.raises(ValueError, match="no committed snapshot"):
        read_snapshot(spark, t)
    with pytest.raises(ValueError, match="unknown operation"):
        commit_snapshot(_df(spark, 0, 1), t, "merge")


def test_expire_and_orphan_gc(spark, tmp_path):  # noqa: F811
    from jsonld_ex_spark.sources.snapshot_table import expire_snapshots

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 3), t, "append")
    commit_snapshot(_df(spark, 3, 6), t, "append")
    commit_snapshot(_df(spark, 6, 9), t, "append")
    # a crashed-writer orphan, old enough to collect
    _df(spark, 90, 95).write.parquet(os.path.join(t, "data", "orphan"))
    os.utime(os.path.join(t, "data", "orphan"), (0, 0))
    rep = expire_snapshots(t, keep_last=2, min_orphan_age_s=60)
    assert rep["expired_snapshots"] == [1]
    assert rep["kept"] == [2, 3]
    # v1's FIRST data dir is still referenced by v2/v3 manifests (append
    # keeps parents' files), so only the orphan is collectable
    assert rep["removed_data_dirs"] == [os.path.join("data", "orphan")]
    # current + kept history readable; expired id raises
    assert sorted(r["id"] for r in read_snapshot(spark, t).collect()) == list(range(9))
    assert sorted(r["id"] for r in read_snapshot(spark, t, 2).collect()) == list(range(6))
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, t, 1)
    assert [m["snapshot_id"] for m in snapshots(t)] == [2, 3]


def test_compact_then_expire_reclaims_files(spark, tmp_path):  # noqa: F811
    from jsonld_ex_spark.sources.snapshot_table import (
        compact_snapshot,
        expire_snapshots,
    )

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 4), t, "append")
    commit_snapshot(_df(spark, 4, 8), t, "append")
    snap = compact_snapshot(spark, t)
    assert snap == 3
    # compacted snapshot has ONE data dir and the full content
    m3 = json.load(open(os.path.join(t, "manifests", "v00003.json")))
    assert len(m3["files"]) == 1
    assert sorted(r["id"] for r in read_snapshot(spark, t).collect()) == list(range(8))
    rep = expire_snapshots(t, keep_last=1, min_orphan_age_s=0)
    assert rep["expired_snapshots"] == [1, 2]
    # the two pre-compaction data dirs are unreferenced now -> collected
    assert len(rep["removed_data_dirs"]) == 2
    assert sorted(r["id"] for r in read_snapshot(spark, t).collect()) == list(range(8))


def test_crashed_claim_rolls_forward_instead_of_wedging(spark, tmp_path):  # noqa: F811
    """Round-5 advice (medium): a writer that crashed AFTER the O_EXCL
    manifest claim but BEFORE the CURRENT pointer swap must not wedge
    the table — the next committer builds on the highest CLAIMED
    manifest and its successful swap rolls CURRENT past the orphan."""
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 5), t, "append")        # v1, CURRENT=1
    commit_snapshot(_df(spark, 5, 8), t, "append")        # v2, CURRENT=2
    # simulate the crash: CURRENT never swapped to 2
    with open(os.path.join(t, "CURRENT"), "w") as f:
        f.write("1")
    assert current_snapshot_id(t) == 1
    # the old protocol would collide on v2 for every retry and raise;
    # the fix claims v3 with parent=2 (keeping v2's files) and swaps
    s3 = commit_snapshot(_df(spark, 8, 10), t, "append")
    assert s3 == 3
    assert current_snapshot_id(t) == 3
    got = sorted(r["id"] for r in read_snapshot(spark, t).collect())
    assert got == list(range(10))  # v1 + crashed v2 + v3 data all visible
    assert json.loads(open(os.path.join(t, "manifests", "v00003.json")).read())["parent"] == 2


def test_expire_never_drops_current_despite_claimed_head(spark, tmp_path):  # noqa: F811
    """Round-5 review: with a crashed claimed-but-unswapped head (v3
    claimed, CURRENT=2), expire_snapshots(keep_last=1) must still keep
    the CURRENT snapshot readable — the keep window anchored at the
    claimed head would otherwise expire CURRENT's manifest."""
    from jsonld_ex_spark.sources.snapshot_table import expire_snapshots

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 5), t, "append")     # v1
    commit_snapshot(_df(spark, 5, 8), t, "append")     # v2, CURRENT=2
    commit_snapshot(_df(spark, 8, 9), t, "append")     # v3
    with open(os.path.join(t, "CURRENT"), "w") as f:
        f.write("2")  # simulate crash before the v3 pointer swap
    out = expire_snapshots(t, keep_last=1, min_orphan_age_s=0.0)
    assert 2 not in out["expired_snapshots"]
    # default read (CURRENT=2) still works and sees v1+v2 data
    got = sorted(r["id"] for r in read_snapshot(spark, t).collect())
    assert got == list(range(8))
    # the claimed head also survives (a future commit builds on it)
    assert 3 in out["kept"] and 2 in out["kept"]


def test_manifest_claim_is_atomic_no_temp_left(spark, tmp_path):  # noqa: F811
    """The claim is tmp-write + fsync + os.link: a committed table has
    fully-written manifests only and no .claim temp residue."""
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 3), t, "append")
    commit_snapshot(_df(spark, 3, 5), t, "append")
    names = os.listdir(os.path.join(t, "manifests"))
    assert sorted(names) == ["v00001.json", "v00002.json"]
    for n in names:
        json.load(open(os.path.join(t, "manifests", n)))  # parseable


def test_expire_reclaims_crashed_temp_residue(spark, tmp_path):  # noqa: F811
    """Crashed writers' .claim.*.tmp / CURRENT.*.tmp residue is GC'd by
    expire_snapshots (age-guarded), so long-lived tables don't
    accumulate unbounded orphan temps."""
    from jsonld_ex_spark.sources.snapshot_table import expire_snapshots

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 3), t, "append")
    stale_claim = os.path.join(t, "manifests", ".claim.deadbeef.tmp")
    stale_cur = os.path.join(t, "CURRENT.deadbeef.tmp")
    open(stale_claim, "w").write("{}")
    open(stale_cur, "w").write("1")
    # young temps survive (possibly an in-flight commit)
    expire_snapshots(t, keep_last=1, min_orphan_age_s=3600.0)
    assert os.path.exists(stale_claim) and os.path.exists(stale_cur)
    expire_snapshots(t, keep_last=1, min_orphan_age_s=0.0)
    assert not os.path.exists(stale_claim) and not os.path.exists(stale_cur)
    # the table itself is untouched
    assert sorted(r["id"] for r in read_snapshot(spark, t).collect()) == [0, 1, 2]


def test_stalled_committer_does_not_regress_current(spark, tmp_path, monkeypatch):  # noqa: F811
    """Round-5 review: a committer that stalls between its manifest
    claim and the CURRENT swap must not move CURRENT BACKWARD past a
    newer committed snapshot.  Simulated by making the guard's
    CURRENT read observe a concurrent advance (the parent derivation,
    which runs before the claim, sees the real value)."""
    from jsonld_ex_spark.sources import snapshot_table as st

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 3), t, "append")  # v1, CURRENT=1
    real = st.current_snapshot_id

    def observed_advance(table_dir):
        # after OUR claim of v2 exists, pretend a faster committer
        # already swapped CURRENT to a later snapshot
        if os.path.exists(os.path.join(table_dir, "manifests", "v00002.json")):
            return 5
        return real(table_dir)

    monkeypatch.setattr(st, "current_snapshot_id", observed_advance)
    snap = commit_snapshot(_df(spark, 3, 6), t, "append")
    monkeypatch.setattr(st, "current_snapshot_id", real)
    assert snap == 2  # the snapshot itself committed (manifest exists)
    # ...but the stalled swap was skipped: CURRENT not regressed, no temp residue
    assert open(os.path.join(t, "CURRENT")).read().strip() == "1"
    assert not [n for n in os.listdir(t) if n.startswith("CURRENT.")]
    # the next commit heals: builds on the claimed head and rolls CURRENT forward
    s3 = commit_snapshot(_df(spark, 6, 8), t, "append")
    assert s3 == 3 and current_snapshot_id(t) == 3
    assert sorted(r["id"] for r in read_snapshot(spark, t).collect()) == list(range(8))


def test_compact_conflicts_with_concurrent_append(spark, tmp_path, monkeypatch):  # noqa: F811
    """Round-5 review: compaction is read-modify-write — an append that
    lands between compaction's pinned read and its overwrite commit
    must raise SnapshotConflictError, never be silently dropped."""
    from jsonld_ex_spark.sources import snapshot_table as st
    from jsonld_ex_spark.sources.snapshot_table import (
        SnapshotConflictError,
        compact_snapshot,
    )

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 4), t, "append")  # v1
    real_read = st.read_snapshot

    def read_then_concurrent_append(spark_, table_dir, snapshot_id=None):
        df = real_read(spark_, table_dir, snapshot_id)
        commit_snapshot(_df(spark_, 100, 102), table_dir, "append")  # v2 lands mid-compaction
        return df

    monkeypatch.setattr(st, "read_snapshot", read_then_concurrent_append)
    with pytest.raises(SnapshotConflictError):
        compact_snapshot(spark, t)
    monkeypatch.setattr(st, "read_snapshot", real_read)
    # the concurrent append survived; nothing was lost
    assert current_snapshot_id(t) == 2
    assert sorted(r["id"] for r in read_snapshot(spark, t).collect()) == [
        0, 1, 2, 3, 100, 101,
    ]
    # a clean retry compacts BOTH commits into one data dir
    snap = compact_snapshot(spark, t)
    m = json.load(open(os.path.join(t, "manifests", f"v{snap:05d}.json")))
    assert len(m["files"]) == 1
    assert sorted(r["id"] for r in read_snapshot(spark, t).collect()) == [
        0, 1, 2, 3, 100, 101,
    ]
