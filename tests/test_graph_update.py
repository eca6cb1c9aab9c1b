"""SPARQL-Update-style mutation over the snapshot store: atomicity,
time travel of the pre-update graph, literal-object deletion, insert
dedup, and the one-binding-pass modify semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

pytestmark = pytest.mark.spark

from jsonld_ex_spark.operators.graph_update import (
    delete_insert,
    delete_where,
    insert_data,
)
from jsonld_ex_spark.sources.snapshot_table import (
    current_snapshot_id,
    read_snapshot,
    write_triples_snapshot,
)
from tests.spark_fixtures import spark  # noqa: F401

_SCHEMA = (
    "subj string, pred string, obj string, obj_is_iri boolean, "
    "obj_dt string, obj_lang string, graph string"
)


def _seed(spark):  # noqa: F811
    rows = [
        ("urn:t1", "urn:role", "tool", False, None, None, None),
        ("urn:t1", "urn:tool", "kb_search", False, None, None, None),
        ("urn:t2", "urn:role", "user", False, None, None, None),
        ("urn:t2", "urn:mentions", "urn:e1", True, None, None, None),
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def _triples(spark, tdir, snapshot_id=None):  # noqa: F811
    return sorted(
        tuple(r)
        for r in read_snapshot(spark, tdir, snapshot_id)
        .select("subj", "pred", "obj")
        .collect()
    )


def test_delete_where_removes_literal_object_triples(spark, tmp_path):  # noqa: F811
    t = str(tmp_path / "tbl")
    write_triples_snapshot(_seed(spark), t, "append")
    snap = delete_where(spark, t, [("?turn", "<urn:tool>", "?tn")])
    assert snap == 2 and current_snapshot_id(t) == 2
    got = _triples(spark, t)
    assert ("urn:t1", "urn:tool", "kb_search") not in got
    assert len(got) == 3
    # time travel: the pre-update snapshot still holds the tool triple
    assert ("urn:t1", "urn:tool", "kb_search") in _triples(spark, t, 1)


def test_delete_insert_modify_is_one_atomic_commit(spark, tmp_path):  # noqa: F811
    t = str(tmp_path / "tbl")
    write_triples_snapshot(_seed(spark), t, "append")
    delete_insert(
        spark, t,
        delete_template=[("?turn", "<urn:tool>", "?tn")],
        insert_template=[("?turn", "<urn:redacted>", '"true"')],
        where=[("?turn", "<urn:tool>", "?tn")],
    )
    got = _triples(spark, t)
    assert ("urn:t1", "urn:redacted", "true") in got
    assert ("urn:t1", "urn:tool", "kb_search") not in got
    assert current_snapshot_id(t) == 2  # delete+insert = ONE commit
    # the inserted marker is a plain literal
    row = (
        read_snapshot(spark, t)
        .filter("pred = 'urn:redacted'")
        .select("obj_is_iri")
        .first()
    )
    assert row["obj_is_iri"] is False


def test_insert_dedups_against_surviving_graph(spark, tmp_path):  # noqa: F811
    t = str(tmp_path / "tbl")
    write_triples_snapshot(_seed(spark), t, "append")
    # insert a triple that already exists: the graph is a set
    delete_insert(
        spark, t,
        delete_template=[],
        insert_template=[("?turn", "<urn:role>", '"user"')],
        where=[("?turn", "<urn:role>", '"user"')],
    )
    got = _triples(spark, t)
    assert got.count(("urn:t2", "urn:role", "user")) == 1
    assert len(got) == 4  # nothing added, nothing removed


def test_insert_data_appends_without_rewrite(spark, tmp_path):  # noqa: F811
    t = str(tmp_path / "tbl")
    write_triples_snapshot(_seed(spark), t, "append")
    new = spark.createDataFrame(
        [("urn:t3", "urn:role", "assistant", False, None, None, None)], _SCHEMA
    )
    insert_data(new, t)
    assert len(_triples(spark, t)) == 5
    assert len(_triples(spark, t, 1)) == 4


def test_no_op_modify_rejected(spark, tmp_path):  # noqa: F811
    t = str(tmp_path / "tbl")
    write_triples_snapshot(_seed(spark), t, "append")
    with pytest.raises(ValueError, match="no-op"):
        delete_insert(spark, t, [], [], [("?s", "<urn:role>", "?r")])


def test_concurrent_commit_conflict_detected(spark, tmp_path):  # noqa: F811
    """Round-5 review: a read-modify-write update whose base snapshot
    was advanced by a concurrent committer must raise
    SnapshotConflictError, never silently clobber the other commit
    (lost update)."""
    from jsonld_ex_spark.sources.snapshot_table import (
        SnapshotConflictError,
        commit_snapshot,
    )

    t = str(tmp_path / "tbl")
    write_triples_snapshot(_seed(spark), t, "append")   # v1
    # writer A reads v1 ... meanwhile writer B lands v2
    base = read_snapshot(spark, t)
    commit_snapshot(
        spark.createDataFrame(
            [("urn:t9", "urn:role", "user", False, None, None, None)], _SCHEMA
        ),
        t, "append",
    )
    with pytest.raises(SnapshotConflictError, match="concurrent commit"):
        commit_snapshot(base, t, "overwrite", require_parent=1)
    # B's commit survives untouched
    assert ("urn:t9", "urn:role", "user") in _triples(spark, t)


def test_update_rejects_quads_and_bare_var_insert_objects(spark, tmp_path):  # noqa: F811
    t = str(tmp_path / "tbl")
    write_triples_snapshot(_seed(spark), t, "append")
    with pytest.raises(ValueError, match="TRIPLE patterns only"):
        delete_where(spark, t, [("?s", "<urn:p>", "?o", "?g")])
    with pytest.raises(ValueError, match="bare variable"):
        delete_insert(
            spark, t,
            delete_template=[],
            insert_template=[("?turn", "<urn:backup>", "?tn")],
            where=[("?turn", "<urn:tool>", "?tn")],
        )


def test_where_refinements_filter_the_mutation(spark, tmp_path):  # noqa: F811
    """DELETE WHERE with FILTER + NOT EXISTS: only bindings surviving
    the refinements are deleted — the everyday SPARQL Update shape."""
    t = str(tmp_path / "tbl")
    rows = [
        ("urn:t1", "urn:idx", "3", False, None, None, None),
        ("urn:t2", "urn:idx", "9", False, None, None, None),
        ("urn:t3", "urn:idx", "12", False, None, None, None),
        ("urn:t3", "urn:tool", "kb", False, None, None, None),
    ]
    write_triples_snapshot(spark.createDataFrame(rows, _SCHEMA), t, "append")
    # delete idx triples of turns with idx > 5 that have NO tool: only t2
    delete_insert(
        spark, t,
        delete_template=[("?turn", "<urn:idx>", "?i")],
        insert_template=[],
        where=[("?turn", "<urn:idx>", "?i")],
        filters=[("i", "gt", 5)],
        not_exists=[[("?turn", "<urn:tool>", "?tn")]],
    )
    got = _triples(spark, t)
    assert ("urn:t2", "urn:idx", "9") not in got
    assert ("urn:t1", "urn:idx", "3") in got     # fails the filter
    assert ("urn:t3", "urn:idx", "12") in got    # has a tool (NOT EXISTS fails)
