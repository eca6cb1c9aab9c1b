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


def test_update_rejects_malformed_patterns(spark, tmp_path):  # noqa: F811
    t = str(tmp_path / "tbl")
    write_triples_snapshot(_seed(spark), t, "append")
    with pytest.raises(ValueError, match="triples or .* quads"):
        delete_where(spark, t, [("?s", "<urn:p>", "?o", "?g", "?x")])
    with pytest.raises(ValueError, match="graph term"):
        delete_where(spark, t, [("?s", "<urn:p>", "?o", '"lit"')])
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


# --- round-5 late: graph-scoped update + graph management -------------

def _graph_seed(spark):  # noqa: F811
    rows = [
        ("urn:d1", "urn:name", "alpha", False, None, None, "urn:g1"),
        ("urn:d1", "urn:chars", "5", False, None, None, "urn:g1"),
        ("urn:d2", "urn:name", "beta", False, None, None, "urn:g2"),
        ("urn:d2", "urn:chars", "4", False, None, None, "urn:g2"),
        ("urn:d3", "urn:name", "gamma", False, None, None, None),  # default
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def _quads(spark, tdir, snapshot_id=None):  # noqa: F811
    return sorted(
        (
            (r["subj"], r["pred"], r["obj"], r["graph"])
            for r in read_snapshot(spark, tdir, snapshot_id).collect()
        ),
        key=lambda q: tuple("" if v is None else v for v in q),
    )


def test_quad_delete_is_graph_exact(spark, tmp_path):  # noqa: F811
    """A quad DELETE template removes the triple from THAT graph only;
    the same lexical triple elsewhere (incl. the default graph)
    survives."""
    t = str(tmp_path / "tbl")
    seed = _graph_seed(spark).union(
        spark.createDataFrame(
            [("urn:d1", "urn:name", "alpha", False, None, None, "urn:g2"),
             ("urn:d1", "urn:name", "alpha", False, None, None, None)],
            _SCHEMA,
        )
    )
    write_triples_snapshot(seed, t, "append")
    delete_where(spark, t, [("?d", "<urn:name>", '"alpha"', "<urn:g1>")])
    got = _quads(spark, t)
    assert ("urn:d1", "urn:name", "alpha", "urn:g1") not in got
    assert ("urn:d1", "urn:name", "alpha", "urn:g2") in got
    assert ("urn:d1", "urn:name", "alpha", None) in got


def test_with_graph_scopes_templates_and_where(spark, tmp_path):  # noqa: F811
    """WITH <g1>: triple patterns bind/delete/insert inside g1 only —
    g2's chars triple survives and the marker lands IN g1."""
    t = str(tmp_path / "tbl")
    write_triples_snapshot(_graph_seed(spark), t, "append")
    delete_insert(
        spark, t,
        delete_template=[("?d", "<urn:chars>", "?c")],
        insert_template=[("?d", "<urn:redacted>", '"true"')],
        where=[("?d", "<urn:chars>", "?c")],
        with_graph="urn:g1",
    )
    got = _quads(spark, t)
    assert ("urn:d1", "urn:chars", "5", "urn:g1") not in got
    assert ("urn:d2", "urn:chars", "4", "urn:g2") in got
    assert ("urn:d1", "urn:redacted", "true", "urn:g1") in got


def test_insert_dedup_is_graph_exact(spark, tmp_path):  # noqa: F811
    """Inserting a triple into a SECOND graph must not be suppressed by
    its presence in the first (null-safe graph-exact dedup), and
    re-inserting into the same graph is a no-op."""
    t = str(tmp_path / "tbl")
    write_triples_snapshot(_graph_seed(spark), t, "append")
    delete_insert(
        spark, t,
        delete_template=[],
        insert_template=[("?d", "<urn:name>", '"alpha"', "<urn:g2>"),
                         ("?d", "<urn:name>", '"alpha"', "<urn:g1>")],
        where=[("?d", "<urn:name>", '"alpha"', "<urn:g1>")],
    )
    got = _quads(spark, t)
    assert ("urn:d1", "urn:name", "alpha", "urn:g2") in got
    assert got.count(("urn:d1", "urn:name", "alpha", "urn:g1")) == 1


def test_quad_where_binds_graph_variable_into_insert(spark, tmp_path):  # noqa: F811
    """?g bound by a quad WHERE pattern instantiates a quad INSERT
    template — per-graph provenance markers in one pass."""
    t = str(tmp_path / "tbl")
    write_triples_snapshot(_graph_seed(spark), t, "append")
    delete_insert(
        spark, t,
        delete_template=[],
        insert_template=[("?d", "<urn:audited>", '"yes"', "?g")],
        where=[("?d", "<urn:name>", "?n", "?g")],
    )
    got = _quads(spark, t)
    assert ("urn:d1", "urn:audited", "yes", "urn:g1") in got
    assert ("urn:d2", "urn:audited", "yes", "urn:g2") in got
    # default-graph d3 has no named graph: ?g unbound there → no marker
    assert not any(s == "urn:d3" and p == "urn:audited" for s, p, _o, _g in got)


def test_clear_add_copy_move_graph(spark, tmp_path):  # noqa: F811
    from jsonld_ex_spark.operators.graph_update import (
        add_graph,
        clear_graph,
        copy_graph,
        move_graph,
    )

    t = str(tmp_path / "tbl")
    write_triples_snapshot(_graph_seed(spark), t, "append")
    # COPY g1 TO arch: arch := g1, g1 intact
    copy_graph(spark, t, "urn:g1", "urn:arch")
    got = _quads(spark, t)
    assert ("urn:d1", "urn:name", "alpha", "urn:arch") in got
    assert ("urn:d1", "urn:name", "alpha", "urn:g1") in got
    # ADD g2 TO arch: union (g2 intact)
    add_graph(spark, t, "urn:g2", "urn:arch")
    got = _quads(spark, t)
    assert ("urn:d2", "urn:name", "beta", "urn:arch") in got
    assert ("urn:d2", "urn:name", "beta", "urn:g2") in got
    # ADD again: set semantics, no duplicates
    add_graph(spark, t, "urn:g2", "urn:arch")
    got = _quads(spark, t)
    assert got.count(("urn:d2", "urn:name", "beta", "urn:arch")) == 1
    # MOVE arch TO g9: arch gone, content in g9
    move_graph(spark, t, "urn:arch", "urn:g9")
    got = _quads(spark, t)
    assert not any(g == "urn:arch" for *_x, g in got)
    assert ("urn:d1", "urn:name", "alpha", "urn:g9") in got
    # COPY default TO g9 replaces g9 with the default graph's content
    copy_graph(spark, t, None, "urn:g9")
    got = _quads(spark, t)
    assert ("urn:d3", "urn:name", "gamma", "urn:g9") in got
    assert ("urn:d1", "urn:name", "alpha", "urn:g9") not in got
    # CLEAR DEFAULT
    clear_graph(spark, t, None)
    got = _quads(spark, t)
    assert not any(g is None for *_x, g in got)
    # self-transfer no-op: MOVE g2 TO g2 must NOT clear g2
    before = current_snapshot_id(t)
    move_graph(spark, t, "urn:g2", "urn:g2")
    assert current_snapshot_id(t) == before
    assert ("urn:d2", "urn:name", "beta", "urn:g2") in _quads(spark, t)


XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
XSD_STR = "http://www.w3.org/2001/XMLSchema#string"
LANGSTR = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"


def _typed_seed(spark):  # noqa: F811
    # the same lexical '7' under three term identities, plus a tagged
    # vs plain 'hi' pair — the exact-term matching witnesses
    rows = [
        ("urn:d1", "urn:flag", "7", False, XSD_INT, None, None),
        ("urn:d1", "urn:flag", "7", False, XSD_STR, None, None),
        ("urn:d1", "urn:flag", "7", False, None, None, None),  # plain == xsd:string
        ("urn:d1", "urn:note", "hi", False, LANGSTR, "en", None),
        ("urn:d1", "urn:note", "hi", False, None, None, None),
        ("urn:d2", "urn:flag", "7", False, XSD_INT, None, "urn:g1"),
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def _terms(spark, tdir):  # noqa: F811
    return {
        tuple(r)
        for r in read_snapshot(spark, tdir)
        .select("subj", "pred", "obj", "obj_dt", "obj_lang", "graph")
        .collect()
    }


def test_delete_data_exact_typed_literal(spark, tmp_path):  # noqa: F811
    from jsonld_ex_spark.operators.graph_update import delete_data

    t = str(tmp_path / "tbl")
    write_triples_snapshot(_typed_seed(spark), t, "append")
    delete_data(spark, t, [("<urn:d1>", "<urn:flag>", f'"7"^^<{XSD_INT}>')])
    got = _terms(spark, t)
    # ONLY the default-graph xsd:integer '7' is gone; the xsd:string,
    # the dt-less plain (same term as xsd:string), and the named-graph
    # copy all survive
    assert ("urn:d1", "urn:flag", "7", XSD_INT, None, None) not in got
    assert ("urn:d1", "urn:flag", "7", XSD_STR, None, None) in got
    assert ("urn:d1", "urn:flag", "7", None, None, None) in got
    assert ("urn:d2", "urn:flag", "7", XSD_INT, None, "urn:g1") in got


def test_delete_data_plain_matches_both_string_conventions(spark, tmp_path):  # noqa: F811
    from jsonld_ex_spark.operators.graph_update import delete_data

    t = str(tmp_path / "tbl")
    write_triples_snapshot(_typed_seed(spark), t, "append")
    delete_data(spark, t, [("<urn:d1>", "<urn:flag>", '"7"')])
    got = _terms(spark, t)
    # plain literal IS xsd:string (RDF 1.1): both storage conventions
    # of that one term go; the xsd:integer term survives
    assert ("urn:d1", "urn:flag", "7", XSD_STR, None, None) not in got
    assert ("urn:d1", "urn:flag", "7", None, None, None) not in got
    assert ("urn:d1", "urn:flag", "7", XSD_INT, None, None) in got


def test_delete_data_lang_tag_and_quad_scope(spark, tmp_path):  # noqa: F811
    from jsonld_ex_spark.operators.graph_update import delete_data

    t = str(tmp_path / "tbl")
    write_triples_snapshot(_typed_seed(spark), t, "append")
    delete_data(
        spark, t,
        [
            ("<urn:d1>", "<urn:note>", '"hi"@en'),
            ("<urn:d2>", "<urn:flag>", f'"7"^^<{XSD_INT}>', "<urn:g1>"),
        ],
    )
    got = _terms(spark, t)
    assert ("urn:d1", "urn:note", "hi", LANGSTR, "en", None) not in got
    assert ("urn:d1", "urn:note", "hi", None, None, None) in got  # plain survives
    assert ("urn:d2", "urn:flag", "7", XSD_INT, None, "urn:g1") not in got
    # the ground quad names ITS graph only — default-graph '7's untouched
    assert ("urn:d1", "urn:flag", "7", XSD_INT, None, None) in got


def test_delete_data_validation(spark, tmp_path):  # noqa: F811
    from jsonld_ex_spark.operators.graph_update import delete_data

    t = str(tmp_path / "tbl")
    write_triples_snapshot(_typed_seed(spark), t, "append")
    with pytest.raises(ValueError, match="no triples"):
        delete_data(spark, t, [])
    with pytest.raises(ValueError, match="ground"):
        delete_data(spark, t, [("?s", "<urn:flag>", '"7"')])
    with pytest.raises(ValueError, match="ground"):
        delete_data(spark, t, [("<urn:d1>", "<urn:flag>", "?o")])


def test_exact_term_delete_template(spark, tmp_path):  # noqa: F811
    t = str(tmp_path / "tbl")
    write_triples_snapshot(_typed_seed(spark), t, "append")
    # DELETE { ?d urn:flag "7"^^xsd:integer } WHERE { ?d urn:flag ?x }:
    # exact-term deletion driven by WHERE bindings — removes the typed
    # term for EVERY matching subject (both graphs: triple templates
    # keep the module's every-graph scope), identical lexicals under
    # other datatypes survive
    delete_insert(
        spark, t,
        delete_template=[("?d", "<urn:flag>", f'"7"^^<{XSD_INT}>')],
        insert_template=[],
        where=[("?d", "<urn:flag>", "?x")],
    )
    got = _terms(spark, t)
    assert ("urn:d1", "urn:flag", "7", XSD_INT, None, None) not in got
    assert ("urn:d2", "urn:flag", "7", XSD_INT, None, "urn:g1") not in got
    assert ("urn:d1", "urn:flag", "7", XSD_STR, None, None) in got
    assert ("urn:d1", "urn:flag", "7", None, None, None) in got


def test_exact_term_insert_template_carries_datatype(spark, tmp_path):  # noqa: F811
    t = str(tmp_path / "tbl")
    write_triples_snapshot(_typed_seed(spark), t, "append")
    delete_insert(
        spark, t,
        delete_template=[],
        insert_template=[
            ("?d", "<urn:level>", f'"9"^^<{XSD_INT}>'),
            ("?d", "<urn:label>", '"neun"@de'),
        ],
        where=[("?d", "<urn:flag>", "?x")],
    )
    got = _terms(spark, t)
    assert ("urn:d1", "urn:level", "9", XSD_INT, None, None) in got
    assert ("urn:d1", "urn:label", "neun", LANGSTR, "de", None) in got
    # idempotent: re-running inserts nothing (term-exact set dedup)
    n1 = len(got)
    delete_insert(
        spark, t,
        delete_template=[],
        insert_template=[("?d", "<urn:level>", f'"9"^^<{XSD_INT}>')],
        where=[("?d", "<urn:flag>", "?x")],
    )
    assert len(_terms(spark, t)) == n1
