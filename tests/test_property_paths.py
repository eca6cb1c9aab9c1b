"""Property-path evaluator semantics vs the DuckDB recursive-CTE
mirror: closures (incl. CYCLES — reachability is well-defined where the
list walker would raise), inverse/sequence/alternative, zero-length
path semantics, and the gated conv→turn path query."""

from __future__ import annotations

import duckdb
import pytest

from jsonld_ex_spark.operators.property_paths import (
    eval_path,
    path_oracle_sql,
    path_select,
)
from tests.spark_fixtures import SF_DIR, spark  # noqa: F401

TRIPLES = [
    # a -p-> b -p-> c -p-> a  (CYCLE), plus a -q-> d, d -p-> e
    ("a", "p", "b", True),
    ("b", "p", "c", True),
    ("c", "p", "a", True),
    ("a", "q", "d", True),
    ("d", "p", "e", True),
]


@pytest.fixture()
def tiny(spark):  # noqa: F811
    return spark.createDataFrame(
        TRIPLES, "subj string, pred string, obj string, obj_is_iri boolean"
    )


def _cte() -> str:
    values = ", ".join(
        f"('{s}', '{p}', '{o}', {str(i).lower()})" for s, p, o, i in TRIPLES
    )
    return (
        "SELECT * FROM (VALUES " + values + ") AS v(subj, pred, obj, obj_is_iri)"
    )


def _pairs(df):
    return sorted(tuple(r) for r in df.collect())


def _duck(sql):
    return sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())


CASES = [
    # plus over a CYCLE: every node in the cycle reaches every cycle
    # node (incl. itself); d reaches e
    ("plus_cycle", ("plus", "p")),
    ("star_cycle", ("star", "p")),
    ("inv", ("inv", "p")),
    ("seq", ("seq", "q", "p")),           # a-q->d-p->e
    ("alt", ("alt", "p", "q")),
    ("opt", ("opt", "q")),
    ("seq_star", ("seq", "q", ("star", "p"))),  # a->d, a->e (zero + one)
    ("nested", ("plus", ("alt", "p", "q"))),
]


@pytest.mark.parametrize("name,path", CASES, ids=[c[0] for c in CASES])
def test_path_matches_duckdb(tiny, name, path):
    got = _pairs(path_select(tiny, "?s", path, "?o"))
    sql = path_oracle_sql(_cte(), "?s", path, "?o")
    assert got == _duck(sql), name
    assert got  # non-vacuous


def test_plus_cycle_exact_pairs(tiny):
    got = set(_pairs(eval_path(tiny, ("plus", "p"))))
    cyc = {"a", "b", "c"}
    expected = {(x, y) for x in cyc for y in cyc} | {("d", "e")}
    assert got == expected


def test_constant_terms_and_same_var(tiny):
    # constant subject
    got = _pairs(path_select(tiny, "<a>", ("plus", "p"), "?o"))
    assert got == [("a",), ("b",), ("c",)]
    sql = path_oracle_sql(_cte(), "<a>", ("plus", "p"), "?o")
    assert got == _duck(sql)
    # same variable twice = self-reachability (cycle members only)
    got2 = _pairs(path_select(tiny, "?x", ("plus", "p"), "?x"))
    assert got2 == [("a",), ("b",), ("c",)]
    sql2 = path_oracle_sql(_cte(), "?x", ("plus", "p"), "?x")
    assert got2 == _duck(sql2)


def test_path_validation(tiny):
    with pytest.raises(ValueError, match="bad path node"):
        eval_path(tiny, ("between", "p"))
    with pytest.raises(ValueError, match="exactly one"):
        eval_path(tiny, ("plus", "p", "q"))
    with pytest.raises(ValueError, match="at least two"):
        eval_path(tiny, ("seq", "p"))
    with pytest.raises(ValueError, match="bad path term"):
        path_select(tiny, '"lit"', "p", "?o")
    with pytest.raises(ValueError, match="no variables"):
        path_select(tiny, "<a>", "p", "<b>")


def test_gated_path_equals_list_walk_members(spark):  # noqa: F811
    """The path query's (conv, turn) pair set must equal the
    pointer-doubling list walk's — two different traversal engines over
    the same graph encoding."""
    from pyspark.sql import functions as F

    from jsonld_ex_spark.operators.kg_queries import (
        kg_list_walk,
        kg_path_conv_turns,
    )

    walk = (
        kg_list_walk(spark, SF_DIR)
        .select(F.col("conv_iri").alias("conv"), F.col("turn_iri").alias("turn"))
        .dropDuplicates()
    )
    path = kg_path_conv_turns(spark, SF_DIR)
    assert path.count() == walk.count()
    assert path.exceptAll(walk).count() == 0


def test_mixed_path_and_pattern_bgp(tiny):
    """bgp_select paths= joins a path relation with plain patterns on
    the shared variable; SQL mirror agrees (WITH RECURSIVE composed
    with the pattern CTEs)."""
    from jsonld_ex_spark.operators.bgp import bgp_oracle_sql, bgp_select

    patterns = [("?y", "<q>", "?z")]
    paths = [("?x", ("plus", "p"), "?y")]
    out = bgp_select(tiny, patterns, project=["x", "y", "z"], paths=paths)
    got = sorted(tuple(r) for r in out.collect())
    # ?x p+ ?y restricted to y with a q-edge: only a has q→d; a,b,c all reach a
    assert got == [("a", "a", "d"), ("b", "a", "d"), ("c", "a", "d")]
    sql = bgp_oracle_sql(_cte(), patterns, project=["x", "y", "z"], paths=paths)
    assert got == _duck(sql)
    # path-only BGP (no plain patterns)
    out2 = bgp_select(tiny, [], paths=paths, project=["x", "y"])
    sql2 = bgp_oracle_sql(_cte(), [], paths=paths, project=["x", "y"])
    assert sorted(tuple(r) for r in out2.collect()) == _duck(sql2)
    # disconnected path rejected
    with pytest.raises(ValueError, match="shares no variable"):
        bgp_select(tiny, [("?a", "<q>", "?b")], paths=[("?m", "p", "?n")])


def test_negated_property_set(tiny):
    """!(p) matches every edge whose predicate is not p — forward-only
    negated property set, mirrored in SQL."""
    got = _pairs(eval_path(tiny, ("neg", "p")))
    assert got == [("a", "d")]  # only the q edge survives
    sql = path_oracle_sql(_cte(), "?s", ("neg", "p"), "?o")
    assert got == _duck(sql)
    # composes with closures: !(q)+ == p+ here
    got2 = _pairs(eval_path(tiny, ("plus", ("neg", "q"))))
    assert got2 == _pairs(eval_path(tiny, ("plus", "p")))
    with pytest.raises(ValueError, match="IRI predicates"):
        eval_path(tiny, ("neg", ("inv", "p")))


def test_seq_star_rewrite_equivalence(tiny):
    """The seq-star/opt identity-elimination rewrite must be invisible:
    Spark (rewritten) vs DuckDB (direct form) on multi-star sequences,
    and the rewriter's output shape is as derived."""
    from jsonld_ex_spark.operators.property_paths import _rewrite

    assert _rewrite(("seq", "q", ("star", "p"))) == (
        "alt", "q", ("seq", "q", ("plus", "p")))
    assert _rewrite(("seq", "a", ("opt", "b"), "c")) == (
        "alt", ("seq", "a", "c"), ("seq", "a", "b", "c"))
    for path in [
        ("seq", ("star", "p"), "q", ("star", "p")),
        ("seq", ("opt", "p"), ("star", "q")),
        ("seq", "q", ("star", ("alt", "p", "q"))),
    ]:
        got = _pairs(path_select(tiny, "?s", path, "?o"))
        assert got == _duck(path_oracle_sql(_cte(), "?s", path, "?o")), path


def test_head_plus_rewrite_is_seedable_and_correct(tiny):
    """Round-5 advice (low): a plus at the HEAD of a sequence (directly,
    or generated by the star/opt expansion) must not fall through to the
    all-pairs closure.  The rewrite reverses the sequence under inverse
    (seq(p1..pn) = inv(seq(inv(pn)..inv(p1)))) so the plus lands in a
    seedable tail position; the oracle keeps the direct form, so
    agreement proves the rewrite."""
    from jsonld_ex_spark.operators.property_paths import _rewrite

    def no_head_plus(ast):
        if isinstance(ast, str):
            return True
        if ast[0] == "seq" and isinstance(ast[1], tuple) and ast[1][0] == "plus":
            return False
        return all(no_head_plus(s) for s in ast[1:] if not isinstance(s, str))

    for path in [
        ("seq", ("plus", "p"), "q"),
        ("seq", ("star", "p"), "q"),       # expansion creates a head plus
        ("seq", ("opt", "p"), ("star", "q")),
    ]:
        assert no_head_plus(_rewrite(path)), path

    # correctness of the reversal vs the direct-form oracle
    for path in [("seq", ("plus", "p"), "q"), ("seq", ("star", "p"), "q")]:
        got = _pairs(path_select(tiny, "?s", path, "?o"))
        sql = path_oracle_sql(_cte(), "?s", path, "?o")
        assert got == _duck(sql), path
        assert got  # non-vacuous


def test_full_closure_guard(tiny, monkeypatch):
    """Round-4 verdict item 6: a standalone plus/star over a relation
    above the edge bound raises unless the caller opts in."""
    from jsonld_ex_spark.operators import property_paths

    monkeypatch.setattr(property_paths, "FULL_CLOSURE_EDGE_BOUND", 2)
    with pytest.raises(ValueError, match="allow_full_closure"):
        eval_path(tiny, ("plus", "p"))
    out = eval_path(tiny, ("plus", "p"), allow_full_closure=True)
    assert out.count() > 0
    # the gated seq-rewrite shape stays guarded-free (seeded closure)
    from jsonld_ex_spark.operators.property_paths import path_select as ps
    got = ps(tiny, "?s", ("seq", "q", ("star", "p")), "?o")
    assert got.count() > 0


def test_materialized_closure_build_reuse_and_staleness(spark, tmp_path):  # noqa: F811
    """Round-6 verdict item 5: ensure_path_closure writes the (s, o)
    closure next to the triple table, reuses it while the source
    fingerprint matches, and REBUILDS it when the triples change."""
    import os

    from jsonld_ex_spark.operators.property_paths import (
        ensure_path_closure,
        read_path_closure,
        source_table_fingerprint,
    )

    tdir = str(tmp_path / "triples")
    df = spark.createDataFrame(
        TRIPLES, "subj string, pred string, obj string, obj_is_iri boolean"
    )
    df.write.parquet(tdir)
    cdir = ensure_path_closure(spark, tdir, "pplus", ("plus", "p"))
    pairs1 = _pairs(read_path_closure(spark, cdir))
    assert ("a", "b") in pairs1 and ("a", "a") in pairs1  # cycle closure
    # unchanged source -> same dir, no rebuild (marker mtime stable)
    marker = os.path.join(cdir, "_SOURCE_FINGERPRINT")
    mtime1 = os.path.getmtime(marker)
    assert ensure_path_closure(spark, tdir, "pplus", ("plus", "p")) == cdir
    assert os.path.getmtime(marker) == mtime1
    # source change (append a new edge e -p-> f) -> fingerprint moves,
    # closure rebuilt with the new reachability
    fp_before = source_table_fingerprint(tdir)
    spark.createDataFrame(
        [("e", "p", "f", True)],
        "subj string, pred string, obj string, obj_is_iri boolean",
    ).write.mode("append").parquet(tdir)
    assert source_table_fingerprint(tdir) != fp_before
    cdir2 = ensure_path_closure(spark, tdir, "pplus", ("plus", "p"))
    pairs2 = _pairs(read_path_closure(spark, cdir2))
    assert ("d", "f") in pairs2 and pairs1 < pairs2
