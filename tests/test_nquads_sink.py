"""JVM-side N-Quads sink must agree byte-for-byte with the pure-Python
core serializer on the pipeline's triple table."""

from __future__ import annotations

import pytest

from jsonld_ex_spark.core.nquads import quads_to_nquads
from jsonld_ex_spark.core.rdf import RDF_LANGSTRING
from jsonld_ex_spark.operators.kg_pipeline import kg_triples
from jsonld_ex_spark.operators.triples import nquads_lines

from tests.spark_fixtures import spark  # noqa: F401

pytestmark = pytest.mark.spark
SF = "/root/testdata/sf0.001"


def _row_to_quad(r):
    def node(v):
        return ("bnode", v[2:]) if v.startswith("_:") else ("iri", v)

    s = node(r["subj"])
    p = ("iri", r["pred"])
    if r["obj_is_iri"]:
        o = node(r["obj"])
    elif r["obj_lang"] is not None:
        o = ("lit", r["obj"], RDF_LANGSTRING, r["obj_lang"])
    else:
        o = ("lit", r["obj"], r["obj_dt"], None)
    g = node(r["graph"]) if r["graph"] is not None else None
    return (s, p, o, g)


def test_jvm_escaping_matches_core_on_control_chars(spark):  # noqa: F811
    """Control chars (incl. \\x0c, \\x85, \\u2028 — the splitlines()
    hazards) must escape to \\uXXXX identically in the JVM sink and the
    core serializer, and the emitted lines must survive splitlines()."""
    from jsonld_ex_spark.core.nquads import parse_nquads

    nasty = [
        "form\x0cfeed", "vt\x0bvt", "nel\x85nel", "ls\u2028ls", "ps\u2029ps",
        "nul\x00nul", "esc\x1b[0m", "fs\x1c gs\x1d rs\x1e",
        "tab\there\nnewline\rcr", 'quote" back\\slash',
    ]
    rows = [
        ("http://ex.org/s", "http://ex.org/p", t,
         "http://www.w3.org/2001/XMLSchema#string", None, None, False)
        for t in nasty
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_dt string, obj_lang string, graph string, obj_is_iri boolean"
    )
    jvm_lines = sorted(r["line"] for r in nquads_lines(df).collect())
    core_text = quads_to_nquads(
        [(("iri", "http://ex.org/s"), ("iri", "http://ex.org/p"),
          ("lit", t, "http://www.w3.org/2001/XMLSchema#string", None), None) for t in nasty]
    )
    core_lines = sorted(core_text.strip().split("\n"))
    assert jvm_lines == core_lines
    # the repo's own parser (splitlines-based) round-trips the JVM output
    parsed = parse_nquads("\n".join(jvm_lines) + "\n")
    assert sorted(q[2][1] for q in parsed) == sorted(nasty)


def test_jvm_nquads_matches_core_serializer(spark):  # noqa: F811
    triples = kg_triples(spark, SF).cache()
    try:
        jvm_lines = sorted(r["line"] for r in nquads_lines(triples).collect())
        rows = triples.collect()
        core_text = quads_to_nquads([_row_to_quad(r) for r in rows])
        core_lines = sorted(core_text.strip().split("\n"))
        assert jvm_lines == core_lines
        plan = nquads_lines(triples)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan  # serialization stays JVM-side
    finally:
        # don't leave a cached plan in the shared session (later plan-shape
        # tests would see InMemoryTableScan instead of the real exchanges)
        triples.unpersist()


def test_iceberg_sink_gating(spark):  # noqa: F811
    """Iceberg path: used when the runtime jar is present, clean error
    otherwise (never a silent parquet write to a bogus 'path')."""
    from jsonld_ex_spark.operators.triples import iceberg_available, write_triples

    df = spark.createDataFrame(
        [("http://ex/s", "http://ex/p", "o", None, None, None, False, "c1")],
        "subj string, pred string, obj string, obj_dt string, obj_lang string, "
        "graph string, obj_is_iri boolean, conv_id string",
    )
    if iceberg_available(spark):
        pytest.skip("iceberg present: live write covered on cluster images")
    with pytest.raises(RuntimeError, match="[Ii]ceberg"):
        write_triples(df, "local.db.triples")


def test_read_nquads_inverts_write_nquads(spark, tmp_path):  # noqa: F811
    """Writer → distributed reader must reproduce every row exactly,
    including control-char escapes, unicode line separators, language
    tags, datatypes, blank nodes and named graphs."""
    from jsonld_ex_spark.operators.triples import read_nquads, write_nquads

    rows = [
        ("http://ex.org/s", "http://ex.org/p", "plain \"quoted\"\nline\ttab",
         False, "http://www.w3.org/2001/XMLSchema#string", None, None),
        ("http://ex.org/s", "http://ex.org/p", "ctrl\x0c\x1d\x85 end",
         False, "http://www.w3.org/2001/XMLSchema#string", None, None),
        ("_:b0", "http://ex.org/p", "42", False,
         "http://www.w3.org/2001/XMLSchema#integer", None, None),
        ("http://ex.org/s", "http://ex.org/lang", "bonjour", False,
         "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", "fr", None),
        ("http://ex.org/s", "http://ex.org/ref", "_:b1", True, None, None,
         "http://ex.org/g"),
        ("_:b1", "http://ex.org/ref", "http://ex.org/o", True, None, None, "_:g2"),
    ]
    schema = ("subj string, pred string, obj string, obj_is_iri boolean, "
              "obj_dt string, obj_lang string, graph string")
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "nq")
    write_nquads(df, path)
    back = sorted(map(tuple, read_nquads(spark, path).collect()))
    assert back == sorted(rows)


def test_read_nquads_fast_path_equals_python_parser(spark, tmp_path):  # noqa: F811
    """The JVM fast path must be a PURE optimization: byte-identical
    output to the grammar-complete Python parser over the full pipeline
    triple table (which includes escape-y literals routed to the
    fallback) — and the fast path must actually carry the bulk of rows
    (no silent everything-falls-back regression)."""
    from jsonld_ex_spark.operators.triples import read_nquads, write_nquads

    triples = kg_triples(spark, SF).select(
        "subj", "pred", "obj", "obj_is_iri", "obj_dt", "obj_lang", "graph"
    )
    path = str(tmp_path / "nq")
    write_nquads(triples, path)
    fast = sorted(map(tuple, read_nquads(spark, path, jvm_fast_path=True).collect()))
    slow = sorted(map(tuple, read_nquads(spark, path, jvm_fast_path=False).collect()))
    assert fast == slow
    assert len(fast) == triples.count()


def test_read_nquads_paths_agree_on_nasty_corpus(spark, tmp_path):  # noqa: F811
    """Seeded nasty corpus (control chars, unicode, quotes, backslashes,
    @-signs and ^^ inside literals, empty literals, languages,
    datatypes, bnodes, graphs): the JVM fast path and the Python parser
    must agree exactly, and both must invert the core serializer."""
    import random

    from jsonld_ex_spark.core.nquads import quads_to_nquads
    from jsonld_ex_spark.core.rdf import RDF_LANGSTRING, XSD_STRING
    from jsonld_ex_spark.operators.triples import read_nquads

    rng = random.Random(42)
    alphabet = 'ab cd"\\\n\t\r\x0c\x1d\x85é漢@^^<>._:-'
    quads = []
    for i in range(250):
        subj = ("iri", f"http://ex.org/s{i}") if i % 3 else ("bnode", f"b{i}")
        pred = ("iri", f"http://ex.org/p{i % 7}")
        kind = i % 4
        if kind == 0:
            obj = ("iri", f"http://ex.org/o{i}")
        elif kind == 1:
            obj = ("bnode", f"ob{i}")
        else:
            text = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 20)))
            if kind == 2 and i % 2:
                obj = ("lit", text, RDF_LANGSTRING, "en-GB")
            elif kind == 2:
                obj = ("lit", text, "http://ex.org/dt", None)
            else:
                obj = ("lit", text, XSD_STRING, None)
        graph = ("iri", f"http://ex.org/g{i % 3}") if i % 5 == 0 else (
            ("bnode", f"g{i}") if i % 11 == 0 else None
        )
        quads.append((subj, pred, obj, graph))
    text = quads_to_nquads(quads)
    d = tmp_path / "nq"
    d.mkdir()
    (d / "part.nq").write_text(text, encoding="utf-8")
    fast = sorted(map(tuple, read_nquads(spark, str(d), jvm_fast_path=True).collect()))
    slow = sorted(map(tuple, read_nquads(spark, str(d), jvm_fast_path=False).collect()))
    assert fast == slow
    assert len(fast) == len(quads)
    # spot-check full inversion against the original quads
    def row(q):
        s, p, o, g = q
        subj = s[1] if s[0] == "iri" else "_:" + s[1]
        if o[0] == "lit":
            obj, is_iri, dt, lang = o[1], False, o[2], o[3]
        else:
            obj, is_iri, dt, lang = (o[1] if o[0] == "iri" else "_:" + o[1]), True, None, None
        graph = (g[1] if g[0] == "iri" else "_:" + g[1]) if g is not None else None
        return (subj, p[1], obj, is_iri, dt, lang, graph)
    assert fast == sorted(row(q) for q in quads)
