"""Unit tests for core internals: canonical lexical forms, JCS, RFC 3986
resolution, N-Quads round-trip, isomorphism, quarantine capture.

Mirrors the reference's table-driven unit style
(/root/reference/test/unit/*_test.exs).
"""

from __future__ import annotations

import pytest

from jsonld_ex_spark.core.iri import remove_dot_segments, resolve_iri, remove_base
from jsonld_ex_spark.core.nquads import isomorphic, parse_nquads, quads_to_nquads
from jsonld_ex_spark.core.rdf import canonical_double, jcs_canonicalize, literal, iri, bnode


@pytest.mark.parametrize(
    "value,expected",
    [
        (1.0, "1.0E0"),
        (1.1, "1.1E0"),
        (-1.0, "-1.0E0"),
        (0.0, "0.0E0"),
        (123.456, "1.23456E2"),
        (1e21, "1.0E21"),
        (1e23, "1.0E23"),
        (5.3, "5.3E0"),
        (0.0000123, "1.23E-5"),
        (-0.1, "-1.0E-1"),
        (10.0, "1.0E1"),
        (float("inf"), "INF"),
        (float("-inf"), "-INF"),
    ],
)
def test_canonical_double(value, expected):
    assert canonical_double(value) == expected


def test_canonical_double_nan():
    assert canonical_double(float("nan")) == "NaN"


@pytest.mark.parametrize(
    "value,expected",
    [
        ({"b": 1, "a": 2}, '{"a":2,"b":1}'),
        ({"x": [1.0, 2.5, True, None]}, '{"x":[1,2.5,true,null]}'),
        ({"k": 1e21}, '{"k":1e+21}'),
        ({"" : ""}, '{"":""}'),
        ({"é": "ü"}, '{"é":"ü"}'),
    ],
)
def test_jcs(value, expected):
    assert jcs_canonicalize(value) == expected


# RFC 3986 §5.4 reference-resolution examples (base per the RFC)
_RFC_BASE = "http://a/b/c/d;p?q"


@pytest.mark.parametrize(
    "ref,expected",
    [
        ("g", "http://a/b/c/g"),
        ("./g", "http://a/b/c/g"),
        ("g/", "http://a/b/c/g/"),
        ("/g", "http://a/g"),
        ("//g", "http://g"),
        ("?y", "http://a/b/c/d;p?y"),
        ("g?y", "http://a/b/c/g?y"),
        ("#s", "http://a/b/c/d;p?q#s"),
        ("g#s", "http://a/b/c/g#s"),
        (";x", "http://a/b/c/;x"),
        ("", "http://a/b/c/d;p?q"),
        (".", "http://a/b/c/"),
        ("..", "http://a/b/"),
        ("../g", "http://a/b/g"),
        ("../..", "http://a/"),
        ("../../g", "http://a/g"),
        ("../../../g", "http://a/g"),
        ("../../../../g", "http://a/g"),
        ("/./g", "http://a/g"),
        ("/../g", "http://a/g"),
        ("g.", "http://a/b/c/g."),
        (".g", "http://a/b/c/.g"),
        ("g..", "http://a/b/c/g.."),
        ("..g", "http://a/b/c/..g"),
        ("./../g", "http://a/b/g"),
        ("./g/.", "http://a/b/c/g/"),
        ("g/./h", "http://a/b/c/g/h"),
        ("g/../h", "http://a/b/c/h"),
        ("g;x=1/./y", "http://a/b/c/g;x=1/y"),
        ("g;x=1/../y", "http://a/b/c/y"),
        ("http:g", "http:g"),  # strict parser
    ],
)
def test_rfc3986_resolution(ref, expected):
    assert resolve_iri(_RFC_BASE, ref) == expected


def test_remove_dot_segments():
    assert remove_dot_segments("/a/b/c/./../../g") == "/a/g"
    assert remove_dot_segments("mid/content=5/../6") == "mid/6"


def test_remove_base_roundtrip():
    base = "http://example.com/dir/file"
    for target in [
        "http://example.com/dir/other",
        "http://example.com/dir/sub/x",
        "http://example.com/top",
        "http://example.com/dir/file#frag",
        "http://example.com/dir/file?q=1",
    ]:
        rel = remove_base(base, target)
        assert resolve_iri(base, rel) == target, (rel, target)


def test_nquads_roundtrip():
    quads = [
        (iri("http://ex/s"), iri("http://ex/p"), literal("hi \"quoted\"\n"), None),
        (bnode("b0"), iri("http://ex/p"), literal("1", "http://www.w3.org/2001/XMLSchema#integer", None), iri("http://ex/g")),
        (iri("http://ex/s"), iri("http://ex/p"), literal("chat", "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", "fr"), None),
        (iri("http://ex/s"), iri("http://ex/p"), bnode("b1"), None),
    ]
    text = quads_to_nquads(quads)
    parsed = parse_nquads(text)
    assert sorted(map(repr, parsed)) == sorted(map(repr, quads))


def test_isomorphism_bnode_bijection():
    a = parse_nquads('_:a <http://p> _:b .\n_:b <http://p> _:a .')
    b = parse_nquads('_:x <http://p> _:y .\n_:y <http://p> _:x .')
    c = parse_nquads('_:x <http://p> _:y .\n_:x <http://p> _:y .')  # dup = 1 triple
    assert isomorphic(a, b)
    assert not isomorphic(a, c)


def test_quarantine_captures_jsonld_errors(monkeypatch):
    import pandas as pd

    from jsonld_ex_spark.operators import kg_pipeline as kp

    def bad_doc(conv_id, turns):
        return {"@id": f"conv:{conv_id}", "@type": "Conversation", "bad": {"@id": 42}}

    import json

    monkeypatch.setattr(kp, "build_conversation_doc", bad_doc)
    pdf = pd.DataFrame({
        "conv_id": ["c1"],
        # turns now cross the boundary as ONE JSON string (to_json output)
        "turns_json": [json.dumps([{"turn_idx": 0, "role": "user", "text": "t",
                                    "ts_str": "2024-01-01T00:00:00Z", "mentions": []}])],
    })
    out = pd.concat(list(kp._extract_triples(iter([pdf]))))
    assert len(out) == 1
    assert out.iloc[0]["pred"] == kp.QUARANTINE_PRED
    assert out.iloc[0]["obj"] == "invalid @id value"


def test_read_write_jsonld_file_roundtrip(tmp_path):
    """read_file!/write_file! mirror incl. implicit :context compaction
    (reference lib/json_ld.ex:10, encoder.ex:62-90)."""
    import json

    from jsonld_ex_spark.core.api import read_jsonld_file, write_jsonld_file

    ctx = {"name": "http://xmlns.com/foaf/0.1/name"}
    doc = {"@context": ctx, "@id": "http://ex.org/a", "name": "Alice"}
    src = tmp_path / "in.jsonld"
    src.write_text(json.dumps(doc), encoding="utf-8")

    quads = read_jsonld_file(str(src))
    assert (("iri", "http://ex.org/a"), ("iri", "http://xmlns.com/foaf/0.1/name"),
            ("lit", "Alice", "http://www.w3.org/2001/XMLSchema#string", None), None) in quads

    out = tmp_path / "out.jsonld"
    write_jsonld_file(quads, str(out), ctx={"@context": ctx})
    written = json.loads(out.read_text(encoding="utf-8"))
    assert written["name"] == "Alice"  # implicit compaction applied
    assert read_jsonld_file(str(out)) == quads  # file roundtrip is lossless
