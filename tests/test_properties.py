"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY.md §5: the reference has no randomized tests)."""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st

from jsonld_ex_spark.core.api import expand, to_rdf
from jsonld_ex_spark.core.context import Options
from jsonld_ex_spark.core.iri import remove_base, resolve_iri
from jsonld_ex_spark.core.nquads import parse_nquads, quads_to_nquads
from jsonld_ex_spark.core.rdf import canonical_double

OPTS = dict(base="http://example.com/base/doc")

_term = st.sampled_from(["name", "age", "knows", "tag", "note"])
_iri_str = st.sampled_from(
    ["http://ex.org/a", "http://ex.org/b#c", "rel/path", "#frag", "_:b0"]
)
_scalar = st.one_of(
    st.text(alphabet=string.printable, max_size=12),
    st.integers(min_value=-10**15, max_value=10**15),
    st.booleans(),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
)

_value_obj = st.fixed_dictionaries(
    {"@value": _scalar},
    optional={"@language": st.sampled_from(["en", "de", "fr-CA"])},
).filter(lambda v: not ("@language" in v and not isinstance(v["@value"], str)))


def _node(children=None):
    optional = {
        "@id": _iri_str,
        "@type": st.lists(st.sampled_from(["http://ex.org/T1", "T2"]), max_size=2),
        "name": st.lists(st.one_of(_scalar, _value_obj), max_size=3),
        "tag": st.one_of(_scalar, st.lists(_scalar, max_size=3)),
    }
    if children is not None:
        optional["knows"] = st.lists(children, max_size=2)
    return st.fixed_dictionaries({}, optional=optional)


_doc = st.recursive(_node(), _node, max_leaves=8).map(
    lambda d: {"@context": {"@vocab": "http://vocab.example/", "name": "http://ex.org/name"}, **d}
)


@given(_doc)
@settings(max_examples=150, deadline=None)
def test_expand_idempotent(doc):
    options = Options(**OPTS)
    once = expand(doc, options)
    twice = expand(once, Options(**OPTS))
    assert twice == once


@given(_doc)
@settings(max_examples=100, deadline=None)
def test_to_rdf_total_and_nquads_roundtrip(doc):
    options = Options(**OPTS)
    quads = to_rdf(doc, options)
    text = quads_to_nquads(quads)
    assert sorted(map(repr, parse_nquads(text))) == sorted(map(repr, set(map(tuple, quads))))


@given(st.floats(allow_nan=False, allow_infinity=False))
@settings(max_examples=300)
def test_canonical_double_roundtrips(x):
    assert float(canonical_double(x)) == x


_path_seg = st.text(alphabet=string.ascii_letters + string.digits, min_size=1, max_size=5)


@given(
    st.lists(_path_seg, min_size=1, max_size=4),
    st.lists(_path_seg, min_size=0, max_size=4),
    st.one_of(st.none(), _path_seg),
    st.one_of(st.none(), _path_seg),
)
@settings(max_examples=200)
def test_remove_base_inverts_resolve(base_segs, target_segs, query, frag):
    base = "http://h.example/" + "/".join(base_segs)
    target = "http://h.example/" + "/".join(target_segs)
    if query is not None:
        target += "?" + query
    if frag is not None:
        target += "#" + frag
    rel = remove_base(base, target)
    assert resolve_iri(base, rel) == target


_ctx_variants = st.sampled_from([
    {"@vocab": "http://vocab.example/", "name": "http://ex.org/name"},
    {"@vocab": "http://vocab.example/", "name": {"@id": "http://ex.org/name"},
     "knows": {"@type": "@id"}},
    {"@vocab": "http://vocab.example/", "ex": "http://ex.org/",
     "name": {"@id": "ex:name", "@container": "@set"}},
    {"@vocab": "http://vocab.example/", "tag": {"@container": "@list"}},
])


@given(_doc, _ctx_variants)
@settings(max_examples=120, deadline=None)
def test_compact_expand_roundtrip(doc, ctx):
    """compact(expand(doc), ctx) re-expands to exactly expand(doc):
    compaction must be meaning-preserving for any context."""
    from jsonld_ex_spark.core.api import compact

    options = Options(**OPTS)
    expanded = expand(doc, options)
    compacted = compact(expanded, {"@context": ctx}, Options(**OPTS))
    re_expanded = expand(compacted, Options(**OPTS))
    assert re_expanded == expanded


@given(_doc)
@settings(max_examples=80, deadline=None)
def test_to_rdf_from_rdf_roundtrip_isomorphic(doc):
    """to_rdf(from_rdf(to_rdf(doc))) must be dataset-isomorphic to
    to_rdf(doc): the serializer pair loses nothing for any generated
    document (the reference proves this only on fixtures)."""
    from jsonld_ex_spark.core.api import from_rdf
    from jsonld_ex_spark.core.nquads import isomorphic
    from jsonld_ex_spark.core.to_rdf import expanded_to_rdf

    options = Options(**OPTS)
    quads = to_rdf(doc, options)
    back = from_rdf(quads, Options(**OPTS))
    quads2 = expanded_to_rdf(expand(back, Options(**OPTS)), Options(**OPTS))
    assert isomorphic(set(map(tuple, quads)), set(map(tuple, quads2)))


@given(_doc, st.randoms())
@settings(max_examples=80, deadline=None)
def test_expansion_invariant_under_key_insertion_order(doc, rnd):
    """Unordered-mode expansion must not depend on dict insertion order
    (the engine iterates keys sorted — the determinism that makes
    distributed runs reproducible regardless of upstream JSON parsing)."""

    def shuffle_keys(obj):
        if isinstance(obj, dict):
            items = [(k, shuffle_keys(v)) for k, v in obj.items()]
            rnd.shuffle(items)
            return dict(items)
        if isinstance(obj, list):
            return [shuffle_keys(v) for v in obj]
        return obj

    options = Options(**OPTS)
    a = expand(doc, options)
    b = expand(shuffle_keys(doc), Options(**OPTS))
    assert a == b


@given(doc=_doc)
@settings(max_examples=60, deadline=None)
def test_frame_wildcard_never_crashes_and_keeps_ids(doc):
    """Framing with the empty (wildcard) frame is total over arbitrary
    documents, and every IRI-identified node in the expanded input
    appears somewhere in the framed output (wildcard matches all)."""
    from jsonld_ex_spark.core.api import frame

    expanded = expand(doc, Options(**OPTS))
    out = frame(doc, {"@context": doc.get("@context", {})}, Options(**OPTS))

    def node_iris(e, acc):
        if isinstance(e, list):
            for v in e:
                node_iris(v, acc)
        elif isinstance(e, dict):
            i = e.get("@id")
            if isinstance(i, str) and not i.startswith("_:") and "@value" not in e:
                acc.add(i)
            for k, v in e.items():
                if k != "@id":
                    node_iris(v, acc)
        return acc

    expected = node_iris(expanded, set())
    # the framed output is COMPACTED (base-relative @ids): resolve each
    # collected id against the base before comparing.  (Re-expanding the
    # output instead would drop nodes framing reduced to only-@id.)
    got = {resolve_iri(OPTS["base"], i) for i in node_iris(out, set())}
    assert expected <= got


@given(doc=_doc)
@settings(max_examples=60, deadline=None)
def test_frame_embed_never_yields_only_references(doc):
    """@embed @never at the top level must produce only {@id: ...}
    references (or an empty result) — never embedded content."""
    from jsonld_ex_spark.core.api import frame

    out = frame(
        doc, {"@context": doc.get("@context", {}), "@embed": "@never"}, Options(**OPTS)
    )
    body = {k: v for k, v in out.items() if k != "@context"} if isinstance(out, dict) else out
    nodes = body.get("@graph", [body] if body else []) if isinstance(body, dict) else body
    for n in nodes:
        assert set(n.keys()) <= {"@id"}, n
