"""RDF dataset canonicalization (core/canonicalization.py): canonical
labels must be deterministic and isomorphism-invariant — equal
canonical N-Quads ⟺ isomorphic datasets (cross-checked against the
independent color-refinement isomorphism checker the W3C suites use)."""

from __future__ import annotations

import random

from jsonld_ex_spark.core.canonicalization import canonical_nquads, canonicalize
from jsonld_ex_spark.core.nquads import isomorphic

EX = "http://ex.org/"


def _q(s, p, o, g=None):
    return (s, ("iri", EX + p), o, g)


def b(x):
    return ("bnode", x)


def i(x):
    return ("iri", EX + x)


def lit(x):
    return ("lit", x, "http://www.w3.org/2001/XMLSchema#string", None)


def _relabel(quads, mapping):
    def m(t):
        if t is not None and t[0] == "bnode":
            return ("bnode", mapping[t[1]])
        return t

    return [(m(s), p, m(o), m(g)) for s, p, o, g in quads]


def test_relabeling_invariance_simple():
    quads = [
        _q(b("x"), "p", lit("v1")),
        _q(b("y"), "p", lit("v2")),
        _q(b("x"), "knows", b("y")),
    ]
    other = _relabel(quads, {"x": "q17", "y": "zz"})
    assert canonical_nquads(quads) == canonical_nquads(other)


def test_symmetric_cycle_needs_n_degree():
    """Two bnodes in a symmetric 2-cycle have IDENTICAL first-degree
    hashes — only the N-degree recursion separates/orders them; the
    result must still be label-invariant."""
    quads = [
        _q(b("a"), "next", b("c")),
        _q(b("c"), "next", b("a")),
        _q(b("a"), "name", lit("A")),
        _q(b("c"), "name", lit("C")),
    ]
    other = _relabel(quads, {"a": "zz9", "c": "b0"})
    assert canonical_nquads(quads) == canonical_nquads(other)
    # and the two nodes are distinguishable in the output (no collapse)
    out = canonicalize(quads)
    labels = {t[1] for q in out for t in (q[0], q[2]) if t[0] == "bnode"}
    assert labels == {"c14n0", "c14n1"}


def test_fully_symmetric_cycle():
    """An UNLABELED symmetric cycle (no distinguishing literals) is the
    hard case: the permutation search must still terminate and be
    relabeling-invariant."""
    quads = [
        _q(b("a"), "next", b("c")),
        _q(b("c"), "next", b("a")),
    ]
    other = _relabel(quads, {"a": "c", "c": "a"})
    assert canonical_nquads(quads) == canonical_nquads(other)


def test_distinct_graphs_differ():
    q1 = [_q(b("x"), "p", lit("v"))]
    q2 = [_q(b("x"), "p", lit("w"))]
    assert canonical_nquads(q1) != canonical_nquads(q2)


def test_bnode_graph_names():
    quads = [
        (b("s"), ("iri", EX + "p"), lit("v"), b("g")),
        (b("g"), ("iri", EX + "label"), lit("the graph"), None),
    ]
    other = _relabel(quads, {"s": "g", "g": "s"})
    assert canonical_nquads(quads) == canonical_nquads(other)


def test_random_graphs_canonical_equal_iff_isomorphic():
    """Fuzz cross-check against the independent color-refinement
    isomorphism checker: for random bnode graphs and random relabelings/
    mutations, canonical equality must track isomorphism exactly."""
    rng = random.Random(7)
    for trial in range(30):
        n = rng.randrange(2, 6)
        nodes = [f"n{k}" for k in range(n)]
        quads = []
        for _ in range(rng.randrange(2, 8)):
            s = b(rng.choice(nodes))
            o = b(rng.choice(nodes)) if rng.random() < 0.6 else lit(str(rng.randrange(3)))
            quads.append(_q(s, f"p{rng.randrange(2)}", o))
        quads = list(dict.fromkeys(quads))
        perm = dict(zip(nodes, rng.sample(nodes, n)))
        relabeled = _relabel(quads, perm)
        assert canonical_nquads(quads) == canonical_nquads(relabeled)
        assert isomorphic(canonicalize(quads), quads)
        # mutate: flip one object literal → non-isomorphic unless the
        # mutation is a no-op for the dataset as a set
        mutated = list(quads)
        mutated[0] = (mutated[0][0], mutated[0][1], lit("MUTANT"), mutated[0][3])
        if set(mutated) != set(quads):
            same = canonical_nquads(mutated) == canonical_nquads(quads)
            assert same == isomorphic(mutated, quads)


def test_deterministic_across_runs_and_orderings():
    quads = [
        _q(b("a"), "next", b("c")),
        _q(b("c"), "next", b("d")),
        _q(b("d"), "next", b("a")),
    ]
    shuffled = [quads[2], quads[0], quads[1]]
    assert canonical_nquads(quads) == canonical_nquads(shuffled)


def test_poison_graph_raises_instead_of_hanging():
    """A fully-connected clique of indistinguishable bnodes drives the
    N-degree permutation search factorial — the known RDFC 'poison'
    shape must raise a clear error instead of hanging."""
    import pytest

    n = 10
    quads = []
    for a in range(n):
        for c in range(n):
            if a != c:
                quads.append(_q(b(f"n{a}"), "p", b(f"n{c}")))
    with pytest.raises(ValueError, match="poison"):
        canonical_nquads(quads)
