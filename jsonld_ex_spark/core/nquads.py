"""N-Quads serialization / parsing + dataset isomorphism for test oracles.

Used by the pytest W3C runners to compare our toRdf output against the
golden ``*-out.nq`` fixtures (reference harness does the same via RDF
isomorphism — /root/reference/test/acceptance/w3c/to_rdf_test.exs:69-88).
"""

from __future__ import annotations

import re
from collections import defaultdict

from jsonld_ex_spark.core.rdf import XSD_STRING, RDF_LANGSTRING

_ESCAPES = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t"}


def _escape(s: str) -> str:
    # control characters are written as \uXXXX — Python's splitlines()
    # (used by the parser) treats \x0b/\x0c/\x1c-\x1e/\x85/ /
    # as line breaks, so raw control chars would corrupt round-trips
    return "".join(
        _ESCAPES.get(c, c if (c >= " " and c not in "\x85  ") else f"\\u{ord(c):04X}")
        for c in s
    )


_UNESCAPE_RE = re.compile(r"\\(?:u([0-9A-Fa-f]{4})|U([0-9A-Fa-f]{8})|(.))")
_UNESCAPE_MAP = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f", '"': '"', "'": "'", "\\": "\\"}


def _unescape(s: str) -> str:
    def sub(m: re.Match) -> str:
        if m.group(1):
            return chr(int(m.group(1), 16))
        if m.group(2):
            return chr(int(m.group(2), 16))
        return _UNESCAPE_MAP.get(m.group(3), m.group(3))

    return _UNESCAPE_RE.sub(sub, s)


def term_to_nquads(term: tuple) -> str:
    kind = term[0]
    if kind == "iri":
        return f"<{term[1]}>"
    if kind == "bnode":
        return f"_:{term[1]}"
    _, lexical, datatype, language = term
    base = f'"{_escape(lexical)}"'
    if language is not None:
        return f"{base}@{language}"
    if datatype and datatype != XSD_STRING:
        return f"{base}^^<{datatype}>"
    return base


def quads_to_nquads(quads: list) -> str:
    lines = []
    for s, p, o, g in quads:
        parts = [term_to_nquads(s), term_to_nquads(p), term_to_nquads(o)]
        if g is not None:
            parts.append(term_to_nquads(g))
        lines.append(" ".join(parts) + " .")
    return "\n".join(sorted(lines)) + ("\n" if lines else "")


_TERM_RE = re.compile(
    r"""\s*(?:
        <([^>]*)>                                   # IRI
      | _:([A-Za-z0-9_.\-]+)                        # bnode
      | "((?:[^"\\]|\\.)*)"                         # literal lexical
        (?:\^\^<([^>]*)>|@([a-zA-Z0-9\-]+))?        # datatype / lang
    )""",
    re.VERBOSE,
)


def parse_nquads(text: str) -> list:
    quads = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        terms = []
        pos = 0
        while pos < len(line) and len(terms) < 4:
            if line[pos:].lstrip().startswith("."):
                break
            m = _TERM_RE.match(line, pos)
            if not m:
                break
            if m.group(1) is not None:
                terms.append(("iri", _unescape(m.group(1))))
            elif m.group(2) is not None:
                terms.append(("bnode", m.group(2)))
            else:
                lexical = _unescape(m.group(3))
                datatype = m.group(4)
                language = m.group(5)
                if language is not None:
                    terms.append(("lit", lexical, RDF_LANGSTRING, language))
                else:
                    terms.append(("lit", lexical, datatype or XSD_STRING, None))
            pos = m.end()
        if len(terms) == 3:
            quads.append((terms[0], terms[1], terms[2], None))
        elif len(terms) == 4:
            quads.append((terms[0], terms[1], terms[2], terms[3]))
    return quads


def _is_bnode(t) -> bool:
    return isinstance(t, tuple) and t[0] == "bnode"


def _signature(quads: list) -> dict:
    """Iteratively refine bnode signatures (color refinement) for isomorphism."""
    labels: dict[str, str] = {}
    bnodes = set()
    for q in quads:
        for t in q:
            if t is not None and _is_bnode(t):
                bnodes.add(t[1])
    for b in bnodes:
        labels[b] = ""

    def term_key(t, labels):
        if t is None:
            return "∅"
        if _is_bnode(t):
            return "B" + labels[t[1]]
        return repr(t)

    for _ in range(len(bnodes) + 2):
        new_labels = {}
        for b in bnodes:
            sigs = []
            for q in quads:
                if any(t is not None and _is_bnode(t) and t[1] == b for t in q):
                    pos = tuple("•" if (t is not None and _is_bnode(t) and t[1] == b) else term_key(t, labels) for t in q)
                    sigs.append(pos)
            new_labels[b] = str(hash(tuple(sorted(sigs))))
        if new_labels == labels:
            break
        labels = new_labels
    return labels


def isomorphic(quads_a: list, quads_b: list) -> bool:
    """Dataset isomorphism under blank-node bijection.

    Color refinement + backtracking match (fixture graphs are tiny).
    """
    a = list(set(map(_freeze, quads_a)))
    b = list(set(map(_freeze, quads_b)))
    if len(a) != len(b):
        return False
    ground_a = {q for q in a if not _has_bnode(q)}
    ground_b = {q for q in b if not _has_bnode(q)}
    if ground_a != ground_b:
        return False
    var_a = [q for q in a if _has_bnode(q)]
    var_b = set(q for q in b if _has_bnode(q))
    bnodes_a = sorted({t[1] for q in var_a for t in q if t is not None and _is_bnode(t)})
    bnodes_b = sorted({t[1] for q in var_b for t in q if t is not None and _is_bnode(t)})
    if len(bnodes_a) != len(bnodes_b):
        return False

    sig_a = _signature(var_a)
    sig_b = _signature(list(var_b))
    # candidate sets by signature
    by_sig_b: dict[str, list[str]] = defaultdict(list)
    for bb in bnodes_b:
        by_sig_b[sig_b[bb]].append(bb)

    mapping: dict[str, str] = {}
    used: set[str] = set()

    def subst(q, mapping):
        return tuple(
            ("bnode", mapping[t[1]]) if (t is not None and _is_bnode(t) and t[1] in mapping) else t
            for t in q
        )

    def consistent() -> bool:
        for q in var_a:
            qq = subst(q, mapping)
            if not any(t is not None and _is_bnode(t) and t[1] not in mapping for t in q):
                if qq not in var_b:
                    return False
        return True

    def backtrack(i: int) -> bool:
        if i == len(bnodes_a):
            return consistent()
        ba = bnodes_a[i]
        for bb in by_sig_b.get(sig_a[ba], bnodes_b):
            if bb in used:
                continue
            mapping[ba] = bb
            used.add(bb)
            if consistent() and backtrack(i + 1):
                return True
            del mapping[ba]
            used.discard(bb)
        return False

    return backtrack(0)


def _freeze(q):
    return tuple(q)


def _has_bnode(q) -> bool:
    return any(t is not None and _is_bnode(t) for t in q)
