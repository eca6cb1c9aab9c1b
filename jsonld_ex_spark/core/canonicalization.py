"""RDF dataset canonicalization (the RDFC-1.0 / URDNA2015 algorithm
shape, W3C rdf-canon spec §4): deterministic, isomorphism-invariant
blank-node labels (``_:c14n0`` …) for ARBITRARY graphs — first-degree
quad hashing, shared-hash resolution via the recursive N-degree hash
with permutation search, canonical issuer.

BEYOND REFERENCE: jsonld-ex has no canonicalization (the rdf-elixir
ecosystem ships it as a separate library).  Serialization inside the
hashes reuses this repo's N-Quads writer (core/nquads.py), which
escapes control characters as \\uXXXX where the spec's canonical
N-Triples form would emit them raw — so hash VALUES are repo-local, but
the produced LABELS are deterministic and isomorphism-invariant (the
tested contract), and graphs canonicalize identically however their
input labels were chosen.

Used by the distributed per-document graph fingerprint
(operators/jsonld_ops.py::jsonld_canonical_hashes): two documents whose
RDF graphs are isomorphic get the same canonical hash regardless of
skolem/bnode labeling.
"""

from __future__ import annotations

import hashlib
from itertools import permutations

from jsonld_ex_spark.core.nquads import quads_to_nquads, term_to_nquads

Term = tuple
Quad = tuple

# permutation-search group-size cap: the N-degree hash explores k! orders
# of same-hash related nodes — highly symmetric "poison" graphs are the
# known RDFC denial-of-service shape (the spec recommends bounding work).
# 7! = 5040 paths per group is plenty for real data; larger groups raise.
MAX_PERMUTATION_GROUP = 7


class _Issuer:
    """Identifier issuer (spec §4.5): stable prefix + issue order."""

    __slots__ = ("prefix", "issued", "order")

    def __init__(self, prefix: str = "c14n"):
        self.prefix = prefix
        self.issued: dict[str, str] = {}
        self.order: list[str] = []

    def issue(self, existing: str) -> str:
        got = self.issued.get(existing)
        if got is None:
            got = f"{self.prefix}{len(self.order)}"
            self.issued[existing] = got
            self.order.append(existing)
        return got

    def copy(self) -> "_Issuer":
        c = _Issuer(self.prefix)
        c.issued = dict(self.issued)
        c.order = list(self.order)
        return c


def _is_bnode(t) -> bool:
    return isinstance(t, tuple) and t[0] == "bnode"


def _sha256(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def _serialize_quad_with(quad: Quad, rename) -> str:
    """One N-Quads line with blank nodes mapped through ``rename``."""
    s, p, o, g = quad
    parts = []
    for t in (s, p, o):
        parts.append(f"_:{rename(t[1])}" if _is_bnode(t) else term_to_nquads(t))
    if g is not None:
        parts.append(f"_:{rename(g[1])}" if _is_bnode(g) else term_to_nquads(g))
    return " ".join(parts) + " ."


def _hash_first_degree(bnode: str, quads: list[Quad]) -> str:
    """Spec §4.6: serialize the bnode's quads with itself as ``_:a`` and
    every other blank node as ``_:z``; hash the sorted lines."""
    lines = sorted(
        _serialize_quad_with(q, lambda b: "a" if b == bnode else "z") for q in quads
    )
    return _sha256("\n".join(lines) + "\n")


def canonicalize(quads: list[Quad]) -> list[Quad]:
    """Return the quads with every blank node relabeled ``_:c14nN``
    (deterministic; isomorphic inputs produce identical outputs)."""
    # 1-2) blank node → mentioning quads
    bnode_quads: dict[str, list[Quad]] = {}
    for q in quads:
        for t in (q[0], q[2], q[3]):
            if t is not None and _is_bnode(t):
                bnode_quads.setdefault(t[1], []).append(q)

    # 3-4) first-degree hashes
    fd_hash = {b: _hash_first_degree(b, qs) for b, qs in bnode_quads.items()}
    by_hash: dict[str, list[str]] = {}
    for b, h in fd_hash.items():
        by_hash.setdefault(h, []).append(b)

    canonical = _Issuer("c14n")
    # 5) unique hashes first, in hash order
    shared: list[tuple[str, list[str]]] = []
    for h in sorted(by_hash):
        group = by_hash[h]
        if len(group) == 1:
            canonical.issue(group[0])
        else:
            shared.append((h, group))

    # 6) shared hashes: N-degree resolution (spec §4.9)
    def hash_related(related: str, quad: Quad, issuer: _Issuer, position: str) -> str:
        if related in canonical.issued:
            ident = "_:" + canonical.issued[related]
        elif related in issuer.issued:
            ident = "_:" + issuer.issued[related]
        else:
            ident = fd_hash[related]
        inp = position
        if position != "g":
            inp += f"<{quad[1][1]}>"
        return _sha256(inp + ident)

    def hash_n_degree(identifier: str, issuer: _Issuer) -> tuple[str, _Issuer]:
        hn: dict[str, list[str]] = {}
        for quad in bnode_quads[identifier]:
            for t, pos in ((quad[0], "s"), (quad[2], "o"), (quad[3], "g")):
                if t is not None and _is_bnode(t) and t[1] != identifier:
                    hn.setdefault(hash_related(t[1], quad, issuer, pos), []).append(t[1])
        data = ""
        for related_hash in sorted(hn):
            if len(hn[related_hash]) > MAX_PERMUTATION_GROUP:
                raise ValueError(
                    f"canonicalization aborted: {len(hn[related_hash])} blank nodes "
                    f"share a related-hash group (> {MAX_PERMUTATION_GROUP}) — "
                    "pathologically symmetric ('poison') graph"
                )
            data += related_hash
            chosen_path = ""
            chosen_issuer: _Issuer | None = None
            for perm in permutations(hn[related_hash]):
                issuer_copy = issuer.copy()
                path = ""
                recursion: list[str] = []
                skip = False
                for related in perm:
                    if related in canonical.issued:
                        path += "_:" + canonical.issued[related]
                    else:
                        if related not in issuer_copy.issued:
                            recursion.append(related)
                        path += "_:" + issuer_copy.issue(related)
                    if chosen_path and len(path) >= len(chosen_path) and path > chosen_path:
                        skip = True
                        break
                if skip:
                    continue
                for related in recursion:
                    result_hash, result_issuer = hash_n_degree(related, issuer_copy)
                    path += "_:" + issuer_copy.issue(related)
                    path += f"<{result_hash}>"
                    issuer_copy = result_issuer
                    if chosen_path and len(path) >= len(chosen_path) and path > chosen_path:
                        skip = True
                        break
                if skip:
                    continue
                if not chosen_path or path < chosen_path:
                    chosen_path = path
                    chosen_issuer = issuer_copy
            data += chosen_path
            if chosen_issuer is not None:
                issuer = chosen_issuer
        return _sha256(data), issuer

    for _h, group in shared:
        results = []
        for b in group:
            temp = _Issuer("b")
            temp.issue(b)
            results.append(hash_n_degree(b, temp))
        for _nh, temp_issuer in sorted(results, key=lambda r: r[0]):
            for existing in temp_issuer.order:
                canonical.issue(existing)

    # 7) relabel
    def relabel(t):
        if t is not None and _is_bnode(t):
            return ("bnode", canonical.issued[t[1]])
        return t

    return [(relabel(s), p, relabel(o), relabel(g)) for s, p, o, g in quads]


def canonical_nquads(quads: list[Quad]) -> str:
    """Canonical N-Quads document: canonical labels, sorted lines,
    trailing newline — equal strings ⟺ isomorphic datasets."""
    return quads_to_nquads(canonicalize(quads))
