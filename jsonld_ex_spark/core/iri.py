"""IRI handling: RFC 3986 reference resolution + validity predicates.

The W3C test suite exercises corner cases where ``urllib.parse.urljoin``
deviates from the RFC 3986 "transform references" algorithm (e.g. resolving
``""``/``"#frag"``/excess ``..`` segments and non-hierarchical bases), so we
implement the algorithm directly (spec-exact; reference relies on RDF.ex
``IRI.absolute`` — cf. /root/reference/lib/json/ld/utils.ex:41-44).
"""

from __future__ import annotations

import re
from functools import lru_cache

# RFC 3986 appendix B regex, fine for IRIs too (splitting only).
_SPLIT_RE = re.compile(r"^(?:([^:/?#]+):)?(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$")

# Scheme per RFC 3986 §3.1
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+\-.]*$")

# An "absolute IRI" test good enough for JSON-LD keyword-vs-IRI dispatch:
# scheme ':' followed by any non-space chars.  The spec's notion used by
# expansion is just "contains a colon after a valid scheme".
_ABSOLUTE_IRI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+\-.]*:")

# Characters not allowed raw in IRIs (used for well-formedness filtering in
# toRdf; the suite only needs a loose check: no whitespace/angle brackets).
_BAD_IRI_CHARS_RE = re.compile(r'[\x00-\x20<>"{}|\\^`]')


def split_iri(iri: str) -> tuple[str | None, str | None, str, str | None, str | None]:
    """Split into (scheme, authority, path, query, fragment); None = absent."""
    m = _SPLIT_RE.match(iri)
    assert m is not None  # the regex matches any string
    return m.group(1), m.group(2), m.group(3) or "", m.group(4), m.group(5)


def is_absolute_iri(value: str) -> bool:
    """True if value looks like an absolute IRI (scheme:...) and is well-formed enough."""
    if not isinstance(value, str):
        return False
    if not _ABSOLUTE_IRI_RE.match(value):
        return False
    return _BAD_IRI_CHARS_RE.search(value) is None


def is_relative_iri(value: str) -> bool:
    """Loose well-formedness check for a relative IRI reference."""
    return isinstance(value, str) and _BAD_IRI_CHARS_RE.search(value) is None


@lru_cache(maxsize=65536)
def is_well_formed_iri(value: str) -> bool:
    """Well-formed absolute IRI check used by toRdf to drop bad triples.

    Memoized: in the triple pipeline the same predicate/type IRIs recur
    for every document, so this is the hottest call in toRdf.
    """
    if not isinstance(value, str) or not is_absolute_iri(value):
        return False
    scheme, _, _, _, fragment = split_iri(value)
    if scheme is None or _SCHEME_RE.match(scheme) is None:
        return False
    # RFC 3986: '#' cannot appear raw inside a fragment (i.e. no second '#')
    return fragment is None or "#" not in fragment


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    output: list[str] = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if output:
                output.pop()
        elif path == "/..":
            path = "/"
            if output:
                output.pop()
        elif path in (".", ".."):
            path = ""
        else:
            # move first path segment (incl. leading /) to output
            i = path.find("/", 1)
            if i == -1:
                output.append(path)
                path = ""
            else:
                output.append(path[:i])
                path = path[i:]
    return "".join(output)


def _merge(base_authority: str | None, base_path: str, ref_path: str) -> str:
    """RFC 3986 §5.3 merge."""
    if base_authority is not None and base_path == "":
        return "/" + ref_path
    i = base_path.rfind("/")
    if i == -1:
        return ref_path
    return base_path[: i + 1] + ref_path


@lru_cache(maxsize=4096)
def resolve_iri(base: str | None, reference: str) -> str:
    """RFC 3986 §5.2 transform-references algorithm (strict)."""
    if not base:
        return reference
    r_scheme, r_auth, r_path, r_query, r_frag = split_iri(reference)
    b_scheme, b_auth, b_path, b_query, _ = split_iri(base)

    if r_scheme is not None:
        scheme, auth, path, query = r_scheme, r_auth, remove_dot_segments(r_path), r_query
    else:
        if r_auth is not None:
            auth, path, query = r_auth, remove_dot_segments(r_path), r_query
        else:
            if r_path == "":
                path = b_path
                query = r_query if r_query is not None else b_query
            else:
                if r_path.startswith("/"):
                    path = remove_dot_segments(r_path)
                else:
                    path = remove_dot_segments(_merge(b_auth, b_path, r_path))
                query = r_query
            auth = b_auth
        scheme = b_scheme

    result = []
    if scheme is not None:
        result.append(scheme + ":")
    if auth is not None:
        result.append("//" + auth)
    result.append(path)
    if query is not None:
        result.append("?" + query)
    if r_frag is not None:
        result.append("#" + r_frag)
    return "".join(result)


def remove_base(base: str | None, iri: str) -> str:
    """Inverse of resolve: produce the shortest relative reference for
    ``iri`` against ``base`` (used by compaction with compactToRelative).
    """
    if base is None:
        return iri
    b_scheme, b_auth, b_path, b_query, _ = split_iri(base)
    i_scheme, i_auth, i_path, i_query, i_frag = split_iri(iri)
    if b_scheme != i_scheme or b_auth != i_auth:
        return iri

    suffix = ""
    if i_query is not None:
        suffix += "?" + i_query
    if i_frag is not None:
        suffix += "#" + i_frag

    if i_path == b_path:
        if i_query == b_query and i_frag is not None:
            return "#" + i_frag
        if i_query is not None and i_query == b_query:
            return ("#" + i_frag) if i_frag is not None else i_path.split("/")[-1] + suffix
        if suffix:
            return suffix if i_query is not None else (i_path.split("/")[-1] or "./") + suffix
        # same path, no query/fragment on iri
        last = i_path.split("/")[-1]
        return last if last else "./"

    b_segs = b_path.split("/")
    i_segs = i_path.split("/")
    # drop the file part of base
    b_dirs = b_segs[:-1]
    common = 0
    while common < len(b_dirs) and common < len(i_segs) - 1 and b_dirs[common] == i_segs[common]:
        common += 1
    ups = len(b_dirs) - common
    rel_segs = [".."] * ups + i_segs[common:]
    rel = "/".join(rel_segs)
    if not rel:
        rel = "./"
    # a relative path can't start with a segment containing ':' (scheme confusion)
    first = rel.split("/", 1)[0]
    if ":" in first:
        rel = "./" + rel
    if len(rel) >= len(iri):
        return iri
    return rel + suffix
