"""Shared predicates & helpers (reference: lib/json/ld/utils.ex:11-151)."""

from __future__ import annotations

import re

KEYWORDS = frozenset(
    {
        "@base", "@container", "@context", "@direction", "@graph", "@id",
        "@import", "@included", "@index", "@json", "@language", "@list",
        "@nest", "@none", "@prefix", "@propagate", "@protected", "@reverse",
        "@set", "@type", "@value", "@version", "@vocab",
        # framing keywords recognized (not implemented) so they aren't
        # treated as IRIs:
        "@default", "@embed", "@explicit", "@omitDefault", "@requireAll",
        "@preserve", "@annotation",
    }
)

# "has the form of a keyword": @ followed by one or more ALPHA
_KEYWORD_FORM_RE = re.compile(r"^@[A-Za-z]+$")

# BCP47-ish language tag check (reference: utils.ex:11-29)
_LANGUAGE_TAG_RE = re.compile(r"^[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8})*$")

_BLANK_NODE_RE = re.compile(r"^_:")


def is_keyword(value: object) -> bool:
    return isinstance(value, str) and value in KEYWORDS


def has_keyword_form(value: object) -> bool:
    return isinstance(value, str) and _KEYWORD_FORM_RE.match(value) is not None


def is_blank_node_id(value: object) -> bool:
    return isinstance(value, str) and value.startswith("_:")


def is_scalar(value: object) -> bool:
    return isinstance(value, (str, int, float, bool))


def is_valid_language_tag(value: object) -> bool:
    return isinstance(value, str) and _LANGUAGE_TAG_RE.match(value) is not None


def is_value_object(value: object) -> bool:
    return isinstance(value, dict) and "@value" in value


def is_list_object(value: object) -> bool:
    return isinstance(value, dict) and "@list" in value


def is_set_object(value: object) -> bool:
    return isinstance(value, dict) and "@set" in value


def is_default_object(value: object) -> bool:
    return isinstance(value, dict) and "@default" in value


def is_node_object(value: object) -> bool:
    return (
        isinstance(value, dict)
        and "@value" not in value
        and "@list" not in value
        and "@set" not in value
    )


def is_graph_object(value: object) -> bool:
    """Spec definition: a map with @graph and at most @id/@index/@context."""
    return (
        isinstance(value, dict)
        and "@graph" in value
        and set(value.keys()) <= {"@graph", "@id", "@index", "@context"}
    )


def is_simple_graph_object(value: object) -> bool:
    return (
        is_graph_object(value)
        and "@id" not in value
        and set(value.keys()) <= {"@graph", "@index", "@context"}
    )


def compact_iri_parts(value: str) -> tuple[str, str] | None:
    """Split a potential compact IRI ``prefix:suffix``; None if not one.

    Mirrors the spec: suffix must not start with ``//`` (then it's an
    absolute-ish IRI), and prefix must not be ``_`` (blank node).
    """
    if ":" not in value:
        return None
    prefix, _, suffix = value.partition(":")
    if prefix == "_" or suffix.startswith("//"):
        return None
    return prefix, suffix


def as_list(value: object) -> list:
    return value if isinstance(value, list) else [value]
