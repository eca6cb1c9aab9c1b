"""frameExpansion option behavior (spec §5.1.2 frame branches).

Mirrors the reference's implemented branches (expansion.ex:22-25 @default
reset, :252 only-@id retention, :356-413 @value/@language/@direction
patterns, :493-499 framing keywords) and covers the repo's
beyond-reference extensions (@id/@type {} wildcards and arrays — the
framing spec's frame-validity shapes, on which the reference raises).
Option-off behavior must be byte-identical to before (W3C suites guard
that globally; the negative cases here pin the specific branches).
"""

from __future__ import annotations

import pytest

from jsonld_ex_spark.core.api import expand
from jsonld_ex_spark.core.context import Options
from jsonld_ex_spark.core.errors import JsonLdError

FRAME = Options(frame_expansion=True)
DATA = Options()

CTX = {"@vocab": "http://ex.org/", "id": "@id", "type": "@type"}


def _exp(doc, options):
    return expand(doc, options)


def test_only_id_map_survives_frame_expansion():
    doc = {"@id": "http://ex.org/a"}
    assert _exp(doc, DATA) == []  # free-floating only-@id node drops
    assert _exp(doc, FRAME) == [{"@id": "http://ex.org/a"}]  # node PATTERN


def test_value_array_pattern_kept_verbatim():
    doc = {"@context": CTX, "p": {"@value": ["a", "b"]}}
    with pytest.raises(JsonLdError):
        _exp(doc, DATA)
    out = _exp(doc, FRAME)
    assert out == [{"http://ex.org/p": [{"@value": ["a", "b"]}]}]


def test_value_empty_map_wildcard():
    doc = {"@context": CTX, "p": {"@value": {}}}
    with pytest.raises(JsonLdError):
        _exp(doc, DATA)
    out = _exp(doc, FRAME)
    assert out == [{"http://ex.org/p": [{"@value": [{}]}]}]


def test_language_patterns():
    # string wraps in an array under frame expansion (reference :385-403)
    doc = {"@context": CTX, "p": {"@value": "x", "@language": "EN"}}
    assert _exp(doc, DATA) == [
        {"http://ex.org/p": [{"@value": "x", "@language": "en"}]}
    ]
    assert _exp(doc, FRAME) == [
        {"http://ex.org/p": [{"@value": "x", "@language": ["en"]}]}
    ]
    # list normalized per item; {} → [{}]
    doc2 = {"@context": CTX, "p": {"@value": ["x"], "@language": ["EN", "FR"]}}
    out2 = _exp(doc2, FRAME)
    assert out2[0]["http://ex.org/p"][0]["@language"] == ["en", "fr"]
    doc3 = {"@context": CTX, "p": {"@value": "x", "@language": {}}}
    assert _exp(doc3, FRAME)[0]["http://ex.org/p"][0]["@language"] == [{}]


def test_direction_patterns():
    doc = {"@context": CTX, "p": {"@value": "x", "@direction": "ltr"}}
    assert _exp(doc, DATA)[0]["http://ex.org/p"][0]["@direction"] == "ltr"
    assert _exp(doc, FRAME)[0]["http://ex.org/p"][0]["@direction"] == ["ltr"]
    doc2 = {"@context": CTX, "p": {"@value": "x", "@direction": ["ltr", "rtl"]}}
    with pytest.raises(JsonLdError):
        _exp(doc2, DATA)
    assert _exp(doc2, FRAME)[0]["http://ex.org/p"][0]["@direction"] == ["ltr", "rtl"]
    doc3 = {"@context": CTX, "p": {"@value": "x", "@direction": {}}}
    assert _exp(doc3, FRAME)[0]["http://ex.org/p"][0]["@direction"] == [{}]


def test_framing_keywords_expand_recursively():
    doc = {
        "@context": CTX,
        "@explicit": True,
        "@requireAll": False,
        "@embed": "@once",
        "p": {"@default": "fallback"},
    }
    # data mode ignores framing keywords (reference 13.4.15 `_ -> nil`):
    # @explicit/@requireAll/@embed drop, {@default: ...} becomes {}
    assert _exp(doc, DATA) == [{"http://ex.org/p": [{}]}]
    out = _exp(doc, FRAME)[0]
    assert out["@explicit"] == [{"@value": True}]
    assert out["@requireAll"] == [{"@value": False}]
    assert out["@embed"] == [{"@value": "@once"}]
    assert out["http://ex.org/p"] == [{"@default": [{"@value": "fallback"}]}]


def test_default_subtree_resets_frame_expansion():
    # inside @default, {} is DATA (an empty node object → dropped), not a
    # wildcard value pattern (reference expansion.ex:22-25)
    doc = {"@context": CTX, "p": {"@default": {"@value": {}}}}
    with pytest.raises(JsonLdError):
        _exp(doc, FRAME)


def test_id_wildcard_and_array_beyond_reference():
    doc = {"@context": CTX, "p": {"@id": {}}}
    with pytest.raises(JsonLdError):
        _exp(doc, DATA)
    assert _exp(doc, FRAME)[0]["http://ex.org/p"] == [{"@id": [{}]}]
    doc2 = {"@id": ["http://ex.org/a", "http://ex.org/b"]}
    with pytest.raises(JsonLdError):
        _exp(doc2, DATA)
    assert _exp(doc2, FRAME) == [{"@id": ["http://ex.org/a", "http://ex.org/b"]}]


def test_type_wildcard_and_default_beyond_reference():
    doc = {"@context": CTX, "@type": {}}
    with pytest.raises(JsonLdError):
        _exp(doc, DATA)
    # only-@type pattern node
    assert _exp(doc, FRAME) == [{"@type": [{}]}]
    doc2 = {"@context": CTX, "@type": {"@default": "T"}}
    out = _exp(doc2, FRAME)
    assert out == [{"@type": [{"@default": ["http://ex.org/T"]}]}]


def test_empty_value_array_is_match_none_pattern():
    doc = {"@context": CTX, "p": {"@value": []}}
    with pytest.raises(JsonLdError):  # data: non-scalar @value raises
        _exp(doc, DATA)
    assert _exp(doc, FRAME) == [{"http://ex.org/p": [{"@value": []}]}]
