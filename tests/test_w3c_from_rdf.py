"""W3C JSON-LD 1.1 fromRdf test suite (53 cases).

Mirrors /root/reference/test/acceptance/w3c/from_rdf_test.exs: parse the
input N-Quads, serialize to expanded JSON-LD, compare structurally.
"""

from __future__ import annotations

import pytest

from jsonld_ex_spark.core.api import from_rdf
from jsonld_ex_spark.core.nquads import parse_nquads

from tests.w3c_harness import (
    case_kind,
    case_options,
    is_1_0_only,
    load_json,
    load_text,
    manifest_cases,
)

CASES = manifest_cases("fromRdf")


def _id(case):
    return case["@id"]


REFERENCE_SKIPS = {"#t0027": "w3c/json-ld-api#555 / PR 625 (reference skips too)"}


@pytest.mark.parametrize("ordered", [True, False], ids=["ordered", "unordered"])
@pytest.mark.parametrize("case", CASES, ids=_id)
def test_from_rdf(case, ordered):
    if is_1_0_only(case):
        pytest.skip("JSON-LD 1.0 only")
    if case["@id"] in REFERENCE_SKIPS:
        pytest.skip(REFERENCE_SKIPS[case["@id"]])
    options = case_options(case)
    options.ordered = ordered
    kind = case_kind(case)
    quads = parse_nquads(load_text(case["input"]))
    if kind == "positive":
        expected = load_json(case["expect"])
        actual = from_rdf(quads, options)
        assert actual == expected
    elif kind == "negative":
        from jsonld_ex_spark.core.errors import JsonLdError

        with pytest.raises(JsonLdError) as exc_info:
            from_rdf(quads, options)
        assert exc_info.value.code == case["expectErrorCode"]
    else:
        pytest.skip(f"unhandled kind {kind}")
