"""W3C JSON-LD 1.1 toRdf test suite (467 cases).

Mirrors /root/reference/test/acceptance/w3c/to_rdf_test.exs: positive
cases compare against the golden N-Quads via dataset isomorphism with
blank-node bijection; negative cases assert exact spec error codes.
Skips mirror the reference: 1.0-only cases, #te122 (spec issue 480) and
produceGeneralizedRdf cases (#t0118/#te075, no generalized-RDF support).
"""

from __future__ import annotations

import pytest

from jsonld_ex_spark.core.api import to_rdf
from jsonld_ex_spark.core.errors import JsonLdError
from jsonld_ex_spark.core.nquads import isomorphic, parse_nquads, quads_to_nquads

from tests.w3c_harness import (
    case_kind,
    case_options,
    input_url,
    is_1_0_only,
    load_text,
    manifest_cases,
)

REFERENCE_SKIPS = {"#te122": "w3c/json-ld-api#480 (reference skips too)"}

CASES = manifest_cases("toRdf")


def _id(case):
    return case["@id"]


@pytest.mark.parametrize("case", CASES, ids=_id)
def test_to_rdf(case):
    if is_1_0_only(case):
        pytest.skip("JSON-LD 1.0 only")
    if case["@id"] in REFERENCE_SKIPS:
        pytest.skip(REFERENCE_SKIPS[case["@id"]])
    # NB: produceGeneralizedRdf cases (#t0118/#te075) run and pass here —
    # the reference skips them (missing generalized-RDF support)
    options = case_options(case)
    kind = case_kind(case)
    if kind == "positive":
        expected = parse_nquads(load_text(case["expect"]))
        actual = to_rdf(input_url(case), options)
        assert isomorphic(actual, expected), (
            f"not isomorphic\n--- actual ---\n{quads_to_nquads(actual)}"
            f"\n--- expected ---\n{quads_to_nquads(expected)}"
        )
    elif kind == "negative":
        with pytest.raises(JsonLdError) as exc_info:
            to_rdf(input_url(case), options)
        assert exc_info.value.code == case["expectErrorCode"]
    elif kind == "positive_syntax":
        result = to_rdf(input_url(case), options)
        assert isinstance(result, list)
    else:
        pytest.skip(f"unhandled kind {kind}")
