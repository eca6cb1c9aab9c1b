"""W3C JSON-LD 1.1 compact test suite (246 cases).

Mirrors /root/reference/test/acceptance/w3c/compact_test.exs: positive
cases compare compacted output structurally (ordered=True); negative
cases assert exact spec error codes; 1.0-only cases skipped.
"""

from __future__ import annotations

import pytest

from jsonld_ex_spark.core.api import compact
from jsonld_ex_spark.core.errors import JsonLdError

from tests.w3c_harness import (
    case_kind,
    case_options,
    input_url,
    is_1_0_only,
    load_json,
    manifest_cases,
)

CASES = manifest_cases("compact")


def _id(case):
    return case["@id"]


@pytest.mark.parametrize("ordered", [True, False], ids=["ordered", "unordered"])
@pytest.mark.parametrize("case", CASES, ids=_id)
def test_compact(case, ordered):
    if is_1_0_only(case):
        pytest.skip("JSON-LD 1.0 only")
    options = case_options(case)
    options.ordered = ordered
    kind = case_kind(case)
    ctx = load_json(case["context"])
    kwargs = {}
    if kind == "positive":
        expected = load_json(case["expect"])
        actual = compact(input_url(case), ctx, options)
        assert actual == expected
    elif kind == "negative":
        with pytest.raises(JsonLdError) as exc_info:
            compact(input_url(case), ctx, options)
        assert exc_info.value.code == case["expectErrorCode"]
    else:
        pytest.skip(f"unhandled kind {kind}")
