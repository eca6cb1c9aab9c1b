"""W3C JSON-LD 1.1 flatten test suite (58 cases).

Mirrors /root/reference/test/acceptance/w3c/flatten_test.exs.  Cases with
a compaction context are run once compaction lands; until then they are
executed through expand+flatten and compared only when no context is
given.
"""

from __future__ import annotations

import pytest

from jsonld_ex_spark.core.api import flatten
from jsonld_ex_spark.core.errors import JsonLdError

from tests.w3c_harness import (
    case_kind,
    case_options,
    input_url,
    is_1_0_only,
    load_json,
    manifest_cases,
)

CASES = manifest_cases("flatten")


def _id(case):
    return case["@id"]


ORDERING_SKIPS = {"#t0034", "#t0035", "#tin03"}


@pytest.mark.parametrize("ordered", [True, False], ids=["ordered", "unordered"])
@pytest.mark.parametrize("case", CASES, ids=_id)
def test_flatten(case, ordered):
    if is_1_0_only(case):
        pytest.skip("JSON-LD 1.0 only")
    if not ordered and case["@id"] in ORDERING_SKIPS:
        pytest.skip("ordering-sensitive comparison (reference skips too)")
    options = case_options(case)
    options.ordered = ordered
    kind = case_kind(case)
    ctx = load_json(case["context"]) if case.get("context") else None
    if ctx is not None:
        pytest.importorskip("jsonld_ex_spark.core.compaction")
    if kind == "positive":
        expected = load_json(case["expect"])
        actual = flatten(input_url(case), ctx, options)
        assert actual == expected
    elif kind == "negative":
        with pytest.raises(JsonLdError) as exc_info:
            flatten(input_url(case), ctx, options)
        assert exc_info.value.code == case["expectErrorCode"]
    else:
        pytest.skip(f"unhandled kind {kind}")
