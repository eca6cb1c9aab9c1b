"""W3C JSON-LD 1.1 remote-doc test suite (18 cases).

Mirrors /root/reference/test/acceptance/w3c/remote_doc_test.exs, which
stubs HTTP with Bypass; here the transport is a fake ``fetch`` that
serves the vendored fixture files with the per-case headers/redirects
from the manifest options.  #t0013 skipped (HTML support), matching the
reference.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from jsonld_ex_spark.core.api import expand
from jsonld_ex_spark.core.context import Options
from jsonld_ex_spark.core.errors import JsonLdError
from jsonld_ex_spark.sources.document_loader import HttpResponse, make_document_loader

from tests.w3c_harness import BASE_IRI, FIXTURE_DIR, case_kind, load_json, manifest_cases

CASES = manifest_cases("remote-doc")

REFERENCE_SKIPS = {"#t0013": "missing HTML support (reference skips too)"}

_EXT_TYPES = {
    ".jsonld": "application/ld+json",
    ".json": "application/json",
    ".html": "text/html",
    ".jldt": "application/octet-stream",
    ".jldte": "application/octet-stream",
}


def make_fetch(case: dict):
    opts = case.get("option", {})
    input_url = BASE_IRI + case["input"]

    def fetch(url: str) -> HttpResponse:
        rel = url[len(BASE_IRI):] if url.startswith(BASE_IRI) else None
        if rel is None:
            raise JsonLdError("loading document failed", f"non-fixture URL {url}")
        if url == input_url:
            if "redirectTo" in opts:
                return HttpResponse(
                    status=opts.get("httpStatus", 301),
                    headers={"Location": BASE_IRI + opts["redirectTo"]},
                )
            headers: dict = {}
            ext = Path(rel).suffix
            headers["Content-Type"] = opts.get("contentType", _EXT_TYPES.get(ext, "application/octet-stream"))
            if "httpLink" in opts:
                headers["Link"] = opts["httpLink"]
            path = FIXTURE_DIR / rel
            if not path.exists():
                return HttpResponse(status=404)
            return HttpResponse(status=200, headers=headers, body=path.read_text())
        path = FIXTURE_DIR / rel
        if not path.exists():
            return HttpResponse(status=404)
        ext = Path(rel).suffix
        return HttpResponse(
            status=200,
            headers={"Content-Type": _EXT_TYPES.get(ext, "application/octet-stream")},
            body=path.read_text(),
        )

    return fetch


def _id(case):
    return case["@id"]


@pytest.mark.parametrize("case", CASES, ids=_id)
def test_remote_doc(case):
    if case["@id"] in REFERENCE_SKIPS:
        pytest.skip(REFERENCE_SKIPS[case["@id"]])
    options = Options(document_loader=make_document_loader(make_fetch(case)), ordered=True)
    kind = case_kind(case)
    input_url = BASE_IRI + case["input"]
    if kind == "positive":
        expected = load_json(case["expect"])
        actual = expand(input_url, options)
        assert actual == expected
    elif kind == "negative":
        with pytest.raises(JsonLdError) as exc_info:
            expand(input_url, options)
        assert exc_info.value.code == case["expectErrorCode"]
    else:
        pytest.skip(f"unhandled kind {kind}")
