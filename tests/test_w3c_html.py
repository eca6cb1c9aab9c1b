"""W3C JSON-LD 1.1 html test suite (50 cases: HTML Script Extraction).

The reference does NOT implement HTML extraction (its EARL reports the
html suite untested); this engine implements it with stdlib parsing —
all 50 cases run here.
"""

from __future__ import annotations

import pytest

from jsonld_ex_spark.core.api import compact, expand, flatten, to_rdf
from jsonld_ex_spark.core.context import Options, RemoteDocument
from jsonld_ex_spark.core.errors import JsonLdError
from jsonld_ex_spark.core.iri import resolve_iri
from jsonld_ex_spark.core.nquads import isomorphic, parse_nquads
from jsonld_ex_spark.sources.html_extraction import extract_html_jsonld

from tests.w3c_harness import (
    BASE_IRI,
    FIXTURE_DIR,
    fixture_loader,
    load_json,
    load_text,
    manifest_cases,
)

CASES = manifest_cases("html")


def make_loader(options: Options):
    def loader(url: str) -> RemoteDocument:
        base, _, fragment = url.partition("#")
        rel = base[len(BASE_IRI):]
        path = FIXTURE_DIR / rel
        if rel.endswith((".html", ".xhtml")):
            doc, base_href = extract_html_jsonld(
                path.read_text(),
                fragment=fragment or None,
                extract_all_scripts=bool(options.extract_all_scripts),
            )
            base_iri = None
            if base_href:
                base_iri = resolve_iri(options.base or base, base_href)
            return RemoteDocument(document=doc, document_url=base,
                                  content_type="text/html", base_iri=base_iri)
        return fixture_loader(url)

    return loader


def case_options(case: dict) -> Options:
    opts = case.get("option", {})
    o = Options()
    o.base = opts.get("base", BASE_IRI + case["input"])
    if "extractAllScripts" in opts:
        o.extract_all_scripts = opts["extractAllScripts"]
    if "processingMode" in opts:
        o.processing_mode = opts["processingMode"]
    if "expandContext" in opts:
        o.expand_context = load_json(opts["expandContext"])
    o.document_loader = make_loader(o)
    return o


def _id(case):
    return case["@id"]


@pytest.mark.parametrize("case", CASES, ids=_id)
def test_html(case):
    options = case_options(case)
    options.ordered = True
    input_url = BASE_IRI + case["input"]
    types = case["@type"]
    negative = "jld:NegativeEvaluationTest" in types

    def run():
        if "jld:ToRDFTest" in types:
            return to_rdf(input_url, options)
        if "jld:CompactTest" in types:
            return compact(input_url, load_json(case["context"]), options)
        if "jld:FlattenTest" in types:
            ctx = load_json(case["context"]) if case.get("context") else None
            return flatten(input_url, ctx, options)
        return expand(input_url, options)

    if negative:
        with pytest.raises(JsonLdError) as exc_info:
            run()
        assert exc_info.value.code == case["expectErrorCode"]
        return

    actual = run()
    if "jld:ToRDFTest" in types:
        expected = parse_nquads(load_text(case["expect"]))
        assert isomorphic(actual, expected)
    else:
        assert actual == load_json(case["expect"])
