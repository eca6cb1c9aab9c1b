"""Spec-example tests (mirrors reference test/unit/flattening_test.exs:9-57
— JSON-LD 1.1 spec EXAMPLE 60/61: flattening with a context)."""

from __future__ import annotations

from jsonld_ex_spark.core.api import flatten
from jsonld_ex_spark.core.context import Options

SPEC_INPUT = {
    "@context": {
        "name": "http://xmlns.com/foaf/0.1/name",
        "knows": "http://xmlns.com/foaf/0.1/knows",
    },
    "@id": "http://me.markus-lanthaler.com/",
    "name": "Markus Lanthaler",
    "knows": [
        {"@id": "http://manu.sporny.org/about#manu", "name": "Manu Sporny"},
        {"name": "Dave Longley"},
    ],
}


def test_spec_example_60_flattened_expanded():
    flattened = flatten(SPEC_INPUT, None, Options())
    assert flattened == [
        {
            "@id": "_:b0",
            "http://xmlns.com/foaf/0.1/name": [{"@value": "Dave Longley"}],
        },
        {
            "@id": "http://manu.sporny.org/about#manu",
            "http://xmlns.com/foaf/0.1/name": [{"@value": "Manu Sporny"}],
        },
        {
            "@id": "http://me.markus-lanthaler.com/",
            "http://xmlns.com/foaf/0.1/name": [{"@value": "Markus Lanthaler"}],
            "http://xmlns.com/foaf/0.1/knows": [
                {"@id": "http://manu.sporny.org/about#manu"},
                {"@id": "_:b0"},
            ],
        },
    ]


def test_spec_example_61_flattened_compacted():
    ctx = {
        "@context": {
            "name": "http://xmlns.com/foaf/0.1/name",
            "knows": "http://xmlns.com/foaf/0.1/knows",
        }
    }
    result = flatten(SPEC_INPUT, ctx, Options(ordered=True))
    assert result == {
        "@context": ctx["@context"],
        "@graph": [
            {"@id": "_:b0", "name": "Dave Longley"},
            {"@id": "http://manu.sporny.org/about#manu", "name": "Manu Sporny"},
            {
                "@id": "http://me.markus-lanthaler.com/",
                "knows": [{"@id": "http://manu.sporny.org/about#manu"}, {"@id": "_:b0"}],
                "name": "Markus Lanthaler",
            },
        ],
    }
