"""Pure-Python parsing tests for the query_graph spark-submit job (the
end-to-end CLI is smoke-tested via spark-submit — see CLAUDE.md); the
execution paths it feeds are covered by tests/test_bgp.py."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "jobs"))
from query_graph import parse_filter, parse_pattern  # noqa: E402


def test_parse_pattern_triple_and_quad():
    assert parse_pattern("?s <urn:p> ?o") == ("?s", "<urn:p>", "?o")
    assert parse_pattern("?s <urn:p> ?o ?g") == ("?s", "<urn:p>", "?o", "?g")
    assert parse_pattern("?s <urn:p> ?o <urn:g>") == ("?s", "<urn:p>", "?o", "<urn:g>")
    with pytest.raises(SystemExit):
        parse_pattern("?s <urn:p>")
    with pytest.raises(SystemExit):
        parse_pattern("?s <urn:p> ?o ?g extra")


def test_cli_filter_parsing_rules():
    # strict-integer numeric detection + quoted lexical opt-out
    # (round-5 advice item)
    assert parse_filter("idx gt 5") == ("idx", "gt", 5)
    assert parse_filter("idx gt -5") == ("idx", "gt", -5)
    # '--5' previously crashed with an unhandled int() ValueError
    assert parse_filter("idx eq --5") == ("idx", "eq", "--5")
    # quoting forces lexical comparison against an all-digit literal
    assert parse_filter('idx eq "7"') == ("idx", "eq", "7")
    assert isinstance(parse_filter("idx eq 7")[2], int)
    assert parse_filter("e regex 7") == ("e", "regex", "7")


def test_update_graph_cli_graph_token_normalization():
    # the update job accepts graph tokens in BOTH the bare-IRI and the
    # <iri> form every pattern flag uses; '<urn:g1>' passed verbatim
    # would literal-compare against the bare-IRI graph column and
    # silently match nothing (round-5 review)
    from update_graph import graph_arg, src_dst, with_graph_arg

    assert graph_arg("urn:g1") == "urn:g1"
    assert graph_arg("<urn:g1>") == "urn:g1"
    assert graph_arg(" <urn:g1> ") == "urn:g1"
    assert graph_arg("DEFAULT") is None

    assert src_dst("--copy-graph", "<urn:a> DEFAULT") == ("urn:a", None)
    assert src_dst("--copy-graph", "urn:a urn:b") == ("urn:a", "urn:b")
    with pytest.raises(SystemExit):
        src_dst("--copy-graph", "urn:only-one")

    # WITH takes an IRI only — _scope_to_graph wraps the bare IRI in
    # <> itself, so a verbatim '<g>' would have produced '<<g>>'
    assert with_graph_arg("<urn:g1>") == "urn:g1"
    assert with_graph_arg("urn:g1") == "urn:g1"
    with pytest.raises(SystemExit):
        with_graph_arg("DEFAULT")


def test_sparql_flag_is_exclusive(monkeypatch, capsys):
    # --sparql carries the whole query: combining it with any pattern
    # flag must exit before a SparkSession is ever built
    from query_graph import main

    monkeypatch.setattr(sys, "argv", [
        "query_graph.py", "--triples", "t", "--output", "o",
        "--sparql", "SELECT * WHERE { ?s <http://p> ?o }",
        "--pattern", "?s <http://p> ?o",
    ])
    with pytest.raises(SystemExit, match="no other"):
        main()
