"""Textual SPARQL front-end (operators/sparql_text.py).

Two layers: pure parser tests (no Spark — the parser is plain Python,
so every grammar production and error path is checked fast), then
Spark-vs-DuckDB equivalence for full textual queries — the SAME query
string compiled to a DataFrame plan and to oracle SQL must agree row
for row, the same contract every programmatic form is held to.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from jsonld_ex_spark.operators.sparql_text import (
    parse_sparql,
    sparql_oracle_sql,
    sparql_query,
)

NS = "http://ex.org/d/"
V = "http://ex.org/v#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"

P = f"PREFIX v: <{V}>\nPREFIX d: <{NS}>\n"


# --- pure parser -----------------------------------------------------


def test_basic_select_patterns():
    spec = parse_sparql(
        P + 'SELECT ?t ?e WHERE { ?t v:role "tool" ; v:mentions ?e , ?f . }'
    )
    assert spec["patterns"] == [
        ("?t", f"<{V}role>", '"tool"'),
        ("?t", f"<{V}mentions>", "?e"),
        ("?t", f"<{V}mentions>", "?f"),
    ]
    assert spec["project"] == ["t", "e"]
    assert spec["form"] == "select"


def test_a_keyword_and_integer_literals():
    spec = parse_sparql(P + "SELECT ?s WHERE { ?s a v:Entity ; v:idx 5 . }")
    assert spec["patterns"] == [
        ("?s", f"<{RDF_TYPE}>", f"<{V}Entity>"),
        ("?s", f"<{V}idx>", '"5"'),
    ]


def test_filter_pushdown_routing():
    spec = parse_sparql(
        P + 'SELECT * WHERE { ?t v:idx ?i . FILTER(?i > 3 && ?i != 7) }'
    )
    assert sorted(spec["filters"]) == [("i", "gt", 3), ("i", "ne", 7)]
    assert spec["filter_exprs"] == []


def test_filter_before_pattern_still_pushes_down():
    spec = parse_sparql(
        P + 'SELECT * WHERE { FILTER(?i > 3) ?t v:idx ?i . }'
    )
    assert spec["filters"] == [("i", "gt", 3)]


def test_complex_filter_goes_post_join():
    spec = parse_sparql(
        P + 'SELECT * WHERE { ?t v:name ?n . OPTIONAL { ?t v:tag ?g } '
            'FILTER(BOUND(?g) || STRSTARTS(?n, "a")) }'
    )
    assert spec["filters"] == []
    assert spec["filter_exprs"] == [
        ("or", ("bound", "g"), ("strstarts", "n", "a"))
    ]


def test_regex_and_in_filters():
    spec = parse_sparql(
        P + 'SELECT * WHERE { ?t v:name ?n . FILTER(REGEX(?n, "^a.*")) '
            'FILTER(?n IN ("x", "y")) }'
    )
    assert spec["filters"] == [("n", "regex", "^a.*")]
    assert spec["values"] == {"n": ["x", "y"]}


def test_property_path_parsing():
    spec = parse_sparql(
        "PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>\n"
        + P
        + "SELECT ?c ?t WHERE { ?c v:turns/rdf:rest*/rdf:first ?t . }"
    )
    assert spec["paths"] == [(
        "?c",
        ("seq", f"{V}turns",
         ("star", "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"),
         "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"),
        "?t",
    )]
    assert spec["patterns"] == []


def test_path_alternative_inverse_negated():
    spec = parse_sparql(
        P + "SELECT * WHERE { ?a (v:p|^v:q)+ ?b . ?a !(v:r|v:s) ?c . }"
    )
    assert spec["paths"][0][1] == ("plus", ("alt", f"{V}p", ("inv", f"{V}q")))
    assert spec["paths"][1][1] == ("neg", f"{V}r", f"{V}s")


def test_optional_minus_exists_groups():
    spec = parse_sparql(
        P + 'SELECT * WHERE { ?t v:mentions ?e . OPTIONAL { ?e v:label ?l } '
            'MINUS { ?t v:role "tool" } FILTER EXISTS { ?e a v:Entity } '
            'FILTER NOT EXISTS { ?e v:hidden "true" } }'
    )
    assert spec["optional"] == [[("?e", f"<{V}label>", "?l")]]
    assert spec["minus"] == [[("?t", f"<{V}role>", '"tool"')]]
    assert spec["exists"] == [[("?e", f"<{RDF_TYPE}>", f"<{V}Entity>")]]
    assert spec["not_exists"] == [[("?e", f"<{V}hidden>", '"true"')]]


def test_bind_expressions():
    spec = parse_sparql(
        P + 'SELECT * WHERE { ?t v:name ?n ; v:idx ?i . '
            'BIND(CONCAT("x:", ?n) AS ?cn) BIND(?i * 2 + 1 AS ?j) '
            'BIND(STRLEN(?n) AS ?ln) BIND(LANG(?n) AS ?lg) }'
    )
    assert spec["bind"]["cn"] == ("concat", ("lit", "x:"), "n")
    assert spec["bind"]["j"] == ("add", ("mul", "i", 2), 1)
    assert spec["bind"]["ln"] == ("strlen", "n")
    assert spec["annotations"]["lg"] == ("n", "lang")
    assert "lg" not in spec["hidden_annots"]


def test_lang_in_filter_makes_hidden_annotation():
    spec = parse_sparql(
        P + 'SELECT * WHERE { ?s v:label ?o . FILTER(LANGMATCHES(LANG(?o), "en")) }'
    )
    assert spec["annotations"] == {"_lang_o": ("o", "lang")}
    assert spec["hidden_annots"] == {"_lang_o"}
    assert spec["filter_exprs"] == [("langmatches", "_lang_o", "en")]


def test_datatype_filter():
    spec = parse_sparql(
        "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n" + P
        + "SELECT * WHERE { ?s v:n ?o . FILTER(DATATYPE(?o) = xsd:integer) }"
    )
    assert spec["annotations"] == {"_dt_o": ("o", "datatype")}
    assert spec["filter_exprs"] == [("eq", "_dt_o", ("lit", XSD_INT))]


def test_aggregates_group_by_having():
    spec = parse_sparql(
        P + "SELECT ?e (COUNT(?t) AS ?n) (SUM(?i) AS ?s) WHERE "
            "{ ?t v:mentions ?e ; v:idx ?i } GROUP BY ?e "
            "HAVING(?n > 2) ORDER BY DESC(?n) ?e LIMIT 5 OFFSET 5"
    )
    agg = spec["agg"]
    assert agg["group_by"] == ["e"]
    assert agg["aggs"] == {"n": ("count", "t"), "s": ("sum", "i")}
    assert agg["having"] == [("n", "gt", 2)]
    assert spec["order_by"] == [("n", "desc"), ("e", "asc")]
    assert spec["limit"] == 5 and spec["offset"] == 5


def test_count_star_distinct_and_having_by_call():
    spec = parse_sparql(
        P + "SELECT ?e (COUNT(*) AS ?n) (COUNT(DISTINCT ?t) AS ?d) WHERE "
            "{ ?t v:mentions ?e } GROUP BY ?e HAVING(COUNT(DISTINCT ?t) >= 2)"
    )
    assert spec["agg"]["aggs"] == {"n": ("count", None), "d": ("count_distinct", "t")}
    assert spec["agg"]["having"] == [("d", "ge", 2)]


def test_subquery():
    spec = parse_sparql(
        P + "SELECT ?t ?e ?n WHERE { ?t v:mentions ?e . "
            "{ SELECT ?e (COUNT(?x) AS ?n) WHERE { ?x v:mentions ?e } GROUP BY ?e } }"
    )
    assert spec["subqueries"] == [{
        "patterns": [("?x", f"<{V}mentions>", "?e")],
        "group_by": ["e"], "aggs": {"n": ("count", "x")},
    }]


def test_values_single_and_multi():
    spec = parse_sparql(
        P + 'SELECT * WHERE { ?t v:role ?r ; v:name ?n . '
            'VALUES ?r { "tool" "user" } VALUES (?n) { ("a") ("b") } }'
    )
    assert spec["values"] == {"r": ["tool", "user"]}
    assert spec["values_rows"] == (("n",), [("a",), ("b",)])


def test_graph_clause():
    spec = parse_sparql(
        P + "SELECT * WHERE { GRAPH ?g { ?t v:role ?r } "
            "GRAPH d:g1 { ?t v:name ?n } }"
    )
    assert spec["patterns"] == [
        ("?t", f"<{V}role>", "?r", "?g"),
        ("?t", f"<{V}name>", "?n", f"<{NS}g1>"),
    ]


def test_union():
    # identical-variable branches take the embedded (joinable) form
    spec = parse_sparql(
        P + 'SELECT ?x WHERE { { ?x v:role "tool" } UNION { ?x v:role "user" } }'
    )
    assert spec["union"] is None
    assert spec["unions"] == [[
        [("?x", f"<{V}role>", '"tool"')],
        [("?x", f"<{V}role>", '"user"')],
    ]]
    # differing-variable branches keep the standalone NULL-padding form
    spec2 = parse_sparql(
        P + 'SELECT ?x ?y WHERE { { ?x v:role "tool" } UNION { ?y v:role "user" } }'
    )
    assert spec2["union"] == [
        [("?x", f"<{V}role>", '"tool"')],
        [("?y", f"<{V}role>", '"user"')],
    ] and spec2["unions"] == []


def test_ask_construct_describe():
    ask = parse_sparql(P + 'ASK { ?t v:role "tool" }')
    assert ask["form"] == "ask"
    con = parse_sparql(
        P + "CONSTRUCT { ?e a v:Entity } WHERE { ?t v:mentions ?e }"
    )
    assert con["template"] == [("?e", f"<{RDF_TYPE}>", f"<{V}Entity>")]
    des = parse_sparql(f"DESCRIBE <{NS}1> <{NS}2>")
    assert des["roots"] == [f"{NS}1", f"{NS}2"]


def test_string_escapes_and_comments():
    spec = parse_sparql(
        P + '# a comment\nSELECT * WHERE { ?t v:name "a\\"b\\nc" . } # tail'
    )
    assert spec["patterns"] == [("?t", f"<{V}name>", '"a"b\nc"')]


@pytest.mark.parametrize("query,msg", [
    ('SELECT * WHERE { ?t <http://p> "x"@en }', "language-tagged"),
    ("SELECT * WHERE { ?t <http://p> ?o } ORDER BY ?o", "ORDER BY requires LIMIT"),
    ("SELECT * WHERE { ?t <http://p> ?o } LIMIT 5", "LIMIT requires ORDER BY"),
    ("SELECT * WHERE { ?t v:p ?o }", "undeclared prefix"),
    ("SELECT (COUNT(?t) AS ?n) WHERE { ?t <http://p> ?o }", "GROUP BY"),
    ("SELECT ?o (MAX(*) AS ?m) WHERE { ?t <http://p> ?o } GROUP BY ?o",
     "not valid SPARQL"),
    ("SELECT * WHERE { ?t <http://p> ?o . { ?t <http://q> ?x } UNION "
     "{ ?t <http://r> ?y } }", "identical variable sets"),
    ("SELECT * WHERE { OPTIONAL { ?a <http://p> ?b . BIND(STR(?b) AS ?s) } "
     "?a <http://q> ?c }", "plain triple patterns"),
    ("SELECT * WHERE { MINUS { ?a <http://p> ?b . VALUES ?b { \"x\" } } "
     "?a <http://q> ?c }", "plain triple patterns"),
    ("ASK { ?a <http://p>+ ?b }", "plain triple patterns only"),
    ("SELECT * WHERE { ?a <http://p> ?b } trailing", "trailing tokens"),
    ("SELECT * WHERE { VALUES ?v { UNDEF } ?a <http://p> ?v }", "UNDEF"),
    ("SELECT * WHERE { ?a <http://p> ?b . "
     "{ SELECT ?b WHERE { ?x <http://q> ?b } } }", "subqueries must aggregate"),
])
def test_rejections(query, msg):
    from jsonld_ex_spark.operators.sparql_text import _check_modifiers

    with pytest.raises(ValueError, match=msg):
        _check_modifiers(parse_sparql(query))


# --- Spark vs DuckDB equivalence ------------------------------------

SCHEMA = (
    "subj string, pred string, obj string, obj_is_iri boolean, "
    "obj_dt string, obj_lang string, graph string"
)


def _rows():
    rows = []
    for i in range(12):
        s = f"{NS}{i}"
        lang = ["en", "en-GB", None][i % 3]
        rows.append((s, V + "name", f"name{i}", False, None, lang, None))
        rows.append((s, V + "idx", str(i), False, XSD_INT, None, None))
        rows.append((s, V + "mentions", f"{NS}e{i % 3}", True, None, None, None))
        if i % 4 == 0:
            rows.append((s, V + "rating", str(i % 5), False, None, None, None))
        if i % 2 == 0:
            rows.append((s, V + "role", "tool", False, None, None, None))
        else:
            rows.append((s, V + "role", "user", False, None, None, None))
        if i % 3 == 0:
            rows.append((s, V + "next", f"{NS}{(i + 1) % 12}", True, None, None, None))
    for j in range(3):
        rows.append((f"{NS}e{j}", RDF_TYPE, V + "Entity", True, None, None, f"{NS}g1"))
    return rows


@pytest.fixture()
def triples(spark):  # noqa: F811
    return spark.createDataFrame(_rows(), SCHEMA)


@pytest.fixture()
def oracle():
    con = duckdb.connect()
    con.register(
        "tri_src",
        pd.DataFrame(_rows(), columns=[
            "subj", "pred", "obj", "obj_is_iri", "obj_dt", "obj_lang", "graph",
        ]),
    )
    return con


from tests.spark_fixtures import spark  # noqa: F401,E402


def _match(triples, con, query, order_cols):
    sdf = sparql_query(triples, query)
    sql = sparql_oracle_sql("SELECT * FROM tri_src", query)
    order = ", ".join(order_cols)
    got = [tuple(r) for r in sdf.orderBy(*order_cols).collect()]
    want = [
        tuple(r)
        for r in con.execute(f"SELECT * FROM ({sql}) q ORDER BY {order}")
        .df().itertuples(index=False)
    ]
    assert got == want
    return got


@pytest.mark.spark
def test_text_select_filter_bind(triples, oracle):
    q = (
        P + 'SELECT ?d ?n ?lab WHERE {\n'
            '  ?d v:name ?n ; v:idx ?i .\n'
            '  OPTIONAL { ?d v:rating ?r }\n'
            '  BIND(IF(BOUND(?r), CONCAT("rated:", ?r), "unrated") AS ?lab)\n'
            '  FILTER(?i > 1)\n'
            '  FILTER(STRSTARTS(?n, "name"))\n'
            '}'
    )
    got = _match(triples, oracle, q, ["d"])
    by_d = {r[0]: r for r in got}
    assert by_d[f"{NS}4"][2] == "rated:4"
    assert by_d[f"{NS}5"][2] == "unrated"
    assert f"{NS}0" not in by_d and f"{NS}1" not in by_d


@pytest.mark.spark
def test_text_aggregate_page(triples, oracle):
    q = (
        P + "SELECT ?e (COUNT(?d) AS ?n) (GROUP_CONCAT(?r) AS ?roles) WHERE {\n"
            "  ?d v:mentions ?e ; v:role ?r .\n"
            "} GROUP BY ?e HAVING(?n >= 2) ORDER BY DESC(?n) ?e LIMIT 2 OFFSET 1"
    )
    got = _match(triples, oracle, q, ["e"])
    assert len(got) == 2


@pytest.mark.spark
def test_text_langmatches_annotation(triples, oracle):
    q = (
        P + 'SELECT ?d ?n WHERE { ?d v:name ?n . '
            'FILTER(LANGMATCHES(LANG(?n), "en")) }'
    )
    got = _match(triples, oracle, q, ["d"])
    # docs 0,1,3,4,6,7,9,10 have en/en-GB names; 2,5,8,11 are untagged
    assert {r[0] for r in got} == {f"{NS}{i}" for i in range(12) if i % 3 != 2}


@pytest.mark.spark
def test_text_path_union_graph(triples, oracle):
    qp = P + "SELECT ?a ?b WHERE { ?a v:next+ ?b . }"
    _match(triples, oracle, qp, ["a", "b"])
    qu = (
        P + 'SELECT ?x WHERE { { ?x v:role "tool" } UNION { ?x v:rating "0" } }'
    )
    got = _match(triples, oracle, qu, ["x"])
    assert len(got) == 7  # 6 tool-role + doc 0's rating "0" (bag semantics)
    qg = P + "SELECT ?g ?e WHERE { GRAPH ?g { ?e a v:Entity } }"
    got = _match(triples, oracle, qg, ["e"])
    assert all(r[0] == f"{NS}g1" for r in got)


@pytest.mark.spark
def test_text_subquery_minus_exists(triples, oracle):
    q = (
        P + "SELECT ?d ?e ?n WHERE {\n"
            "  ?d v:mentions ?e .\n"
            '  MINUS { ?d v:role "user" }\n'
            "  { SELECT ?e (COUNT(?x) AS ?n) WHERE { ?x v:mentions ?e } GROUP BY ?e }\n"
            "}"
    )
    got = _match(triples, oracle, q, ["d", "e"])
    assert got and all(r[2] == 4 for r in got)


@pytest.mark.spark
def test_text_values_distinct(triples, oracle):
    q = (
        P + 'SELECT DISTINCT ?r WHERE { ?d v:role ?r . VALUES ?r { "tool" "user" } }'
    )
    got = _match(triples, oracle, q, ["r"])
    assert [r[0] for r in got] == ["tool", "user"]


@pytest.mark.spark
def test_text_ask_construct(triples, oracle):
    got = _match(triples, oracle, P + 'ASK { ?t v:role "tool" }', ["ask_id"])
    assert got[0][1] == True  # noqa: E712
    qc = (
        P + "CONSTRUCT { ?e a v:Entity . ?e v:mentionedBy ?d } "
            "WHERE { ?d v:mentions ?e }"
    )
    got = _match(triples, oracle, qc, ["subj", "pred", "obj"])
    assert len(got) == 3 + 12  # 3 type triples + 12 distinct mentionedBy


@pytest.mark.spark
def test_text_describe(triples, oracle):
    got = _match(
        triples, oracle, f"DESCRIBE <{NS}0> <{NS}3>",
        ["root", "subj", "pred", "obj"],
    )
    assert {r[0] for r in got} == {f"{NS}0", f"{NS}3"}


@pytest.mark.spark
def test_text_matches_programmatic(triples):
    """The textual path and the programmatic path compile to the same
    result set for the same logical query."""
    from jsonld_ex_spark.operators.bgp import bgp_select

    q = P + 'SELECT ?d ?e WHERE { ?d v:mentions ?e ; v:role "tool" . }'
    text_rows = sorted(map(tuple, sparql_query(triples, q).collect()))
    prog_rows = sorted(map(tuple, bgp_select(
        triples,
        [("?d", f"<{V}mentions>", "?e"), ("?d", f"<{V}role>", '"tool"')],
        project=["d", "e"],
    ).collect()))
    assert text_rows == prog_rows


# --- review-hardening regressions (round 6) --------------------------


def test_pname_local_cannot_end_with_dot():
    # 'v:o.' flush against the terminator: SPARQL PN_LOCAL forbids a
    # trailing dot, so the '.' is the triple terminator, not IRI text
    spec = parse_sparql(P + "SELECT * WHERE { ?s v:p v:o. ?s v:q ?x }")
    assert spec["patterns"][0] == ("?s", f"<{V}p>", f"<{V}o>")
    assert spec["patterns"][1] == ("?s", f"<{V}q>", "?x")
    # dots INSIDE a local name still work
    spec2 = parse_sparql(P + "SELECT * WHERE { ?s v:a.b ?x }")
    assert spec2["patterns"][0] == ("?s", f"<{V}a.b>", "?x")


def test_malformed_unicode_escape_raises():
    with pytest.raises(ValueError, match="uXXXX"):
        parse_sparql(P + 'SELECT * WHERE { ?s v:p "\\u41" }')


def test_replace_rejects_regex_metacharacters():
    with pytest.raises(ValueError, match="fixed-string"):
        parse_sparql(
            P + 'SELECT * WHERE { ?s v:p ?o . BIND(REPLACE(?o, ".", "-") AS ?r) }'
        )
    # fixed strings still fine
    spec = parse_sparql(
        P + 'SELECT * WHERE { ?s v:p ?o . BIND(REPLACE(?o, "a-b", "c") AS ?r) }'
    )
    assert spec["bind"]["r"] == ("replace", "o", "a-b", "c")


def test_in_keeps_integer_semantics():
    # IN is '=' over each element: ints keep the numeric-guard path
    spec = parse_sparql(
        P + "SELECT * WHERE { ?s v:n ?i . FILTER(?i IN (5, 7) || BOUND(?s)) }"
    )
    cond = spec["filter_exprs"][0]
    assert ("cmp", "i", "eq", 5) in cond[1][1:] or cond[1] == ("or", ("cmp", "i", "eq", 5), ("cmp", "i", "eq", 7))
    # standalone integer IN compiles to cmp filters, not lexical VALUES
    spec2 = parse_sparql(P + "SELECT * WHERE { ?s v:n ?i . FILTER(?i IN (5, 7)) }")
    assert spec2["values"] == {}
    assert spec2["filter_exprs"] == [
        ("or", ("cmp", "i", "eq", 5), ("cmp", "i", "eq", 7))
    ]


def test_union_with_aggregates():
    # identical-variable union branches: aggregation over the union now
    # compiles (embedded form)
    spec = parse_sparql(
        P + "SELECT ?e (COUNT(?e) AS ?n) WHERE "
            "{ { ?t v:mentions ?e } UNION { ?t v:cites ?e } } GROUP BY ?e"
    )
    assert spec["agg"] is not None and len(spec["unions"]) == 1
    # differing-variable branches (standalone form) still reject
    with pytest.raises(ValueError, match="UNION queries do not support"):
        parse_sparql(
            P + "SELECT ?e (COUNT(?e) AS ?n) WHERE "
                "{ { ?t v:mentions ?e } UNION { ?x v:cites ?e } } GROUP BY ?e"
        )


def test_subquery_rejects_modifiers():
    with pytest.raises(ValueError, match="subqueries do not support"):
        parse_sparql(
            P + "SELECT * WHERE { ?t v:mentions ?e . "
                "{ SELECT ?e (COUNT(?x) AS ?n) WHERE { ?x v:mentions ?e } "
                "GROUP BY ?e OFFSET 5 } }"
        )
    with pytest.raises(ValueError, match="subqueries do not support"):
        parse_sparql(
            P + "SELECT * WHERE { ?t v:mentions ?e . "
                "{ SELECT ?e (COUNT(?x) AS ?n) WHERE { ?x v:mentions ?e } "
                "GROUP BY ?e LIMIT 0 } }"
        )


def test_limit_offset_require_integer_tokens():
    with pytest.raises(ValueError, match="LIMIT takes a non-negative integer"):
        parse_sparql(P + "SELECT * WHERE { ?s v:p ?o } ORDER BY ?s LIMIT abc")
    with pytest.raises(ValueError, match="OFFSET takes a non-negative integer"):
        parse_sparql(P + "SELECT * WHERE { ?s v:p ?o } ORDER BY ?s LIMIT 5 OFFSET ?x")


# --- textual SPARQL Update -------------------------------------------

from jsonld_ex_spark.operators.sparql_text import (  # noqa: E402
    parse_sparql_update,
    run_sparql_update,
)


def test_parse_insert_data():
    spec = parse_sparql_update(
        P + 'INSERT DATA { d:1 v:role "tool" . d:1 v:n "5"^^<http://www.w3.org/2001/XMLSchema#integer> . '
            'd:1 v:label "hi"@en . GRAPH d:g1 { d:1 v:x d:2 } }'
    )
    assert spec["form"] == "insert_data"
    assert spec["quads"] == [
        (f"<{NS}1>", f"<{V}role>", '"tool"'),
        (f"<{NS}1>", f"<{V}n>", '"5"^^<http://www.w3.org/2001/XMLSchema#integer>'),
        (f"<{NS}1>", f"<{V}label>", '"hi"@en'),
        (f"<{NS}1>", f"<{V}x>", f"<{NS}2>", f"<{NS}g1>"),
    ]


def test_parse_delete_forms_and_graph_management():
    dd = parse_sparql_update(P + 'DELETE DATA { d:1 v:role "tool" }')
    assert dd["form"] == "delete_data"
    dw = parse_sparql_update(P + "DELETE WHERE { ?t v:tool ?n }")
    assert dw == {
        "form": "delete_where",
        "patterns": [("?t", f"<{V}tool>", "?n")], "with_graph": None,
    }
    m = parse_sparql_update(
        P + 'WITH d:g1 DELETE { ?t v:tool ?n } INSERT { ?t v:redacted "true" } '
            'WHERE { ?t v:tool ?n . FILTER(?n != "kb") }'
    )
    assert m["form"] == "modify" and m["with_graph"] == f"{NS}g1"
    assert m["filters"] == [("n", "ne", "kb")]
    assert parse_sparql_update(f"CLEAR GRAPH <{NS}g1>") == {
        "form": "clear", "graph": f"{NS}g1",
    }
    assert parse_sparql_update("CLEAR DEFAULT") == {"form": "clear", "graph": None}
    assert parse_sparql_update(f"COPY GRAPH <{NS}a> TO DEFAULT") == {
        "form": "copy", "src": f"{NS}a", "dst": None,
    }


def test_update_rejections():
    with pytest.raises(ValueError, match="ground terms only"):
        parse_sparql_update(P + "INSERT DATA { ?s v:p d:1 }")
    with pytest.raises(ValueError, match="do not support OPTIONAL"):
        parse_sparql_update(
            P + "DELETE { ?t v:p ?o } WHERE { ?t v:p ?o . OPTIONAL { ?t v:q ?x } }"
        )
    # exact-term literals stay update-side only
    with pytest.raises(ValueError, match="not supported"):
        parse_sparql(P + 'SELECT * WHERE { ?s v:p "x"@en }')


@pytest.mark.spark
def test_run_sparql_update_end_to_end(spark, tmp_path):  # noqa: F811
    from jsonld_ex_spark.sources.snapshot_table import read_snapshot

    t = str(tmp_path / "tbl")
    r = run_sparql_update(
        spark, t,
        P + 'INSERT DATA { d:t1 v:role "tool" . d:t1 v:tool "kb" . '
            'd:t2 v:role "user" . d:t2 v:n "7"^^<http://www.w3.org/2001/XMLSchema#integer> . '
            'd:t2 v:n "7" }',
    )
    assert r["kind"] == "insert_data"
    cols = ["subj", "pred", "obj", "obj_is_iri", "obj_dt", "obj_lang", "graph"]
    rows = {tuple(x) for x in read_snapshot(spark, t).select(*cols).collect()}
    assert (f"{NS}t2", f"{V}n", "7", False,
            "http://www.w3.org/2001/XMLSchema#integer", None, None) in rows
    # exact-term DELETE DATA: the typed literal dies, the plain survives
    r2 = run_sparql_update(
        spark, t,
        P + 'DELETE DATA { d:t2 v:n "7"^^<http://www.w3.org/2001/XMLSchema#integer> }',
    )
    assert r2["kind"] == "delete_data"
    objs = [
        (x["obj"], x["obj_dt"]) for x in read_snapshot(spark, t)
        .filter("pred = '%sn'" % V).collect()
    ]
    assert objs == [("7", None)]
    # modify: redact tool turns
    r3 = run_sparql_update(
        spark, t,
        P + 'DELETE { ?t v:tool ?n } INSERT { ?t v:redacted "true" } '
            'WHERE { ?t v:tool ?n }',
    )
    assert r3["kind"] == "modify"
    rows3 = {(x["subj"], x["pred"], x["obj"]) for x in read_snapshot(spark, t).collect()}
    assert (f"{NS}t1", f"{V}redacted", "true") in rows3
    assert not any(p == f"{V}tool" for _, p, _ in rows3)


def test_parse_describe_where():
    spec = parse_sparql(
        P + 'DESCRIBE ?e WHERE { ?t v:mentions ?e ; v:role "tool" . }'
    )
    assert spec["form"] == "describe_where" and spec["var"] == "e"
    assert len(spec["patterns"]) == 2
    with pytest.raises(ValueError, match="does not support BIND"):
        parse_sparql(
            P + 'DESCRIBE ?e WHERE { ?t v:mentions ?e . BIND(STR(?e) AS ?x) }'
        )


@pytest.mark.spark
def test_text_describe_where(triples, oracle):
    q = P + 'DESCRIBE ?e WHERE { ?d v:mentions ?e ; v:role "tool" . }'
    got = _match(triples, oracle, q, ["root", "subj", "pred", "obj"])
    assert {r[0] for r in got} == {f"{NS}e0", f"{NS}e1", f"{NS}e2"}


def test_parse_isiri_isliteral_isblank():
    spec = parse_sparql(
        P + "SELECT * WHERE { ?s v:p ?o . FILTER(ISIRI(?o) || ISBLANK(?o)) }"
    )
    assert spec["annotations"] == {"_tt_o": ("o", "termtype")}
    assert spec["filter_exprs"] == [(
        "or", ("eq", "_tt_o", ("lit", "iri")), ("eq", "_tt_o", ("lit", "bnode")),
    )]


@pytest.mark.spark
def test_text_isliteral_both_engines(triples, oracle):
    q = P + "SELECT ?d ?x WHERE { ?d v:mentions ?x . FILTER(ISIRI(?x)) }"
    got = _match(triples, oracle, q, ["d", "x"])
    assert len(got) == 12  # every mention object is an IRI
    q2 = P + "SELECT ?d ?x WHERE { ?d v:role ?x . FILTER(ISLITERAL(?x)) }"
    got2 = _match(triples, oracle, q2, ["d", "x"])
    assert len(got2) == 12
    q3 = P + "SELECT ?d ?x WHERE { ?d v:role ?x . FILTER(ISIRI(?x)) }"
    assert _match(triples, oracle, q3, ["d"]) == []


def test_parse_numeric_expression_filter():
    spec = parse_sparql(
        P + "SELECT * WHERE { ?s v:name ?n ; v:idx ?i . "
            "FILTER(STRLEN(?n) > 5) FILTER(?i * 2 >= STRLEN(?n)) }"
    )
    assert spec["filter_exprs"] == [
        ("num_cmp", ("strlen", "n"), "gt", 5),
        ("num_cmp", ("mul", "i", 2), "ge", ("strlen", "n")),
    ]


@pytest.mark.spark
def test_text_strlen_filter_both_engines(triples, oracle):
    # name10/name11 are the only 6-char names
    q = P + "SELECT ?d ?n WHERE { ?d v:name ?n . FILTER(STRLEN(?n) > 5) }"
    got = _match(triples, oracle, q, ["d"])
    assert {r[1] for r in got} == {"name10", "name11"}
    # arithmetic vs guarded var cast: idx*2 > 20 -> idx 11 only
    q2 = P + "SELECT ?d ?i WHERE { ?d v:idx ?i . FILTER(?i * 2 > 20) }"
    got2 = _match(triples, oracle, q2, ["d"])
    assert [r[1] for r in got2] == ["11"]


# --- property-based round trip ---------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_vars = st.sampled_from(["a", "b", "c", "d"])
_iris = st.sampled_from([f"{V}p1", f"{V}p2", f"{V}p3", f"{NS}x1", f"{NS}x2"])
_lit_text = st.text(
    alphabet=st.characters(
        min_codepoint=32, max_codepoint=126, blacklist_characters='"\\',
    ),
    min_size=1, max_size=8,
)


@st.composite
def _term(draw, positions=("var", "iri", "lit")):
    kind = draw(st.sampled_from(positions))
    if kind == "var":
        return "?" + draw(_vars)
    if kind == "iri":
        return f"<{draw(_iris)}>"
    return f'"{draw(_lit_text)}"'


@st.composite
def _pattern(draw):
    return (
        draw(_term(("var", "iri"))),
        draw(_term(("var", "iri"))),
        draw(_term()),
    )


@settings(max_examples=120, deadline=None)
@given(
    patterns=st.lists(_pattern(), min_size=1, max_size=4),
    filt=st.one_of(
        st.none(),
        st.tuples(_vars, st.sampled_from([">", "<", ">=", "<=", "=", "!="]),
                  st.integers(min_value=-99, max_value=99)),
    ),
    page=st.one_of(
        st.none(),
        st.tuples(_vars, st.booleans(),
                  st.integers(min_value=1, max_value=50),
                  st.integers(min_value=0, max_value=20)),
    ),
    distinct=st.booleans(),
)
def test_render_parse_round_trip(patterns, filt, page, distinct):
    """Any spec rendered to SPARQL text parses back to exactly the
    engine tuples it came from — the parser neither drops nor invents
    structure across the pattern/filter/modifier grammar."""
    body = " ".join(" ".join(p) + " ." for p in patterns)
    text = "SELECT" + (" DISTINCT" if distinct else "") + " * WHERE { " + body
    expect_filters, expect_exprs = [], []
    if filt is not None:
        var, op, val = filt
        text += f" FILTER(?{var} {op} {val})"
        opname = {">": "gt", "<": "lt", ">=": "ge", "<=": "le",
                  "=": "eq", "!=": "ne"}[op]
        bound = {v[1:] for p in patterns for v in p if v.startswith("?")}
        (expect_filters if var in bound else expect_exprs).append(
            (var, opname, val) if var in bound else ("cmp", var, opname, val)
        )
    text += " }"
    if page is not None:
        var, desc, limit, offset = page
        text += f" ORDER BY {'DESC(?' + var + ')' if desc else '?' + var}"
        text += f" LIMIT {limit}"
        if offset:
            text += f" OFFSET {offset}"
    spec = parse_sparql(text)
    assert spec["patterns"] == patterns
    assert spec["filters"] == expect_filters
    assert spec["filter_exprs"] == expect_exprs
    assert spec["distinct"] == distinct
    if page is not None:
        var, desc, limit, offset = page
        assert spec["order_by"] == [(var, "desc" if desc else "asc")]
        assert spec["limit"] == limit and spec["offset"] == offset
    else:
        assert spec["order_by"] == [] and spec["limit"] is None


def test_parse_var_var_ordering_filter():
    # bare ?a < ?b is ambiguous over lexical bindings -> explicit forms
    spec = parse_sparql(
        P + "SELECT * WHERE { ?a v:p ?x . ?b v:p ?x . FILTER(STR(?a) < STR(?b)) }"
    )
    assert spec["filter_exprs"] == [("str_cmp", ("str", "a"), "lt", ("str", "b"))]
    with pytest.raises(ValueError, match="ambiguous over lexical"):
        parse_sparql(P + "SELECT * WHERE { ?a v:p ?x . ?b v:p ?x . FILTER(?a < ?b) }")
    # numeric path via arithmetic
    spec2 = parse_sparql(
        P + "SELECT * WHERE { ?a v:p ?x . ?b v:p ?x . FILTER(?a + 0 < ?b + 0) }"
    )
    assert spec2["filter_exprs"] == [
        ("num_cmp", ("add", "a", 0), "lt", ("add", "b", 0))
    ]


@pytest.mark.spark
def test_text_symmetric_pair_elimination(triples, oracle):
    # co-mention pairs without the symmetric duplicate: FILTER(?a < ?b)
    q = (
        P + "SELECT ?a ?b ?e WHERE { ?a v:mentions ?e . ?b v:mentions ?e . "
            "FILTER(STR(?a) < STR(?b)) }"
    )
    got = _match(triples, oracle, q, ["a", "b", "e"])
    assert got and all(r[0] < r[1] for r in got)
    # exactly C(4,2)=6 ordered pairs per entity (4 docs mention each)
    assert len(got) == 3 * 6


def test_bnode_labels_are_scoped_variables():
    spec = parse_sparql(P + "SELECT ?n WHERE { _:c v:name ?n ; v:role _:r . }")
    assert spec["patterns"] == [
        ("?_bn_c", f"<{V}name>", "?n"),
        ("?_bn_c", f"<{V}role>", "?_bn_r"),
    ]
    assert spec["bnode_vars"] == {"_bn_c", "_bn_r"}


@pytest.mark.spark
def test_text_bnode_select_star_hides_bnode_vars(triples, oracle):
    # _:d joins the two patterns but stays out of SELECT *
    q = P + 'SELECT * WHERE { _:d v:role "tool" ; v:mentions ?e . }'
    sdf = sparql_query(triples, q)
    assert sdf.columns == ["e"]
    got = _match(triples, oracle, q, ["e"])
    assert len(got) == 6
    from jsonld_ex_spark.operators.sparql_text import _visible_project
    with pytest.raises(ValueError, match="cannot be projected"):
        sparql_query(triples, P + "SELECT ?_bn_d WHERE { _:d v:mentions ?e }")


def test_parse_filter_inside_optional():
    spec = parse_sparql(
        P + "SELECT * WHERE { ?d v:name ?n . "
            "OPTIONAL { ?d v:rating ?r . FILTER(?r > 2) } }"
    )
    assert spec["optional"] == [(
        [("?d", f"<{V}rating>", "?r")], [("r", "gt", 2)],
    )]
    with pytest.raises(ValueError, match="scalar comparisons"):
        parse_sparql(
            P + "SELECT * WHERE { ?d v:name ?n . "
                "OPTIONAL { ?d v:rating ?r . FILTER(BOUND(?r)) } }"
        )


@pytest.mark.spark
def test_text_optional_group_filter_both_engines(triples, oracle):
    # ratings: doc0 -> "0", doc4 -> "4", doc8 -> "3"; FILTER(?r > 2)
    # keeps the OPTIONAL arm only for docs 4 and 8 — the rest keep
    # their solution with ?r unbound (the LeftJoin(A, Filter(C, P))
    # algebra, NOT a post-join filter that would drop them)
    q = (
        P + 'SELECT ?d ?r WHERE { ?d v:name ?n . '
            'OPTIONAL { ?d v:rating ?r . FILTER(?r > 2) } }'
    )
    got = _match(triples, oracle, q, ["d"])
    by_d = dict(got)
    assert len(got) == 12
    assert by_d[f"{NS}4"] == "4" and by_d[f"{NS}8"] == "3"
    assert by_d[f"{NS}0"] is None  # rating "0" filtered inside the group


@pytest.mark.spark
def test_text_filters_inside_minus_and_not_exists(triples, oracle):
    # MINUS { ... FILTER(...) }: drop docs whose rating survives the
    # group-internal constraint (ratings: 0->"0", 4->"4", 8->"3")
    q = (
        P + 'SELECT DISTINCT ?d WHERE { ?d v:name ?n . '
            'MINUS { ?d v:rating ?r . FILTER(?r > 2) } }'
    )
    got = _match(triples, oracle, q, ["d"])
    names = {r[0] for r in got}
    assert f"{NS}4" not in names and f"{NS}8" not in names
    assert f"{NS}0" in names  # rating "0" fails the filter -> not minused
    # FILTER NOT EXISTS with an internal scalar filter, same shape
    q2 = (
        P + 'SELECT DISTINCT ?d WHERE { ?d v:name ?n . '
            'FILTER NOT EXISTS { ?d v:rating ?r . FILTER(?r > 2) } }'
    )
    assert {r[0] for r in _match(triples, oracle, q2, ["d"])} == names


def test_parse_load():
    spec = parse_sparql_update("LOAD <file:///tmp/data.nq> INTO GRAPH <urn:g1>")
    assert spec == {"form": "load", "source": "file:///tmp/data.nq", "into": "urn:g1"}
    assert parse_sparql_update("LOAD </tmp/d.nq>")["into"] is None


@pytest.mark.spark
def test_run_sparql_load_end_to_end(spark, tmp_path):  # noqa: F811
    from jsonld_ex_spark.operators.triples import write_nquads
    from jsonld_ex_spark.sources.snapshot_table import read_snapshot

    rows = [
        ("urn:s1", f"{V}p", "v1", False, None, None, None),
        ("urn:s2", f"{V}p", "urn:o", True, None, None, "urn:gx"),
    ]
    src = spark.createDataFrame(rows, SCHEMA)
    nq_dir = str(tmp_path / "nq")
    write_nquads(src, nq_dir)
    t = str(tmp_path / "tbl")
    r = run_sparql_update(spark, t, f"LOAD <file://{nq_dir}> INTO GRAPH <urn:dest>")
    assert r["kind"] == "load"
    got = read_snapshot(spark, t).select("subj", "graph").collect()
    assert len(got) == 2 and all(x["graph"] == "urn:dest" for x in got)
    # without INTO: source graphs preserved
    r2 = run_sparql_update(spark, t, f"LOAD <file://{nq_dir}>")
    graphs = sorted(
        (x["graph"] or "") for x in read_snapshot(spark, t).collect()
    )
    assert graphs.count("urn:gx") == 1 and graphs.count("urn:dest") == 2


def test_parse_embedded_union():
    spec = parse_sparql(
        P + 'SELECT * WHERE { ?t v:turn_idx ?i . '
            '{ ?t v:role "tool" . ?t v:mentions ?x } UNION '
            '{ ?t v:role "user" . ?t v:mentions ?x } }'
    )
    assert spec["union"] is None
    assert spec["unions"] == [[
        [("?t", f"<{V}role>", '"tool"'), ("?t", f"<{V}mentions>", "?x")],
        [("?t", f"<{V}role>", '"user"'), ("?t", f"<{V}mentions>", "?x")],
    ]]
    # a lone identical-variable union is ALSO embedded now
    lone = parse_sparql(
        P + 'SELECT ?x WHERE { { ?x v:role "tool" } UNION { ?x v:role "user" } }'
    )
    assert lone["union"] is None and len(lone["unions"]) == 1


@pytest.mark.spark
def test_text_embedded_union_both_engines(triples, oracle):
    # union joined onto an outer pattern — docs with idx > 7 whose role
    # arm contributes its mention edge (bag: both arms can match)
    q = (
        P + 'SELECT ?d ?i ?e WHERE { ?d v:idx ?i . FILTER(?i > 7) '
            '{ ?d v:role "tool" . ?d v:mentions ?e } UNION '
            '{ ?d v:role "user" . ?d v:mentions ?e } }'
    )
    got = _match(triples, oracle, q, ["d", "i", "e"])
    assert {r[0] for r in got} == {f"{NS}{i}" for i in (8, 9, 10, 11)}
    # union with group-internal FILTER in one arm
    q2 = (
        P + 'SELECT ?d ?e WHERE { ?d v:name ?n . '
            '{ ?d v:mentions ?e . FILTER(?d != "nope") } UNION '
            '{ ?d v:mentions ?e } }'
    )
    got2 = _match(triples, oracle, q2, ["d", "e"])
    assert len(got2) == 24  # every mention edge twice (bag semantics)


def test_construct_where_shorthand():
    spec = parse_sparql(P + 'CONSTRUCT WHERE { ?t v:mentions ?e . ?t v:role "tool" }')
    assert spec["form"] == "construct"
    assert spec["template"] == spec["patterns"] and len(spec["template"]) == 2
    with pytest.raises(ValueError, match="plain BGP"):
        parse_sparql(
            P + "CONSTRUCT WHERE { ?t v:mentions ?e . OPTIONAL { ?t v:tool ?n } }"
        )


@pytest.mark.spark
def test_text_construct_where_both_engines(triples, oracle):
    q = P + 'CONSTRUCT WHERE { ?t v:role "tool" ; v:mentions ?e }'
    got = _match(triples, oracle, q, ["subj", "pred", "obj"])
    # 6 tool turns: 6 role triples + 6 mention triples, deduped as a set
    assert len(got) == 12


@pytest.mark.spark
def test_text_filter_inside_graph_block(triples, oracle):
    q = (
        P + 'SELECT ?g ?e WHERE { GRAPH ?g { ?e a v:Entity . '
            'FILTER(STRENDS(?e, "0")) } }'
    )
    got = _match(triples, oracle, q, ["e"])
    assert [r[1] for r in got] == [f"{NS}e0"]


def test_review_guards_round6b():
    # bnode in an update pattern would silently become a wildcard
    with pytest.raises(ValueError, match="blank-node labels are not allowed"):
        parse_sparql_update(P + "DELETE WHERE { _:b v:tool ?n }")
    # bnode in CONSTRUCT (template OR shorthand) minting is unsupported
    with pytest.raises(ValueError, match="blank-node labels are not allowed"):
        parse_sparql(P + "CONSTRUCT { _:n v:p ?o } WHERE { ?s v:p ?o }")
    with pytest.raises(ValueError, match="blank-node labels are not allowed"):
        parse_sparql(P + "CONSTRUCT WHERE { _:s v:p ?o }")
    # EXISTS inside GRAPH would leak to the union graph
    with pytest.raises(ValueError, match="union graph"):
        parse_sparql(
            P + "SELECT * WHERE { GRAPH ?g { ?s v:p ?o "
                "FILTER EXISTS { ?s v:q ?x } } }"
        )
    # SELECT * with only bnode variables projects nothing
    from jsonld_ex_spark.operators.sparql_text import _visible_project
    with pytest.raises(ValueError, match="project nothing"):
        _visible_project(parse_sparql(P + 'SELECT * WHERE { _:a v:role "tool" }'))


def test_norm_group_tuple_of_patterns_is_not_filters():
    # a group passed as a TUPLE of patterns keeps pattern-list semantics
    from jsonld_ex_spark.operators.bgp import _norm_group
    pats = (("?s", "<http://p>", "?o"), ("?s", "<http://q>", "?x"))
    assert _norm_group(pats) == ([("?s", "<http://p>", "?o"),
                                  ("?s", "<http://q>", "?x")], [])
    assert _norm_group(([("?s", "<http://p>", "?o")], [("o", "gt", 1)])) == (
        [("?s", "<http://p>", "?o")], [("o", "gt", 1)],
    )
