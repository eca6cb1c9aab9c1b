"""Round-6 SPARQL surface: expression/function library (BOUND /
COALESCE / IF / STR / LANG / DATATYPE / STRSTARTS / STRENDS / CONTAINS
/ LCASE / UCASE), aggregation subqueries, and the DISTINCT / OFFSET
solution modifiers — every Spark plan checked against the DuckDB
rendering of the same compiled query.

The reference has no query language; these close the engine's own
most-hit gaps (round-5 verdict items 1–3).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from jsonld_ex_spark.operators.bgp import (
    bgp_oracle_sql,
    bgp_order_limit,
    bgp_order_limit_oracle_sql,
    bgp_select,
)
from tests.spark_fixtures import spark  # noqa: F401

NS = "http://ex.org/d/"
V = "http://ex.org/v#"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"

SCHEMA = (
    "subj string, pred string, obj string, obj_is_iri boolean, "
    "obj_dt string, obj_lang string, graph string"
)


def _rows():
    rows = []
    for i in range(12):
        s = f"{NS}{i}"
        lang = ["en", "en-GB", None][i % 3]
        rows.append(
            (s, V + "name", f"name{i}", False, None if lang else XSD_STRING, lang, None)
        )
        rows.append((s, V + "chars", str(i * 7), False, XSD_INT, None, None))
        if i % 4 == 0:
            rows.append((s, V + "rating", str(i % 5), False, None, None, None))
        if i % 5 == 0:
            rows.append((s, V + "link", f"{NS}{(i + 1) % 12}", True, None, None, None))
    return rows


@pytest.fixture()
def annotated(spark):  # noqa: F811
    return spark.createDataFrame(_rows(), SCHEMA)


@pytest.fixture()
def oracle():
    con = duckdb.connect()
    con.register(
        "tri_src",
        pd.DataFrame(
            _rows(),
            columns=[
                "subj", "pred", "obj", "obj_is_iri", "obj_dt", "obj_lang", "graph",
            ],
        ),
    )
    return con


def _match(sdf, con, sql, order_cols):
    order = ", ".join(order_cols)
    got = [tuple(r) for r in sdf.orderBy(*order_cols).collect()]
    want = [
        tuple(r)
        for r in con.execute(f"SELECT * FROM ({sql}) q ORDER BY {order}")
        .df()
        .itertuples(index=False)
    ]
    assert got == want
    return got


EXPR_KW = dict(
    patterns=[("?d", f"<{V}name>", "?n"), ("?d", f"<{V}chars>", "?c")],
    annotations={"l": ("n", "lang"), "dt": ("c", "datatype")},
    optional=[[("?d", f"<{V}rating>", "?r")]],
    filter_exprs=[("or", ("strstarts", "l", "en"), ("bound", "r"))],
    bind={
        "label": (
            "if",
            ("bound", "r"),
            ("concat", ("lit", "rated:"), "r"),
            ("lit", "unrated"),
        ),
        "meta": ("concat", ("coalesce", "r", ("lit", "-")), ("lit", "|"), ("ucase", "l")),
        "sn": ("str", "n"),
    },
    project=["d", "l", "dt", "label", "meta", "sn"],
)


def test_expression_library_matches_oracle(annotated, oracle):
    got = _match(
        bgp_select(annotated, **EXPR_KW),
        oracle,
        bgp_oracle_sql("SELECT * FROM tri_src", **EXPR_KW),
        ["d"],
    )
    # LANG of a plain literal is '', of a tagged one the tag; DATATYPE
    # of the typed chars literal is its IRI
    by_d = {r[0]: r for r in got}
    assert by_d[f"{NS}0"][1] == "en" and by_d[f"{NS}0"][3] == "rated:0"
    assert by_d[f"{NS}4"][1] == "en-GB" and by_d[f"{NS}4"][4] == "4|EN-GB"
    assert all(r[2] == XSD_INT for r in got)
    # doc 2 has no lang and no rating -> filtered out by (strstarts OR bound)
    assert f"{NS}2" not in by_d
    # doc 3: lang 'en', unrated -> COALESCE default visible
    assert by_d[f"{NS}3"][3] == "unrated" and by_d[f"{NS}3"][4] == "-|EN"


def test_lang_of_iri_object_is_unbound(annotated, oracle):
    kw = dict(
        patterns=[("?d", f"<{V}link>", "?e")],
        annotations={"le": ("e", "lang"), "de": ("e", "datatype")},
        filter_exprs=[("not", ("bound", "le"))],
        project=["d", "e", "de"],
    )
    got = _match(
        bgp_select(annotated, **kw),
        oracle,
        bgp_oracle_sql("SELECT * FROM tri_src", **kw),
        ["d"],
    )
    # LANG/DATATYPE of an IRI term is an error -> unbound (never '');
    # NOT BOUND therefore keeps every link row
    assert len(got) == 3 and all(r[2] is None for r in got)


def test_strends_contains_lcase_eq(annotated, oracle):
    kw = dict(
        patterns=[("?d", f"<{V}name>", "?n")],
        filter_exprs=[
            ("and", ("contains", "n", "ame"), ("not", ("strends", "n", "1"))),
            ("eq", ("lcase", ("ucase", "n")), "n"),
        ],
        project=["d", "n"],
    )
    got = _match(
        bgp_select(annotated, **kw),
        oracle,
        bgp_oracle_sql("SELECT * FROM tri_src", **kw),
        ["d"],
    )
    assert f"{NS}1" not in {r[0] for r in got} and len(got) == 10


def test_annotation_validation(annotated):
    # source var must be the object of exactly one required pattern
    with pytest.raises(ValueError, match="exactly one"):
        bgp_select(
            annotated,
            [("?d", f"<{V}name>", "?n"), ("?e", f"<{V}rating>", "?n")],
            annotations={"l": ("n", "lang")},
        )
    with pytest.raises(ValueError, match="exactly one"):
        bgp_select(
            annotated,
            [("?d", f"<{V}name>", "?n")],
            annotations={"l": ("missing", "lang")},
        )
    with pytest.raises(ValueError, match="shadows"):
        bgp_select(
            annotated,
            [("?d", f"<{V}name>", "?n")],
            annotations={"d": ("n", "lang")},
        )
    with pytest.raises(ValueError, match="lang|datatype"):
        bgp_select(
            annotated,
            [("?d", f"<{V}name>", "?n")],
            annotations={"l": ("n", "tag")},
        )


def test_filter_expr_validation(annotated):
    with pytest.raises(ValueError, match="unbound"):
        bgp_select(
            annotated,
            [("?d", f"<{V}name>", "?n")],
            filter_exprs=[("bound", "nope")],
        )
    with pytest.raises(ValueError, match="bad condition"):
        bgp_select(
            annotated,
            [("?d", f"<{V}name>", "?n")],
            filter_exprs=[("xor", ("bound", "n"), ("bound", "n"))],
        )


SUB_KW = dict(
    patterns=[("?d", f"<{V}link>", "?e")],
    subqueries=[
        dict(
            patterns=[("?x", f"<{V}link>", "?e")],
            group_by=["e"],
            aggs={"total": ("count", None)},
            having=[("total", "ge", 1)],
        )
    ],
    project=["d", "e", "total"],
)


def test_subquery_matches_oracle(annotated, oracle):
    got = _match(
        bgp_select(annotated, **SUB_KW),
        oracle,
        bgp_oracle_sql("SELECT * FROM tri_src", **SUB_KW),
        ["d", "e"],
    )
    assert len(got) == 3 and all(r[2] == 1 for r in got)


def test_subquery_validation(annotated):
    with pytest.raises(ValueError, match="shares no GROUP BY"):
        bgp_select(
            annotated,
            [("?d", f"<{V}link>", "?e")],
            subqueries=[
                dict(
                    patterns=[("?x", f"<{V}name>", "?n")],
                    group_by=["n"],
                    aggs={"total": ("count", None)},
                )
            ],
        )
    with pytest.raises(ValueError, match="already bound"):
        bgp_select(
            annotated,
            [("?d", f"<{V}link>", "?e")],
            subqueries=[
                dict(
                    patterns=[("?d", f"<{V}link>", "?e")],
                    group_by=["e"],
                    aggs={"d": ("count", None)},
                )
            ],
        )


def test_order_limit_offset_distinct(annotated, oracle):
    inner_kw = dict(patterns=[("?d", f"<{V}name>", "?n")], project=["d"])
    b = bgp_select(annotated, **inner_kw)
    got = [
        r.d
        for r in bgp_order_limit(
            b, [("d", "asc")], limit=4, offset=3, distinct=True
        ).collect()
    ]
    sql = bgp_order_limit_oracle_sql(
        bgp_oracle_sql("SELECT * FROM tri_src", **inner_kw),
        [("d", "asc")],
        limit=4,
        offset=3,
        distinct=True,
    )
    assert got == list(oracle.execute(sql).df()["d"])
    # page 1 + page 2 tile without overlap
    p1 = [r.d for r in bgp_order_limit(b, [("d", "asc")], limit=3, distinct=True).collect()]
    p2 = [
        r.d
        for r in bgp_order_limit(
            b, [("d", "asc")], limit=3, offset=3, distinct=True
        ).collect()
    ]
    assert not set(p1) & set(p2) and p1 + p2 == sorted(set(p1 + p2))


def test_order_limit_offset_validation(annotated):
    b = bgp_select(annotated, [("?d", f"<{V}name>", "?n")], project=["d"])
    with pytest.raises(ValueError, match="offset"):
        bgp_order_limit(b, [("d", "asc")], limit=3, offset=-1)
    with pytest.raises(ValueError, match="offset"):
        bgp_order_limit_oracle_sql("SELECT 1 AS d", [("d", "asc")], 3, offset=-2)


def test_string_function_library(annotated, oracle):
    """Round-6 extension: SUBSTR / REPLACE / STRBEFORE / STRAFTER /
    LANGMATCHES, each compiled to both engines."""
    kw = dict(
        patterns=[("?d", f"<{V}name>", "?n")],
        annotations={"lg": ("n", "lang")},
        filter_exprs=[("langmatches", "lg", "en")],
        bind={
            "num": ("strafter", "d", "/d/"),
            "renamed": ("replace", ("strafter", "n", "name"), "1", "one"),
            "head": ("substr", "n", 1, 4),
            "tail": ("substr", "d", 8),
            "nohit": ("strbefore", "n", "zzz"),
        },
        project=["d", "lg", "num", "renamed", "head", "tail", "nohit"],
    )
    got = _match(
        bgp_select(annotated, **kw),
        oracle,
        bgp_oracle_sql("SELECT * FROM tri_src", **kw),
        ["d"],
    )
    # LANGMATCHES 'en' matches both 'en' and 'en-GB' (RFC 4647 basic
    # filtering), never the plain (lang '') names
    assert len(got) == 8
    by_d = {r[0]: r for r in got}
    assert by_d[f"{NS}1"][1] == "en-GB" and by_d[f"{NS}1"][3] == "one"
    assert all(r[6] == "" for r in got)  # STRBEFORE misses -> ''
    assert by_d[f"{NS}0"][2] == "0" and by_d[f"{NS}0"][4] == "name"


def test_values_rows_multi_variable(annotated, oracle):
    kw = dict(
        patterns=[("?d", f"<{V}name>", "?n"), ("?d", f"<{V}chars>", "?c")],
        values_rows=(
            ["d", "n"],
            [(f"{NS}0", "name0"), (f"{NS}1", "nameX"), (f"{NS}2", "name2")],
        ),
        project=["d", "n", "c"],
    )
    got = _match(
        bgp_select(annotated, **kw),
        oracle,
        bgp_oracle_sql("SELECT * FROM tri_src", **kw),
        ["d"],
    )
    # the (d1, nameX) row matches nothing — VALUES joins on the tuple
    assert [r[0] for r in got] == [f"{NS}0", f"{NS}2"]


def test_values_rows_validation(annotated):
    with pytest.raises(ValueError, match="not bound"):
        bgp_select(
            annotated,
            [("?d", f"<{V}name>", "?n")],
            values_rows=(["zz"], [("a",)]),
        )
    with pytest.raises(ValueError, match="one string per variable"):
        bgp_select(
            annotated,
            [("?d", f"<{V}name>", "?n")],
            values_rows=(["d", "n"], [("only-one",)]),
        )
    with pytest.raises(ValueError, match="at least one"):
        bgp_select(
            annotated,
            [("?d", f"<{V}name>", "?n")],
            values_rows=(["d"], []),
        )


def test_string_function_validation(annotated):
    with pytest.raises(ValueError, match="SUBSTR start"):
        bgp_select(
            annotated, [("?d", f"<{V}name>", "?n")],
            bind={"x": ("substr", "n", 0, 3)},
        )
    with pytest.raises(ValueError, match="needle"):
        bgp_select(
            annotated, [("?d", f"<{V}name>", "?n")],
            bind={"x": ("strafter", "n", "")},
        )
    with pytest.raises(ValueError, match="langmatches range"):
        bgp_select(
            annotated, [("?d", f"<{V}name>", "?n")],
            annotations={"lg": ("n", "lang")},
            filter_exprs=[("langmatches", "lg", "")],
        )


def test_aggregate_forwards_expression_surface(annotated, oracle):
    """bgp_aggregate accepts annotations/filter_exprs/values_rows —
    aggregation over language-filtered bindings."""
    from jsonld_ex_spark.operators.bgp import (
        bgp_aggregate,
        bgp_aggregate_oracle_sql,
    )

    kw = dict(
        patterns=[("?d", f"<{V}name>", "?n")],
        annotations={"lg": ("n", "lang")},
        filter_exprs=[("langmatches", "lg", "en")],
        group_by=["lg"],
        aggs={"n_docs": ("count", None)},
    )
    got = {
        (r.lg, r.n_docs)
        for r in bgp_aggregate(annotated, **kw).collect()
    }
    sql = bgp_aggregate_oracle_sql("SELECT * FROM tri_src", **kw)
    want = {tuple(r) for r in oracle.execute(sql).df().itertuples(index=False)}
    assert got == want == {("en", 4), ("en-GB", 4)}
