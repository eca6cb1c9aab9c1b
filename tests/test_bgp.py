"""BGP compiler semantics + incremental-delta tests.

The tiny-graph tests pin the compiler's semantics (variable joins,
IRI/literal object distinction, repeated variables, predicate
variables, cartesian rejection) independently of the KG pipeline; the
oracle-equivalence test runs bgp_oracle_sql's generated SQL on DuckDB
over the SAME tiny graph and compares bindings bag-for-bag.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from jsonld_ex_spark.operators.bgp import bgp_oracle_sql, bgp_select
from tests.spark_fixtures import SF_DIR, spark  # noqa: F401

TRIPLES = [
    # (subj, pred, obj, obj_is_iri)
    ("urn:t1", "urn:role", "tool", False),
    ("urn:t2", "urn:role", "tool", False),
    ("urn:t3", "urn:role", "assistant", False),
    ("urn:t1", "urn:mentions", "urn:e1", True),
    ("urn:t1", "urn:mentions", "urn:e2", True),
    ("urn:t2", "urn:mentions", "urn:e1", True),
    ("urn:t3", "urn:mentions", "urn:e1", True),
    # a literal that collides lexically with an IRI object
    ("urn:t2", "urn:note", "urn:e1", False),
    # self-loop for the repeated-variable test
    ("urn:e1", "urn:sameAs", "urn:e1", True),
    ("urn:e1", "urn:sameAs", "urn:e2", True),
]


@pytest.fixture()
def tiny(spark):  # noqa: F811
    return spark.createDataFrame(
        TRIPLES, "subj string, pred string, obj string, obj_is_iri boolean"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_star_join_bindings(tiny):
    out = bgp_select(
        tiny,
        [("?t", "<urn:role>", '"tool"'), ("?t", "<urn:mentions>", "?e")],
        project=["t", "e"],
    )
    assert _rows(out) == [
        ("urn:t1", "urn:e1"),
        ("urn:t1", "urn:e2"),
        ("urn:t2", "urn:e1"),
    ]


def test_literal_constant_does_not_match_iri_object(tiny):
    # "urn:e1" as a literal term must match ONLY the urn:note literal row,
    # never the urn:mentions IRI rows with the same lexical form.
    lit = bgp_select(tiny, [("?t", "?p", '"urn:e1"')], project=["t", "p"])
    assert _rows(lit) == [("urn:t2", "urn:note")]
    iri = bgp_select(tiny, [("?t", "<urn:mentions>", "<urn:e1>")], project=["t"])
    assert _rows(iri) == [("urn:t1",), ("urn:t2",), ("urn:t3",)]


def test_repeated_variable_within_pattern(tiny):
    out = bgp_select(tiny, [("?x", "<urn:sameAs>", "?x")], project=["x"])
    assert _rows(out) == [("urn:e1",)]


def test_predicate_variable_binds(tiny):
    out = bgp_select(tiny, [("<urn:t3>", "?p", "?o")], project=["p", "o"])
    assert _rows(out) == [("urn:mentions", "urn:e1"), ("urn:role", "assistant")]


def test_disconnected_bgp_rejected_unless_allowed(tiny):
    pats = [("?a", "<urn:role>", '"tool"'), ("?b", "<urn:sameAs>", "?c")]
    with pytest.raises(ValueError, match="cross product"):
        bgp_select(tiny, pats)
    out = bgp_select(tiny, pats, allow_cartesian=True)
    assert out.count() == 2 * 2  # 2 tool turns x 2 sameAs edges


def test_unbound_projection_rejected(tiny):
    with pytest.raises(ValueError, match="not bound"):
        bgp_select(tiny, [("?t", "<urn:role>", "?r")], project=["nope"])
    with pytest.raises(ValueError, match="no variables"):
        bgp_select(tiny, [("<urn:t1>", "<urn:role>", '"tool"')])


def test_oracle_sql_matches_spark_bindings(tiny):
    """The generated SQL, run by DuckDB on the same tiny graph, must
    produce the identical binding bag as the DataFrame plan."""
    patterns = [
        ("?t", "<urn:role>", "?r"),
        ("?t", "<urn:mentions>", "?e"),
    ]
    values = ", ".join(
        f"('{s}', '{p}', '{o}', {str(i).lower()})" for s, p, o, i in TRIPLES
    )
    cte = (
        "SELECT * FROM (VALUES "
        + values
        + ") AS v(subj, pred, obj, obj_is_iri)"
    )
    sql = bgp_oracle_sql(cte, patterns, project=["t", "r", "e"])
    duck = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    got = _rows(bgp_select(tiny, patterns, project=["t", "r", "e"]))
    assert got == duck
    assert len(got) == 4


def test_bgp_plan_has_no_cartesian_or_python(spark):  # noqa: F811
    from jsonld_ex_spark.operators.kg_queries import kg_bgp_tool_mentions

    plan = kg_bgp_tool_mentions(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_triples_delta_non_vacuous_both_directions(spark):  # noqa: F811
    """Both delta directions must be exercised: dropping a conv's final
    turn removes its old rdf:rest→nil cell and adds the whole new turn."""
    from jsonld_ex_spark.operators.kg_queries import kg_triples_delta

    rows = {r["pred"]: r for r in kg_triples_delta(spark, SF_DIR).collect()}
    assert sum(r["n_added"] for r in rows.values()) > 0
    removed_preds = {p for p, r in rows.items() if r["n_removed"] > 0}
    assert removed_preds, "no removed triples — delta is vacuous"
    # the ONLY removals are rewritten list tails (rest→nil became rest→cell)
    assert removed_preds == {"http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"}
    # every truncated multi-turn conv contributes 2 added tails per 1
    # removed; a single-turn conv vanishes from the old snapshot
    # entirely (its one added tail has no matching removal)
    rest = rows["http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"]
    assert rest["n_added"] >= 2 * rest["n_removed"] > 0


def test_optional_group_left_join_semantics(tiny):
    out = bgp_select(
        tiny,
        [("?t", "<urn:role>", "?r")],
        optional=[[("?t", "<urn:mentions>", "?e")]],
        project=["t", "r", "e"],
    )
    rows = _rows(out)
    # every typed binding survives; t3 keeps its single mention,
    # a turn with no mentions would carry e = NULL
    assert ("urn:t3", "assistant", "urn:e1") in rows
    assert len(rows) == 4  # t1x2 mentions, t2x1, t3x1 — none dropped
    # now an optional that genuinely misses: urn:sameAs rows exist only
    # for e1, so t-rows get NULL
    out2 = bgp_select(
        tiny,
        [("?t", "<urn:role>", "?r")],
        optional=[[("?t", "<urn:sameAs>", "?x")]],
        project=["t", "x"],
    )
    assert _rows(out2) == [("urn:t1", None), ("urn:t2", None), ("urn:t3", None)]


def test_optional_validation(tiny):
    with pytest.raises(ValueError, match="shares no variable"):
        bgp_select(
            tiny,
            [("?t", "<urn:role>", "?r")],
            optional=[[("?a", "<urn:sameAs>", "?b")]],
        )
    with pytest.raises(ValueError, match="another optional group"):
        bgp_select(
            tiny,
            [("?t", "<urn:role>", "?r")],
            optional=[
                [("?t", "<urn:mentions>", "?e")],
                [("?e", "<urn:sameAs>", "?x")],
            ],
        )


def test_optional_oracle_sql_matches_spark(tiny):
    patterns = [("?t", "<urn:role>", "?r")]
    optional = [[("?t", "<urn:mentions>", "?e")]]
    values = ", ".join(
        f"('{s}', '{p}', '{o}', {str(i).lower()})" for s, p, o, i in TRIPLES
    )
    cte = "SELECT * FROM (VALUES " + values + ") AS v(subj, pred, obj, obj_is_iri)"
    sql = bgp_oracle_sql(cte, patterns, project=["t", "r", "e"], optional=optional)
    duck = sorted(
        tuple(r) for r in duckdb.connect().execute(sql).fetchall()
    )
    got = _rows(
        bgp_select(tiny, patterns, project=["t", "r", "e"], optional=optional)
    )
    assert got == duck


def test_bgp_over_table_pushes_constant_filters(spark, tmp_path):  # noqa: F811
    """Production form: constants in a pattern must reach the parquet
    scan as PushedFilters (at 10^12 triples this is the difference
    between scanning a predicate's slice and scanning the world)."""
    from jsonld_ex_spark.operators.bgp import bgp_over_table
    from jsonld_ex_spark.operators.kg_pipeline import kg_triples
    from jsonld_ex_spark.operators.triples import write_triples

    path = str(tmp_path / "trip")
    write_triples(kg_triples(spark, SF_DIR).limit(2000), path, n_buckets=2)
    df = bgp_over_table(
        spark,
        path,
        [("?t", "<urn:x:role>", '"tool"'), ("?t", "<urn:x:mentions>", "?e")],
        project=["t", "e"],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "urn:x:role" in plan  # the pred constant reached the scan
    assert "CartesianProduct" not in plan


def test_construct_distinct_and_closure(tiny):
    from jsonld_ex_spark.operators.bgp import bgp_construct

    g = bgp_construct(
        tiny,
        [("?t", "<urn:mentions>", "?e")],
        [
            ("?e", "<urn:type>", "<urn:Entity>"),
            ("?e", "<urn:mentionedBy>", "?t"),
        ],
    )
    # set semantics: e1 is mentioned by 3 turns but typed once
    assert g.filter("pred = 'urn:type'").count() == 2  # e1, e2
    assert g.filter("pred = 'urn:mentionedBy'").count() == 4
    assert g.columns == [
        "subj", "pred", "obj", "obj_is_iri", "obj_dt", "obj_lang", "graph",
    ]
    # closure: the constructed graph is itself BGP-queryable
    back = bgp_select(
        g,
        [("?e", "<urn:type>", "<urn:Entity>"), ("?e", "<urn:mentionedBy>", "?t")],
        project=["e", "t"],
    )
    assert back.count() == 4


def test_construct_literal_object_and_errors(tiny):
    from jsonld_ex_spark.operators.bgp import bgp_construct

    g = bgp_construct(
        tiny, [("?t", "<urn:role>", '"tool"')], [("?t", "<urn:flag>", '"hot"')]
    )
    rows = g.collect()
    assert {r["subj"] for r in rows} == {"urn:t1", "urn:t2"}
    assert all(r["obj"] == "hot" and r["obj_is_iri"] is False for r in rows)
    with pytest.raises(ValueError, match="not bound"):
        bgp_construct(tiny, [("?t", "<urn:role>", "?r")], [("?x", "<urn:p>", "?t")])
    with pytest.raises(ValueError, match="empty CONSTRUCT"):
        bgp_construct(tiny, [("?t", "<urn:role>", "?r")], [])


def test_construct_oracle_sql_matches_spark(tiny):
    from jsonld_ex_spark.operators.bgp import bgp_construct, bgp_construct_oracle_sql

    patterns = [("?t", "<urn:mentions>", "?e")]
    template = [
        ("?e", "<urn:type>", "<urn:Entity>"),
        ("?e", "<urn:mentionedBy>", "?t"),
    ]
    values = ", ".join(
        f"('{s}', '{p}', '{o}', {str(i).lower()})" for s, p, o, i in TRIPLES
    )
    cte = "SELECT * FROM (VALUES " + values + ") AS v(subj, pred, obj, obj_is_iri)"
    sql = bgp_construct_oracle_sql(cte, patterns, template)
    duck = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    got = _rows(bgp_construct(tiny, patterns, template))
    assert got == duck


def test_key_skew_profile_surfaces_planted_hot_keys(spark):  # noqa: F811
    """The corpus plants HOT_ENTITIES hot surface forms; the profiler
    must rank them at the top with consistent integer shares."""
    from jsonld_ex_spark.functions.skew_ops import key_skew_profile
    from jsonld_ex_spark.operators.kg_queries import kg_mentions

    prof = key_skew_profile(kg_mentions(spark, SF_DIR), "surface_norm", top_n=10)
    rows = sorted(prof.collect(), key=lambda r: r["rank"])
    assert [r["rank"] for r in rows] == list(range(1, 11))
    # counts non-increasing, hot head is far above the uniform tail
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert rows[0]["n"] > 3 * rows[-1]["n"]
    assert all(0 < r["ppm"] < 1_000_000 for r in rows)
    # plan: no driver collect — profile is a single DataFrame plan
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan or "BroadcastQueryStage" in plan


def test_construct_skips_unbound_optional_template_vars(tiny):
    """SPARQL CONSTRUCT: a template pattern referencing a variable left
    unbound by a non-matching OPTIONAL is not instantiated — no NULL
    triples reach the output (or write_triples)."""
    from jsonld_ex_spark.operators.bgp import bgp_construct, bgp_construct_oracle_sql

    patterns = [("?t", "<urn:role>", "?r")]
    optional = [[("?t", "<urn:mentions>", "?e"), ("?e", "<urn:sameAs>", "?x")]]
    template = [
        ("?t", "<urn:hasRole>", "?r"),
        ("?t", "<urn:linksTo>", "?x"),
    ]
    g = bgp_construct(tiny, patterns, template, optional=optional)
    rows = g.collect()
    assert all(r["subj"] is not None and r["obj"] is not None for r in rows)
    # every turn keeps its role triple; only t1/t2 (mention e1, which
    # has sameAs edges) yield linksTo triples
    assert g.filter("pred = 'urn:hasRole'").count() == 3
    # all three turns mention e1, which has sameAs edges → all bound
    links = {r["subj"] for r in g.filter("pred = 'urn:linksTo'").collect()}
    assert links == {"urn:t1", "urn:t2", "urn:t3"}
    # and the SQL mirror agrees exactly
    values = ", ".join(
        f"('{s}', '{p}', '{o}', {str(i).lower()})" for s, p, o, i in TRIPLES
    )
    cte = "SELECT * FROM (VALUES " + values + ") AS v(subj, pred, obj, obj_is_iri)"
    sql = bgp_construct_oracle_sql(cte, patterns, template, optional=optional)
    duck = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert _rows(g) == duck


def test_default_projection_sorted_and_mirrored(tiny):
    """project=None: both sides emit variables sorted by name."""
    df = bgp_select(tiny, [("?t", "<urn:mentions>", "?e")])
    assert df.columns == ["e", "t"]
    values = ", ".join(
        f"('{s}', '{p}', '{o}', {str(i).lower()})" for s, p, o, i in TRIPLES
    )
    cte = "SELECT * FROM (VALUES " + values + ") AS v(subj, pred, obj, obj_is_iri)"
    sql = bgp_oracle_sql(cte, [("?t", "<urn:mentions>", "?e")])
    cols = [d[0] for d in duckdb.connect().execute(sql).description]
    assert cols == ["e", "t"]


def test_minus_semantics_and_sql_mirror(tiny):
    out = bgp_select(
        tiny,
        [("?t", "<urn:mentions>", "?e")],
        project=["t", "e"],
        minus=[[("?t", "<urn:role>", '"tool"')]],
    )
    # only the assistant turn's mention survives
    assert _rows(out) == [("urn:t3", "urn:e1")]
    values = ", ".join(
        f"('{s}', '{p}', '{o}', {str(i).lower()})" for s, p, o, i in TRIPLES
    )
    cte = "SELECT * FROM (VALUES " + values + ") AS v(subj, pred, obj, obj_is_iri)"
    sql = bgp_oracle_sql(
        cte,
        [("?t", "<urn:mentions>", "?e")],
        project=["t", "e"],
        minus=[[("?t", "<urn:role>", '"tool"')]],
    )
    assert sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall()) == [
        ("urn:t3", "urn:e1")
    ]
    with pytest.raises(ValueError, match="shares no variable"):
        bgp_select(tiny, [("?t", "<urn:role>", "?r")], minus=[[("?a", "<urn:note>", "?b")]])
    with pytest.raises(ValueError, match="optional-introduced"):
        bgp_select(
            tiny,
            [("?t", "<urn:role>", "?r")],
            optional=[[("?t", "<urn:mentions>", "?e")]],
            minus=[[("?e", "<urn:sameAs>", "?x")]],
        )


def test_union_semantics_and_sql_mirror(tiny):
    from jsonld_ex_spark.operators.bgp import bgp_union, bgp_union_oracle_sql

    alts = [
        [("?t", "<urn:role>", '"assistant"')],
        [("?t", "<urn:mentions>", "?e")],
    ]
    def norm(rows):
        return sorted(
            (tuple("" if v is None else v for v in r) for r in rows)
        )

    out = bgp_union(tiny, alts, project=["t", "e"])
    rows = norm(tuple(r) for r in out.collect())
    # 1 assistant row (e NULL-padded) + 4 mention rows
    assert len(rows) == 5
    assert ("urn:t3", "") in rows
    values = ", ".join(
        f"('{s}', '{p}', '{o}', {str(i).lower()})" for s, p, o, i in TRIPLES
    )
    cte = "SELECT * FROM (VALUES " + values + ") AS v(subj, pred, obj, obj_is_iri)"
    sql = bgp_union_oracle_sql(cte, alts, project=["t", "e"])
    duck = norm(duckdb.connect().execute(sql).fetchall())
    assert rows == duck


# --- property-based: random graphs x random algebra vs DuckDB --------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SUBJ = [f"urn:s{i}" for i in range(4)]
_PRED = [f"urn:p{i}" for i in range(3)]
_OBJ = [f"urn:o{i}" for i in range(3)] + ["lit0", "lit1"]

_triple = st.tuples(
    st.sampled_from(_SUBJ),
    st.sampled_from(_PRED),
    st.sampled_from(_OBJ),
    st.booleans(),
)


def _rand_pattern(draw, i: int):
    # star shape: every pattern's subject is ?a, so the BGP is connected
    pred = draw(st.sampled_from([f"<{p}>" for p in _PRED] + [f"?p{i}"]))
    obj = draw(
        st.sampled_from(
            [f"<{o}>" for o in _OBJ]
            + [f'"{o}"' for o in _OBJ]
            + [f"?o{i}", "?shared"]
        )
    )
    return ("?a", pred, obj)


@st.composite
def _case(draw):
    triples = draw(st.lists(_triple, min_size=1, max_size=12, unique=True))
    n = draw(st.integers(1, 3))
    patterns = [_rand_pattern(draw, i) for i in range(n)]
    optional = (
        [[_rand_pattern(draw, 90)]] if draw(st.booleans()) else None
    )
    minus = [[_rand_pattern(draw, 95)]] if draw(st.booleans()) else None
    return triples, patterns, optional, minus


@given(_case())
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_property_bgp_matches_duckdb(spark, case):  # noqa: F811
    """Any random star BGP (with random OPTIONAL/MINUS groups) over any
    random tiny graph must produce the same binding bag in Spark and in
    the generated DuckDB SQL — including NULLs from OPTIONAL."""
    triples, patterns, optional, minus = case
    df = spark.createDataFrame(
        triples, "subj string, pred string, obj string, obj_is_iri boolean"
    )
    try:
        got = bgp_select(df, patterns, optional=optional, minus=minus)
    except ValueError:
        # e.g. a minus group with only constants+?a sharing nothing new is
        # still fine; true rejections (no variables) must reject in SQL too
        with pytest.raises(ValueError):
            bgp_oracle_sql("SELECT 1", patterns, optional=optional, minus=minus)
        return
    values = ", ".join(
        f"('{s}', '{p}', '{o}', {str(i).lower()})" for s, p, o, i in triples
    )
    cte = "SELECT * FROM (VALUES " + values + ") AS v(subj, pred, obj, obj_is_iri)"
    sql = bgp_oracle_sql(cte, patterns, optional=optional, minus=minus)
    duck = duckdb.connect().execute(sql)
    duck_cols = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()
    assert got.columns == duck_cols

    def norm(rows):
        return sorted(tuple("" if v is None else v for v in r) for r in rows)

    assert norm(tuple(r) for r in got.collect()) == norm(duck_rows)


def test_bgp_aggregate_semantics_and_mirror(tiny):
    from jsonld_ex_spark.operators.bgp import (
        bgp_aggregate,
        bgp_aggregate_oracle_sql,
    )

    patterns = [("?t", "<urn:mentions>", "?e")]
    aggs = {
        "n": ("count", None),
        "nt": ("count_distinct", "t"),
        "first_t": ("min", "t"),
    }
    out = {
        r["e"]: (r["n"], r["nt"], r["first_t"])
        for r in bgp_aggregate(tiny, patterns, ["e"], aggs).collect()
    }
    assert out == {"urn:e1": (3, 3, "urn:t1"), "urn:e2": (1, 1, "urn:t1")}
    values = ", ".join(
        f"('{s}', '{p}', '{o}', {str(i).lower()})" for s, p, o, i in TRIPLES
    )
    cte = "SELECT * FROM (VALUES " + values + ") AS v(subj, pred, obj, obj_is_iri)"
    sql = bgp_aggregate_oracle_sql(cte, patterns, ["e"], aggs)
    duck = {r[0]: tuple(r[1:]) for r in duckdb.connect().execute(sql).fetchall()}
    assert duck == out
    with pytest.raises(ValueError, match="unsupported aggregate"):
        bgp_aggregate(tiny, patterns, ["e"], {"x": ("median", "t")})
    with pytest.raises(ValueError, match="not bound"):
        bgp_aggregate(tiny, patterns, ["e"], {"x": ("min", "zz")})


def test_bgp_ask(tiny):
    from jsonld_ex_spark.operators.bgp import bgp_ask

    assert bgp_ask(tiny, [("?t", "<urn:role>", '"tool"')])
    assert not bgp_ask(tiny, [("?t", "<urn:role>", '"moderator"')])
    # MINUS can empty the solution set
    assert not bgp_ask(
        tiny,
        [("?t", "<urn:role>", '"tool"')],
        minus=[[("?t", "<urn:mentions>", "?e")]],
    )


def test_bgp_ask_df_matches_oracle(tiny):
    """Batch ASK: DataFrame form returns one labeled boolean row per
    ask and the EXISTS-based SQL mirror agrees on both outcomes."""
    from jsonld_ex_spark.operators.bgp import bgp_ask_df, bgp_ask_oracle_sql

    asks = {
        "tool_exists": [("?t", "<urn:role>", '"tool"')],
        "moderator_exists": [("?t", "<urn:role>", '"moderator"')],
    }
    got = {r["ask_id"]: r["result"] for r in bgp_ask_df(tiny, asks).collect()}
    assert got == {"tool_exists": True, "moderator_exists": False}
    values = ", ".join(
        f"('{s}', '{p}', '{o}', {str(i).lower()})" for s, p, o, i in TRIPLES
    )
    cte = "SELECT * FROM (VALUES " + values + ") AS v(subj, pred, obj, obj_is_iri)"
    sql = bgp_ask_oracle_sql(cte, asks)
    duck = {r[0]: r[1] for r in duckdb.connect().execute(sql).fetchall()}
    assert duck == got


FILTER_TRIPLES = [
    ("urn:t1", "urn:idx", "3", False),
    ("urn:t2", "urn:idx", "7", False),
    ("urn:t3", "urn:idx", "12", False),
    ("urn:t4", "urn:idx", "oops", False),  # non-numeric binding drops out
    ("urn:t1", "urn:mentions", "urn:e1", True),
    ("urn:t2", "urn:mentions", "urn:e1", True),
    ("urn:t2", "urn:mentions", "urn:zz99", True),  # regex-rejected
    ("urn:t3", "urn:mentions", "urn:e2", True),
    ("urn:t4", "urn:mentions", "urn:e3", True),
]


def test_filter_numeric_and_regex_semantics(spark):  # noqa: F811
    """FILTER(?i > 5) numeric-compares the lexical form (non-numeric
    bindings drop out in BOTH engines via CAST/TRY_CAST→NULL) and
    FILTER(regex(?e, ...)) matches lexically; the SQL mirror agrees."""
    df = spark.createDataFrame(
        FILTER_TRIPLES, "subj string, pred string, obj string, obj_is_iri boolean"
    )
    patterns = [("?t", "<urn:idx>", "?i"), ("?t", "<urn:mentions>", "?e")]
    filters = [("i", "gt", 5), ("e", "regex", "e\\d$")]
    out = bgp_select(df, patterns, project=["t", "i", "e"], filters=filters)
    assert _rows(out) == [("urn:t2", "7", "urn:e1"), ("urn:t3", "12", "urn:e2")]
    values = ", ".join(
        f"('{s}', '{p}', '{o}', {str(i).lower()})" for s, p, o, i in FILTER_TRIPLES
    )
    cte = "SELECT * FROM (VALUES " + values + ") AS v(subj, pred, obj, obj_is_iri)"
    sql = bgp_oracle_sql(cte, patterns, project=["t", "i", "e"], filters=filters)
    duck = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert duck == _rows(out)
    # string-typed eq/ne filters compare lexically
    out2 = bgp_select(df, patterns, project=["t"], filters=[("i", "eq", "7")])
    assert _rows(out2) == [("urn:t2",), ("urn:t2",)]


def test_filter_validation(tiny):
    with pytest.raises(ValueError, match="not bound"):
        bgp_select(
            tiny, [("?t", "<urn:role>", '"tool"')], filters=[("zz", "gt", 1)]
        )
    with pytest.raises(ValueError, match="unsupported filter op"):
        bgp_select(
            tiny, [("?t", "<urn:role>", "?r")], filters=[("r", "between", 1)]
        )
    with pytest.raises(ValueError, match="regex filter value"):
        bgp_select(
            tiny, [("?t", "<urn:role>", "?r")], filters=[("r", "regex", 7)]
        )


def test_filter_compiles_below_join(spark):  # noqa: F811
    """The FILTER conditions must sit in the pattern scans BELOW the
    join (first Join line above the cast/rlike filter lines in the
    executed-plan tree), and pushable string filters must reach a
    persisted table's parquet scan as PushedFilters."""
    from jsonld_ex_spark.operators.kg_queries import kg_bgp_filtered_mentions

    plan = (
        kg_bgp_filtered_mentions(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    join_pos = min(
        p for p in (plan.find("HashJoin"), plan.find("SortMergeJoin")) if p >= 0
    )
    cast_pos = plan.find("cast(")
    rlike_pos = plan.find("RLIKE")
    assert cast_pos > join_pos and rlike_pos > join_pos  # below, not post-join
    assert "CartesianProduct" not in plan


def test_order_limit_semantics_and_plan(spark):  # noqa: F811
    """ORDER BY + LIMIT: deterministic prefix under a total order,
    mirrored SQL, and the TakeOrderedAndProject plan (per-partition
    heaps — never a global sort)."""
    from jsonld_ex_spark.operators.bgp import (
        bgp_order_limit,
        bgp_order_limit_oracle_sql,
    )
    from jsonld_ex_spark.operators.kg_queries import kg_bgp_top_entities

    df = spark.createDataFrame(
        [("a", 3), ("b", 5), ("c", 5), ("d", 1)], "e string, n long"
    )
    out = bgp_order_limit(df, [("n", "desc"), ("e", "asc")], 3)
    assert [tuple(r) for r in out.collect()] == [("b", 5), ("c", 5), ("a", 3)]
    sql = bgp_order_limit_oracle_sql(
        "SELECT * FROM (VALUES ('a', 3), ('b', 5), ('c', 5), ('d', 1)) AS v(e, n)",
        [("n", "desc"), ("e", "asc")], 3,
    )
    assert [tuple(r) for r in duckdb.connect().execute(sql).fetchall()] == [
        ("b", 5), ("c", 5), ("a", 3),
    ]
    plan = (
        kg_bgp_top_entities(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    with pytest.raises(ValueError, match="total order"):
        bgp_order_limit(df, [], 3)
    with pytest.raises(ValueError, match="bad direction"):
        bgp_order_limit(df, [("n", "down")], 3)
    with pytest.raises(ValueError, match="positive"):
        bgp_order_limit(df, [("n", "asc")], 0)


def test_values_clause_semantics_and_mirror(tiny):
    from jsonld_ex_spark.operators.bgp import bgp_oracle_sql

    patterns = [("?t", "<urn:mentions>", "?e")]
    vals = {"e": ["urn:e1", "urn:zz"]}
    out = bgp_select(tiny, patterns, project=["t", "e"], values=vals)
    got = _rows(out)
    assert got == [("urn:t1", "urn:e1"), ("urn:t2", "urn:e1"), ("urn:t3", "urn:e1")]
    values_txt = ", ".join(
        f"('{s}', '{p}', '{o}', {str(i).lower()})" for s, p, o, i in TRIPLES
    )
    cte = "SELECT * FROM (VALUES " + values_txt + ") AS v(subj, pred, obj, obj_is_iri)"
    sql = bgp_oracle_sql(cte, patterns, project=["t", "e"], values=vals)
    assert got == sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    with pytest.raises(ValueError, match="VALUES variable"):
        bgp_select(tiny, patterns, values={"zz": ["x"]})


def test_numeric_filter_fractional_lexicals_agree_cross_engine(spark):  # noqa: F811
    """Round-5 advice (medium): without the strict-integer guard Spark
    try_cast('12.5' as long) → NULL (row dropped) while DuckDB
    TRY_CAST('12.5' AS BIGINT) rounds to 13 (row kept).  Both engines
    must now drop every non-strict-integer lexical form identically."""
    triples = [
        ("urn:a", "urn:idx", "12.5", False),   # fractional → dropped
        ("urn:b", "urn:idx", "13", False),     # integer > 12 → kept
        ("urn:c", "urn:idx", "12.9e1", False), # scientific → dropped
        ("urn:d", "urn:idx", "-3", False),     # integer, fails gt
        ("urn:e", "urn:idx", "nan", False),    # non-numeric → dropped
    ]
    df = spark.createDataFrame(
        triples, "subj string, pred string, obj string, obj_is_iri boolean"
    )
    patterns = [("?t", "<urn:idx>", "?i")]
    for op, val, expect in [
        ("gt", 12, [("urn:b", "13")]),
        ("le", 13, [("urn:b", "13"), ("urn:d", "-3")]),
        ("ne", 13, [("urn:d", "-3")]),
    ]:
        filters = [("i", op, val)]
        out = bgp_select(df, patterns, project=["t", "i"], filters=filters)
        assert _rows(out) == sorted(expect), (op, val)
        values = ", ".join(
            f"('{s}', '{p}', '{o}', {str(i).lower()})" for s, p, o, i in triples
        )
        cte = "SELECT * FROM (VALUES " + values + ") AS v(subj, pred, obj, obj_is_iri)"
        sql = bgp_oracle_sql(cte, patterns, project=["t", "i"], filters=filters)
        duck = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
        assert duck == _rows(out), (op, val)


# --- round-5 surface: GRAPH quads, EXISTS/NOT EXISTS, BIND, path filters ---

QUAD_TRIPLES = [
    ("urn:t1", "urn:role", "tool", False, "urn:g1"),
    ("urn:t2", "urn:role", "tool", False, "urn:g2"),
    ("urn:t3", "urn:role", "assistant", False, None),  # default graph
    ("urn:t1", "urn:mentions", "urn:e1", True, "urn:g1"),
    ("urn:t2", "urn:mentions", "urn:e2", True, "urn:g2"),
    ("urn:t3", "urn:mentions", "urn:e1", True, None),
    ("urn:t1", "urn:idx", "7", False, "urn:g1"),
    ("urn:t2", "urn:idx", "12", False, "urn:g2"),
]


@pytest.fixture()
def quads(spark):  # noqa: F811
    return spark.createDataFrame(
        QUAD_TRIPLES,
        "subj string, pred string, obj string, obj_is_iri boolean, graph string",
    )


def _quads_cte() -> str:
    values = ", ".join(
        "('%s','%s','%s',%s,%s)"
        % (s, p, o, str(i).lower(), "NULL" if g is None else f"'{g}'")
        for s, p, o, i, g in QUAD_TRIPLES
    )
    return (
        "SELECT * FROM (VALUES " + values
        + ") AS v(subj, pred, obj, obj_is_iri, graph)"
    )


def _both(quads, **kw):
    out = sorted(tuple(r) for r in bgp_select(quads, **kw).collect())
    sql = bgp_oracle_sql(_quads_cte(), **kw)
    duck = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert out == duck
    return out


def test_graph_variable_binds_named_graphs_only(quads):
    """GRAPH ?g never ranges over the default graph (NULL): t3's
    default-graph role triple must not match."""
    got = _both(quads, patterns=[("?t", "<urn:role>", "?r", "?g")], project=["t", "r", "g"])
    assert got == [("urn:t1", "tool", "urn:g1"), ("urn:t2", "tool", "urn:g2")]


def test_graph_constant_scopes_pattern(quads):
    got = _both(quads, patterns=[("?t", "<urn:mentions>", "?e", "<urn:g2>")], project=["t", "e"])
    assert got == [("urn:t2", "urn:e2")]


def test_graph_variable_joins_across_patterns(quads):
    """?g shared between two quad patterns co-locates them in the SAME
    named graph, like SPARQL GRAPH ?g { p1 . p2 }."""
    got = _both(
        quads,
        patterns=[("?t", "<urn:role>", '"tool"', "?g"),
                  ("?t", "<urn:mentions>", "?e", "?g")],
        project=["t", "e", "g"],
    )
    assert got == [("urn:t1", "urn:e1", "urn:g1"), ("urn:t2", "urn:e2", "urn:g2")]


def test_triple_patterns_keep_union_graph_semantics(quads):
    """A 3-tuple matches across ALL graphs including the default —
    the pre-quad behavior is unchanged."""
    got = _both(quads, patterns=[("?t", "<urn:mentions>", "?e")], project=["t"])
    assert got == [("urn:t1",), ("urn:t2",), ("urn:t3",)]


def test_quad_validation(quads):
    with pytest.raises(ValueError, match="literal graph"):
        bgp_select(quads, [("?t", "<urn:role>", "?r", '"g"')])
    with pytest.raises(ValueError, match="3- or 4-tuple"):
        bgp_select(quads, [("?t", "<urn:role>")])


def test_exists_and_not_exists_groups(quads):
    got = _both(
        quads, patterns=[("?t", "<urn:mentions>", "?e")], project=["t", "e"],
        exists=[[("?t", "<urn:role>", '"tool"')]],
    )
    assert got == [("urn:t1", "urn:e1"), ("urn:t2", "urn:e2")]
    got = _both(
        quads, patterns=[("?t", "<urn:mentions>", "?e")], project=["t", "e"],
        not_exists=[[("?t", "<urn:role>", '"tool"')]],
    )
    assert got == [("urn:t3", "urn:e1")]
    # semi-join must not multiply solutions when the group matches twice
    got = _both(
        quads, patterns=[("?t", "<urn:role>", '"tool"')], project=["t"],
        exists=[[("?t", "<urn:idx>", "?i")]],
    )
    assert got == [("urn:t1",), ("urn:t2",)]


def test_exists_validation(quads):
    with pytest.raises(ValueError, match="shares no variable"):
        bgp_select(
            quads, [("?t", "<urn:role>", '"tool"')],
            exists=[[("?x", "<urn:idx>", "?i")]],
        )


def test_bind_expressions_match_oracle(quads):
    got = _both(
        quads,
        patterns=[("?t", "<urn:idx>", "?i"), ("?t", "<urn:mentions>", "?e")],
        project=["t", "ename", "i2", "lbl", "elen"],
        bind={
            "ename": ("localname", "e"),
            "i2": ("add", ("mul", "i", 10), 5),
            "lbl": ("concat", ("lit", "m:"), ("localname", "e"), ("lit", "@"), "t"),
            "elen": ("strlen", "e"),
        },
    )
    assert got == [
        ("urn:t1", "urn:e1", 75, "m:urn:e1@urn:t1", 6),
        ("urn:t2", "urn:e2", 125, "m:urn:e2@urn:t2", 6),
    ]


def test_bind_numeric_guard_nulls_non_integer(quads):
    """Arithmetic over a non-integer lexical form yields NULL in both
    engines (strict-integer guard, same as numeric FILTERs)."""
    got = _both(
        quads, patterns=[("?t", "<urn:role>", "?r")], project=["t", "n"],
        bind={"n": ("add", "r", 1)},
    )
    assert all(n is None for _, n in got)


def test_bind_validation(quads):
    with pytest.raises(ValueError, match="already bound"):
        bgp_select(quads, [("?t", "<urn:idx>", "?i")], bind={"i": ("strlen", "t")})
    with pytest.raises(ValueError, match="unbound variable"):
        bgp_select(quads, [("?t", "<urn:idx>", "?i")], bind={"x": ("strlen", "zz")})
    with pytest.raises(ValueError, match="bad string expression"):
        bgp_select(quads, [("?t", "<urn:idx>", "?i")], bind={"x": ("exp", "i")})


def test_filter_on_path_bound_variable(quads):
    """Round-4 verdict item 3: FILTERs now apply to variables bound
    only by property paths (post-join), mirrored in the oracle's outer
    WHERE."""
    paths = [("?t", ("seq", "urn:mentions", ("opt", "urn:sameAs")), "?e")]
    filters = [("e", "regex", "e1$")]
    out = sorted(
        tuple(r)
        for r in bgp_select(quads, [], paths=paths, filters=filters,
                            project=["t", "e"]).collect()
    )
    sql = bgp_oracle_sql(_quads_cte(), [], paths=paths, filters=filters,
                         project=["t", "e"])
    duck = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert out == duck
    assert out == [("urn:t1", "urn:e1"), ("urn:t3", "urn:e1")]
    # mixed: plain-pattern filter still pushes, path filter post-joins
    out2 = sorted(
        tuple(r)
        for r in bgp_select(
            quads, [("?t", "<urn:idx>", "?i")], paths=paths,
            filters=[("i", "gt", 5), ("e", "regex", "e1$")],
            project=["t", "i", "e"],
        ).collect()
    )
    sql2 = bgp_oracle_sql(
        _quads_cte(), [("?t", "<urn:idx>", "?i")], paths=paths,
        filters=[("i", "gt", 5), ("e", "regex", "e1$")],
        project=["t", "i", "e"],
    )
    duck2 = sorted(tuple(r) for r in duckdb.connect().execute(sql2).fetchall())
    assert out2 == duck2 == [("urn:t1", "7", "urn:e1")]


def test_constant_graph_filter_pushed_to_scan(spark, tmp_path):  # noqa: F811
    """Round-4 verdict item 2 'done' criterion: a constant graph term
    must reach the persisted quad table's parquet scan as a PushedFilter
    (on a graph-partitioned layout this prunes files)."""
    from jsonld_ex_spark.operators.bgp import bgp_over_table

    df = spark.createDataFrame(
        QUAD_TRIPLES,
        "subj string, pred string, obj string, obj_is_iri boolean, graph string",
    )
    path = str(tmp_path / "quads")
    df.write.parquet(path)
    out = bgp_over_table(
        spark, path,
        [("?t", "<urn:mentions>", "?e", "<urn:g2>")],
        project=["t", "e"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "urn:g2" in plan  # the graph constant reached the scan
    assert _rows(out) == [("urn:t2", "urn:e2")]
    # ?g variable: IsNotNull(graph) must also be pushed
    out2 = bgp_over_table(
        spark, path, [("?t", "<urn:role>", "?r", "?g")], project=["t", "g"]
    )
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert "IsNotNull(graph)" in plan2


def test_bgp_over_table_forwards_paths(spark, tmp_path):  # noqa: F811
    """Round-4 verdict item 4: the persisted-table form must evaluate
    property paths over the same pruned scans (it previously dropped
    paths= entirely)."""
    from jsonld_ex_spark.operators.bgp import bgp_over_table

    df = spark.createDataFrame(
        QUAD_TRIPLES,
        "subj string, pred string, obj string, obj_is_iri boolean, graph string",
    )
    path = str(tmp_path / "quads")
    df.write.parquet(path)
    out = bgp_over_table(
        spark, path,
        [("?t", "<urn:idx>", "?i")],
        project=["t", "i", "e"],
        paths=[("?t", ("seq", "urn:mentions", ("opt", "urn:sameAs")), "?e")],
    )
    assert _rows(out) == [
        ("urn:t1", "7", "urn:e1"),
        ("urn:t2", "12", "urn:e2"),
    ]


def test_sum_and_group_concat_aggregates(quads):
    """Round-5 aggregate extensions: SUM over strict-integer-guarded
    lexical forms (BIGINT both engines) and deterministic sorted
    GROUP_CONCAT, both mirrored in SQL."""
    from jsonld_ex_spark.operators.bgp import (
        bgp_aggregate,
        bgp_aggregate_oracle_sql,
    )

    kw = dict(
        patterns=[("?t", "<urn:mentions>", "?e")],
        group_by=["t"],
        aggs={"n": ("count", None), "ents": ("group_concat", "e")},
    )
    out = sorted(tuple(r) for r in bgp_aggregate(quads, **kw).collect())
    sql = bgp_aggregate_oracle_sql(_quads_cte(), **kw)
    duck = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert out == duck
    assert out == [
        ("urn:t1", 1, "urn:e1"),
        ("urn:t2", 1, "urn:e2"),
        ("urn:t3", 1, "urn:e1"),
    ]
    # SUM: integer lexicals sum; non-integer lexicals (role strings)
    # contribute NULL = skipped in both engines
    kw2 = dict(
        patterns=[("?t", "<urn:idx>", "?i"), ("?t", "<urn:role>", "?r")],
        group_by=["r"],
        aggs={"total": ("sum", "i"), "bogus": ("sum", "r")},
    )
    out2 = sorted(tuple(r) for r in bgp_aggregate(quads, **kw2).collect())
    sql2 = bgp_aggregate_oracle_sql(_quads_cte(), **kw2)
    duck2 = sorted(tuple(r) for r in duckdb.connect().execute(sql2).fetchall())
    # SPARQL Sum over an empty (no valid integer) sequence is 0 — and
    # NULL-free columns avoid DuckDB's float64 .df() downcast
    assert out2 == duck2 == [("tool", 19, 0)]
    with pytest.raises(ValueError, match="unsupported aggregate"):
        bgp_aggregate(quads, [("?t", "<urn:idx>", "?i")], ["t"], {"a": ("median", "i")})


def test_avg_sample_and_having(quads):
    """Round-5 late aggregates: AVG as integer per-mille floor (the
    only engine-exact rendering of a fractional mean), deterministic
    SAMPLE (= min), and the HAVING clause over typed aggregate
    outputs — all mirrored in SQL."""
    from jsonld_ex_spark.operators.bgp import (
        bgp_aggregate,
        bgp_aggregate_oracle_sql,
    )

    # both tool turns carry an idx (7, 12): avg = 9.5 → 9500 per-mille;
    # a group whose var never parses as an integer (role lexicals)
    # averages to 0, not NULL
    kw = dict(
        patterns=[("?t", "<urn:idx>", "?i"), ("?t", "<urn:role>", "?r")],
        group_by=["r"],
        aggs={
            "idx_avg_pm": ("avg", "i"),
            "bogus_avg_pm": ("avg", "r"),
            "a_turn": ("sample", "t"),
        },
    )
    out = sorted(tuple(r) for r in bgp_aggregate(quads, **kw).collect())
    sql = bgp_aggregate_oracle_sql(_quads_cte(), **kw)
    duck = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert out == duck == [("tool", 9500, 0, "urn:t1")]
    # negative sum path: floor(-19/2 * 1000) = -9500 exactly; floor of
    # -19/3 would be -6334 (floor) not -6333 (truncate) — use a 3-row
    # group to prove the floor rewrite, not just truncation agreement
    import pyspark.sql.functions as SF
    with_neg = quads.union(
        quads.sparkSession.createDataFrame(
            [("urn:t4", "urn:idx", "-33", False, None),
             ("urn:t4", "urn:role", "tool", False, None)],
            quads.schema,
        )
    ).withColumn("obj", SF.when(SF.col("obj") == "7", "-5").otherwise(SF.col("obj")))
    neg_cte = _quads_cte().replace("'7'", "'-5'") + (
        " UNION ALL SELECT 'urn:t4','urn:idx','-33',false,NULL"
        " UNION ALL SELECT 'urn:t4','urn:role','tool',false,NULL"
    )
    kw2 = dict(
        patterns=[("?t", "<urn:idx>", "?i"), ("?t", "<urn:role>", "?r")],
        group_by=["r"],
        aggs={"idx_avg_pm": ("avg", "i")},
    )
    out2 = sorted(tuple(r) for r in bgp_aggregate(with_neg, **kw2).collect())
    sql2 = bgp_aggregate_oracle_sql(neg_cte, **kw2)
    duck2 = sorted(tuple(r) for r in duckdb.connect().execute(sql2).fetchall())
    # (-5 + 12 - 33) / 3 = -26/3 → floor(-8666.67) = -8667 (truncation
    # would give -8666)
    assert out2 == duck2 == [("tool", -8667)]
    # HAVING: keep only groups with 2+ mentions
    kw3 = dict(
        patterns=[("?t", "<urn:mentions>", "?e")],
        group_by=["e"],
        aggs={"n": ("count", None)},
        having=[("n", "ge", 2)],
    )
    out3 = sorted(tuple(r) for r in bgp_aggregate(quads, **kw3).collect())
    sql3 = bgp_aggregate_oracle_sql(_quads_cte(), **kw3)
    duck3 = sorted(tuple(r) for r in duckdb.connect().execute(sql3).fetchall())
    assert out3 == duck3 == [("urn:e1", 2)]
    with pytest.raises(ValueError, match="unsupported HAVING"):
        bgp_aggregate(quads, [("?t", "<urn:mentions>", "?e")], ["e"],
                      {"n": ("count", None)}, having=[("n", "like", 2)])


DESCRIBE_TRIPLES = [
    ("urn:c1", "urn:turns", "_:a", True),
    ("_:a", "urn:first", "urn:t1", True),
    ("_:a", "urn:rest", "_:b", True),
    ("_:b", "urn:first", "urn:t2", True),
    ("_:b", "urn:rest", "urn:nil", True),
    ("urn:c2", "urn:turns", "_:c", True),
    ("_:c", "urn:first", "urn:t3", True),
    ("urn:t1", "urn:role", "tool", False),
    # single-char-scheme IRI: SQL LIKE '_:%' would wrongly treat it as
    # a blank node ('_' is the single-char wildcard) — the oracle must
    # use a literal prefix test (round-5 review finding)
    ("urn:c1", "urn:ref", "n:123", True),
    ("n:123", "urn:x", "y", False),
]


def test_describe_cbd_follows_bnodes_not_iris(spark):  # noqa: F811
    """DESCRIBE = Concise Bounded Description: the described node's
    triples plus the transitive closure through BLANK-NODE objects
    (the rdf:list spine), never through IRI objects (urn:t1's own
    triples stay out of c1's description)."""
    from jsonld_ex_spark.operators.bgp import (
        bgp_describe,
        bgp_describe_oracle_sql,
    )

    df = spark.createDataFrame(
        DESCRIBE_TRIPLES, "subj string, pred string, obj string, obj_is_iri boolean"
    )
    out = sorted(tuple(r) for r in bgp_describe(df, ["urn:c1"]).collect())
    assert out == sorted([
        ("urn:c1", "urn:c1", "urn:turns", "_:a", True),
        ("urn:c1", "urn:c1", "urn:ref", "n:123", True),
        ("urn:c1", "_:a", "urn:first", "urn:t1", True),
        ("urn:c1", "_:a", "urn:rest", "_:b", True),
        ("urn:c1", "_:b", "urn:first", "urn:t2", True),
        ("urn:c1", "_:b", "urn:rest", "urn:nil", True),
    ])  # n:123's own triples excluded: an IRI object is never followed
    # DataFrame-roots form + oracle equivalence over both roots
    roots = df.filter(F.col("pred") == "urn:turns").select("subj").dropDuplicates()
    got = sorted(tuple(r) for r in bgp_describe(df, roots).collect())
    values = ", ".join(
        f"('{s}', '{p}', '{o}', {str(i).lower()})" for s, p, o, i in DESCRIBE_TRIPLES
    )
    cte = "SELECT * FROM (VALUES " + values + ") AS v(subj, pred, obj, obj_is_iri)"
    sql = bgp_describe_oracle_sql(
        cte, "SELECT DISTINCT subj AS root FROM triples WHERE pred = 'urn:turns'"
    )
    duck = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == duck
    assert ("urn:c2", "_:c", "urn:first", "urn:t3", True) in got
    with pytest.raises(ValueError, match="empty DESCRIBE"):
        bgp_describe(df, [])


def test_int_guard_rejects_trailing_newline_both_engines(spark):  # noqa: F811
    """Round-5 review: Java's '$' matches before a trailing newline, so
    with ^...$ anchors Spark kept '7\\n' (try_cast trims it) while
    DuckDB's RE2 dropped it.  The \\A/\\z anchors must reject it in
    BOTH engines."""
    triples = [
        ("urn:a", "urn:idx", "7\n", False),
        ("urn:b", "urn:idx", "7", False),
    ]
    df = spark.createDataFrame(
        triples, "subj string, pred string, obj string, obj_is_iri boolean"
    )
    patterns = [("?t", "<urn:idx>", "?i")]
    filters = [("i", "ge", 7)]
    out = bgp_select(df, patterns, project=["t"], filters=filters)
    assert _rows(out) == [("urn:b",)]
    values = "('urn:a', 'urn:idx', '7' || chr(10), false), ('urn:b', 'urn:idx', '7', false)"
    cte = "SELECT * FROM (VALUES " + values + ") AS v(subj, pred, obj, obj_is_iri)"
    sql = bgp_oracle_sql(cte, patterns, project=["t"], filters=filters)
    duck = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert duck == [("urn:b",)]


def test_aggregate_empty_group_semantics(quads):
    """SPARQL empty-sequence aggregates: Sum({}) = 0, GROUP_CONCAT({})
    = '' — and neither engine may emit NULL (one NULL downcasts
    DuckDB's whole BIGINT .df() column to float64, diverging every
    other row's rendering)."""
    from jsonld_ex_spark.operators.bgp import (
        bgp_aggregate,
        bgp_aggregate_oracle_sql,
    )

    # group by role; sum/concat over ?tn bound only by an OPTIONAL that
    # never matches for 'assistant' (no urn:idx triple on t3)
    kw = dict(
        patterns=[("?t", "<urn:role>", "?r")],
        optional=[[("?t", "<urn:idx>", "?i")]],
        group_by=["r"],
        aggs={"total": ("sum", "i"), "vals": ("group_concat", "i")},
    )
    out = sorted(tuple(r) for r in bgp_aggregate(quads, **kw).collect())
    sql = bgp_aggregate_oracle_sql(_quads_cte(), **kw)
    duck = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert out == duck
    assert out == [("assistant", 0, ""), ("tool", 19, "12|7")]


def test_stats_driven_join_order_flips_on_cardinality(spark):  # noqa: F811
    """Round-6 verdict item 1: with predicate statistics, the left-deep
    order starts from the smallest ESTIMATED pattern, not the
    constant-count heuristic's pick.  Two patterns, one constant each:
    the huge predicate (urn:text — one triple per subject) is listed
    FIRST, the small one (urn:tool — 2 rows) second; the static order
    keeps the listing (index tie-break), the stats order flips.  The
    oracle SQL path never receives stats, so its (fingerprinted) text
    keeps the static order."""
    from jsonld_ex_spark.operators.bgp import (
        _join_order,
        _parse_pattern,
        predicate_stats,
    )

    rows = [(f"urn:t{i}", "urn:text", f"x{i}", False) for i in range(500)]
    rows += [("urn:t1", "urn:tool", "kb", False), ("urn:t2", "urn:tool", "kb2", False)]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_iri boolean"
    )
    patterns = [("?t", "<urn:text>", "?x"), ("?t", "<urn:tool>", "?n")]
    parsed = [_parse_pattern(p) for p in patterns]
    assert _join_order(parsed, False) == [0, 1]  # static: listing order
    stats = predicate_stats(df)
    assert stats["preds"]["urn:text"][0] == 500
    assert _join_order(parsed, False, stats) == [1, 0]  # flipped by cost
    # result set is order-independent: both compiles agree
    got = sorted(
        tuple(r) for r in bgp_select(df, patterns, project=["t", "x", "n"]).collect()
    )
    assert got == [("urn:t1", "x1", "kb"), ("urn:t2", "x2", "kb2")]


def test_stats_estimate_uses_object_constant_selectivity(spark):  # noqa: F811
    """A constant object divides the predicate's estimate by its
    observed object-NDV: (?t urn:role "tool") over a 2-value role
    predicate estimates ~half the role rows, so it is ordered before a
    same-size all-variable pattern."""
    from jsonld_ex_spark.operators.bgp import (
        _estimated_rows,
        _join_order,
        _parse_pattern,
        predicate_stats,
    )

    rows = [
        (f"urn:t{i}", "urn:role", "tool" if i % 2 else "user", False)
        for i in range(100)
    ] + [(f"urn:t{i}", "urn:mentions", f"urn:e{i % 3}", True) for i in range(100)]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_iri boolean"
    )
    stats = predicate_stats(df)
    p_role = _parse_pattern(("?t", "<urn:role>", '"tool"'))
    p_ment = _parse_pattern(("?t", "<urn:mentions>", "?e"))
    assert _estimated_rows(p_role, stats) < _estimated_rows(p_ment, stats)
    assert _join_order([p_ment, p_role], False, stats) == [1, 0]
