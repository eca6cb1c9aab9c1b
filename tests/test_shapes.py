"""SHACL-lite validator: every rule must FIRE on a planted-violation
graph and stay silent on the clean pipeline graph."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jsonld_ex_spark.operators.shapes import (
    RDF_TYPE,
    shape_violation_rows,
    validate_shapes,
)
from tests.spark_fixtures import SF_DIR, spark  # noqa: F401

V = "urn:v#"
XSD_DT = "http://www.w3.org/2001/XMLSchema#dateTime"

DIRTY = [
    # t1: fine
    ("urn:t1", RDF_TYPE, f"{V}Turn", True, None),
    ("urn:t1", f"{V}role", "user", False, "xsd:string"),
    ("urn:t1", f"{V}ts", "2024-01-01T00:00:00Z", False, XSD_DT),
    # t2: MISSING role, ts has WRONG datatype
    ("urn:t2", RDF_TYPE, f"{V}Turn", True, None),
    ("urn:t2", f"{V}ts", "2024-01-01", False, "xsd:date"),
    # t3: TWO roles, one role value outside the set, literal mention
    ("urn:t3", RDF_TYPE, f"{V}Turn", True, None),
    ("urn:t3", f"{V}role", "user", False, "xsd:string"),
    ("urn:t3", f"{V}role", "robot", False, "xsd:string"),
    ("urn:t3", f"{V}ts", "2024-01-01T00:00:01Z", False, XSD_DT),
    ("urn:t3", f"{V}mentions", "not-an-iri", False, "xsd:string"),
    ("urn:t1", f"{V}mentions", "urn:e1", True, None),
    # e1 is a typed Entity; t3's literal mention target is not
    ("urn:e1", RDF_TYPE, f"{V}Entity", True, None),
]


SHAPES = [
    {"rule_id": "role_card", "rule": "cardinality", "cls": f"{V}Turn",
     "pred": f"{V}role", "min_count": 1, "max_count": 1},
    {"rule_id": "ts_dt", "rule": "datatype", "pred": f"{V}ts", "dt": XSD_DT},
    {"rule_id": "mention_iri", "rule": "node_kind", "pred": f"{V}mentions",
     "is_iri": True},
    {"rule_id": "role_vals", "rule": "value_in", "pred": f"{V}role",
     "values": ("user", "assistant", "tool")},
    {"rule_id": "ts_pattern", "rule": "pattern", "pred": f"{V}ts",
     "regex": r"^\d{4}-\d{2}-\d{2}T"},
    {"rule_id": "mentions_typed", "rule": "class_range",
     "pred": f"{V}mentions", "cls": f"{V}Entity"},
]


@pytest.fixture()
def dirty(spark):  # noqa: F811
    df = spark.createDataFrame(
        DIRTY,
        "subj string, pred string, obj string, obj_is_iri boolean, obj_dt string",
    )
    return df.select(
        "*",
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(None).cast("string").alias("graph"),
    )


def test_every_rule_fires_on_planted_violations(dirty):
    rep = {r["rule_id"]: r for r in validate_shapes(dirty, SHAPES).collect()}
    assert rep["role_card"]["n_checked"] == 3          # 3 typed turns
    assert rep["role_card"]["n_violations"] == 2       # t2 missing, t3 double
    assert rep["ts_dt"]["n_checked"] == 3
    assert rep["ts_dt"]["n_violations"] == 1           # t2 wrong datatype
    assert rep["mention_iri"]["n_checked"] == 2
    assert rep["mention_iri"]["n_violations"] == 1     # t3 literal mention
    assert rep["role_vals"]["n_checked"] == 3
    assert rep["role_vals"]["n_violations"] == 1       # 'robot'
    # t2's ts ('2024-01-01', no time part) breaks the datetime pattern
    assert rep["ts_pattern"]["n_checked"] == 3
    assert rep["ts_pattern"]["n_violations"] == 1
    assert rep["mentions_typed"]["n_checked"] == 2
    assert rep["mentions_typed"]["n_violations"] == 1  # 'not-an-iri' untyped
    bad = {r["subj"] for r in shape_violation_rows(dirty, SHAPES[0]).collect()}
    assert bad == {"urn:t2", "urn:t3"}


def test_pipeline_graph_is_clean_but_checked(spark):  # noqa: F811
    from jsonld_ex_spark.operators.kg_queries import kg_shape_report

    rows = kg_shape_report(spark, SF_DIR).collect()
    assert len(rows) == 8
    assert all(r["n_violations"] == 0 for r in rows)
    assert all(r["n_checked"] > 0 for r in rows)  # non-vacuous


def test_exact_percentiles_nearest_rank(spark):  # noqa: F811
    """Nearest-rank definition pinned on a tiny group: p50 of
    [10,20,30,40] cents is the ceil(0.5*4)=2nd value (20)."""
    import tempfile

    from jsonld_ex_spark.functions.relational_ops import events_value_percentiles

    d = tempfile.mkdtemp() + "/t"
    rows = [(i, None, 1, "x", v, "{}") for i, v in enumerate([0.10, 0.20, 0.30, 0.40])]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    out = {r["pct"]: r["value_cents"] for r in events_value_percentiles(spark, d).collect()}
    assert out == {50: 20, 95: 40, 99: 40}
