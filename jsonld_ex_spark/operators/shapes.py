"""SHACL-lite shape validation over the triple table.

The rdf-elixir ecosystem pairs jsonld-ex with a SHACL validator; a KG
pipeline without data-quality gates ships corrupt graphs silently.
This module compiles a small, useful subset of SHACL's core
constraints — cardinality per typed subject, object datatype, object
node-kind, and value-set membership — into plain aggregations over the
triple relation, each one a map-side-combined groupBy (no Python, no
per-subject loops; at 10^12 triples validation costs one pass per
rule over the rule's predicate slice, column-pruned and
filter-pushed on a persisted table).

The report row per rule is (rule_id, n_checked, n_violations) —
n_checked makes a clean graph's report NON-vacuous (violations = 0 is
an assertion over real counts, not an empty result).  Violating
detail rows are available via ``violations=True`` for debugging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _typed_subjects(triples: DataFrame, cls: str) -> DataFrame:
    return (
        triples.filter((F.col("pred") == RDF_TYPE) & (F.col("obj") == cls))
        .select(F.col("subj"))
        .distinct()
    )


# Each rule returns ONE relation of checked units with a boolean `bad`
# column, so the report is a single conditional aggregate per rule
# (count + sum(bad)) — one pass over the rule's predicate slice, not
# separate checked/violation scans.

def _rule_cardinality(triples, cls, pred, min_count, max_count):
    """Subjects of type cls must carry between [min_count, max_count]
    pred triples."""
    subs = _typed_subjects(triples, cls)
    matched = subs.join(
        triples.filter(F.col("pred") == pred).groupBy("subj").agg(
            F.count(F.lit(1)).alias("c")
        ),
        on="subj",
        how="left",
    ).select("subj", F.coalesce("c", F.lit(0)).alias("c"))
    return matched.select(
        "subj",
        ((F.col("c") < min_count) | (F.col("c") > max_count)).alias("bad"),
    )


def _rule_datatype(triples, pred, dt):
    """Every pred triple's object must be a literal of datatype dt."""
    return triples.filter(F.col("pred") == pred).select(
        "subj",
        (F.col("obj_is_iri") | (F.coalesce("obj_dt", F.lit("")) != dt)).alias("bad"),
    )


def _rule_node_kind(triples, pred, is_iri):
    """Every pred triple's object must be an IRI (or a literal)."""
    return triples.filter(F.col("pred") == pred).select(
        "subj", (F.col("obj_is_iri") != F.lit(is_iri)).alias("bad")
    )


def _rule_value_in(triples, pred, values):
    """Every pred triple's object lexical form must be in the set."""
    return triples.filter(F.col("pred") == pred).select(
        "subj", (~F.col("obj").isin(list(values))).alias("bad")
    )


def _rule_pattern(triples, pred, regex):
    """sh:pattern — every pred triple's object lexical form must match
    the regex (Java/RE2-common syntax, mirrored by regexp_matches)."""
    return triples.filter(F.col("pred") == pred).select(
        "subj", (~F.col("obj").rlike(regex)).alias("bad")
    )


def _rule_class_range(triples, pred, cls):
    """sh:class — every pred triple's object must be a subject typed
    cls somewhere in the graph.  One equi-join against the (distinct)
    typed-subject set: at scale this is a broadcast or shuffle join on
    the object key, never a per-object lookup."""
    typed = _typed_subjects(triples, cls).select(
        F.col("subj").alias("obj"), F.lit(True).alias("_typed")
    )
    p = triples.filter(F.col("pred") == pred).select("subj", "obj")
    return p.join(typed, on="obj", how="left").select(
        "subj", F.col("_typed").isNull().alias("bad")
    )


_RULE_FNS = {
    "cardinality": _rule_cardinality,
    "datatype": _rule_datatype,
    "node_kind": _rule_node_kind,
    "value_in": _rule_value_in,
    "pattern": _rule_pattern,
    "class_range": _rule_class_range,
}


def validate_shapes(triples: DataFrame, shapes: list[dict]) -> DataFrame:
    """Run every shape rule; returns one report row per rule:
    (rule_id, n_checked, n_violations) via a single conditional
    aggregate over that rule's checked relation."""
    out = None
    for shape in shapes:
        params = {k: v for k, v in shape.items() if k not in ("rule_id", "rule")}
        checked = _RULE_FNS[shape["rule"]](triples, **params)
        row = checked.agg(
            F.count(F.lit(1)).alias("n_checked"),
            F.coalesce(F.sum(F.col("bad").cast("long")), F.lit(0)).alias(
                "n_violations"
            ),
        ).select(
            F.lit(shape["rule_id"]).alias("rule_id"), "n_checked", "n_violations"
        )
        out = row if out is None else out.unionByName(row)
    if out is None:
        raise ValueError("no shapes given")
    return out


def shape_violation_rows(triples: DataFrame, shape: dict) -> DataFrame:
    """Debug form: the violating subjects for one rule."""
    params = {k: v for k, v in shape.items() if k not in ("rule_id", "rule")}
    checked = _RULE_FNS[shape["rule"]](triples, **params)
    return checked.filter(F.col("bad")).select("subj").distinct()
