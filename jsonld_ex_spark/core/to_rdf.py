"""Deserialize JSON-LD to RDF (W3C JSON-LD 1.1 API §8.1-8.3).

Reference parity: lib/json/ld/decoder.ex:29-297 in /root/reference.

Output is a list of quads ``(subject, predicate, object, graph)`` with
terms per jsonld_ex_spark.core.rdf; ``graph`` is None for the default
graph.  Deterministic: graphs, subjects and properties are walked in
sorted order (matching the reference's unconditional sort at
decoder.ex:46-64), so blank-node allocation order — and therefore the
skolemized ids used in the Spark pipeline — is stable across runs.
"""

from __future__ import annotations

import re
from typing import Any

from jsonld_ex_spark.core import rdf
from jsonld_ex_spark.core.context import Options
from jsonld_ex_spark.core.flattening import BlankNodeGenerator, node_map
from jsonld_ex_spark.core.iri import is_well_formed_iri
from jsonld_ex_spark.core.rdf import (
    RDF_DIRECTION,
    RDF_FIRST,
    RDF_JSON,
    RDF_LANGSTRING,
    RDF_LANGUAGE,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    RDF_VALUE,
    XSD_BOOLEAN,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
    canonical_double,
    canonical_integer,
    jcs_canonicalize,
)
from jsonld_ex_spark.core.utils import is_blank_node_id, is_keyword

_LANGTAG_RE = re.compile(r"^[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8})*$")

Quad = tuple  # (subj_term, pred_term, obj_term, graph_term_or_None)

UNSET_PRED = object()  # pred-term cache miss sentinel


_RDF_TYPE_TERM = ("iri", RDF_TYPE)
_RDF_FIRST_TERM = ("iri", RDF_FIRST)
_RDF_REST_TERM = ("iri", RDF_REST)
_RDF_NIL_TERM = ("iri", RDF_NIL)


def _node_term(value: str) -> tuple | None:
    if value.startswith("_:"):
        return ("bnode", value[2:])
    if is_well_formed_iri(value):
        return ("iri", value)
    return None


def to_rdf_from_node_map(
    nm: dict,
    options: Options,
    generator: BlankNodeGenerator,
) -> list[Quad]:
    """Spec §8.1 steps 1-2 over a prebuilt node map."""
    quads: list[Quad] = []
    for graph_name in sorted(nm.keys()):
        graph = nm[graph_name]
        if graph_name == "@default":
            graph_term = None
        else:
            graph_term = _node_term(graph_name)
            if graph_term is None:
                continue
        list_triples: list[Quad] = []
        pred_terms: dict[str, tuple | None] = {}
        for subject in sorted(graph.keys()):
            node = graph[subject]
            subject_term = _node_term(subject)
            if subject_term is None:
                continue
            for prop in sorted(node.keys()):
                values = node[prop]
                if prop == "@type":
                    for t in values:
                        t_term = _node_term(t)
                        if t_term is None:
                            continue
                        quads.append((subject_term, _RDF_TYPE_TERM, t_term, graph_term))
                    continue
                pred_term = pred_terms.get(prop, UNSET_PRED)
                if pred_term is UNSET_PRED:
                    if is_keyword(prop):
                        pred_term = None
                    elif prop.startswith("_:"):
                        pred_term = ("bnode", prop[2:]) if options.produce_generalized_rdf else None
                    elif is_well_formed_iri(prop):
                        pred_term = ("iri", prop)
                    else:
                        pred_term = None
                    pred_terms[prop] = pred_term
                if pred_term is None:
                    continue
                for item in values:
                    obj_term = _object_to_rdf(item, options, generator, list_triples, graph_term)
                    if obj_term is not None:
                        quads.append((subject_term, pred_term, obj_term, graph_term))
        quads.extend(list_triples)
    # an RDF dataset is a SET of quads: distinct node-map values can
    # canonicalize to the same literal (e.g. 0 and 0.0 → "0"^^xsd:integer)
    return list(dict.fromkeys(quads))


def _object_to_rdf(
    item: Any,
    options: Options,
    generator: BlankNodeGenerator,
    list_triples: list[Quad],
    graph_term: tuple | None,
) -> tuple | None:
    """Object to RDF Conversion (spec §8.2)."""
    if not isinstance(item, dict):
        return None
    if "@value" not in item:
        if "@list" in item:
            return _list_to_rdf(item["@list"], options, generator, list_triples, graph_term)
        if "@id" in item:
            return _node_term(item["@id"])
        return None

    value = item["@value"]
    datatype = item.get("@type")
    language = item.get("@language")
    direction = item.get("@direction")

    if datatype is not None and datatype != "@json" and not is_well_formed_iri(datatype):
        return None
    if language is not None and not _LANGTAG_RE.match(language):
        return None

    if datatype == "@json":
        value = jcs_canonicalize(value)
        datatype = RDF_JSON

    if isinstance(value, bool):
        value = "true" if value else "false"
        datatype = datatype or XSD_BOOLEAN
    elif isinstance(value, float) and (value % 1 != 0 or abs(value) >= 1e21) or datatype == XSD_DOUBLE:
        if isinstance(value, (int, float)):
            value = canonical_double(float(value))
        datatype = datatype or XSD_DOUBLE
    elif isinstance(value, (int, float)) and not isinstance(value, bool):
        value = canonical_integer(value)
        datatype = datatype or XSD_INTEGER
    elif datatype is None:
        datatype = RDF_LANGSTRING if language is not None else XSD_STRING

    if not isinstance(value, str):
        value = str(value)

    if direction is not None and options.rdf_direction == "i18n-datatype":
        lang = (language or "").lower()
        datatype = f"{rdf.I18N_NS}{lang}_{direction}"
        return rdf.literal(value, datatype, None)
    if direction is not None and options.rdf_direction == "compound-literal":
        cl = rdf.bnode(generator.generate()[2:])
        list_triples.append((cl, rdf.iri(RDF_VALUE), rdf.literal(value, XSD_STRING, None), graph_term))
        if language is not None:
            list_triples.append((cl, rdf.iri(RDF_LANGUAGE), rdf.literal(language.lower(), XSD_STRING, None), graph_term))
        list_triples.append((cl, rdf.iri(RDF_DIRECTION), rdf.literal(direction, XSD_STRING, None), graph_term))
        return cl

    if language is not None:
        return rdf.literal(value, RDF_LANGSTRING, language)
    return rdf.literal(value, datatype, None)


def _list_to_rdf(
    items: list,
    options: Options,
    generator: BlankNodeGenerator,
    list_triples: list[Quad],
    graph_term: tuple | None,
) -> tuple:
    """List Conversion (spec §8.3)."""
    if not items:
        return _RDF_NIL_TERM
    bnodes = [("bnode", generator.generate()[2:]) for _ in items]
    for i, item in enumerate(items):
        obj = _object_to_rdf(item, options, generator, list_triples, graph_term)
        if obj is not None:
            list_triples.append((bnodes[i], _RDF_FIRST_TERM, obj, graph_term))
        rest = bnodes[i + 1] if i + 1 < len(items) else _RDF_NIL_TERM
        list_triples.append((bnodes[i], _RDF_REST_TERM, rest, graph_term))
    return bnodes[0]


def expanded_to_rdf(
    expanded: Any,
    options: Options,
    generator: BlankNodeGenerator | None = None,
) -> list[Quad]:
    """Expanded JSON-LD document → quads (node map + deserialize)."""
    generator = generator or BlankNodeGenerator()
    nm = node_map(expanded, generator)
    return to_rdf_from_node_map(nm, options, generator)
