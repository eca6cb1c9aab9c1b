"""Round-trip invariants across the full algorithm stack.

Pipeline triples → fromRdf (expanded docs) → compact (pipeline context)
→ re-expand → toRdf must reproduce the original quad set exactly (same
graph, modulo blank-node relabeling handled by isomorphism).  This
exercises every algorithm the reference implements in one loop, on
pipeline-shaped data rather than fixtures.
"""

from __future__ import annotations

import pytest

from jsonld_ex_spark.core.api import compact, expand, from_rdf
from jsonld_ex_spark.core.context import Options
from jsonld_ex_spark.core.flattening import BlankNodeGenerator
from jsonld_ex_spark.core.nquads import isomorphic
from jsonld_ex_spark.core.to_rdf import expanded_to_rdf
from jsonld_ex_spark.operators.kg_pipeline import (
    CONV_CONTEXT,
    _pipeline_context,
    build_conversation_doc,
)


def _sample_doc():
    turns = [
        {
            "turn_idx": i,
            "role": ["user", "assistant", "tool"][i % 3],
            "text": f"Zürich café — turn {i} references ENT_000{i}",
            "tool": "kb_search" if i % 3 == 2 else None,
            "ts": f"2024-01-01T00:00:0{i}Z",
            "mentions": [f"ENT_000{i}", "ENT_0001"],
        }
        for i in range(4)
    ]
    return build_conversation_doc("conv-rt", turns)


def test_triples_fromrdf_compact_expand_roundtrip():
    options = Options()
    active = _pipeline_context()
    from jsonld_ex_spark.core.expansion import expand as expand_algo

    expanded = expand_algo(active, None, _sample_doc(), options)
    quads = expanded_to_rdf(expanded, options, BlankNodeGenerator(skolem_prefix="conv-rt."))

    docs = from_rdf(quads, options)
    compacted = compact(docs, {"@context": CONV_CONTEXT}, options)
    re_expanded = expand(compacted, options)
    quads2 = expanded_to_rdf(re_expanded, options)

    assert isomorphic(quads, quads2)


def test_expand_idempotent_on_pipeline_docs():
    options = Options()
    active = _pipeline_context()
    from jsonld_ex_spark.core.expansion import expand as expand_algo

    expanded = expand_algo(active, None, _sample_doc(), options)
    again = expand(expanded, options)
    assert again == (expanded if isinstance(expanded, list) else [expanded])
