"""Node Map Generation + Flattening (W3C JSON-LD 1.1 API §6, §7).

Reference parity: lib/json/ld/flattening.ex:12-372 in /root/reference.

Blank-node identifiers: the reference uses a process-global GenServer
counter (node_identifier_map.ex:31-46) which cannot distribute; here the
generator is a plain per-document object with two modes:

* ``BlankNodeGenerator()`` — ``_:b0, _:b1, …`` (reference-identical, used
  for W3C fixture parity; scope is one document so no coordination needed)
* ``BlankNodeGenerator(skolem_prefix=...)`` — deterministic skolem labels
  ``<prefix>:<n>`` keyed by the caller on (conv_id,) so ids are stable
  across retries/re-runs at cluster scale (north_star requirement).
"""

from __future__ import annotations

from typing import Any

from jsonld_ex_spark.core import errors as err
from jsonld_ex_spark.core.errors import JsonLdError
from jsonld_ex_spark.core.utils import as_list, is_blank_node_id


def _strict_eq(a: Any, b: Any) -> bool:
    """JSON-value equality that does NOT conflate bool/int/float.

    Python's ``True == 1`` / ``1 == 1.0`` would wrongly dedup
    ``{"@value": true}`` against ``{"@value": 1}`` during node-map merge.
    """
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, bool):
        return a is b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return type(a) == type(b) and a == b
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_strict_eq(v, b[k]) for k, v in a.items())
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_strict_eq(x, y) for x, y in zip(a, b))
    if type(a) != type(b):
        return False
    return a == b


def _strict_in(element: Any, values: list) -> bool:
    return any(_strict_eq(element, v) for v in values)


class BlankNodeGenerator:
    """Deterministic per-document blank node id issuer."""

    def __init__(self, skolem_prefix: str | None = None):
        self._map: dict[str, str] = {}
        self._counter = 0
        self._prefix = skolem_prefix

    def generate(self, identifier: str | None = None) -> str:
        if identifier is not None and identifier in self._map:
            return self._map[identifier]
        if self._prefix is not None:
            new_id = f"_:{self._prefix}{self._counter}"
        else:
            new_id = f"_:b{self._counter}"
        self._counter += 1
        if identifier is not None:
            self._map[identifier] = new_id
        return new_id


def generate_node_map(
    element: Any,
    node_map: dict,
    generator: BlankNodeGenerator,
    active_graph: str = "@default",
    active_subject: Any = None,
    active_property: str | None = None,
    list_obj: dict | None = None,
) -> None:
    """Node Map Generation (spec §7.1)."""
    if isinstance(element, list):
        for item in element:
            generate_node_map(item, node_map, generator, active_graph, active_subject, active_property, list_obj)
        return
    if not isinstance(element, dict):
        return

    graph = node_map.setdefault(active_graph, {})
    subject_node = graph.get(active_subject) if isinstance(active_subject, str) else None

    if "@type" in element:
        types = [
            generator.generate(t) if is_blank_node_id(t) else t
            for t in as_list(element["@type"])
        ]
        element["@type"] = types if isinstance(element["@type"], list) else types[0]

    if "@value" in element:
        if list_obj is None:
            if subject_node is not None:
                values = subject_node.setdefault(active_property, [])
                if not _strict_in(element, values):
                    values.append(element)
        else:
            list_obj["@list"].append(element)
        return

    if "@list" in element:
        result: dict = {"@list": []}
        generate_node_map(element["@list"], node_map, generator, active_graph, active_subject, active_property, result)
        if list_obj is None:
            if subject_node is not None:
                subject_node.setdefault(active_property, []).append(result)
        else:
            list_obj["@list"].append(result)
        return

    # node object
    if "@id" in element:
        elem_id = element.pop("@id")
        if not isinstance(elem_id, str):
            elem_id = generator.generate()
        elif is_blank_node_id(elem_id):
            elem_id = generator.generate(elem_id)
    else:
        elem_id = generator.generate()

    if elem_id not in graph:
        graph[elem_id] = {"@id": elem_id}
    node = graph[elem_id]

    if isinstance(active_subject, dict):
        # reverse-property case: active_subject is a node reference
        values = node.setdefault(active_property, [])
        if active_subject not in values:
            values.append(active_subject)
    elif active_property is not None:
        reference = {"@id": elem_id}
        if list_obj is None:
            if subject_node is not None:
                values = subject_node.setdefault(active_property, [])
                if reference not in values:
                    values.append(reference)
        else:
            list_obj["@list"].append(reference)

    if "@type" in element:
        node_types = node.setdefault("@type", [])
        for t in as_list(element.pop("@type")):
            if t not in node_types:
                node_types.append(t)

    if "@index" in element:
        index = element.pop("@index")
        if "@index" in node and node["@index"] != index:
            raise JsonLdError(err.CONFLICTING_INDEXES, repr(index))
        node["@index"] = index

    if "@reverse" in element:
        referenced_node = {"@id": elem_id}
        reverse_map = element.pop("@reverse")
        for prop, values in reverse_map.items():
            for value in values:
                generate_node_map(value, node_map, generator, active_graph, referenced_node, prop)

    if "@graph" in element:
        graph_items = element.pop("@graph")
        node_map.setdefault(elem_id, {})
        generate_node_map(graph_items, node_map, generator, elem_id)

    if "@included" in element:
        included = element.pop("@included")
        generate_node_map(included, node_map, generator, active_graph)

    for prop in sorted(element):
        if prop == "@id":
            continue
        value = element[prop]
        if prop.startswith("_:"):
            prop = generator.generate(prop)
        if prop not in node:
            node[prop] = []
        generate_node_map(value, node_map, generator, active_graph, elem_id, prop)


def node_map(expanded: Any, generator: BlankNodeGenerator | None = None) -> dict:
    """Build the full node map for an expanded document."""
    generator = generator or BlankNodeGenerator()
    nm: dict = {"@default": {}}
    generate_node_map(expanded, nm, generator)
    return nm


def flatten_node_map(nm: dict, ordered: bool = False) -> list:
    """Flattening Algorithm (spec §6.1) steps 2-6: node map → node array."""
    default_graph = nm["@default"]
    graph_names = [g for g in nm.keys() if g != "@default"]
    for graph_name in sorted(graph_names):
        entry = default_graph.setdefault(graph_name, {"@id": graph_name})
        graph_entries = entry.setdefault("@graph", [])
        for node_id in sorted(nm[graph_name].keys()):
            node = nm[graph_name][node_id]
            if set(node.keys()) != {"@id"}:
                graph_entries.append(node)
    return [
        default_graph[node_id]
        for node_id in sorted(default_graph.keys())
        if set(default_graph[node_id].keys()) != {"@id"}
    ]
