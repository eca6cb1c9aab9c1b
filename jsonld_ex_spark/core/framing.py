"""JSON-LD 1.1 Framing Algorithm (W3C json-ld11-framing spec §4).

BEYOND REFERENCE: rdf-elixir/jsonld-ex implements only the
frame-expansion branches of Expansion (lib/json/ld/expansion.ex:252,
267,356-413,493-499) and has NO Framing algorithm; this module
implements the full public-spec pipeline:

    expand(input) → node map → [@merged graph] →
    frame matching (@id/@type/duck-typed patterns, @requireAll) →
    embed control (@once/@always/@never/@link, circularity guard) →
    @explicit / @default / @omitDefault → @reverse framing →
    named-graph recursion → @preserve cleanup →
    compaction with the frame's context →
    "@null" substitution, blank-node pruning (json-ld-1.1), @omitGraph

Written from the public spec text; no reference counterpart exists.
Pure Python, per-document — in Spark it runs inside the same
Arrow-batched mapInPandas stages as expansion (operators/jsonld_ops.py).
"""

from __future__ import annotations

import copy as _copy
from dataclasses import replace as _replace
from typing import Any

from jsonld_ex_spark.core import errors as err
from jsonld_ex_spark.core.compaction import compact_expanded
from jsonld_ex_spark.core.context import Options
from jsonld_ex_spark.core.errors import JsonLdError
from jsonld_ex_spark.core.flattening import BlankNodeGenerator, node_map
from jsonld_ex_spark.core.utils import as_list, is_keyword, is_list_object


class _State:
    __slots__ = (
        "options", "graph_map", "graph", "graph_stack",
        "subject_stack", "link", "unique_embeds",
    )

    def __init__(self, options: Options, graph_map: dict, graph: str):
        self.options = options
        self.graph_map = graph_map
        self.graph = graph
        self.graph_stack: list[str] = []
        self.subject_stack: list[tuple[str, str]] = []
        self.link: dict[str, dict] = {}           # graph → id → output (@link reuse)
        self.unique_embeds: dict[str, dict] = {}  # graph → {id: True} (@once)


def _flag(frame: dict, name: str, default: Any) -> Any:
    """Framing flag from the expanded frame (value objects unwrapped)."""
    if name not in frame:
        return default
    v = frame[name]
    if isinstance(v, list):
        v = v[0] if v else default
    if isinstance(v, dict) and "@value" in v:
        v = v["@value"]
    return v


def _embed_value(v: Any) -> str:
    if v is True:
        return "@once"
    if v is False:
        return "@never"
    if v in ("@once", "@always", "@never", "@link", "@first", "@last"):
        # @first/@last are the 1.0 aliases of @once/@always
        return {"@first": "@once", "@last": "@always"}.get(v, v)
    raise JsonLdError(err.INVALID_EMBED_VALUE, repr(v))


def _is_node_ref(o: Any) -> bool:
    return isinstance(o, dict) and set(o.keys()) == {"@id"} and isinstance(o["@id"], str)


def _is_value_pattern(f: dict) -> bool:
    return "@value" in f


def _value_match(pattern: dict, value: dict) -> bool:
    """Value Pattern Matching (framing spec §2.2): each of
    @value/@type/@language matches when the pattern entry is absent, a
    {} wildcard, or contains the value's entry; [] requires absence."""
    v1, t1, l1 = pattern.get("@value"), pattern.get("@type"), pattern.get("@language")
    if v1 is None and t1 is None and l1 is None:
        return True
    v2, t2, l2 = value.get("@value"), value.get("@type"), value.get("@language")
    if isinstance(l2, str):
        l2 = l2.lower()

    def m(p: Any, actual: Any, lower: bool = False) -> bool:
        if p is None:
            return True
        plist = p if isinstance(p, list) else [p]
        if lower:
            plist = [x.lower() if isinstance(x, str) else x for x in plist]
        if plist == []:
            return actual is None
        if any(x == {} for x in plist):
            return actual is not None
        return actual in plist

    return m(v1, v2) and m(t1, t2) and m(l1, l2, lower=True)


def _filter_subject(state: _State, subject: dict, frame: dict, require_all: bool) -> bool:
    """Frame Matching (framing spec §4.1.2.2): @id / @type / duck-typed
    property constraints, wildcard when the frame constrains nothing."""
    wildcard = True
    matches_some = False
    for key in sorted(frame.keys()):
        v = frame[key]
        if is_keyword(key):
            if key == "@id":
                wildcard = False
                ids = v if isinstance(v, list) else [v]
                if any(x == {} for x in ids) or subject.get("@id") in ids:
                    matches_some = True
                    continue
                return False
            if key == "@type":
                wildcard = False
                types = as_list(v)
                node_types = as_list(subject.get("@type", []))
                if types == []:
                    if node_types:
                        return False
                    matches_some = True
                elif types == [{}]:
                    if not node_types:
                        return False
                    matches_some = True
                elif any(isinstance(t, dict) and "@default" in t for t in types):
                    matches_some = True  # default object: always match
                else:
                    if not any(t in types for t in node_types):
                        return False
                    matches_some = True
            continue  # other keywords don't constrain matching
        wildcard = False
        this_frame = v[0] if isinstance(v, list) and v and isinstance(v[0], dict) else None
        has_default = this_frame is not None and "@default" in this_frame
        node_values = as_list(subject.get(key, []))
        if isinstance(v, list) and v == [] and node_values:
            return False  # match-none pattern violated
        if not node_values and has_default:
            continue  # defaults satisfy the constraint
        if node_values:
            if this_frame is not None and _is_value_pattern(this_frame):
                matched = any(
                    isinstance(nv, dict) and "@value" in nv and _value_match(this_frame, nv)
                    for nv in node_values
                )
            else:
                matched = True  # property present (duck typing)
            if not matched and require_all:
                return False
            matches_some = matches_some or matched
        elif require_all:
            return False
    return wildcard or matches_some


def _add_output(parent: Any, prop: str | None, value: Any) -> None:
    if isinstance(parent, list):
        parent.append(value)
    else:
        parent.setdefault(prop, []).append(value)


def _frame(state: _State, subjects: list, frame: dict, parent: Any, active_property: str | None) -> None:
    opts = state.options
    embed = _embed_value(_flag(frame, "@embed", opts.embed))
    explicit = bool(_flag(frame, "@explicit", opts.explicit))
    require_all = bool(_flag(frame, "@requireAll", opts.require_all))

    graph_nodes = state.graph_map.get(state.graph, {})
    matches = {
        sid: graph_nodes[sid]
        for sid in subjects
        if sid in graph_nodes and _filter_subject(state, graph_nodes[sid], frame, require_all)
    }

    for sid in sorted(matches.keys()):
        subject = matches[sid]
        if active_property is None:
            # fresh @once-embed tracking per top-level match
            state.unique_embeds = {state.graph: {}}
        link = state.link.setdefault(state.graph, {})
        if embed == "@link" and sid in link:
            _add_output(parent, active_property, link[sid])
            continue
        output: dict[str, Any] = {"@id": sid}
        link[sid] = output

        on_stack = any(s == sid and g == state.graph for s, g in state.subject_stack)
        if embed == "@never" or on_stack:
            _add_output(parent, active_property, {"@id": sid})
            continue
        if embed == "@once":
            ue = state.unique_embeds.setdefault(state.graph, {})
            if sid in ue:
                _add_output(parent, active_property, {"@id": sid})
                continue
            ue[sid] = True

        state.subject_stack.append((sid, state.graph))

        # named-graph recursion: a subject that names a graph, framed by
        # a frame with @graph, recurses into that graph's subjects
        if sid in state.graph_map and "@graph" in frame:
            gf = frame["@graph"]
            subframe = gf[0] if isinstance(gf, list) and gf and isinstance(gf[0], dict) else {}
            state.graph_stack.append(state.graph)
            state.graph = sid
            _frame(state, sorted(state.graph_map[sid].keys()), subframe, output, "@graph")
            state.graph = state.graph_stack.pop()

        for prop in sorted(subject.keys()):
            values = subject[prop]
            if is_keyword(prop):
                if prop == "@id":
                    continue
                output[prop] = _copy.deepcopy(values)
                continue
            if explicit and prop not in frame:
                continue
            fv = frame.get(prop)
            subframe = (
                fv[0] if isinstance(fv, list) and fv and isinstance(fv[0], dict) else None
            )
            for o in as_list(values):
                if is_list_object(o):
                    list_frame = None
                    if subframe is not None and isinstance(subframe.get("@list"), list):
                        lf = subframe["@list"]
                        if lf and isinstance(lf[0], dict):
                            list_frame = lf[0]
                    if list_frame is None:
                        list_frame = {
                            "@embed": [embed], "@explicit": [explicit],
                            "@requireAll": [require_all],
                        }
                    lst: dict[str, Any] = {"@list": []}
                    for item in o["@list"]:
                        if _is_node_ref(item):
                            _frame(state, [item["@id"]], list_frame, lst["@list"], None)
                        else:
                            lst["@list"].append(_copy.deepcopy(item))
                    _add_output(output, prop, lst)
                elif _is_node_ref(o):
                    sf = subframe if subframe is not None else {
                        "@embed": [embed], "@explicit": [explicit],
                        "@requireAll": [require_all],
                    }
                    _frame(state, [o["@id"]], sf, output, prop)
                else:
                    # value object: only copy values matching the pattern
                    if subframe is not None and _is_value_pattern(subframe):
                        if _value_match(subframe, o):
                            _add_output(output, prop, _copy.deepcopy(o))
                    else:
                        _add_output(output, prop, _copy.deepcopy(o))

        # defaults for frame properties absent from the node
        for prop in sorted(frame.keys()):
            if prop == "@type":
                tf = frame[prop]
                if (
                    isinstance(tf, list) and tf and isinstance(tf[0], dict)
                    and set(tf[0].keys()) == {"@default"} and "@type" not in output
                ):
                    output["@type"] = [{"@preserve": as_list(_copy.deepcopy(tf[0]["@default"]))}]
                continue
            if is_keyword(prop) or prop in output:
                continue
            pf = frame[prop]
            property_frame = (
                pf[0] if isinstance(pf, list) and pf and isinstance(pf[0], dict) else {}
            )
            if not bool(_flag(property_frame, "@omitDefault", opts.omit_default)):
                default = _copy.deepcopy(property_frame.get("@default", "@null"))
                output[prop] = [{"@preserve": as_list(default)}]

        # @reverse framing: pull in nodes that point AT this subject
        rev = frame.get("@reverse")
        if isinstance(rev, dict):
            for rprop in sorted(rev.keys()):
                rf = rev[rprop]
                subframe = rf[0] if isinstance(rf, list) and rf and isinstance(rf[0], dict) else {}
                for other_id in sorted(graph_nodes.keys()):
                    refs = as_list(graph_nodes[other_id].get(rprop, []))
                    if any(_is_node_ref(r) and r["@id"] == sid for r in refs):
                        rout = output.setdefault("@reverse", {})
                        rout.setdefault(rprop, [])
                        _frame(state, [other_id], subframe, rout[rprop], None)

        state.subject_stack.pop()
        _add_output(parent, active_property, output)


def _merge_graphs(graph_map: dict) -> dict:
    """@merged node map: node properties unioned across all graphs.
    Single-graph documents (the overwhelmingly common pipeline case)
    alias the @default graph directly — framing never mutates graph-map
    nodes (outputs are deepcopied), so the O(doc) merge copy is skipped."""
    if set(graph_map.keys()) == {"@default"}:
        return graph_map["@default"]
    merged: dict[str, dict] = {}
    for graph in sorted(graph_map.keys()):
        for sid in sorted(graph_map[graph].keys()):
            node = graph_map[graph][sid]
            target = merged.setdefault(sid, {"@id": sid})
            for prop in sorted(node.keys()):
                if prop == "@id":
                    continue
                if is_keyword(prop):
                    target.setdefault(prop, _copy.deepcopy(node[prop]))
                    continue
                vals = target.setdefault(prop, [])
                for v in as_list(node[prop]):
                    if v not in vals:
                        vals.append(_copy.deepcopy(v))
    return merged


def _cleanup_preserve(e: Any) -> Any:
    """Replace {"@preserve": [...]} wrappers by their contents; the
    "@null" placeholder becomes a string value object so it survives
    compaction (substituted with JSON null afterwards — same strategy
    as the public JS/Python processors)."""
    if isinstance(e, list):
        out = []
        for item in e:
            if isinstance(item, dict) and set(item.keys()) == {"@preserve"}:
                for v in as_list(item["@preserve"]):
                    out.append({"@value": "@null"} if v == "@null" else _cleanup_preserve(v))
            else:
                out.append(_cleanup_preserve(item))
        return out
    if isinstance(e, dict):
        return {k: _cleanup_preserve(v) for k, v in e.items()}
    return e


def _replace_null(e: Any) -> Any:
    if isinstance(e, list):
        return [_replace_null(v) for v in e if v != "@null"]
    if isinstance(e, dict):
        return {k: (None if v == "@null" else _replace_null(v)) for k, v in e.items()}
    return e


def _count_bnode_ids(e: Any, counts: dict) -> None:
    if isinstance(e, list):
        for v in e:
            _count_bnode_ids(v, counts)
    elif isinstance(e, dict):
        i = e.get("@id")
        if isinstance(i, str) and i.startswith("_:"):
            counts[i] = counts.get(i, 0) + 1
        for k, v in e.items():
            if k != "@id":
                _count_bnode_ids(v, counts)


def _prune_bnode_ids(e: Any, prune: set) -> None:
    if isinstance(e, list):
        for v in e:
            _prune_bnode_ids(v, prune)
    elif isinstance(e, dict):
        i = e.get("@id")
        if isinstance(i, str) and i in prune and len(e) > 1:
            del e["@id"]
        for k, v in list(e.items()):
            if k != "@id":
                _prune_bnode_ids(v, prune)


def frame(input_doc: Any, frame_doc: Any, options: Options | None = None) -> Any:
    """JsonLdProcessor.frame (framing spec §4.1): returns the framed,
    compacted document (frame's @context applied; @omitGraph unwrapping
    and blank-node pruning per json-ld-1.1 defaults)."""
    options = options or Options()
    from jsonld_ex_spark.core.api import expand as _expand

    expanded = _expand(input_doc, _replace(options, ordered=False, frame_expansion=False))
    ctx = frame_doc.get("@context") if isinstance(frame_doc, dict) else None
    expanded_frame = _expand(frame_doc, _replace(options, frame_expansion=True, ordered=False))
    return frame_expanded(expanded, expanded_frame, ctx, options)


def frame_expanded(
    expanded: Any,
    expanded_frame: list,
    ctx: Any,
    options: Options | None = None,
    compact_active: Any = None,
) -> Any:
    """Framing over ALREADY-expanded input + frame — the distributed hot
    path: a Spark task expands the shared frame ONCE and processes the
    compaction context ONCE (pass it as ``compact_active``), then frames
    millions of documents without re-processing either per document
    (same per-executor-cache pattern as operators/kg_pipeline.py).

    ``expanded`` is CONSUMED — node-map generation mutates it; deepcopy
    first if you need the expanded form afterwards."""
    options = options or Options()
    frame0 = expanded_frame[0] if expanded_frame else {}
    if len(expanded_frame) > 1:
        raise JsonLdError(err.INVALID_FRAME, "frame must expand to a single node object")

    nm = node_map(expanded, BlankNodeGenerator())
    nm.setdefault("@default", {})
    graph = "@default" if options.frame_default else "@merged"
    if graph == "@merged":
        nm["@merged"] = _merge_graphs(nm)

    state = _State(options, nm, graph)
    results: list = []
    _frame(state, sorted(nm[graph].keys()), frame0, results, None)

    prune = options.prune_blank_node_identifiers
    if prune is None:
        prune = not options.is_1_0
    if prune:
        counts: dict[str, int] = {}
        _count_bnode_ids(results, counts)
        once = {k for k, v in counts.items() if v == 1}
        if once:
            _prune_bnode_ids(results, once)

    cleaned = _cleanup_preserve(results)
    compacted = compact_expanded(cleaned, ctx, options, force_graph=True, active=compact_active)

    omit_graph = options.omit_graph
    if omit_graph is None:
        omit_graph = not options.is_1_0
    if omit_graph and isinstance(compacted, dict):
        gkey = next((k for k in compacted.keys() if k != "@context"), None)
        gvals = compacted.get(gkey) if gkey is not None else None
        if isinstance(gvals, list):
            if len(gvals) == 1 and isinstance(gvals[0], dict):
                node = gvals[0]
                compacted = (
                    {"@context": compacted["@context"], **node}
                    if "@context" in compacted
                    else node
                )
            elif len(gvals) == 0:
                compacted = (
                    {"@context": compacted["@context"]} if "@context" in compacted else {}
                )
    return _replace_null(compacted)
