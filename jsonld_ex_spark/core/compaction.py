"""Compaction Algorithm + IRI/Value Compaction + Inverse Context.

W3C JSON-LD 1.1 API §4.3 (Inverse Context Creation), §6 (Compaction),
IRI Compaction, Value Compaction, Term Selection.

Reference parity: lib/json/ld/compaction.ex:12-1365 and
lib/json/ld/context.ex:450-566 in /root/reference (behavior matched via
the W3C compact test suite).

Spark usage: the inverse context is built once on the driver per target
context and shipped in the UDF closure (it is pure data).
"""

from __future__ import annotations

from typing import Any

from jsonld_ex_spark.core import errors as err
from jsonld_ex_spark.core.context import (
    UNSET,
    Context,
    Options,
    expand_iri,
    process_context,
)
from jsonld_ex_spark.core.errors import JsonLdError
from jsonld_ex_spark.core.iri import remove_base
from jsonld_ex_spark.core.utils import (
    as_list,
    has_keyword_form,
    is_graph_object,
    is_keyword,
    is_list_object,
    is_value_object,
)


def inverse_context(active: Context) -> dict:
    """Inverse Context Creation (spec §4.3.2)."""
    if active._inverse is not None:
        return active._inverse
    result: dict = {}
    default_language = (active.default_language or "@none").lower()
    for term in sorted(active.term_defs.keys(), key=lambda t: (len(t), t)):
        td = active.term_defs[term]
        if td is None or td.iri_mapping is None:
            continue
        container = "".join(sorted(td.container_mapping)) or "@none"
        container_map = result.setdefault(td.iri_mapping, {})
        type_language_map = container_map.setdefault(
            container, {"@language": {}, "@type": {}, "@any": {}}
        )
        type_language_map["@any"].setdefault("@none", term)
        if td.reverse_property:
            type_language_map["@type"].setdefault("@reverse", term)
        elif td.type_mapping == "@none":
            type_language_map["@language"].setdefault("@any", term)
            type_language_map["@type"].setdefault("@any", term)
        elif td.type_mapping is not None:
            type_language_map["@type"].setdefault(td.type_mapping, term)
        elif td.language_mapping is not UNSET and td.direction_mapping is not UNSET:
            lang = td.language_mapping
            direction = td.direction_mapping
            if lang is not None and direction is not None:
                lang_dir = f"{lang}_{direction}".lower()
            elif lang is not None:
                lang_dir = lang.lower()
            elif direction is not None:
                lang_dir = f"_{direction}"
            else:
                lang_dir = "@null"
            type_language_map["@language"].setdefault(lang_dir, term)
        elif td.language_mapping is not UNSET:
            lang = (td.language_mapping or "@null")
            type_language_map["@language"].setdefault(lang.lower() if lang != "@null" else lang, term)
        elif td.direction_mapping is not UNSET:
            direction = td.direction_mapping
            key = f"_{direction}" if direction is not None else "@none"
            type_language_map["@language"].setdefault(key, term)
        elif active.base_direction is not None:
            lang_dir = f"{active.default_language or ''}_{active.base_direction}".lower()
            type_language_map["@language"].setdefault(lang_dir, term)
            type_language_map["@language"].setdefault("@none", term)
            type_language_map["@type"].setdefault("@none", term)
        else:
            type_language_map["@language"].setdefault(default_language, term)
            type_language_map["@language"].setdefault("@none", term)
            type_language_map["@type"].setdefault("@none", term)
    active._inverse = result
    return result


def select_term(
    active: Context,
    var: str,
    containers: list[str],
    type_language: str,
    preferred_values: list[str],
) -> str | None:
    """Term Selection (spec §6.2)."""
    inv = inverse_context(active)
    container_map = inv.get(var)
    if container_map is None:
        return None
    for container in containers:
        entry = container_map.get(container)
        if entry is None:
            continue
        type_language_map = entry[type_language]
        for item in preferred_values:
            if item in type_language_map:
                return type_language_map[item]
    return None


def _lang_dir_key(item: dict) -> str:
    lang = item.get("@language")
    direction = item.get("@direction")
    if lang is not None and direction is not None:
        return f"{lang}_{direction}".lower()
    if lang is not None:
        return lang.lower()
    if direction is not None:
        return f"_{direction}"
    return "@null"


def compact_iri(
    active: Context,
    var: str | None,
    options: Options,
    value: Any = None,
    vocab: bool = False,
    reverse: bool = False,
) -> str | None:
    """IRI Compaction (spec §6.3... 'IRI Compaction algorithm')."""
    if var is None:
        return None

    inv = inverse_context(active)

    if vocab and var in inv:
        # 4.1: default lang-dir
        if active.base_direction is not None:
            default_language = f"{active.default_language or ''}_{active.base_direction}".lower()
        else:
            default_language = (active.default_language or "@none").lower()

        if isinstance(value, dict) and "@preserve" in value:
            value = as_list(value["@preserve"])[0]

        containers: list[str] = []
        type_language = "@language"
        type_language_value = "@null"

        if isinstance(value, dict) and "@index" in value and not is_graph_object(value):
            containers.extend(["@index", "@index@set"])

        if reverse:
            type_language = "@type"
            type_language_value = "@reverse"
            containers.append("@set")
        elif is_list_object(value):
            if "@index" not in value:
                containers.append("@list")
            lst = value["@list"]
            common_type = None
            common_language = default_language if not lst else None
            for item in lst:
                item_language = "@none"
                item_type = "@none"
                if is_value_object(item):
                    if "@direction" in item or "@language" in item:
                        item_language = _lang_dir_key(item)
                    elif "@type" in item:
                        item_type = item["@type"]
                    else:
                        item_language = "@null"
                else:
                    item_type = "@id"
                if common_language is None:
                    common_language = item_language
                elif common_language != item_language and is_value_object(item):
                    common_language = "@none"
                if common_type is None:
                    common_type = item_type
                elif common_type != item_type:
                    common_type = "@none"
                if common_language == "@none" and common_type == "@none":
                    break
            common_language = common_language or "@none"
            common_type = common_type or "@none"
            if common_type != "@none":
                type_language = "@type"
                type_language_value = common_type
            else:
                type_language_value = common_language
        elif is_graph_object(value):
            if "@index" in value:
                containers.extend(["@graph@index", "@graph@index@set"])
            if "@id" in value:
                containers.extend(["@graph@id", "@graph@id@set"])
            containers.extend(["@graph", "@graph@set", "@set"])
            if "@index" not in value:
                containers.extend(["@graph@index", "@graph@index@set"])
            if "@id" not in value:
                containers.extend(["@graph@id", "@graph@id@set"])
            containers.extend(["@index", "@index@set"])
            type_language = "@type"
            type_language_value = "@id"
        else:
            if is_value_object(value):
                if "@direction" in value and "@index" not in value:
                    type_language_value = _lang_dir_key(value)
                    containers.extend(["@language", "@language@set"])
                elif "@language" in value and "@index" not in value:
                    type_language_value = _lang_dir_key(value)
                    containers.extend(["@language", "@language@set"])
                elif "@type" in value:
                    type_language_value = value["@type"]
                    type_language = "@type"
            else:
                type_language = "@type"
                type_language_value = "@id"
                containers.extend(["@id", "@id@set", "@type", "@set@type"])
            containers.append("@set")

        containers.append("@none")
        if not options.is_1_0 and (not isinstance(value, dict) or "@index" not in value):
            containers.extend(["@index", "@index@set"])
        if not options.is_1_0 and is_value_object(value) and set(value.keys()) == {"@value"}:
            containers.extend(["@language", "@language@set"])

        preferred_values: list[str] = []
        if type_language_value == "@reverse":
            preferred_values.append("@reverse")
        if type_language_value in ("@id", "@reverse") and isinstance(value, dict) and "@id" in value:
            candidate = compact_iri(active, value["@id"], options, vocab=True)
            ctd = active.term_defs.get(candidate)
            if ctd is not None and ctd.iri_mapping == value["@id"]:
                preferred_values.extend(["@vocab", "@id", "@none"])
            else:
                preferred_values.extend(["@id", "@vocab", "@none"])
        else:
            preferred_values.extend([type_language_value, "@none"])
            if is_list_object(value) and not value["@list"]:
                type_language = "@any"
        preferred_values.append("@any")
        # lang-dir fallback: "en_ltr" also tries "_ltr"
        for pv in list(preferred_values):
            if isinstance(pv, str) and "_" in pv and not pv.startswith("_"):
                preferred_values.append("_" + pv.split("_", 1)[1])

        term = select_term(active, var, containers, type_language, preferred_values)
        if term is not None:
            return term

    if vocab and active.vocabulary_mapping is not None:
        vm = active.vocabulary_mapping
        if var.startswith(vm) and len(var) > len(vm):
            suffix = var[len(vm):]
            if suffix not in active.term_defs:
                return suffix

    # compact IRI via prefix candidates
    candidate = None
    for term, td in active.term_defs.items():
        if td.iri_mapping is None or not td.prefix_flag:
            continue
        im = td.iri_mapping
        if var.startswith(im) and var != im:
            cand = term + ":" + var[len(im):]
            existing = active.term_defs.get(cand)
            if existing is None or (existing.iri_mapping == var and value is None):
                if candidate is None or (len(cand), cand) < (len(candidate), candidate):
                    candidate = cand
    if candidate is not None:
        return candidate

    # IRI-confused-with-prefix check: scheme part matches a simple-term
    # prefix whose IRI mapping is not a prefix of var
    if ":" in var:
        scheme, _, rest = var.partition(":")
        std = active.term_defs.get(scheme)
        if std is not None and std.prefix_flag and std.iri_mapping is not None and not rest.startswith("//"):
            if not var.startswith(std.iri_mapping):
                raise JsonLdError(err.IRI_CONFUSED_WITH_PREFIX, var)

    if not vocab:
        if options.compact_to_relative and active.base_iri is not None:
            rel = remove_base(active.base_iri, var)
            # a relative IRI must not have the form of a keyword
            if has_keyword_form(rel):
                rel = "./" + rel
            return rel
        return var
    return var


def compact_value(active: Context, active_property: str | None, value: dict, options: Options) -> Any:
    """Value Compaction (spec 'Value Compaction algorithm')."""
    td = active.term_defs.get(active_property) if active_property else None
    language = active.default_language
    direction = active.base_direction
    if td is not None and td.language_mapping is not UNSET:
        language = td.language_mapping
    if td is not None and td.direction_mapping is not UNSET:
        direction = td.direction_mapping

    keys = set(value.keys())
    container = td.container_mapping if td is not None else frozenset()
    if "@index" in keys and "@index" in container:
        value = {k: v for k, v in value.items() if k != "@index"}
        keys = set(value.keys())

    type_mapping = td.type_mapping if td is not None else None

    if keys == {"@id"}:
        if type_mapping == "@id":
            return compact_iri(active, value["@id"], options, vocab=False)
        if type_mapping == "@vocab":
            return compact_iri(active, value["@id"], options, vocab=True)
        return {compact_iri(active, "@id", options, vocab=True): compact_iri(active, value["@id"], options, vocab=False)}
    if "@id" in keys:
        # node reference with extra entries (e.g. @index kept): not scalar
        result = {}
        for k, v in value.items():
            if k == "@id":
                result[compact_iri(active, "@id", options, vocab=True)] = compact_iri(active, v, options, vocab=False)
            else:
                result[compact_iri(active, k, options, vocab=True)] = v
        return result

    v = value.get("@value")
    if value.get("@type") is not None and value.get("@type") == type_mapping:
        return v
    if type_mapping == "@none" or "@type" in keys and value["@type"] != type_mapping:
        result = {}
        for k, val in value.items():
            if k == "@type":
                result[compact_iri(active, "@type", options, vocab=True)] = compact_iri(active, val, options, vocab=True)
            else:
                result[compact_iri(active, k, options, vocab=True)] = val
        return result
    if "@type" not in keys:
        if not isinstance(v, str):
            if "@index" not in keys or "@index" in container:
                return v
        else:
            value_lang = value.get("@language")
            value_dir = value.get("@direction")
            lang_matches = (value_lang or "").lower() == (language or "").lower() if (value_lang or language) else True
            if value_lang is None and language is not None and (td is None or td.language_mapping is UNSET or td.language_mapping is not None):
                lang_matches = False
            dir_matches = value_dir == direction
            if lang_matches and dir_matches and ("@index" not in keys or "@index" in container):
                return v

    result = {}
    for k, val in value.items():
        if k in ("@language", "@direction", "@index", "@value"):
            result[compact_iri(active, k, options, vocab=True)] = val
        else:
            result[compact_iri(active, k, options, vocab=True)] = val
    return result


def compact(
    active: Context,
    active_property: str | None,
    element: Any,
    options: Options,
    compact_arrays: bool = True,
    ordered: bool = False,
) -> Any:
    """Compaction Algorithm (spec §8... 'Compaction algorithm')."""
    td = active.term_defs.get(active_property) if active_property else None

    if not isinstance(element, (dict, list)):
        return element

    if isinstance(element, list):
        result = []
        for item in element:
            compacted = compact(active, active_property, item, options, compact_arrays, ordered)
            if compacted is not None:
                result.append(compacted)
        container = td.container_mapping if td is not None else frozenset()
        if (
            len(result) == 1
            and compact_arrays
            and active_property not in ("@graph", "@set")
            and not ({"@list", "@set"} & container)
        ):
            return result[0]
        return result

    # element is a map.  NB: the property-scoped context comes from the
    # term definition in the context the PARENT passed (pre-revert) —
    # same pattern as expansion.
    td_pre = active.term_defs.get(active_property) if active_property else None

    if active.previous_context is not None:
        if "@value" not in element and set(element.keys()) != {"@id"}:
            active = active.previous_context

    if td_pre is not None and td_pre.local_context is not UNSET:
        active = process_context(active, td_pre.local_context, options, base_url=td_pre.base_url, override_protected=True)
    td = active.term_defs.get(active_property) if active_property else None

    if "@value" in element or "@id" in element and "@list" not in element and "@graph" not in element and not any(
        k for k in element if k not in ("@value", "@id", "@type", "@language", "@direction", "@index")
    ):
        if "@value" in element or set(element.keys()) <= {"@id", "@index"} and "@id" in element:
            result = compact_value(active, active_property, element, options)
            if not isinstance(result, (dict, list)) or (td is not None and td.type_mapping == "@json"):
                return result

    if is_list_object(element) and td is not None and "@list" in td.container_mapping:
        return compact(active, active_property, element["@list"], options, compact_arrays, ordered)

    inside_reverse = active_property == "@reverse"
    result: dict = {}

    type_scoped_active = active
    if "@type" in element:
        compacted_types = sorted(
            compact_iri(active, t, options, vocab=True) for t in as_list(element["@type"])
        )
        for cterm in compacted_types:
            ctd = type_scoped_active.term_defs.get(cterm)
            if ctd is not None and ctd.local_context is not UNSET:
                active = process_context(active, ctd.local_context, options, base_url=ctd.base_url, propagate=False)

    keys = sorted(element.keys()) if ordered else list(element.keys())
    for expanded_property in keys:
        expanded_value = element[expanded_property]

        if expanded_property == "@id":
            compacted_value = compact_iri(active, expanded_value, options, vocab=False)
            alias = compact_iri(active, "@id", options, vocab=True)
            result[alias] = compacted_value
            continue

        if expanded_property == "@type":
            if isinstance(expanded_value, str):
                compacted_value: Any = compact_iri(type_scoped_active, expanded_value, options, vocab=True)
            else:
                compacted_value = [
                    compact_iri(type_scoped_active, t, options, vocab=True) for t in expanded_value
                ]
                if len(compacted_value) == 1:
                    compacted_value = compacted_value[0]
            alias = compact_iri(active, "@type", options, vocab=True)
            alias_td = active.term_defs.get(alias)
            as_array = (
                not options.is_1_0
                and alias_td is not None
                and "@set" in alias_td.container_mapping
            ) or not compact_arrays
            if as_array and not isinstance(compacted_value, list):
                compacted_value = [compacted_value]
            result[alias] = compacted_value
            continue

        if expanded_property == "@reverse":
            compacted_value = compact(active, "@reverse", expanded_value, options, compact_arrays, ordered)
            if isinstance(compacted_value, dict):
                for prop in list(compacted_value.keys()):
                    ptd = active.term_defs.get(prop)
                    if ptd is not None and ptd.reverse_property:
                        value = compacted_value.pop(prop)
                        as_array = not compact_arrays or "@set" in ptd.container_mapping
                        _add_value(result, prop, value, as_array)
                if compacted_value:
                    alias = compact_iri(active, "@reverse", options, vocab=True)
                    result[alias] = compacted_value
            continue

        if expanded_property == "@preserve":
            compacted_value = compact(active, active_property, expanded_value, options, compact_arrays, ordered)
            if compacted_value != []:
                result["@preserve"] = compacted_value
            continue

        if expanded_property == "@index" and td is not None and "@index" in td.container_mapping:
            continue

        if expanded_property in ("@direction", "@index", "@language", "@value"):
            alias = compact_iri(active, expanded_property, options, vocab=True)
            result[alias] = expanded_value
            continue

        if expanded_value == []:
            item_active_property = compact_iri(
                active, expanded_property, options, value=expanded_value, vocab=True, reverse=inside_reverse
            )
            nest_result = result
            iap_td = active.term_defs.get(item_active_property)
            if iap_td is not None and iap_td.nest_value is not None:
                nest_result = _nest_target(active, result, iap_td.nest_value, options)
            existing = nest_result.get(item_active_property)
            if existing is None:
                nest_result[item_active_property] = []
            elif not isinstance(existing, list):
                nest_result[item_active_property] = [existing]

        for expanded_item in as_list(expanded_value) if isinstance(expanded_value, list) else []:
            item_active_property = compact_iri(
                active, expanded_property, options, value=expanded_item, vocab=True, reverse=inside_reverse
            )
            nest_result = result
            iap_td = active.term_defs.get(item_active_property)
            if iap_td is not None and iap_td.nest_value is not None:
                nest_result = _nest_target(active, result, iap_td.nest_value, options)
            container = iap_td.container_mapping if iap_td is not None else frozenset()
            as_array = (
                not compact_arrays
                or "@set" in container
                or "@list" in container
                or item_active_property in ("@graph", "@list")
            )

            if is_list_object(expanded_item):
                inner = expanded_item["@list"]
            elif is_graph_object(expanded_item):
                inner = expanded_item["@graph"]
            else:
                inner = expanded_item
            compacted_item = compact(active, item_active_property, inner, options, compact_arrays, ordered)

            if is_list_object(expanded_item):
                if not isinstance(compacted_item, list):
                    compacted_item = [compacted_item]
                if "@list" not in container:
                    list_alias = compact_iri(active, "@list", options, vocab=True)
                    compacted_item = {list_alias: compacted_item}
                    if "@index" in expanded_item:
                        index_alias = compact_iri(active, "@index", options, vocab=True)
                        compacted_item[index_alias] = expanded_item["@index"]
                    _add_value(nest_result, item_active_property, compacted_item, as_array)
                else:
                    nest_result[item_active_property] = compacted_item
                continue

            if is_graph_object(expanded_item):
                if "@graph" in container and "@id" in container:
                    map_object = nest_result.setdefault(item_active_property, {})
                    map_key = compact_iri(active, expanded_item.get("@id", "@none"), options,
                                          vocab="@id" not in expanded_item)
                    _add_value(map_object, map_key, compacted_item, "@set" in container)
                elif "@graph" in container and "@index" in container and _is_simple_graph(expanded_item):
                    map_object = nest_result.setdefault(item_active_property, {})
                    map_key = expanded_item.get("@index", "@none")
                    _add_value(map_object, map_key, compacted_item, "@set" in container)
                elif "@graph" in container and _is_simple_graph(expanded_item):
                    if isinstance(compacted_item, list) and len(compacted_item) > 1:
                        included_alias = compact_iri(active, "@included", options, vocab=True)
                        compacted_item = {included_alias: compacted_item}
                    _add_value(nest_result, item_active_property, compacted_item, as_array)
                else:
                    graph_alias = compact_iri(active, "@graph", options, vocab=True)
                    wrapped = {graph_alias: compacted_item if isinstance(compacted_item, list) else ([compacted_item] if not compact_arrays else compacted_item)}
                    if "@id" in expanded_item:
                        id_alias = compact_iri(active, "@id", options, vocab=True)
                        wrapped[id_alias] = compact_iri(active, expanded_item["@id"], options, vocab=False)
                    if "@index" in expanded_item:
                        index_alias = compact_iri(active, "@index", options, vocab=True)
                        wrapped[index_alias] = expanded_item["@index"]
                    _add_value(nest_result, item_active_property, wrapped, as_array)
                continue

            map_containers = {"@language", "@index", "@id", "@type"} & set(container)
            if map_containers and "@graph" not in container:
                map_object = nest_result.setdefault(item_active_property, {})
                ckey = next(iter(sorted(map_containers - {"@set"})))
                if "@language" in container:
                    if is_value_object(expanded_item):
                        compacted_item = compact_value(active, item_active_property, expanded_item, options)
                        if isinstance(compacted_item, dict) and "@value" in expanded_item:
                            compacted_item = expanded_item["@value"]
                    map_key = expanded_item.get("@language")
                elif "@index" in container:
                    index_key = iap_td.index_mapping if iap_td is not None and iap_td.index_mapping else "@index"
                    if index_key == "@index":
                        map_key = expanded_item.get("@index")
                    else:
                        # property-based index (errata "No roundtrip with
                        # property-based data indexing"): container key is the
                        # compacted key the index property got in the item —
                        # recompute it with the same (value-directed) IRI
                        # compaction the item's property loop used.
                        expanded_index_key = expand_iri(active, index_key, options, vocab=True)
                        index_vals = as_list(expanded_item.get(expanded_index_key, []))
                        container_key = compact_iri(
                            active, expanded_index_key, options,
                            value=index_vals[0] if index_vals else None, vocab=True,
                        )
                        map_key = None
                        if isinstance(compacted_item, dict) and container_key in compacted_item:
                            values = as_list(compacted_item[container_key])
                            if values and isinstance(values[0], str):
                                map_key = values[0]
                                rest = values[1:]
                                if rest:
                                    compacted_item[container_key] = rest[0] if len(rest) == 1 and compact_arrays else rest
                                else:
                                    compacted_item.pop(container_key, None)
                elif "@id" in container:
                    id_alias = compact_iri(active, "@id", options, vocab=True)
                    if isinstance(compacted_item, dict):
                        map_key = compacted_item.pop(id_alias, None)
                    else:
                        map_key = None
                else:  # @type
                    type_alias = compact_iri(active, "@type", options, vocab=True)
                    map_key = None
                    if isinstance(compacted_item, dict) and type_alias in compacted_item:
                        types = as_list(compacted_item[type_alias])
                        map_key = types[0] if types else None
                        remaining = types[1:]
                        if remaining:
                            compacted_item[type_alias] = remaining[0] if len(remaining) == 1 and compact_arrays else remaining
                        else:
                            compacted_item.pop(type_alias, None)
                        if isinstance(compacted_item, dict) and set(compacted_item.keys()) == {compact_iri(active, "@id", options, vocab=True)}:
                            id_alias = compact_iri(active, "@id", options, vocab=True)
                            compacted_item = compact(active, item_active_property, {"@id": expanded_item["@id"]}, options, compact_arrays, ordered)
                if map_key is None:
                    map_key = compact_iri(active, "@none", options, vocab=True)
                _add_value(map_object, map_key, compacted_item, "@set" in container or not compact_arrays)
            else:
                _add_value(nest_result, item_active_property, compacted_item, as_array)

        if not isinstance(expanded_value, list):
            # expanded input is always arrays for properties; keywords handled above
            pass

    return result


def _is_simple_graph(value: dict) -> bool:
    return is_graph_object(value) and "@id" not in value


def _nest_target(active: Context, result: dict, nest_value: str, options: Options) -> dict:
    if expand_iri(active, nest_value, options, vocab=True) != "@nest":
        raise JsonLdError(err.INVALID_NEST_VALUE, nest_value)
    return result.setdefault(nest_value, {})


def _add_value(obj: dict, key: str, value: Any, as_array: bool) -> None:
    if as_array and key not in obj:
        obj[key] = []
    if key in obj:
        existing = obj[key]
        if not isinstance(existing, list):
            obj[key] = [existing]
        if isinstance(value, list):
            obj[key].extend(value)
        else:
            obj[key].append(value)
    else:
        obj[key] = value


def compact_document(input_doc: Any, ctx: Any, options: Options) -> Any:
    """JsonLdProcessor.compact entry (spec §6.1.2; reference json_ld.ex:188-246)."""
    import dataclasses

    from jsonld_ex_spark.core.api import expand as expand_api

    expand_opts = dataclasses.replace(options, ordered=False)
    expanded = expand_api(input_doc, expand_opts)
    return compact_expanded(expanded, ctx, options)


def compact_expanded(
    expanded: Any, ctx: Any, options: Options, force_graph: bool = False, active: Context | None = None
) -> Any:
    """Compact an already-expanded document against ctx.

    force_graph: flattened output always keeps its nodes under @graph
    (JSON.LD.flatten contract), even for a single node.
    active: pass a pre-processed Context to skip per-document context
    processing AND reuse its memoized inverse context — the shared-
    vocabulary corpus path (operators/jsonld_ops.py caches one per
    executor); the ctx argument is still used verbatim for the output
    ``@context`` entry."""
    context = ctx
    if isinstance(context, dict) and "@context" in context:
        context = context["@context"]
    if active is None:
        active = Context(base_iri=options.base, original_base_url=options.base)
        active = process_context(active, context, options, base_url=options.base)

    result = compact(active, None, expanded, options, options.compact_arrays, options.ordered)
    if result == []:
        result = {}
    elif isinstance(result, list):
        result = {compact_iri(active, "@graph", options, vocab=True): result}
    elif force_graph and result:
        graph_alias = compact_iri(active, "@graph", options, vocab=True)
        if set(result.keys()) != {graph_alias}:
            result = {graph_alias: [result]}
    if ctx is not None and context:
        if isinstance(ctx, dict) and "@context" in ctx:
            result = {"@context": ctx["@context"], **result}
        else:
            result = {"@context": ctx, **result}
    return result
