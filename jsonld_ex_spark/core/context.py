"""Context Processing, Create Term Definition, and IRI Expansion.

Implements W3C JSON-LD 1.1 API §4.1 (Context Processing Algorithm),
§4.2 (Create Term Definition) and §5.2 (IRI Expansion).

Reference parity targets: lib/json/ld/context.ex:78-296,
lib/json/ld/context/term_definition.ex:75-812,
lib/json/ld/iri_expansion.ex:18-153 in /root/reference (behavior matched
via the W3C test suite; implementation is from the public spec).

Spark usage: contexts are processed ONCE on the driver and the resulting
``Context`` (a plain picklable object) is shipped inside pandas-UDF
closures / broadcast variables — executors never re-run context
processing for the shared pipeline context (inline per-document contexts
are still handled in-UDF by these same functions).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, replace
from typing import Any, Callable, Optional

from jsonld_ex_spark.core import errors as err
from jsonld_ex_spark.core.errors import JsonLdError
from jsonld_ex_spark.core.iri import is_absolute_iri, resolve_iri
from jsonld_ex_spark.core.utils import (
    KEYWORDS,
    compact_iri_parts,
    has_keyword_form,
    is_blank_node_id,
    is_keyword,
    is_valid_language_tag,
)

MAX_CONTEXTS_LOADED = 50

_GEN_DELIMS = set(":/?#[]@")

_CONTEXT_KEYWORDS = {
    "@base", "@direction", "@import", "@language", "@propagate",
    "@protected", "@version", "@vocab",
}

_TERM_DEF_KEYS = {
    "@id", "@reverse", "@type", "@language", "@container", "@context",
    "@direction", "@index", "@nest", "@prefix", "@protected",
}


@dataclass
class RemoteDocument:
    document: Any
    document_url: str
    content_type: str = "application/ld+json"
    context_url: str | None = None
    profile: str | None = None
    base_iri: str | None = None  # e.g. from an HTML <base> element


# DocumentLoader: url -> RemoteDocument (raises JsonLdError on failure)
DocumentLoader = Callable[[str], RemoteDocument]


def no_loader(url: str) -> RemoteDocument:
    raise JsonLdError(err.LOADING_REMOTE_CONTEXT_FAILED, f"no document loader configured (url={url})")


@dataclass
class Options:
    """JsonLdOptions (spec §6.1; reference lib/json/ld/options.ex:79-122)."""

    base: str | None = None
    compact_arrays: bool = True
    compact_to_relative: bool = True
    document_loader: DocumentLoader = no_loader
    expand_context: Any = None
    frame_expansion: bool = False
    ordered: bool = False
    processing_mode: str = "json-ld-1.1"
    produce_generalized_rdf: bool = False
    rdf_direction: str | None = None
    use_native_types: bool = False
    use_rdf_type: bool = False
    lowercase_language: bool = True
    # HTML script extraction: None = operation default (expand/compact
    # extract the first script; flatten/toRdf extract all)
    extract_all_scripts: bool | None = None
    # Framing options (W3C json-ld11-framing §1.4 JsonLdOptions) — used
    # by core.framing; beyond the reference, which has no framing
    embed: str = "@once"
    explicit: bool = False
    require_all: bool = False
    omit_default: bool = False
    frame_default: bool = False  # frame the @default graph, not @merged
    # None = processing-mode default (true for json-ld-1.1)
    omit_graph: bool | None = None
    prune_blank_node_identifiers: bool | None = None

    @property
    def is_1_0(self) -> bool:
        return self.processing_mode == "json-ld-1.0"


# Marker distinguishing "mapping explicitly set to null" from "absent"
class _Unset:
    def __repr__(self) -> str:  # pragma: no cover
        return "UNSET"


UNSET: Any = _Unset()


@dataclass
class TermDefinition:
    iri_mapping: str | None = None
    prefix_flag: bool = False
    protected: bool = False
    reverse_property: bool = False
    base_url: str | None = None
    local_context: Any = UNSET
    container_mapping: frozenset = frozenset()
    index_mapping: str | None = None
    language_mapping: Any = UNSET  # UNSET | None | str
    direction_mapping: Any = UNSET  # UNSET | None | "ltr" | "rtl"
    nest_value: str | None = None
    type_mapping: str | None = None

    def same_except_protected(self, other: "TermDefinition") -> bool:
        return replace(self, protected=other.protected) == other


@dataclass
class Context:
    term_defs: dict[str, TermDefinition] = field(default_factory=dict)
    base_iri: str | None = None
    original_base_url: str | None = None
    vocabulary_mapping: str | None = None
    default_language: str | None = None
    base_direction: str | None = None
    previous_context: Optional["Context"] = None
    _inverse: Any = field(default=None, compare=False, repr=False)

    def copy(self) -> "Context":
        return Context(
            term_defs=dict(self.term_defs),
            base_iri=self.base_iri,
            original_base_url=self.original_base_url,
            vocabulary_mapping=self.vocabulary_mapping,
            default_language=self.default_language,
            base_direction=self.base_direction,
            previous_context=self.previous_context,
        )

    def has_protected_terms(self) -> bool:
        return any(td.protected for td in self.term_defs.values())


def new_context(options: Options, base_url: str | None = None) -> Context:
    base = base_url if base_url is not None else options.base
    return Context(base_iri=options.base or base_url, original_base_url=base_url or options.base)


def process_context(
    active: Context,
    local: Any,
    options: Options,
    base_url: str | None = None,
    remote_contexts: tuple[str, ...] = (),
    override_protected: bool = False,
    propagate: bool = True,
    validate_scoped: bool = True,
) -> Context:
    """Context Processing Algorithm (spec §4.1.2)."""
    result = active.copy()
    result._inverse = None

    if isinstance(local, dict) and "@propagate" in local:
        p = local["@propagate"]
        if not isinstance(p, bool):
            raise JsonLdError(err.INVALID_PROPAGATE_VALUE, repr(p))
        propagate = p

    if not propagate and result.previous_context is None:
        result.previous_context = active

    if not isinstance(local, list):
        local = [local]

    for ctx in local:
        # the context object mutates below — drop any memoized expansions
        result.__dict__.pop("_iri_cache", None)
        if ctx is None:
            if not override_protected and result.has_protected_terms():
                raise JsonLdError(err.INVALID_CONTEXT_NULLIFICATION)
            prev = result
            result = new_context(options, base_url=active.original_base_url)
            result.base_iri = active.original_base_url
            result.original_base_url = active.original_base_url
            if not propagate:
                result.previous_context = prev
            continue

        if isinstance(ctx, str):
            context_url = resolve_iri(base_url, ctx) if base_url else ctx
            if not is_absolute_iri(context_url):
                raise JsonLdError(
                    err.LOADING_REMOTE_CONTEXT_FAILED,
                    f"cannot resolve relative context URL {ctx!r} with no base",
                )
            if not validate_scoped and context_url in remote_contexts:
                continue
            if len(remote_contexts) > MAX_CONTEXTS_LOADED:
                raise JsonLdError(err.CONTEXT_OVERFLOW, context_url)
            if context_url in remote_contexts:
                raise JsonLdError(err.CONTEXT_OVERFLOW, f"circular context inclusion: {context_url}")
            try:
                remote = options.document_loader(context_url)
            except JsonLdError:
                raise
            except Exception as e:  # noqa: BLE001
                raise JsonLdError(err.LOADING_REMOTE_CONTEXT_FAILED, f"{context_url}: {e}") from e
            doc = remote.document
            if isinstance(doc, (str, bytes)):
                try:
                    doc = json.loads(doc)
                except Exception as e:  # noqa: BLE001
                    raise JsonLdError(err.LOADING_REMOTE_CONTEXT_FAILED, f"{context_url}: {e}") from e
            if not isinstance(doc, dict) or "@context" not in doc:
                raise JsonLdError(err.INVALID_REMOTE_CONTEXT, context_url)
            loaded = doc["@context"]
            result = process_context(
                result,
                loaded,
                options,
                base_url=remote.document_url,
                remote_contexts=remote_contexts + (context_url,),
                override_protected=override_protected,
                propagate=propagate,
                validate_scoped=validate_scoped,
            )
            continue

        if not isinstance(ctx, dict):
            raise JsonLdError(err.INVALID_LOCAL_CONTEXT, repr(ctx))

        # @version
        if "@version" in ctx:
            v = ctx["@version"]
            if v != 1.1:
                raise JsonLdError(err.INVALID_VERSION_VALUE, repr(v))
            if options.is_1_0:
                raise JsonLdError(err.PROCESSING_MODE_CONFLICT, "@version 1.1 in 1.0 mode")

        # @import
        if "@import" in ctx:
            if options.is_1_0:
                raise JsonLdError(err.INVALID_CONTEXT_ENTRY, "@import")
            imp = ctx["@import"]
            if not isinstance(imp, str):
                raise JsonLdError(err.INVALID_IMPORT_VALUE, repr(imp))
            import_url = resolve_iri(base_url, imp) if base_url else imp
            try:
                remote = options.document_loader(import_url)
            except JsonLdError:
                raise
            except Exception as e:  # noqa: BLE001
                raise JsonLdError(err.LOADING_REMOTE_CONTEXT_FAILED, f"{import_url}: {e}") from e
            doc = remote.document
            if isinstance(doc, (str, bytes)):
                try:
                    doc = json.loads(doc)
                except Exception as e:  # noqa: BLE001
                    raise JsonLdError(err.LOADING_REMOTE_CONTEXT_FAILED, f"{import_url}: {e}") from e
            if not isinstance(doc, dict) or "@context" not in doc:
                raise JsonLdError(err.INVALID_REMOTE_CONTEXT, import_url)
            import_ctx = doc["@context"]
            if not isinstance(import_ctx, dict):
                raise JsonLdError(err.INVALID_REMOTE_CONTEXT, import_url)
            if "@import" in import_ctx:
                raise JsonLdError(err.INVALID_CONTEXT_ENTRY, "@import in imported context")
            ctx = {**import_ctx, **ctx}

        # @base
        if "@base" in ctx and not remote_contexts:
            b = ctx["@base"]
            if b is None:
                result.base_iri = None
            elif isinstance(b, str) and is_absolute_iri(b):
                result.base_iri = b
            elif isinstance(b, str) and result.base_iri is not None:
                result.base_iri = resolve_iri(result.base_iri, b)
            else:
                raise JsonLdError(err.INVALID_BASE_IRI, repr(b))

        # @vocab
        if "@vocab" in ctx:
            v = ctx["@vocab"]
            if v is None:
                result.vocabulary_mapping = None
            elif isinstance(v, str):
                expanded = expand_iri(result, v, options, vocab=True, document_relative=True)
                if expanded is not None and (is_absolute_iri(expanded) or is_blank_node_id(expanded)):
                    result.vocabulary_mapping = expanded
                elif isinstance(expanded, str) and not options.is_1_0:
                    # 1.1 allows relative vocab (resolved against base)
                    result.vocabulary_mapping = expanded
                else:
                    raise JsonLdError(err.INVALID_VOCAB_MAPPING, repr(v))
            else:
                raise JsonLdError(err.INVALID_VOCAB_MAPPING, repr(v))

        # @language
        if "@language" in ctx:
            lang = ctx["@language"]
            if lang is None:
                result.default_language = None
            elif isinstance(lang, str):
                result.default_language = lang.lower() if options.lowercase_language else lang
            else:
                raise JsonLdError(err.INVALID_DEFAULT_LANGUAGE, repr(lang))

        # @direction
        if "@direction" in ctx:
            if options.is_1_0:
                raise JsonLdError(err.INVALID_CONTEXT_ENTRY, "@direction")
            d = ctx["@direction"]
            if d is None:
                result.base_direction = None
            elif d in ("ltr", "rtl"):
                result.base_direction = d
            else:
                raise JsonLdError(err.INVALID_BASE_DIRECTION, repr(d))

        # @propagate (validated; semantics applied above)
        if "@propagate" in ctx:
            if options.is_1_0:
                raise JsonLdError(err.INVALID_CONTEXT_ENTRY, "@propagate")
            if not isinstance(ctx["@propagate"], bool):
                raise JsonLdError(err.INVALID_PROPAGATE_VALUE, repr(ctx["@propagate"]))

        protected = ctx.get("@protected", False)
        if "@protected" in ctx:
            if options.is_1_0:
                raise JsonLdError(err.INVALID_CONTEXT_ENTRY, "@protected")
            if not isinstance(protected, bool):
                raise JsonLdError(err.INVALID_PROTECTED_VALUE, repr(protected))

        defined: dict[str, bool] = {}
        for term in ctx:
            if term in _CONTEXT_KEYWORDS:
                continue
            create_term_definition(
                result,
                ctx,
                term,
                defined,
                options,
                base_url=base_url,
                protected=protected,
                override_protected=override_protected,
                remote_contexts=remote_contexts,
            )

    return result


def create_term_definition(
    active: Context,
    local: dict,
    term: str,
    defined: dict[str, bool],
    options: Options,
    base_url: str | None = None,
    protected: bool = False,
    override_protected: bool = False,
    remote_contexts: tuple[str, ...] = (),
) -> None:
    """Create Term Definition (spec §4.2.2)."""
    state = defined.get(term)
    if state is True:
        return
    if state is False:
        raise JsonLdError(err.CYCLIC_IRI_MAPPING, term)
    if term == "":
        raise JsonLdError(err.INVALID_TERM_DEFINITION, "empty term")
    defined[term] = False
    value = local[term]

    if term == "@type" and not options.is_1_0:
        if not isinstance(value, dict) or not value:
            raise JsonLdError(err.KEYWORD_REDEFINITION, term)
        extra = set(value.keys()) - {"@container", "@protected"}
        if extra or value.get("@container", "@set") != "@set":
            raise JsonLdError(err.KEYWORD_REDEFINITION, term)
    elif is_keyword(term):
        raise JsonLdError(err.KEYWORD_REDEFINITION, term)
    elif has_keyword_form(term):
        # looks like a keyword: ignore with warning
        defined.pop(term, None)
        return

    previous = active.term_defs.pop(term, None)

    simple_term = False
    if value is None:
        value = {"@id": None}
    elif isinstance(value, str):
        value = {"@id": value}
        simple_term = True
    elif isinstance(value, dict):
        simple_term = False
    else:
        raise JsonLdError(err.INVALID_TERM_DEFINITION, repr(value))

    definition = TermDefinition(protected=protected)

    if "@protected" in value:
        if options.is_1_0:
            raise JsonLdError(err.INVALID_TERM_DEFINITION, "@protected in 1.0 mode")
        p = value["@protected"]
        if not isinstance(p, bool):
            raise JsonLdError(err.INVALID_PROTECTED_VALUE, repr(p))
        definition.protected = p

    if "@type" in value:
        t = value["@type"]
        if not isinstance(t, str):
            raise JsonLdError(err.INVALID_TYPE_MAPPING, repr(t))
        expanded_t = expand_iri(active, t, options, vocab=True, local_context=local, defined=defined)
        if expanded_t in ("@json", "@none"):
            if options.is_1_0:
                raise JsonLdError(err.INVALID_TYPE_MAPPING, repr(t))
        elif expanded_t not in ("@id", "@vocab") and not (
            isinstance(expanded_t, str) and is_absolute_iri(expanded_t)
        ):
            raise JsonLdError(err.INVALID_TYPE_MAPPING, repr(t))
        definition.type_mapping = expanded_t

    if "@reverse" in value:
        if "@id" in value or "@nest" in value:
            raise JsonLdError(err.INVALID_REVERSE_PROPERTY, term)
        rev = value["@reverse"]
        if not isinstance(rev, str):
            raise JsonLdError(err.INVALID_IRI_MAPPING, repr(rev))
        if not is_keyword(rev) and has_keyword_form(rev):
            defined.pop(term, None)
            return
        expanded_rev = expand_iri(active, rev, options, vocab=True, local_context=local, defined=defined)
        if not (isinstance(expanded_rev, str) and (is_absolute_iri(expanded_rev) or is_blank_node_id(expanded_rev))):
            raise JsonLdError(err.INVALID_IRI_MAPPING, repr(rev))
        definition.iri_mapping = expanded_rev
        if "@container" in value:
            c = value["@container"]
            if c not in ("@set", "@index", None):
                raise JsonLdError(err.INVALID_REVERSE_PROPERTY, repr(c))
            if c is not None:
                definition.container_mapping = frozenset([c])
        if "@index" in value and "@index" in definition.container_mapping:
            idx = value["@index"]
            if not isinstance(idx, str):
                raise JsonLdError(err.INVALID_TERM_DEFINITION, repr(idx))
            definition.index_mapping = idx
        definition.reverse_property = True
        _finish(active, term, definition, previous, defined, override_protected)
        return

    if "@id" in value and value["@id"] != term:
        idv = value["@id"]
        if idv is None:
            # term with null IRI mapping: retained so the term is "defined"
            # (expands to null / blocks vocab fallback)
            pass
        else:
            if not isinstance(idv, str):
                raise JsonLdError(err.INVALID_IRI_MAPPING, repr(idv))
            if not is_keyword(idv) and has_keyword_form(idv):
                defined.pop(term, None)
                return
            expanded_id = expand_iri(active, idv, options, vocab=True, local_context=local, defined=defined)
            if not (is_keyword(expanded_id) or (isinstance(expanded_id, str) and (is_absolute_iri(expanded_id) or is_blank_node_id(expanded_id)))):
                raise JsonLdError(err.INVALID_IRI_MAPPING, repr(idv))
            if expanded_id == "@context":
                raise JsonLdError(err.INVALID_KEYWORD_ALIAS, "@context")
            definition.iri_mapping = expanded_id
            if ":" in term[1:-1] or "/" in term:
                defined[term] = True
                re_expanded = expand_iri(active, term, options, vocab=True, local_context=local, defined=defined)
                if re_expanded != definition.iri_mapping:
                    raise JsonLdError(err.INVALID_IRI_MAPPING, f"{term} expands inconsistently")
            elif ":" not in term and "/" not in term and simple_term and isinstance(expanded_id, str) and (
                (expanded_id and expanded_id[-1] in _GEN_DELIMS) or is_blank_node_id(expanded_id)
            ):
                definition.prefix_flag = True
    elif ":" in term[1:]:
        parts = compact_iri_parts(term)
        if parts:
            prefix, suffix = parts
            if prefix in local:
                create_term_definition(active, local, prefix, defined, options, base_url=base_url,
                                        protected=protected, override_protected=override_protected,
                                        remote_contexts=remote_contexts)
            prefix_def = active.term_defs.get(prefix)
            if prefix_def is not None and prefix_def.iri_mapping is not None:
                definition.iri_mapping = prefix_def.iri_mapping + suffix
            else:
                definition.iri_mapping = term
        else:
            definition.iri_mapping = term
    elif "/" in term:
        defined[term] = True
        expanded_term = expand_iri(active, term, options, vocab=True, local_context=local, defined=defined)
        if not (isinstance(expanded_term, str) and is_absolute_iri(expanded_term)):
            raise JsonLdError(err.INVALID_IRI_MAPPING, term)
        definition.iri_mapping = expanded_term
    elif term == "@type":
        definition.iri_mapping = "@type"
    elif active.vocabulary_mapping is not None:
        definition.iri_mapping = active.vocabulary_mapping + term
    elif "@id" in value:
        pass  # explicit null IRI mapping
    else:
        raise JsonLdError(err.INVALID_IRI_MAPPING, f"no vocab mapping for term {term!r}")

    if "@container" in value:
        c = value["@container"]
        definition.container_mapping = _validate_container(c, options)
        if "@type" in definition.container_mapping:
            if definition.type_mapping is None:
                definition.type_mapping = "@id"
            elif definition.type_mapping not in ("@id", "@vocab"):
                raise JsonLdError(err.INVALID_TYPE_MAPPING, definition.type_mapping)

    if "@index" in value:
        if options.is_1_0 or "@index" not in definition.container_mapping:
            raise JsonLdError(err.INVALID_TERM_DEFINITION, "@index")
        idx = value["@index"]
        if not isinstance(idx, str):
            raise JsonLdError(err.INVALID_TERM_DEFINITION, repr(idx))
        expanded_idx = expand_iri(active, idx, options, vocab=True)
        if not (isinstance(expanded_idx, str) and is_absolute_iri(expanded_idx)):
            raise JsonLdError(err.INVALID_TERM_DEFINITION, repr(idx))
        definition.index_mapping = idx

    if "@context" in value:
        if options.is_1_0:
            raise JsonLdError(err.INVALID_TERM_DEFINITION, "@context")
        scoped = value["@context"]
        try:
            process_context(
                active, scoped, options,
                base_url=base_url,
                remote_contexts=remote_contexts,
                override_protected=True,
                validate_scoped=False,
            )
        except JsonLdError as e:
            raise JsonLdError(err.INVALID_SCOPED_CONTEXT, f"{term}: {e.code}") from e
        definition.local_context = scoped
        definition.base_url = base_url

    if "@language" in value and "@type" not in value:
        lang = value["@language"]
        if lang is None:
            definition.language_mapping = None
        elif isinstance(lang, str):
            definition.language_mapping = lang.lower() if options.lowercase_language else lang
        else:
            raise JsonLdError(err.INVALID_LANGUAGE_MAPPING, repr(lang))

    if "@direction" in value and "@type" not in value:
        d = value["@direction"]
        if d is None:
            definition.direction_mapping = None
        elif d in ("ltr", "rtl"):
            definition.direction_mapping = d
        else:
            raise JsonLdError(err.INVALID_BASE_DIRECTION, repr(d))

    if "@nest" in value:
        if options.is_1_0:
            raise JsonLdError(err.INVALID_TERM_DEFINITION, "@nest")
        nest = value["@nest"]
        if not isinstance(nest, str) or (nest != "@nest" and is_keyword(nest)):
            raise JsonLdError(err.INVALID_NEST_VALUE, repr(nest))
        definition.nest_value = nest

    if "@prefix" in value:
        if options.is_1_0 or ":" in term or "/" in term:
            raise JsonLdError(err.INVALID_TERM_DEFINITION, "@prefix")
        p = value["@prefix"]
        if not isinstance(p, bool):
            raise JsonLdError(err.INVALID_PREFIX_VALUE, repr(p))
        definition.prefix_flag = p
        if p and is_keyword(definition.iri_mapping):
            raise JsonLdError(err.INVALID_TERM_DEFINITION, "prefix maps to keyword")

    extra_keys = set(value.keys()) - _TERM_DEF_KEYS
    if extra_keys:
        raise JsonLdError(err.INVALID_TERM_DEFINITION, f"{term}: unexpected keys {sorted(extra_keys)}")

    _finish(active, term, definition, previous, defined, override_protected)


def _finish(
    active: Context,
    term: str,
    definition: TermDefinition,
    previous: TermDefinition | None,
    defined: dict[str, bool],
    override_protected: bool,
) -> None:
    if not override_protected and previous is not None and previous.protected:
        if not definition.same_except_protected(previous):
            raise JsonLdError(err.PROTECTED_TERM_REDEFINITION, term)
        definition = previous
    active.term_defs[term] = definition
    active.__dict__.pop("_iri_cache", None)  # term set changed
    defined[term] = True


def _validate_container(c: Any, options: Options) -> frozenset:
    original = c
    if options.is_1_0:
        if c not in ("@graph", "@id", "@type") and isinstance(c, str):
            if c in ("@index", "@language", "@list", "@set"):
                return frozenset([c])
        raise JsonLdError(err.INVALID_CONTAINER_MAPPING, repr(original))
    values = c if isinstance(c, list) else [c]
    if not values or not all(isinstance(v, str) for v in values):
        raise JsonLdError(err.INVALID_CONTAINER_MAPPING, repr(original))
    s = set(values)
    if len(s) != len(values):
        raise JsonLdError(err.INVALID_CONTAINER_MAPPING, repr(original))
    allowed = {"@graph", "@id", "@index", "@language", "@list", "@set", "@type"}
    if not s <= allowed:
        raise JsonLdError(err.INVALID_CONTAINER_MAPPING, repr(original))
    if len(s) == 1:
        return frozenset(s)
    if "@graph" in s:
        if s <= {"@graph", "@id", "@set"} or s <= {"@graph", "@index", "@set"}:
            return frozenset(s)
        raise JsonLdError(err.INVALID_CONTAINER_MAPPING, repr(original))
    if "@set" in s and len(s) == 2:
        other = next(iter(s - {"@set"}))
        if other in ("@index", "@id", "@type", "@language"):
            return frozenset(s)
    raise JsonLdError(err.INVALID_CONTAINER_MAPPING, repr(original))


def expand_iri(
    active: Context,
    value: Any,
    options: Options,
    document_relative: bool = False,
    vocab: bool = False,
    local_context: dict | None = None,
    defined: dict[str, bool] | None = None,
) -> str | None:
    """IRI Expansion (spec §5.2.2).

    Memoized per Context instance when no local context is in play:
    processed contexts are immutable (process_context copies), and the
    same terms/IRIs recur for every document sharing a context — the
    pipeline's "broadcast context cache" fast path.
    """
    if value is None or is_keyword(value):
        return value
    if not isinstance(value, str):
        return value

    cache = None
    if local_context is None:
        cache = active.__dict__.get("_iri_cache")
        if cache is None:
            cache = {}
            active.__dict__["_iri_cache"] = cache
        key = (value, vocab, document_relative)
        hit = cache.get(key, UNSET)
        if hit is not UNSET:
            return hit
        result = _expand_iri_uncached(active, value, options, document_relative, vocab)
        cache[key] = result
        return result
    return _expand_iri_uncached(active, value, options, document_relative, vocab, local_context, defined)


def _expand_iri_uncached(
    active: Context,
    value: str,
    options: Options,
    document_relative: bool,
    vocab: bool,
    local_context: dict | None = None,
    defined: dict[str, bool] | None = None,
) -> str | None:
    if has_keyword_form(value):
        return None

    if local_context is not None and value in local_context and defined is not None and defined.get(value) is not True:
        create_term_definition(active, local_context, value, defined, options)

    td = active.term_defs.get(value)
    if td is not None and is_keyword(td.iri_mapping):
        return td.iri_mapping
    if vocab and td is not None:
        return td.iri_mapping

    if ":" in value[1:]:
        prefix, _, suffix = value.partition(":")
        if prefix == "_" or suffix.startswith("//"):
            return value
        if local_context is not None and prefix in local_context and defined is not None and defined.get(prefix) is not True:
            create_term_definition(active, local_context, prefix, defined, options)
        ptd = active.term_defs.get(prefix)
        if ptd is not None and ptd.iri_mapping is not None and ptd.prefix_flag:
            return ptd.iri_mapping + suffix
        if is_absolute_iri(value):
            return value

    if vocab and active.vocabulary_mapping is not None:
        return active.vocabulary_mapping + value
    if document_relative and active.base_iri is not None:
        return resolve_iri(active.base_iri, value)
    return value
