"""Remote Document and Context Retrieval (W3C JSON-LD 1.1 API §9.6
LoadDocumentCallback semantics).

Reference parity: lib/json/ld/document_loader/remote_document.ex:60-261.

Transport-pluggable: the actual HTTP GET is injected as ``fetch(url) ->
HttpResponse``.  ``http_fetch`` (below) is the real urllib transport —
content-negotiated Accept header with optional JSON-LD profile, no
auto-redirects (policy lives here, in the loader) — wrapped by
``cached_fetch`` / ``http_document_loader`` for production use; tests
and air-gapped executors may still inject stubs.  In the Spark pipeline
all remote contexts are resolved ONCE on the driver through this loader
and shipped to executors pre-processed — executors never perform I/O
(SURVEY.md §2.1#18).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Callable

from jsonld_ex_spark.core import errors as err
from jsonld_ex_spark.core.context import RemoteDocument
from jsonld_ex_spark.core.errors import JsonLdError
from jsonld_ex_spark.core.iri import resolve_iri

JSON_LD_CONTEXT_REL = "http://www.w3.org/ns/json-ld#context"
MAX_REDIRECTS = 10


@dataclass
class HttpResponse:
    status: int
    headers: dict[str, object] = field(default_factory=dict)  # value: str | list[str]
    body: str = ""
    url: str | None = None


Fetch = Callable[[str], HttpResponse]

_LINK_RE = re.compile(r'<([^>]*)>((?:\s*;\s*[A-Za-z0-9*_-]+=(?:"[^"]*"|[^;,\s]+))*)')
_PARAM_RE = re.compile(r';\s*([A-Za-z0-9*_-]+)=(?:"([^"]*)"|([^;,\s]+))')


def parse_link_header(value) -> list[dict]:
    """Parse Link header(s) into [{target, rel, type, ...}, ...]."""
    links = []
    values = value if isinstance(value, list) else [value]
    for v in values:
        for m in _LINK_RE.finditer(v):
            params = {
                pm.group(1).lower(): pm.group(2) if pm.group(2) is not None else pm.group(3)
                for pm in _PARAM_RE.finditer(m.group(2))
            }
            links.append({"target": m.group(1), **params})
    return links


def _header(headers: dict, name: str):
    for k, v in headers.items():
        if k.lower() == name.lower():
            return v
    return None


def _media_type(content_type: str | None) -> str:
    return (content_type or "").split(";")[0].strip().lower()


def load_remote_document(
    url: str,
    fetch: Fetch,
    max_redirects: int = MAX_REDIRECTS,
    extract_all_scripts: bool | None = None,
    _following_alternate: bool = False,
) -> RemoteDocument:
    """LoadDocumentCallback: content-type dispatch, redirects, Link
    header context discovery, alternate-document following."""
    current = url
    response = None
    for _ in range(max_redirects + 1):
        try:
            response = fetch(current)
        except JsonLdError:
            raise
        except Exception as e:  # noqa: BLE001
            raise JsonLdError(err.LOADING_DOCUMENT_FAILED, f"{current}: {e}") from e
        if response.status in (301, 302, 303, 307, 308):
            location = _header(response.headers, "Location")
            if not location:
                raise JsonLdError(err.LOADING_DOCUMENT_FAILED, f"{current}: redirect without Location")
            current = resolve_iri(current, location)
            continue
        break
    if response is None or not (200 <= response.status < 300):
        raise JsonLdError(
            err.LOADING_DOCUMENT_FAILED,
            f"{current}: HTTP {response.status if response else 'n/a'}",
        )

    final_url = response.url or current
    media = _media_type(_header(response.headers, "Content-Type"))
    links = parse_link_header(_header(response.headers, "Link") or "")

    is_ld_json = media == "application/ld+json"
    is_json = media == "application/json" or media.endswith("+json")

    if not is_json:
        # not JSON at all: follow an alternate link to application/ld+json
        alternates = [
            l for l in links
            if l.get("rel") == "alternate" and l.get("type") == "application/ld+json"
        ]
        if alternates and not _following_alternate:
            alt_url = resolve_iri(final_url, alternates[0]["target"])
            return load_remote_document(alt_url, fetch, max_redirects, _following_alternate=True)
        if media in ("text/html", "application/xhtml+xml"):
            from jsonld_ex_spark.sources.html_extraction import extract_html_jsonld

            base_part, _, frag = url.partition("#")
            doc, base_href = extract_html_jsonld(
                response.body, fragment=frag or None,
                extract_all_scripts=bool(extract_all_scripts),
            )
            base_iri = resolve_iri(final_url, base_href) if base_href else None
            return RemoteDocument(
                document=doc, document_url=final_url.partition("#")[0],
                content_type=media, base_iri=base_iri,
            )
        raise JsonLdError(err.LOADING_DOCUMENT_FAILED, f"{final_url}: unsupported content type {media!r}")

    context_url = None
    if not is_ld_json:
        context_links = [l for l in links if l.get("rel") == JSON_LD_CONTEXT_REL]
        if len(context_links) > 1:
            raise JsonLdError(err.MULTIPLE_CONTEXT_LINK_HEADERS, final_url)
        if context_links:
            context_url = resolve_iri(final_url, context_links[0]["target"])
        # NB: alternate links are only followed for non-JSON media types
        # ("does not redirect if type is application/json")

    try:
        document = json.loads(response.body)
    except ValueError as e:
        raise JsonLdError(err.LOADING_DOCUMENT_FAILED, f"{final_url}: invalid JSON: {e}") from e

    return RemoteDocument(
        document=document,
        document_url=final_url,
        content_type=media,
        context_url=context_url,
    )


def make_document_loader(fetch: Fetch, options=None):
    """Adapt a transport into the Options.document_loader signature.

    Pass the Options object to honor per-operation extractAllScripts
    defaults for HTML documents (read lazily at load time)."""

    def loader(url: str) -> RemoteDocument:
        eas = options.extract_all_scripts if options is not None else None
        return load_remote_document(url, fetch, extract_all_scripts=eas)

    return loader


# ---------------------------------------------------------------------------
# Real HTTP transport (driver-side).
#
# Reference parity: lib/json/ld/document_loader/remote_document.ex:60-145
# (Accept-profile negotiation, redirect following, Link-header handling).
# Redirect/Link/alternate POLICY lives in load_remote_document above — the
# transport therefore must NOT auto-follow redirects; it returns 3xx
# responses verbatim so the loader applies the spec rules (and the
# MAX_REDIRECTS bound).  In the Spark pipeline this runs ONCE on the
# driver per distinct context URL (see cached_fetch); executors receive
# pre-processed contexts via broadcast and never perform I/O.
# ---------------------------------------------------------------------------

DEFAULT_ACCEPT = (
    "application/ld+json, application/json;q=0.9, "
    "text/html;q=0.8, application/xhtml+xml;q=0.8, */*;q=0.1"
)


def http_fetch(
    url: str,
    timeout: float = 30.0,
    request_profile: str | list[str] | None = None,
) -> HttpResponse:
    """urllib transport: one GET, content-negotiated Accept header
    (with optional JSON-LD profile parameter), no auto-redirects."""
    import urllib.error
    import urllib.request

    class _NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, req, fp, code, msg, headers, newurl):  # noqa: N803
            return None  # surface 3xx to the caller

    accept = DEFAULT_ACCEPT
    if request_profile:
        profiles = " ".join(
            request_profile if isinstance(request_profile, list) else [request_profile]
        )
        accept = f'application/ld+json;profile="{profiles}", ' + DEFAULT_ACCEPT

    req = urllib.request.Request(
        url, headers={"Accept": accept, "User-Agent": "jsonld-ex-spark/0.1"}
    )
    opener = urllib.request.build_opener(_NoRedirect())
    try:
        resp = opener.open(req, timeout=timeout)
    except urllib.error.HTTPError as e:
        resp = e  # HTTPError IS the response object (3xx/4xx/5xx)
    except Exception as e:  # noqa: BLE001 — DNS/conn/timeout
        raise JsonLdError(err.LOADING_DOCUMENT_FAILED, f"{url}: {e}") from e

    headers: dict[str, object] = {}
    for k in set(resp.headers.keys()):
        vals = resp.headers.get_all(k) or []
        headers[k] = vals[0] if len(vals) == 1 else list(vals)
    charset = resp.headers.get_content_charset() or "utf-8"
    body = resp.read().decode(charset, errors="replace")
    status = getattr(resp, "status", None) or resp.getcode()
    return HttpResponse(status=status, headers=headers, body=body, url=resp.geturl())


def cached_fetch(fetch: Fetch = http_fetch, max_entries: int = 512) -> Fetch:
    """Memoize a transport by URL (driver-side context cache).  Contexts
    like schema.org are referenced by millions of rows; they must be
    fetched once per driver, never per task.

    Only successful responses (status < 400) are memoized: a transient
    4xx/5xx fetching a shared remote context must NOT be pinned for the
    driver's lifetime — the next document referencing it retries."""
    cache: dict[str, HttpResponse] = {}

    def f(url: str) -> HttpResponse:
        got = cache.get(url)
        if got is None:
            got = fetch(url)
            if got.status < 400:
                if len(cache) >= max_entries:
                    cache.pop(next(iter(cache)))  # FIFO eviction — bounded memory
                cache[url] = got
        return got

    return f


def http_document_loader(options=None, cache: bool = True):
    """Production LoadDocumentCallback: real HTTP + per-driver cache."""
    return make_document_loader(cached_fetch() if cache else http_fetch, options)


def inline_remote_contexts(doc, loader=None, max_depth: int = 8):
    """DRIVER-SIDE context inlining: replace every remote ``@context``
    URL in the document (recursively, including URLs inside fetched
    contexts) with the fetched context value, so the document can be
    shipped to executors that never perform I/O — the distribution
    contract of operators/jsonld_ops.py.

    Relative context refs inside a fetched remote context are resolved
    against THAT context's URL (spec behavior) before recursing.
    """
    loader = loader or http_document_loader()

    def resolve_ctx(ctx, base_url, depth):
        if depth > max_depth:
            raise JsonLdError(err.CONTEXT_OVERFLOW, "remote context nesting too deep")
        if isinstance(ctx, str):
            url = resolve_iri(base_url, ctx) if base_url else ctx
            rd = loader(url)
            fetched = rd.document.get("@context") if isinstance(rd.document, dict) else None
            if fetched is None:
                raise JsonLdError(err.INVALID_REMOTE_CONTEXT, url)
            return resolve_ctx(fetched, rd.document_url, depth + 1)
        if isinstance(ctx, list):
            return [resolve_ctx(c, base_url, depth) for c in ctx]
        return ctx  # dict / None: already inline

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "@context":
                    out[k] = resolve_ctx(v, None, 0)
                else:
                    out[k] = walk(v)
            return out
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(doc)


def file_loader(url: str) -> RemoteDocument:
    """Local-filesystem loader (reference: JSON.LD.read_file!/RDF
    serialization-format reading, lib/json_ld.ex:10).  Accepts plain
    paths and file:// URLs."""
    import json as _json

    path = url[7:] if url.startswith("file://") else url
    try:
        with open(path, encoding="utf-8") as f:
            doc = _json.load(f)
    except FileNotFoundError as e:
        raise JsonLdError(err.LOADING_DOCUMENT_FAILED, str(e)) from e
    except ValueError as e:
        raise JsonLdError(err.LOADING_DOCUMENT_FAILED, f"{path}: invalid JSON: {e}") from e
    return RemoteDocument(document=doc, document_url=f"file://{path}")
