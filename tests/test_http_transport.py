"""Real HTTP transport for the document loader, driven against a local
HTTP server — the same strategy the reference uses with Bypass
(test/acceptance/w3c/remote_doc_test.exs): live sockets, no stubs.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from jsonld_ex_spark.core.errors import JsonLdError
from jsonld_ex_spark.sources.document_loader import (
    HttpResponse,
    cached_fetch,
    http_document_loader,
    http_fetch,
    load_remote_document,
)

DOC = {"@context": {"name": "http://xmlns.com/foaf/0.1/name"}, "name": "x"}
CTX = {"@context": {"name": "http://xmlns.com/foaf/0.1/name"}}


class _Handler(BaseHTTPRequestHandler):
    server_version = "test"
    hits: dict[str, int] = {}
    accepts: dict[str, str] = {}

    def log_message(self, *a):  # noqa: D102
        pass

    def do_GET(self):  # noqa: N802
        _Handler.hits[self.path] = _Handler.hits.get(self.path, 0) + 1
        _Handler.accepts[self.path] = self.headers.get("Accept", "")
        routes = {
            "/doc.jsonld": (200, "application/ld+json", json.dumps(DOC), []),
            "/redirect": (302, "text/plain", "", [("Location", "/hop")]),
            "/hop": (303, "text/plain", "", [("Location", "/doc.jsonld")]),
            "/ctx.jsonld": (200, "application/ld+json", json.dumps(CTX), []),
            "/data.json": (
                200, "application/json", json.dumps({"name": "y"}),
                [("Link", '</ctx.jsonld>; rel="http://www.w3.org/ns/json-ld#context"')],
            ),
            "/page.html": (
                200, "text/html", "<html><body>no scripts</body></html>",
                [("Link", '</doc.jsonld>; rel="alternate"; type="application/ld+json"')],
            ),
            "/loop": (302, "text/plain", "", [("Location", "/loop")]),
            "/utf8.jsonld": (
                200, "application/ld+json; charset=utf-8",
                json.dumps({"name": "café"}, ensure_ascii=False), [],
            ),
        }
        if self.path not in routes:
            self.send_response(404)
            self.send_header("Content-Type", "text/plain")
            self.end_headers()
            self.wfile.write(b"nope")
            return
        status, ctype, body, extra = routes[self.path]
        raw = body.encode("utf-8")
        self.send_response(status)
        self.send_header("Content-Type", ctype)
        for k, v in extra:
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(raw)))
        self.end_headers()
        self.wfile.write(raw)


@pytest.fixture(scope="module")
def base_url():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_direct_ld_json(base_url):
    rd = load_remote_document(f"{base_url}/doc.jsonld", http_fetch)
    assert rd.document == DOC
    assert rd.content_type == "application/ld+json"
    assert rd.document_url.endswith("/doc.jsonld")
    # content negotiation reached the wire
    assert "application/ld+json" in _Handler.accepts["/doc.jsonld"]


def test_redirect_chain_followed(base_url):
    rd = load_remote_document(f"{base_url}/redirect", http_fetch)
    assert rd.document == DOC
    assert rd.document_url.endswith("/doc.jsonld")  # final URL after 302+303


def test_link_header_context_on_plain_json(base_url):
    rd = load_remote_document(f"{base_url}/data.json", http_fetch)
    assert rd.document == {"name": "y"}
    assert rd.context_url.endswith("/ctx.jsonld")


def test_alternate_link_followed_for_html(base_url):
    rd = load_remote_document(f"{base_url}/page.html", http_fetch)
    assert rd.document == DOC  # alternate application/ld+json wins over HTML


def test_http_error_raises_loading_failed(base_url):
    with pytest.raises(JsonLdError) as e:
        load_remote_document(f"{base_url}/missing", http_fetch)
    assert e.value.code == "loading document failed"


def test_redirect_loop_bounded(base_url):
    with pytest.raises(JsonLdError) as e:
        load_remote_document(f"{base_url}/loop", http_fetch)
    assert e.value.code == "loading document failed"


def test_utf8_charset_decoded(base_url):
    rd = load_remote_document(f"{base_url}/utf8.jsonld", http_fetch)
    assert rd.document["name"] == "café"


def test_cached_fetch_hits_network_once(base_url):
    _Handler.hits.pop("/ctx.jsonld", None)
    loader = http_document_loader()
    for _ in range(5):
        rd = loader(f"{base_url}/ctx.jsonld")
        assert rd.document == CTX
    assert _Handler.hits["/ctx.jsonld"] == 1


def test_profile_negotiation_sends_profile_param(base_url):
    fetch = lambda u: http_fetch(u, request_profile="http://www.w3.org/ns/json-ld#context")  # noqa: E731
    load_remote_document(f"{base_url}/doc.jsonld", fetch)
    assert 'profile="http://www.w3.org/ns/json-ld#context"' in _Handler.accepts["/doc.jsonld"]


def test_end_to_end_expand_with_http_context(base_url):
    """Full API path: expand a document whose @context is a remote URL
    served over real HTTP."""
    from jsonld_ex_spark.core.api import expand
    from jsonld_ex_spark.core.context import Options

    doc = {"@context": f"{base_url}/ctx.jsonld", "name": "Alice"}
    out = expand(doc, Options(document_loader=http_document_loader()))
    assert out == [{"http://xmlns.com/foaf/0.1/name": [{"@value": "Alice"}]}]


def test_inline_remote_contexts_enables_io_free_executors(base_url):
    """Driver-side inlining replaces remote @context URLs (including a
    remote context nested inside a fetched context) so expansion works
    with NO loader at all — the executor distribution contract."""
    from jsonld_ex_spark.core.api import expand as core_expand
    from jsonld_ex_spark.core.context import Options
    from jsonld_ex_spark.sources.document_loader import (
        http_document_loader,
        inline_remote_contexts,
    )

    doc = {"@context": f"{base_url}/ctx.jsonld", "name": "Ada",
           "nested": {"@context": [f"{base_url}/ctx.jsonld"], "name": "Bob"}}
    inlined = inline_remote_contexts(doc, loader=http_document_loader())
    assert inlined["@context"] == CTX["@context"]  # URL replaced by value
    # expansion WITHOUT any document loader == expansion WITH the loader
    with_loader = core_expand(doc, Options(document_loader=http_document_loader()))
    without_loader = core_expand(inlined, Options())
    assert without_loader == with_loader


def test_inline_remote_contexts_detects_loops(base_url):
    from jsonld_ex_spark.core.errors import JsonLdError
    from jsonld_ex_spark.sources.document_loader import inline_remote_contexts

    # /loop is a redirect loop: the loader itself errors cleanly
    with pytest.raises(JsonLdError):
        inline_remote_contexts({"@context": f"{base_url}/loop", "x": 1})


def test_cached_fetch_does_not_cache_errors():
    """A transient 4xx/5xx fetching a shared remote context must NOT be
    pinned for the driver's lifetime — the next reference retries; only
    successful responses are memoized."""
    calls = []

    def flaky(url):
        calls.append(url)
        status = 500 if len(calls) == 1 else 200
        return HttpResponse(status=status, headers={}, body="{}", url=url)

    f = cached_fetch(flaky)
    assert f("http://x/ctx").status == 500  # first call surfaces the error
    assert f("http://x/ctx").status == 200  # error was NOT cached — retried
    assert f("http://x/ctx").status == 200  # the success IS cached
    assert len(calls) == 2


def test_framing_with_remote_context(base_url):
    """Framing a document whose frame references a REMOTE @context: the
    frame's context is fetched over HTTP (driver-side, cached) during
    frame expansion AND used for the output compaction."""
    from jsonld_ex_spark.core.api import frame
    from jsonld_ex_spark.core.context import Options

    doc = {
        "@context": f"{base_url}/ctx.jsonld",
        "@id": "http://ex.org/p1",
        "name": "Remote Rose",
    }
    f = {"@context": f"{base_url}/ctx.jsonld", "name": {}}
    out = frame(doc, f, Options(document_loader=http_document_loader()))
    assert out["@id"] == "http://ex.org/p1"
    assert out["name"] == "Remote Rose"
    assert out["@context"] == f"{base_url}/ctx.jsonld"  # frame ctx verbatim
