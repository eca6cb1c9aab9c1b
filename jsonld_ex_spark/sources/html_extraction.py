"""HTML script extraction (W3C JSON-LD 1.1 API §6 'HTML Content
Algorithms'): pull JSON-LD out of <script type="application/ld+json">
elements.

The reference does NOT implement this (its html suite is reported
untested in the EARL); this engine supports it — web-scale transcript
corpora routinely carry embedded JSON-LD in scraped HTML.

stdlib html.parser only (script elements are RAWTEXT, so their content
arrives verbatim, comment wrappers included).
"""

from __future__ import annotations

import json
from html.parser import HTMLParser
from typing import Any

from jsonld_ex_spark.core import errors as err
from jsonld_ex_spark.core.errors import JsonLdError

JSON_LD_TYPE = "application/ld+json"


class _Collector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.scripts: list[dict] = []  # {type, id, text}
        self.ids: dict[str, dict] = {}  # id -> {tag, type}
        self.base_href: str | None = None
        self._in_script: dict | None = None

    def handle_starttag(self, tag: str, attrs) -> None:
        attrd = {k.lower(): (v or "") for k, v in attrs}
        if tag == "base" and self.base_href is None and "href" in attrd:
            self.base_href = attrd["href"]
        if "id" in attrd:
            self.ids.setdefault(attrd["id"], {"tag": tag, "type": attrd.get("type", "")})
        if tag == "script":
            self._in_script = {
                "type": attrd.get("type", ""),
                "id": attrd.get("id"),
                "text": "",
            }

    def handle_data(self, data: str) -> None:
        if self._in_script is not None:
            self._in_script["text"] += data

    def handle_comment(self, data: str) -> None:
        # comments inside RAWTEXT script shouldn't reach here, but some
        # parsers surface them — keep the markers for the wrapper check
        if self._in_script is not None:
            self._in_script["text"] += f"<!--{data}-->"

    def handle_endtag(self, tag: str) -> None:
        if tag == "script" and self._in_script is not None:
            self.scripts.append(self._in_script)
            self._in_script = None


def _uncomment(text: str) -> str:
    """Strip an optional <!-- --> wrapper; reject stray comment markers
    (spec: 'invalid script element')."""
    stripped = text.strip()
    if stripped.startswith("<!--"):
        if not stripped.endswith("-->"):
            raise JsonLdError(err.INVALID_SCRIPT_ELEMENT, "end comment missing")
        inner = stripped[4:-3]
        if "<!--" in inner or "-->" in inner:
            raise JsonLdError(err.INVALID_SCRIPT_ELEMENT, "comment inside commented script")
        return inner
    if "-->" in stripped or "<!--" in stripped:
        raise JsonLdError(err.INVALID_SCRIPT_ELEMENT, "start comment missing")
    return stripped


def _parse_script(text: str) -> Any:
    inner = _uncomment(text)
    try:
        return json.loads(inner)
    except ValueError as e:
        raise JsonLdError(err.INVALID_SCRIPT_ELEMENT, f"invalid JSON: {e}") from e


def _is_ld_type(type_attr: str) -> bool:
    return type_attr.split(";")[0].strip().lower() == JSON_LD_TYPE


def extract_html_jsonld(
    html_text: str,
    fragment: str | None = None,
    extract_all_scripts: bool = False,
) -> tuple[Any, str | None]:
    """Returns (extracted JSON-LD document, html <base href> or None).

    Spec behavior: fragment targets a specific script by id (errors with
    'loading document failed' if missing / not a script / wrong type);
    extractAllScripts concatenates every ld+json script (array contents
    are merged); default takes the first ld+json script.
    """
    collector = _Collector()
    collector.feed(html_text)
    collector.close()

    if fragment:
        target = collector.ids.get(fragment)
        matches = [s for s in collector.scripts if s["id"] == fragment]
        if not matches:
            if target is None:
                raise JsonLdError(err.LOADING_DOCUMENT_FAILED, f"no element with id {fragment!r}")
            raise JsonLdError(err.LOADING_DOCUMENT_FAILED, f"element {fragment!r} is not a script")
        script = matches[0]
        if not _is_ld_type(script["type"]):
            raise JsonLdError(
                err.LOADING_DOCUMENT_FAILED,
                f"script {fragment!r} has type {script['type']!r}",
            )
        return _parse_script(script["text"]), collector.base_href

    ld_scripts = [s for s in collector.scripts if _is_ld_type(s["type"])]
    if not ld_scripts:
        if extract_all_scripts:
            return [], collector.base_href  # "expands as empty"
        raise JsonLdError(err.LOADING_DOCUMENT_FAILED, "no application/ld+json script elements")

    if extract_all_scripts:
        result: list = []
        for s in ld_scripts:
            parsed = _parse_script(s["text"])
            if isinstance(parsed, list):
                result.extend(parsed)
            else:
                result.append(parsed)
        return result, collector.base_href
    return _parse_script(ld_scripts[0]["text"]), collector.base_href
