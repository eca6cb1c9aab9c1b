"""Generate an EARL conformance report over the vendored W3C JSON-LD 1.1
API suites — the same publication format the reference produces with its
mix earl task (/root/reference/mix.exs:128-143, earl_reports/
json-ld-api.ttl): one earl:Assertion per manifest case with outcome
earl:passed / earl:failed / earl:untested (mirrored skips).

Usage: python scripts/earl_report.py [out.ttl]   (default:
earl_reports/json-ld-api.ttl; prints the outcome tally to stdout)
"""

from __future__ import annotations

import sys
from datetime import datetime, timezone

sys.path.insert(0, "/root/repo")

from _pytest.outcomes import Skipped  # noqa: E402

PROJECT = "https://sparkld.dev/jsonld-ex-spark"  # placeholder project IRI
TEST_BASE = "https://w3c.github.io/json-ld-api/tests"

SUITES = [
    ("expand", "tests.test_w3c_expand", "test_expand", True),
    ("compact", "tests.test_w3c_compact", "test_compact", True),
    ("flatten", "tests.test_w3c_flatten", "test_flatten", True),
    ("toRdf", "tests.test_w3c_to_rdf", "test_to_rdf", False),
    ("fromRdf", "tests.test_w3c_from_rdf", "test_from_rdf", True),
    ("remote-doc", "tests.test_w3c_remote_doc", "test_remote_doc", False),
    ("html", "tests.test_w3c_html", "test_html", False),
]

HEADER = """@prefix dc: <http://purl.org/dc/terms/> .
@prefix doap: <http://usefulinc.com/ns/doap#> .
@prefix earl: <http://www.w3.org/ns/earl#> .
@prefix foaf: <http://xmlns.com/foaf/0.1/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

<>
    dc:issued "{issued}"^^xsd:dateTime ;
    foaf:primaryTopic <{project}> .

<{project}>
    a doap:Project, earl:Software, earl:TestSubject ;
    doap:description "PySpark-native JSON-LD 1.1 processor and analytics engine"@en ;
    doap:implements <http://www.w3.org/TR/json-ld-api/>, <http://www.w3.org/TR/json-ld/> ;
    doap:name "jsonld-ex-spark" ;
    doap:platform "Apache Spark" ;
    doap:programming-language "Python" .

"""

ASSERTION = """[
    a earl:Assertion ;
    earl:mode earl:automatic ;
    earl:subject <{project}> ;
    earl:test <{test}> ;
    earl:result [
        a earl:TestResult ;
        dc:date "{issued}"^^xsd:dateTime ;
        earl:outcome earl:{outcome}
    ]
] .

"""


def run_case(mod, fn_name: str, case: dict, takes_ordered: bool) -> str:
    fn = getattr(mod, fn_name)
    try:
        if takes_ordered:
            fn(case, True)
        else:
            fn(case)
        return "passed"
    except Skipped:
        return "untested"
    except Exception:  # noqa: BLE001 — any failure is earl:failed
        return "failed"


def main() -> None:
    import importlib
    import os

    out_path = sys.argv[1] if len(sys.argv) > 1 else "earl_reports/json-ld-api.ttl"
    issued = datetime.now(timezone.utc).isoformat().replace("+00:00", "Z")
    parts = [HEADER.format(issued=issued, project=PROJECT)]
    tally = {"passed": 0, "failed": 0, "untested": 0}
    for suite, mod_name, fn_name, takes_ordered in SUITES:
        mod = importlib.import_module(mod_name)
        for case in mod.CASES:
            outcome = run_case(mod, fn_name, case, takes_ordered)
            tally[outcome] += 1
            parts.append(
                ASSERTION.format(
                    project=PROJECT,
                    test=f"{TEST_BASE}/{suite}-manifest{case['@id']}",
                    issued=issued,
                    outcome=outcome,
                )
            )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as f:
        f.write("".join(parts))
    print(f"{out_path}: {tally['passed']} passed / {tally['failed']} failed / "
          f"{tally['untested']} untested "
          f"(reference EARL: 1196/5/26 — see BASELINE.md)")
    sys.exit(1 if tally["failed"] else 0)


if __name__ == "__main__":
    main()
