"""Pure-Python JSON-LD 1.1 algorithm core (no Spark imports).

Implements the W3C "JSON-LD 1.1 Processing Algorithms and API"
recommendation: Context Processing, Create Term Definition, IRI
Expansion, Expansion, Node Map Generation, Flattening, Deserialize
JSON-LD to RDF, Serialize RDF as JSON-LD, and Compaction.

Parity target: the behaviors exercised by the vendored W3C test suite at
/root/reference/test/data/json-ld-api-tests/ that the reference
(jsonld-ex v1.0.1) passes — see /root/reference/earl_reports/json-ld-api.ttl.
"""
