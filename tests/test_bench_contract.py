"""Driver bench contract: the single stdout JSON line must fit the
driver's ~2,000-char tail capture (round-4 regression: the full record
with 40 extra queries overgrew it, the line was truncated mid-JSON and
BENCH_r04.json recorded "parsed": null — the round lost its bench)."""

import json

import bench


def _worst_case_line() -> str:
    # pessimistic timings: 4-digit seconds with 3 decimals for every
    # headline query, large turn/triple counts
    timings = {name: 9999.999 for name in bench.BENCH_QUERIES}
    return bench.headline_line(
        total=sum(timings.values()),
        timings=timings,
        sf=0.1,
        turns=60_000_000,
        turns_per_sec=123456.7,
        triples=555_080_000,
    )


def test_headline_line_fits_driver_capture():
    line = _worst_case_line()
    assert len(line) < 1900
    assert "\n" not in line


def test_headline_line_is_valid_json_with_contract_fields():
    parsed = json.loads(_worst_case_line())
    assert parsed["metric"]
    assert parsed["unit"] == "sec"
    assert set(parsed["queries"]) == set(bench.BENCH_QUERIES)
    assert parsed["sf"] == 0.1
    assert parsed["turns_per_sec_kg_triples"] > 0


def test_headline_query_list_is_stable_round2_baseline():
    # the 25-query comparable list must stay IDENTICAL across rounds so
    # cross-round totals/ratios stay meaningful (verdict r4 item 9)
    assert len(bench.BENCH_QUERIES) == 25
    assert bench.BENCH_QUERIES[0] == "kg_transcripts"
    assert "kg_triples" in bench.BENCH_QUERIES
