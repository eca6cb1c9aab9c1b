"""Run every __spark_entry__ queries() entry against its DuckDB oracle
at sf0.001 — the repo-local mirror of the driver's correctness gate.

(The KG queries have their own dedicated tests in test_kg_pipeline.py;
this test sweeps everything, so a new query can't be registered in
__spark_entry__ without oracle coverage.)
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

from tests.spark_fixtures import compare_with_oracle, spark  # noqa: F401

pytestmark = pytest.mark.spark

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_query_vs_oracle(spark, name):  # noqa: F811
    fn = QUERIES[name]
    df = fn(spark, "/root/testdata/sf0.001")
    if name not in ORACLES:
        # rows-only check (non-SQL-expressible op)
        assert df.count() >= 0
        return
    compare_with_oracle(df, ORACLES[name])


def test_entry_smoke(spark):  # noqa: F811
    df = entrymod.entry(spark)
    assert df.count() > 0
