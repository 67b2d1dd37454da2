"""Every registered query must match its DuckDB oracle at sf0.001 —
the local version of the driver's correctness gate (which runs sf0.01)."""

from __future__ import annotations

import pytest

from stream_cdc_gps_spark.registry import all_queries
from tests.conftest import SF_SMOKE
from tests.oracle import compare

SPECS = all_queries()
ORACLE_CASES = [s for s in SPECS.values() if s.oracle is not None]
ROWS_ONLY_CASES = [s for s in SPECS.values() if s.oracle is None]


@pytest.mark.parametrize("spec", ORACLE_CASES, ids=[s.name for s in ORACLE_CASES])
def test_query_matches_oracle(spark, spec):
    compare(spark, SF_SMOKE, spec.fn, spec.oracle, name=spec.name)


@pytest.mark.parametrize("spec", ROWS_ONLY_CASES, ids=[s.name for s in ROWS_ONLY_CASES])
def test_rows_only_query_runs(spark, spec):
    df = spec.fn(spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
