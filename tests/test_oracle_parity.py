"""The correctness gate, locally: every registered query with an oracle
must match DuckDB on the driver's parquet tables (same check the driver
runs at sf0.01 — here at sf0.001 by default for speed; set
MTMRL_TEST_SF_DIR=/root/testdata/sf0.01 for the full-size run)."""

from __future__ import annotations

import pytest

from multithreaded_map_reduce_library_spark.plans.registry import all_queries
from tests.conftest import SF_ORACLE
from tests.oracle_util import compare_query

# Full-registry oracle replay (~16 min): `slow` — the driver reproduces
# this exact signal itself (CORRECTNESS gate at sf0.01), and the default
# pytest run must fit the driver's ~30-min window (pytest.ini).
pytestmark = pytest.mark.slow

_QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(n for n, q in _QUERIES.items() if q.oracle))
def test_query_matches_oracle(spark, name):
    q = _QUERIES[name]
    compare_query(spark, q.fn, q.oracle, SF_ORACLE)


def test_all_queries_run_and_return_rows(spark):
    # Queries without an oracle still must run and produce a stable schema.
    for name, q in _QUERIES.items():
        if q.oracle is None:
            df = q.fn(spark, SF_ORACLE)
            assert df.columns, name
            assert df.count() >= 0, name
