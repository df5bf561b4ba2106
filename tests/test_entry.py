from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert "sum_qty_e2" in df.columns


def test_registry_contract():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 25
    assert set(oracles) <= set(qs)
    # the vast majority of queries must be oracle-checked
    assert len(oracles) >= len(qs) - 2
