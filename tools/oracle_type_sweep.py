"""Sweep every registered oracle's DuckDB result types and flag columns whose
type the driver's pandas materialization renders differently from Spark's
collect(): HUGEINT/UHUGEINT (pandas fetchdf -> float64, so 150.0 vs 150) and
DECIMAL (pandas -> decimal.Decimal objects). Root cause of all 8 driver
hash-fails in rounds 1-3 (VERDICT r3 "What's wrong" item 1).

Allowed result types: BIGINT, INTEGER, SMALLINT, TINYINT, DOUBLE, FLOAT,
VARCHAR, TIMESTAMP*, DATE, BOOLEAN, and LIST/STRUCT thereof.

Usage: python tools/oracle_type_sweep.py [sf_dir]
Exit 1 if any oracle emits a flagged column.
"""
import sys

sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as E

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# LIST/STRUCT/MAP are fragile the same way HUGEINT is: pandas materializes
# DuckDB LIST as numpy arrays, whose str() ('[1 2]') differs from the
# Python list Spark's collect() yields ('[1, 2]').
BAD = ("HUGEINT", "UHUGEINT", "DECIMAL", "[]", "STRUCT", "MAP")


def flagged_cols(rel):
    out = []
    for name, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        if any(b in t for b in BAD):
            out.append((name, t))
    return out


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    oracles = E.oracle_sql()
    n_bad = 0
    for name in sorted(oracles):
        try:
            rel = con.sql(oracles[name])
            bad = flagged_cols(rel)
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            print(f"  {name}: ERROR {exc}")
            n_bad += 1
            continue
        if bad:
            n_bad += 1
            cols = ", ".join(f"{c}:{t}" for c, t in bad)
            print(f"  {name}: {cols}")
    print(f"SWEEP: {len(oracles)} oracles, {n_bad} with driver-fragile column types")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
