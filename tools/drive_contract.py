"""Driver-simulation: exercises the __spark_entry__ contract exactly as the
round driver does — entry() smoke, queries() vs oracle_sql() at sf0.01."""
import hashlib
import sys

sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as E
from multithreaded_map_reduce_library_spark.session import get_spark

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

n_pass = n_fail = n_weak = 0
for name, fn in sorted(qs.items()):
    sdf = fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [f.name for f in sdf.schema.fields]
    if name not in oracles:
        print(f"  {name}: rows-only check rows={len(srows)} (no oracle)")
        n_weak += 1
        continue
    orel = con.execute(oracles[name])
    ocols = [d[0] for d in orel.description]
    orows = [tuple(r) for r in orel.fetchall()]
    ok_count = len(srows) == len(orows)
    ok_schema = sorted(scols) == sorted(ocols)
    # EXACT comparison, no float normalization (round-3 tightening, VERDICT
    # r2 item 4): the round-2 gate rounded floats to 4dp before hashing,
    # which was provably weaker than the driver's own comparison and let
    # 5th/6th-decimal cross-engine disagreements through. After the
    # integer-grid sweep every displayed aggregate is exact, so nothing
    # legitimate needs the leniency.
    def norm(rows, cols):
        return [tuple(repr(v) if isinstance(v, float) else v for v in rec) for rec in rows]
    ok_hash = ok_schema and value_hash(scols, norm(srows, scols)) == value_hash(ocols, norm(orows, ocols))
    status = "PASS" if (ok_count and ok_schema and ok_hash) else "FAIL"
    if status == "PASS":
        n_pass += 1
    else:
        n_fail += 1
    print(f"  {name}: {status} rows={len(srows)}/{len(orows)} schema_ok={ok_schema} hash_ok={ok_hash}")
    if status == "FAIL" and ok_schema:
        print(f"    spark cols={scols}")
        print(f"    spark sample={sorted(norm(srows,scols))[:2]}")
        print(f"    oracle sample={sorted(norm(orows,ocols))[:2]}")
    elif status == "FAIL":
        print(f"    spark cols={sorted(scols)} oracle cols={sorted(ocols)}")

print(f"SUMMARY: pass={n_pass} fail={n_fail} rows_only={n_weak}")
sys.exit(1 if n_fail else 0)
