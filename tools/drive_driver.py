"""Simulate the driver harness: plain default SparkSession, import
__spark_entry__, smoke entry(), then run every queries() entry at sf0.01
against its oracle_sql() in DuckDB (order-insensitive value multiset)."""
import sys, datetime as dt, decimal, math
from collections import Counter
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import duckdb

spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
import __spark_entry__ as E

df = E.entry(spark)
rows = df.collect()
print(f"ENTRY: {len(rows)} rows, schema={[f.name for f in df.schema]}")
assert len(rows) > 0

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.01/{t}.parquet'")

def norm(v):
    # exact reprs (no rounding): predicts the driver's representation-
    # sensitive value hash (see VERDICT r1 "What's wrong" #1)
    if isinstance(v, decimal.Decimal): return str(v)
    if isinstance(v, float): return repr(v)
    if isinstance(v, dt.datetime): return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)): return tuple(norm(x) for x in v)
    return v

qs, os_ = E.queries(), E.oracle_sql()
fail = 0
for name in sorted(qs):
    sdf = qs[name](spark, "/root/testdata/sf0.01")
    scols = sdf.columns; srows = [tuple(r) for r in sdf.collect()]
    if name not in os_:
        print(f"  {name}: rows-only ({len(srows)} rows)"); continue
    rel = con.sql(os_[name]); dcols = rel.columns; drows = rel.fetchall()
    so = sorted(range(len(scols)), key=lambda i: scols[i].lower())
    do = sorted(range(len(dcols)), key=lambda i: dcols[i].lower())
    ok_cols = [scols[i].lower() for i in so] == [dcols[i].lower() for i in do]
    ms = Counter(tuple(norm(r[i]) for i in so) for r in srows)
    md = Counter(tuple(norm(r[i]) for i in do) for r in drows)
    ok = ok_cols and len(srows)==len(drows) and ms==md
    print(f"  {name}: {'OK' if ok else 'MISMATCH'} ({len(srows)} rows)")
    if not ok:
        fail += 1
        if not ok_cols: print(f"    cols spark={scols} duck={dcols}")
        print(f"    spark-only={list((ms-md).items())[:2]}")
        print(f"    duck-only={list((md-ms).items())[:2]}")
print("RESULT:", "ALL OK" if fail==0 else f"{fail} FAILURES")
