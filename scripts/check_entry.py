"""Driver-mimic: run every queries() entry at the given SF and compare to
its oracle_sql() via DuckDB — row count, schema width, and order-insensitive
value equality with columns sorted by name (the driver's procedure)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from citykg.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:] if len(sys.argv) > 2 else None

spark = get_spark("check-entry", master="local[16]", shuffle_partitions=16)
# the round driver runs with Spark 4's ANSI default ON — mirror it so
# overflow/array-index bugs surface here, not in CORRECTNESS_r{N}
spark.conf.set("spark.sql.ansi.enabled", "true")
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs = entrymod.queries()
oracles = entrymod.oracle_sql()
fails = []
for name, fn in qs.items():
    if ONLY and name not in ONLY:
        continue
    t0 = time.time()
    try:
        sdf = fn(spark, SF)
        pdf = sdf.toPandas()
    except Exception as ex:
        print(f"FAIL  {name:24s} spark error: {str(ex)[:200]}")
        fails.append(name)
        continue
    if name not in oracles:
        print(f"rows  {name:24s} {len(pdf):7d} rows (rows-only) {time.time()-t0:5.1f}s")
        continue
    try:
        odf = con.execute(oracles[name]).df()
    except Exception as ex:
        print(f"FAIL  {name:24s} oracle error: {str(ex)[:200]}")
        fails.append(name)
        continue
    cols = sorted(pdf.columns)
    if sorted(odf.columns) != cols:
        print(f"FAIL  {name:24s} schema: spark={sorted(pdf.columns)} duck={sorted(odf.columns)}")
        fails.append(name)
        continue
    a = pdf[cols].copy()
    b = odf[cols].copy()
    dtype_bad = []
    for c in cols:
        if a[c].dtype != b[c].dtype:
            # int-vs-float is exactly the class the driver's value-hash
            # rejects (DuckDB HUGEINT -> float64 vs Spark bigint)
            if {a[c].dtype.kind, b[c].dtype.kind} == {"i", "f"} or \
               {a[c].dtype.kind, b[c].dtype.kind} == {"u", "f"}:
                dtype_bad.append(f"{c}: spark={a[c].dtype} duck={b[c].dtype}")
            try:
                b[c] = b[c].astype(a[c].dtype)
            except Exception:
                a[c] = a[c].astype(str)
                b[c] = b[c].astype(str)
    if dtype_bad:
        print(f"FAIL  {name:24s} dtype kind mismatch: {dtype_bad}")
        fails.append(name)
        continue
    a = a.fillna("<N>").sort_values(cols).reset_index(drop=True)
    b = b.fillna("<N>").sort_values(cols).reset_index(drop=True)
    ok = len(a) == len(b) and a.equals(b)
    status = "OK  " if ok else "FAIL"
    print(f"{status}  {name:24s} {len(a):7d} vs {len(b):7d} rows  {time.time()-t0:5.1f}s")
    if not ok:
        fails.append(name)
        if len(a) == len(b):
            neq = (a != b).any(axis=1)
            print(pd.concat([a[neq].head(3), b[neq].head(3)]).to_string()[:1500])
        else:
            m = a.merge(b, how="outer", indicator=True, on=cols)
            print(m[m["_merge"] != "both"].head(6).to_string()[:1500])

print("\n%d/%d FAILED: %s" % (len(fails), len([n for n in qs if not ONLY or n in ONLY]), fails))
spark.stop()
sys.exit(1 if fails else 0)
