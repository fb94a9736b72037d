#!/usr/bin/env python3
"""Dev-only pre-validation of SparkEntry.queries vs oracleSql (mimics the
driver's DuckDB compare). NOT part of the engine — the engine is pure
Scala/Spark; this script only replicates the driver-side check loop so we
catch oracle mismatches before the round gate.

Usage: python3 scripts/check.py [sfdir] [outdir]
(Expects `sbt "runMain graft.Verify <sfdir> <outdir>"` to have been run.)
"""
import json, sys, glob, os
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark result parquet"); fails += 1; continue
    spark_df = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    d = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: schema {list(s.columns)} vs {list(d.columns)}"); fails += 1; continue
    # strict dtype compare (int32-vs-int64 etc. may fail a strict driver)
    sd = con.sql(f"DESCRIBE SELECT * FROM read_parquet({files!r})").df()
    dd = con.sql(f"DESCRIBE {oracle[name]}").df()
    smap = dict(zip(sd.column_name, sd.column_type))
    dmap = dict(zip(dd.column_name, dd.column_type))
    dt = {c: (smap.get(c), dmap.get(c)) for c in smap if smap.get(c) != dmap.get(c)}
    if dt:
        print(f"FAIL {name}: dtype mismatch {dt}"); fails += 1; continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows {len(s)} vs {len(d)}"); fails += 1; continue
    # exact value compare (the driver hashes; equality is the strong form)
    try:
        import pandas as pd
        pd.testing.assert_frame_equal(
            s.reset_index(drop=True), d.reset_index(drop=True),
            check_dtype=False, check_exact=True)
        print(f"ok   {name}: {len(s)} rows")
    except AssertionError as e:
        print(f"FAIL {name}: values differ\n{str(e)[:500]}"); fails += 1

# rows-only queries (no oracle): just confirm they produced output
for p in sorted(glob.glob(f"{outdir}/*/")):
    name = os.path.basename(p.rstrip("/"))
    if name not in oracle:
        n = con.sql(f"SELECT count(*) FROM read_parquet('{p}*.parquet')").fetchone()[0]
        print(f"rows {name}: {n} rows (no oracle)")

print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
