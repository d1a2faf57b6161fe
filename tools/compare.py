#!/usr/bin/env python3
"""Local stand-in for the driver's duckdb-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
Reads each <out>/<name> parquet dir + <out>/oracle_sql.json, registers the
sf tables as duckdb views, runs the oracle SQL, and compares (columns
sorted by name, rows sorted, exact value equality).
"""
import json
import os
import sys
import glob

import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[: -len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    got = con.sql(f"SELECT * FROM '{d}/*.parquet'")
    cols = sorted(got.columns)
    got_rows = con.sql(f"SELECT {', '.join(cols)} FROM got ORDER BY ALL").fetchall()
    if name not in oracles:
        print(f"{name}: NO ORACLE (rows={len(got_rows)})")
        continue
    exp = con.sql(oracles[name])
    ecols = sorted(exp.columns)
    if ecols != cols:
        print(f"{name}: SCHEMA MISMATCH got={cols} exp={ecols}")
        fails += 1
        continue
    exp_rows = con.sql(f"SELECT {', '.join(ecols)} FROM exp ORDER BY ALL").fetchall()
    if got_rows == exp_rows:
        print(f"{name}: OK ({len(got_rows)} rows)")
    else:
        fails += 1
        print(f"{name}: MISMATCH got {len(got_rows)} rows, exp {len(exp_rows)} rows")
        shown = 0
        for g, e in zip(got_rows, exp_rows):
            if g != e and shown < 5:
                shown += 1
                print(f"   got {g}\n   exp {e}")
sys.exit(1 if fails else 0)
