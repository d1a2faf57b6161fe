#!/usr/bin/env python3
"""Local stand-in for the driver's duckdb-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [--dump-types]
Reads each <out>/<name> parquet dir + <out>/oracle_sql.json, registers the
sf tables as duckdb views, runs the oracle SQL, and compares (columns
sorted by name, rows sorted, exact value equality).

--dump-types additionally prints the Arrow type of every column on BOTH
sides — the driver hashes are TYPE-AWARE, so a DuckDB HUGEINT
(decimal128) against a Spark BIGINT hash-mismatches on numerically
identical values (the r9/r10 q237 failure); this flag makes that skew
visible locally. A "TYPE SKEW" line is printed (and counted as a
failure) whenever the two sides' Arrow types differ.
"""
import json
import os
import sys
import glob

import duckdb

dump_types = "--dump-types" in sys.argv
args = [a for a in sys.argv[1:] if a != "--dump-types"]
sf, out = args[0], args[1]
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
    # type-aware check: the driver hashes bytes, not strings — a value-
    # equal decimal128 vs int64 pair still fails there, so fail it here
    got_t = {f.name: str(f.type)
             for f in con.sql("SELECT * FROM got").arrow().schema}
    exp_t = {f.name: str(f.type)
             for f in con.sql("SELECT * FROM exp").arrow().schema}
    if dump_types:
        for c in cols:
            mark = "" if got_t.get(c) == exp_t.get(c) else "   <-- SKEW"
            print(f"   [type] {name}.{c}: spark={got_t.get(c)} "
                  f"oracle={exp_t.get(c)}{mark}")
    skew = [c for c in cols if got_t.get(c) != exp_t.get(c)]
    if skew:
        fails += 1
        print(f"{name}: TYPE SKEW " + ", ".join(
            f"{c} spark={got_t.get(c)} oracle={exp_t.get(c)}" for c in skew))
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
