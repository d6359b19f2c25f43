#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Reads each Spark result parquet in OUT_DIR, runs the matching oracle SQL
from oracle_sql.json in DuckDB over the same test tables, and compares:
row count, column names, and values (columns sorted by name, rows in
result order; exact match, with float cells compared bit-exactly).

Usage: tools/check.py [sfDir] [outDir]
"""
import json, sys, glob, os
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
n_pass = n_fail = 0
for q, sql in sorted(oracle.items()):
    res_dir = f"{out}/{q}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"FAIL {q}: no spark result written"); n_fail += 1; continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {q}: {e}"); n_fail += 1; continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        print(f"FAIL {q}: columns {gc} != {ec}"); n_fail += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {q}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
    got, exp = got[gc], exp[ec]
    bad = []
    for c in gc:
        a, b = got[c], exp[c]
        try:
            if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
                neq = ~((a == b) | (a.isna() & b.isna()))
            else:
                neq = ~((a.astype(str) == b.astype(str)) | (a.isna() & b.isna()))
            if neq.any():
                i = int(neq.idxmax())
                bad.append(f"{c}[row {i}]: spark={a[i]!r} oracle={b[i]!r} "
                           f"({neq.sum()} cells)")
        except Exception as e:
            bad.append(f"{c}: compare error {e}")
    if bad:
        print(f"FAIL {q}: " + "; ".join(bad[:3])); n_fail += 1
    else:
        # dtype note (schema strictness unknown in driver; warn only)
        dt = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in gc
              if str(got[c].dtype) != str(exp[c].dtype)]
        note = f"  [dtype diff: {dt}]" if dt else ""
        print(f"PASS {q} ({len(got)} rows){note}"); n_pass += 1

print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
