#!/usr/bin/env python3
"""Dev-only emulation of the driver's DuckDB-oracle correctness gate.

Usage:  python3 tools/oracle_check.py [verify_out_dir] [sf_dir]

Reads each <out>/<name> parquet (written by graft.Verify), runs the paired
oracle SQL from <out>/oracle_sql.json in DuckDB against views over the
fixture parquet tables, and diffs: row count, column names, and values
(exact for non-floats; exact-then-tolerant report for floats). This is NOT
shipped code — the Scala library never depends on it.
"""
import sys, json, glob, os, math
import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        return v
    return v

def cmp_cell(a, b):
    """exact -> 0, tolerant-float -> 1, mismatch -> 2"""
    if a == b:
        return 0
    try:
        fa, fb = float(a), float(b)
        if math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9):
            return 1
        return 2
    except (TypeError, ValueError):
        return 2

n_exact = n_tol = n_bad = n_noorc = n_err = 0
for d in sorted(glob.glob(f"{out}/*/")):
    name = os.path.basename(d.rstrip("/"))
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        print(f"[MISS ] {name}: no parquet output"); n_err += 1; continue
    got = con.execute(
        f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table().to_pylist()
    if name not in oracle:
        print(f"[NOORC] {name}: rows={len(got)} (rows-only check)"); n_noorc += 1
        continue
    try:
        exp = con.execute(oracle[name]).fetch_arrow_table().to_pylist()
    except Exception as e:
        print(f"[OERR ] {name}: oracle failed: {e}"); n_err += 1; continue
    if len(got) != len(exp):
        print(f"[ROWS ] {name}: spark={len(got)} oracle={len(exp)}"); n_bad += 1
        continue
    gcols = sorted(got[0].keys()) if got else []
    ecols = sorted(exp[0].keys()) if exp else []
    if gcols != ecols:
        print(f"[COLS ] {name}: spark={gcols} oracle={ecols}"); n_bad += 1
        continue
    # driver sorts columns by name; rows are compared in query order with a
    # row-sort fallback — we compare in order (queries are ORDER BY'd).
    worst, where = 0, None
    for i, (g, e) in enumerate(zip(got, exp)):
        for c in gcols:
            r = cmp_cell(g[c], e[c])
            if r > worst:
                worst, where = r, (i, c, g[c], e[c])
            if r == 2:
                break
        if worst == 2:
            break
    if worst == 0:
        print(f"[OK   ] {name}: {len(got)} rows exact"); n_exact += 1
    elif worst == 1:
        print(f"[TOL  ] {name}: {len(got)} rows float-tolerant at {where}"); n_tol += 1
    else:
        print(f"[BAD  ] {name}: first diff {where}"); n_bad += 1

print(f"\nexact={n_exact} tol={n_tol} bad={n_bad} noorc={n_noorc} err={n_err}")
sys.exit(1 if (n_bad or n_err) else 0)
