#!/usr/bin/env python3
"""Partitioning-independence audit (dev-only, like the oracle checkers).

Compares two graft.Verify dumps of the SAME code and fixtures produced
under DIFFERENT parallelism (e.g. SPARK_GRAFT_CPUS=16 vs 7 — different
partition counts, different merge orders). Every oracle-eligible query
must be cell-identical in order: reproducibility under repartitioning is
a correctness property at 100 TB (a plan whose answer depends on
partition count gives a different answer every time the cluster scales).

The known rows-only sketch queries (HLL / CMS / GK-percentile / theta /
Misra-Gries) are EXPECTED to differ — their state is merge-order
dependent by construction (SCALE.md "rows-only set is CLOSED at 6").
The audit fails if any other query differs, or if a sketch query's
difference would have been hidden by a hash oracle.

Usage: python3 tools/determinism_check.py <dumpA> <dumpB>
"""
import sys, glob, os
import duckdb

a, b = sys.argv[1], sys.argv[2]
ALLOWED_DIFF = {
    "agg_approx_distinct", "agg_approx_percentile", "agg_cms_freq",
    "agg_hll_sketch", "dd20_theta_overlap", "ta6_heavy_hitters",
}
con = duckdb.connect()
names = sorted(os.path.basename(d.rstrip("/"))
               for d in glob.glob(f"{a}/*/"))
bad, same, diff_ok = [], 0, []
for name in names:
    fa = glob.glob(f"{a}/{name}/*.parquet")
    fb = glob.glob(f"{b}/{name}/*.parquet")
    if not fa or not fb:
        bad.append((name, "missing dump")); continue
    ta = con.execute(f"SELECT * FROM read_parquet({fa!r})").fetch_arrow_table()
    tb = con.execute(f"SELECT * FROM read_parquet({fb!r})").fetch_arrow_table()
    if ta.column_names != tb.column_names:
        bad.append((name, "column mismatch")); continue
    if ta.num_rows != tb.num_rows:
        if name in ALLOWED_DIFF: diff_ok.append(name); continue
        bad.append((name, f"rows {ta.num_rows} vs {tb.num_rows}")); continue
    if ta.to_pylist() == tb.to_pylist():
        same += 1
    elif name in ALLOWED_DIFF:
        diff_ok.append(name)
    else:
        ra, rb = ta.to_pylist(), tb.to_pylist()
        first = next((i, c) for i, (x, y) in enumerate(zip(ra, rb))
                     if x != y for c in x if x[c] != y[c])
        bad.append((name, f"first diff row={first[0]} col={first[1]}"))

print(f"identical={same} sketch_diff_ok={sorted(diff_ok)} bad={len(bad)}")
for name, why in bad:
    print(f"[BAD ] {name}: {why}")
sys.exit(1 if bad else 0)
