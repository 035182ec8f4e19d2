#!/usr/bin/env python3
"""Partitioning-independence audit (dev-only, like the oracle checkers).

Compares two graft.Verify dumps of the SAME code and fixtures produced
under DIFFERENT parallelism (e.g. SPARK_GRAFT_CPUS=16 vs 7 — different
partition counts, different merge orders). Every query must be
cell-identical in order: reproducibility under repartitioning is a
correctness property at 100 TB (a plan whose answer depends on
partition count gives a different answer every time the cluster scales).

Through round 14 the 6 sketch queries (HLL / CMS / GK-percentile /
theta / Misra-Gries) were exempt — their DUMPED state was merge-order
dependent by construction. Round 15's ε-bounds upgrade removed the raw
estimates from every output column (the queries now surface exact
counterparts plus boolean bound verdicts, both partition-independent by
design), so the exemption is GONE: all 291 queries must be identical,
and a reappearing sketch diff is a regression this audit must catch,
not wave through (round-15 review finding). The sketch_diff_ok field
stays in the output line for artifact-format continuity; it must be [].

Usage: python3 tools/determinism_check.py <dumpA> <dumpB>
"""
import sys, glob, os
import duckdb

a, b = sys.argv[1], sys.argv[2]
ALLOWED_DIFF = set()  # empty since the round-15 ε-bounds upgrade
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
