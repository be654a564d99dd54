#!/usr/bin/env python3
"""Compare two Verify output dirs cell-by-cell (parallelism-determinism
sweep): run graft.Verify twice with different SPARK_GRAFT_CPUS into two
dirs, then `python3 tools/determinism.py dirA dirB`. Rows are sorted by
all columns before comparison, so partitioning may reorder rows but
never change them; any value difference is a determinism bug (arrival-
order-dependent aggregation, float summation order, etc.)."""
import os
import sys

import duckdb

a, b = sys.argv[1], sys.argv[2]
con = duckdb.connect()
names = sorted(d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d)))
bad = 0
for n in names:
    pa, pb = os.path.join(a, n), os.path.join(b, n)
    if not os.path.isdir(pb):
        print(f"MISSING {n} in {b}")
        bad += 1
        continue
    try:
        ra = con.sql(f"SELECT * FROM '{pa}/*.parquet'").df()
        rb = con.sql(f"SELECT * FROM '{pb}/*.parquet'").df()
        cols = sorted(ra.columns)
        ra = ra[cols].sort_values(cols, na_position="first").reset_index(drop=True)
        rb = rb[cols].sort_values(cols, na_position="first").reset_index(drop=True)
        if not ra.equals(rb):
            print(f"DIFF {n}: {len(ra)} vs {len(rb)} rows")
            bad += 1
    except Exception as e:  # surface, never skip silently
        print(f"ERROR {n}: {e}")
        bad += 1
print(f"{len(names) - bad} identical / {bad} different of {len(names)}")
sys.exit(1 if bad else 0)
