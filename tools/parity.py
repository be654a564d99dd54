#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir> [--only-present]

Reads each <verifyOutDir>/<name>/ spark parquet result, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares values with columns sorted by name and rows sorted by all
columns (order-insensitive, like the driver's hash).

--only-present: skip oracle entries whose dump dir does not exist — for
checking a SUBSET Verify run (3rd-arg name filter) without every absent
query counting as FAIL. An EMPTY dump dir (query ran, wrote nothing)
still fails. The driver always runs full Verify, so its compare never
skips.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def main(sf_dir, out_dir, only_present=False):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    n_skip = 0
    for name in sorted(oracles):
        if only_present and not os.path.isdir(f"{out_dir}/{name}"):
            n_skip += 1
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows {len(s)} vs {len(d)}")
            n_fail += 1
            continue
        # the driver also checks schema: dtype drift (int32 vs int64,
        # float vs decimal) is a FAILURE here even when the string repr
        # matches — the driver's schema check would fail on it
        sd, dd = list(map(str, s.dtypes)), list(map(str, d.dtypes))
        if sd != dd:
            diff = [(c, a, b) for c, a, b in zip(s.columns, sd, dd) if a != b]
            print(f"FAIL {name}: dtype drift {diff}")
            n_fail += 1
            continue
        # exact string-repr compare per cell
        mism = None
        for c in s.columns:
            sv, dv = s[c].astype(str), d[c].astype(str)
            bad = sv != dv
            if bad.any():
                i = bad.idxmax()
                mism = (c, i, sv[i], dv[i])
                break
        if mism:
            c, i, a, b = mism
            print(f"FAIL {name}: col {c} row {i}: spark={a!r} duck={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows, {len(s.columns)} cols)")
            n_pass += 1
    # queries with no oracle: rows-only check
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracles:
            files = sorted(glob.glob(f"{d}/*.parquet"))
            n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
            print(f"INFO {name}: no oracle, {n} rows")
    skipped = f" ({n_skip} absent skipped)" if n_skip else ""
    print(f"\n{n_pass} pass / {n_fail} fail{skipped}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sys.exit(main(args[0], args[1],
                  only_present="--only-present" in sys.argv))
