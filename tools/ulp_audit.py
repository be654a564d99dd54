#!/usr/bin/env python3
"""ULP audit for oracle-side DOUBLE conversions (VERDICT r10 task 4).

DuckDB 1.0.0's direct HUGEINT/DECIMAL(38)->DOUBLE casts are not correctly
rounded above 2^53 (the round-10 q286 finding), while VARCHAR->DOUBLE
(strtod) is — and matches Spark's Decimal.toDouble / long->double bit for
bit. Product-class witnesses were VARCHAR-routed in r10; this tool audits
EVERY remaining site empirically instead of trusting per-site domain prose:

For each oracle in <verifyOutDir>/oracle_sql.json it builds a ROUTED
variant in which every `CAST(<expr> AS DOUBLE)` becomes
`CAST(CAST(<expr> AS VARCHAR) AS DOUBLE)` (balanced-paren rewrite, applied
to every site including nested ones), runs both against the <sfDir>
tables, and compares bit-exactly. Below 2^53 the two forms are
value-identical by construction, so ANY difference isolates a conversion
that crossed the non-correctly-rounded regime at this SF — the exact
failure mode, measured directly. Queries that match are PROVEN free of
mis-rounded conversions at the audited scale (no domain argument needed).

Usage: python3 tools/ulp_audit.py <sfDir> <verifyOutDir>
"""
import sys, json, os, math, re
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def route_all_double_casts(sql):
    """Rewrite every CAST(<expr> AS DOUBLE) -> CAST(CAST(<expr> AS VARCHAR)
    AS DOUBLE), innermost-last so nested sites all route. Returns
    (rewritten_sql, n_sites)."""
    n = 0
    i = 0
    out = sql
    # Word-boundary site detection (advisor r11): a raw "AS DOUBLE"
    # substring scan would also fire on aliases like `AS doubled` /
    # `AS double_x` and attempt a bogus rewrite.
    site = re.compile(r"\bAS\s+DOUBLE\b", re.IGNORECASE)
    while True:
        m = site.search(out, i)
        if m is None:
            break
        j = m.start()
        # scan back for the matching 'CAST('
        depth = 0
        k = j - 1
        start = None
        while k >= 0:
            c = out[k]
            if c == ')':
                depth += 1
            elif c == '(':
                if depth == 0:
                    # Require a STANDALONE CAST token: a bare
                    # endswith('CAST') would also match TRY_CAST (whose
                    # null-on-error semantics the rewrite must not touch).
                    if re.search(r"(?<![A-Za-z0-9_])CAST\s*\Z",
                                 out[:k], re.IGNORECASE):
                        start = k + 1
                    break
                depth -= 1
            k -= 1
        if start is None:
            i = j + 1
            continue
        inner = out[start:j].rstrip()
        if inner.upper().endswith('AS VARCHAR)'):
            i = j + 1  # already routed
            continue
        routed = f"CAST({inner} AS VARCHAR) "
        out = out[:start] + routed + out[j:]
        n += 1
        i = start + len(routed) + (m.end() - m.start())
    return out, n


def bitpattern(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return ("f%016x" % int.from_bytes(
            __import__("struct").pack(">d", v), "big"))
    return repr(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda c: cols[c])
    return sorted(tuple(bitpattern(r[c]) for c in order) for r in rows)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_same = n_diff = n_err = n_sites = 0
    for name in sorted(oracles):
        sql = oracles[name]
        routed, k = route_all_double_casts(sql)
        n_sites += k
        try:
            base = con.execute(sql)
            base_rows, base_cols = base.fetchall(), [d[0] for d in base.description]
            rr = con.execute(routed)
            r_rows, r_cols = rr.fetchall(), [d[0] for d in rr.description]
        except Exception as e:
            print(f"SKIP {name}: {str(e).splitlines()[0][:140]}")
            n_err += 1
            continue
        if canon(base_rows, base_cols) == canon(r_rows, r_cols):
            n_same += 1
        else:
            n_diff += 1
            print(f"DIFF {name}: direct vs VARCHAR-routed DOUBLE casts "
                  f"disagree bitwise ({k} sites) — a conversion crossed "
                  f"2^53 at this SF and is NOT correctly rounded")
    print(f"{n_same} bit-identical / {n_diff} diverging / {n_err} skipped; "
          f"{n_sites} unrouted CAST(... AS DOUBLE) sites audited")
    # SKIPs are failures (advisor r11): a malformed rewrite that makes an
    # oracle unrunnable silently removes it from audit coverage — the green
    # state is 0 skips, so any skip must fail the exit code loudly.
    return 1 if (n_diff or n_err) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
