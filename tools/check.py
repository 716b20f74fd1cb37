#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Reads each query's parquet output (written by graft.Verify), runs the
corresponding oracle SQL from oracle_sql.json in DuckDB over the same
testdata tables, sorts columns by name and rows by value, and compares
cell-by-cell. Reports exact mismatches and near-misses (float ulp noise)
separately, since we don't know the driver's tolerance — we aim for exact.

Usage: tools/check.py [verify_out_dir] [sf_dir]
"""
import sys, json, glob, math, os

import duckdb

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def _sort_cell(x):
    # Round floats before building the sort key so float noise between the
    # two engines cannot change row alignment (it would misalign the zip
    # compare and produce spurious FAILs the tolerance can't rescue).
    if isinstance(x, float):
        return f"{x:.6g}"
    return str(x)

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda r: tuple(_sort_cell(x) for x in r))

def cells_equal(a, b):
    if a is None or b is None:
        return a is None and b is None, False
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b), False
        if fa == fb or (math.isnan(fa) and math.isnan(fb)):
            return True, False
        close = abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
        return False, close
    return str(a) == str(b), False

n_pass = n_fail = 0
for name in sorted(oracle):
    qdir = f"{OUT}/{name}"
    files = glob.glob(f"{qdir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output at {qdir}")
        n_fail += 1
        continue
    got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
    gcols, grows = canon(got.fetchall(), [d[0] for d in got.description])
    try:
        exp = con.sql(oracle[name])
        ecols, erows = canon(exp.fetchall(), [d[0] for d in exp.description])
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        n_fail += 1
        continue
    if gcols != ecols:
        print(f"FAIL {name}: columns differ spark={gcols} oracle={ecols}")
        n_fail += 1
        continue
    if len(grows) != len(erows):
        print(f"FAIL {name}: rowcount spark={len(grows)} oracle={len(erows)}")
        n_fail += 1
        continue
    exact = near = bad = 0
    first_bad = None
    for gr, er in zip(grows, erows):
        for gx, ex in zip(gr, er):
            eq, close = cells_equal(gx, ex)
            if eq:
                exact += 1
            elif close:
                near += 1
            else:
                bad += 1
                if first_bad is None:
                    first_bad = (gr, er)
    if bad == 0 and near == 0:
        print(f"PASS {name}: {len(grows)} rows exact")
        n_pass += 1
    elif bad == 0:
        print(f"WARN {name}: {len(grows)} rows, {near} cells off by float noise only")
        n_pass += 1
    else:
        print(f"FAIL {name}: {bad} cells differ; first: spark={first_bad[0]} oracle={first_bad[1]}")
        n_fail += 1

# queries without an oracle: rows-only
for qdir in sorted(glob.glob(f"{OUT}/q*")):
    name = os.path.basename(qdir)
    if name in oracle:
        continue
    files = glob.glob(f"{qdir}/*.parquet")
    if not files:
        print(f"FAIL {name}: (rows-only) no output")
        n_fail += 1
        continue
    n = con.sql(f"SELECT count(*) FROM '{qdir}/*.parquet'").fetchone()[0]
    status = "PASS" if n > 0 else "FAIL"
    print(f"{status} {name}: (rows-only) {n} rows")
    if n > 0: n_pass += 1
    else: n_fail += 1

print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
