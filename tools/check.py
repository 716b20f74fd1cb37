#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Round-2 lesson: the driver hashes REPRESENTATIONS, not numerics — it loads
both sides into pandas, sorts columns by name, sort_values the rows, and
hashes the stringified cells. A Spark DECIMAL(28,4) vs DuckDB DECIMAL(38,4)
(equal values), or DuckDB's HUGEINT window sums (pandas float64 '1.0' vs
Spark int64 '1'), or any array-typed cell (crashes pandas sort_values) all
fail the driver even when every value is bit-equal. The old check.py
compared numerics and said 35/35 while the driver failed 7.

This version emulates the driver:
  1. HARD-FAIL any query whose output schema (either side) contains a
     DECIMAL, HUGEINT/UHUGEINT, or nested (list/struct/map) column — these
     are representation-unsafe regardless of values.
  2. Load both sides into pandas via DuckDB, sort columns by name,
     sort_values over all columns, stringify every cell, compare exactly.

Usage: tools/check.py [verify_out_dir] [sf_dir]
"""
import sys, json, glob, os

import duckdb

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

UNSAFE = ("DECIMAL", "HUGEINT", "[]", "STRUCT", "MAP", "LIST", "UNION")


def unsafe_types(rel):
    """Column -> DuckDB type string for representation-unsafe columns."""
    bad = {}
    for name, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        if any(u in t for u in UNSAFE):
            bad[name] = t
    return bad


def canon_df(rel):
    """Driver-style canonical form: pandas, columns sorted by name,
    rows sorted by all columns, every cell stringified."""
    df = rel.df()
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    df = df.reset_index(drop=True)
    return df.astype(str)


n_pass = n_fail = 0
for name in sorted(oracle):
    qdir = f"{OUT}/{name}"
    files = glob.glob(f"{qdir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output at {qdir}")
        n_fail += 1
        continue
    got_rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
    try:
        exp_rel = con.sql(oracle[name])
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        n_fail += 1
        continue

    # 1. representation-unsafe output schemas fail outright
    bad = {f"spark.{k}": v for k, v in unsafe_types(got_rel).items()}
    bad.update({f"oracle.{k}": v for k, v in unsafe_types(exp_rel).items()})
    if bad:
        print(f"FAIL {name}: representation-unsafe output types {bad} "
              f"(driver hashes representations: cast to DOUBLE/BIGINT or to_json)")
        n_fail += 1
        continue

    # 2. driver-style stringified compare
    try:
        got = canon_df(got_rel)
        exp = canon_df(exp_rel)
    except Exception as e:
        print(f"FAIL {name}: pandas canonicalization error (driver would err): {e}")
        n_fail += 1
        continue
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns differ spark={list(got.columns)} oracle={list(exp.columns)}")
        n_fail += 1
        continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rowcount spark={len(got)} oracle={len(exp)}")
        n_fail += 1
        continue
    neq = (got != exp)
    nbad = int(neq.values.sum())
    if nbad == 0:
        print(f"PASS {name}: {len(got)} rows exact (stringified)")
        n_pass += 1
    else:
        ridx = neq.any(axis=1).idxmax()
        print(f"FAIL {name}: {nbad} cells differ; first row {ridx}: "
              f"spark={got.iloc[ridx].to_dict()} oracle={exp.iloc[ridx].to_dict()}")
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
