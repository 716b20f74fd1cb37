#!/usr/bin/env python3
"""Assemble CORRECTNESS_sf0.1_final.json from a tools/check.py log.

Usage: tools/mk_correctness_artifact.py <check_log> <out_json> \
           <verify_wall_s> <check_wall_s>

The per-query entries mirror the driver's CORRECTNESS_r*.json shape
(rows/schema/hash booleans + row counts); check.py's PASS line implies
all three matched with equal counts, and any FAIL line aborts the
assembly — this artifact only ever records a fully-green gate.
"""
import json, re, sys

log, out, vwall, cwall = sys.argv[1:5]
entries = {}
for line in open(log):
    m = re.match(r"PASS (\S+): (\d+) rows exact", line)
    if m:
        entries[m.group(1)] = {
            "rows_match": True, "schema_match": True, "hash_match": True,
            "spark_rows": int(m.group(2)), "oracle_rows": int(m.group(2)),
            "err": None}
        continue
    if line.startswith("FAIL"):
        sys.exit(f"refusing to record a non-green gate: {line.strip()}")
tail = [l for l in open(log) if re.match(r"\d+ pass, \d+ fail", l)]
assert tail and tail[-1].strip().endswith("0 fail"), tail
n = int(tail[-1].split()[0])
assert n == len(entries), (n, len(entries))
doc = {"_meta": {
    "sf_dir": "/root/testdata/sf0.1",
    "date": "2026-08-15",
    "produced_by": [
        "tools/run_verify.sh /root/testdata/sf0.1 /tmp/graft_verify_sf01",
        "python3 tools/check.py /tmp/graft_verify_sf01 /root/testdata/sf0.1"],
    "verify_dump_wall_s": float(vwall),
    "duckdb_check_wall_s": float(cwall),
    "n_pass": n, "n_fail": 0}}
doc.update(dict(sorted(entries.items())))
json.dump(doc, open(out, "w"), indent=1)
print(f"wrote {out}: {n} green queries")
