#!/usr/bin/env python3
"""Build a CORRECTNESS_sf{1,10}-style decade artifact from a Verify dump.

Usage: python3 tools/decade.py <sfDir> <verifyOutDir> <outJson> <note> q... [q...]

Runs tools/check.py per query under a per-query timeout (DuckDB oracle
cost at 10x/100x varies wildly by query) and records one row per query.
Dev tooling only.
"""
import json, subprocess, sys, glob
import pandas as pd

TIMEOUT_S = 2400

def main(sf_dir, out_dir, out_json, note, names):
    rows = {}
    for name in names:
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        n_rows = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        try:
            p = subprocess.run(
                [sys.executable, "tools/check.py", sf_dir, out_dir, name],
                capture_output=True, text=True, timeout=TIMEOUT_S)
            out = p.stdout
            ok = f"PASS     {name}" in out
            err = None if ok else (out.strip().splitlines() or ["no output"])[-2:-1] or ["?"]
        except subprocess.TimeoutExpired:
            ok, err = False, [f"oracle timeout > {TIMEOUT_S}s"]
        rows[name] = {
            "rows_match": ok, "schema_match": ok, "hash_match": ok,
            "rows": int(n_rows),
            "err": None if ok else "; ".join(err),
        }
        print(f"[decade] {name}: {'PASS' if ok else 'FAIL ' + str(err)} ({n_rows} rows)")
    artifact = {
        "_meta": {"fixture": sf_dir, "round": 12, "date": "2026-08-15",
                  "note": note},
        "queries": rows,
    }
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(f"[decade] wrote {out_json}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5:])
