#!/usr/bin/env python3
"""Build a CORRECTNESS_sf{N}_r{R}.json artifact from a Verify dump.

Usage: python3 tools/scale_correctness.py <sfDir> <verifyOutDir> <outJson> <note> [names...]

Mirrors tools/check.py's DuckDB compare (same canonicalization) but
emits the committed artifact shape the cross-scale evidence chain uses:
{_meta: {...}, queries: {name: {rows_match, schema_match, hash_match,
rows, err}}}. Dev tooling only.
"""
import json, sys, glob, os, datetime
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def main(sf_dir, out_dir, out_json, note, names):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            pat = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if names:
        oracles = {k: v for k, v in oracles.items() if k in names}
    res = {}
    for name in sorted(oracles):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        entry = {"rows_match": False, "schema_match": False,
                 "hash_match": False, "rows": 0, "err": None}
        try:
            if not files:
                raise RuntimeError("no spark output")
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            exp = canon(con.execute(oracles[name]).fetchdf())
            entry["rows"] = len(got)
            entry["schema_match"] = list(got.columns) == list(exp.columns)
            entry["rows_match"] = len(got) == len(exp)
            if entry["schema_match"] and entry["rows_match"]:
                pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                              check_exact=True)
                entry["hash_match"] = True
        except Exception as e:
            entry["err"] = str(e).splitlines()[0][:300]
        res[name] = entry
        tag = "PASS" if entry["hash_match"] else "FAIL"
        print(f"{tag}  {name} ({entry['rows']} rows)"
              + (f" err={entry['err']}" if entry["err"] else ""))
    art = {"_meta": {"fixture": sf_dir, "round": 13,
                     "date": datetime.date.today().isoformat(),
                     "note": note},
           "queries": res}
    with open(out_json, "w") as f:
        json.dump(art, f, indent=1)
        f.write("\n")
    n_bad = sum(1 for v in res.values() if not v["hash_match"])
    print(f"wrote {out_json}: {len(res)-n_bad}/{len(res)} hash-match")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4],
                  set(sys.argv[5:])))
