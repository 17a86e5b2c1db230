#!/usr/bin/env python3
"""Cross-engine pin for the token-count mirror.

The Spark side (TextAnalysis.tokenCount) counts \\S+ runs with
trimmed-empty input counting 1; every oracle mirrors it with
  CASE WHEN len(trim(x)) = 0 THEN 1
       ELSE len(regexp_extract_all(trim(x), '\\S+')) END
This script runs that exact CASE form in DuckDB over the divergence
inputs pinned by TokenCountParitySpec and asserts the same values, so
the VALUE-identical claim is checked in both engines, including the
tab/newline edges where the old split-based mirror disagreed.
Run: python3 tools/token_mirror_check.py
"""
import duckdb

# keep in sync with TokenCountParitySpec.pins
PINS = [
    ("a b", 2),
    ("  a  b  ", 2),
    ("\ta b", 2),
    ("a b\n", 2),
    ("\t", 0),
    ("\n\t\n", 0),
    ("", 1),
    ("   ", 1),
    ("one", 1),
    ("\t\na  b\t", 2),
]

CASE = ("CASE WHEN len(trim(x)) = 0 THEN 1 "
        "ELSE len(regexp_extract_all(trim(x), '\\S+')) END")

def main():
    con = duckdb.connect()
    bad = []
    for text, want in PINS:
        got = con.execute(f"SELECT {CASE} FROM (SELECT ? AS x)", [text]).fetchone()[0]
        if got != want:
            bad.append((repr(text), want, got))
    # null propagates
    got = con.execute(f"SELECT {CASE} FROM (SELECT CAST(NULL AS VARCHAR) AS x)").fetchone()[0]
    if got is not None:
        bad.append(("NULL", None, got))
    if bad:
        for t, w, g in bad:
            print(f"FAIL {t}: want {w}, duckdb says {g}")
        raise SystemExit(1)
    print(f"{len(PINS) + 1} pins OK — DuckDB CASE mirror matches tokenCount on all divergence inputs")

if __name__ == "__main__":
    main()
