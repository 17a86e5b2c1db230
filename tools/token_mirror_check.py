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


# q164's tokenizer mirror (round-9 ADVICE): both engines derive unigrams
# AND bigrams from one \S+-run token stream. The Spark side is
# regexp_extract_all(text, '\S+') + a pair UDF over the array; the
# DuckDB oracle is regexp_extract_all(text, '\S+') + a list
# comprehension. This pins the DuckDB forms against a Python \S+
# reference on exactly the whitespace-edged inputs where the OLD
# trim+split mirror diverged ('\ta b' gave DuckDB bigrams {' a','a b'}
# vs Spark {'a b'}).
Q164_INPUTS = [
    "a b c", "\ta b", "a b\n", "  a  b  ", "\t\na  b\tc ",
    "one", "", "\t", " \n x \t y \n ",
]

def check_q164_mirror():
    import re
    con = duckdb.connect()
    bad = []
    for text in Q164_INPUTS:
        toks = re.findall(r"\S+", text)
        want_uni = toks
        want_bi = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        got_uni = con.execute(
            "SELECT regexp_extract_all(?, '\\S+')", [text]).fetchone()[0]
        got_bi = con.execute(
            """SELECT CASE WHEN len(ws) >= 2 THEN
                 [ws[i] || ' ' || ws[i+1] for i in generate_series(1, len(ws)-1)]
               ELSE [] END
               FROM (SELECT regexp_extract_all(?, '\\S+') AS ws)""",
            [text]).fetchone()[0]
        if list(got_uni) != want_uni:
            bad.append((repr(text), "unigrams", want_uni, got_uni))
        if list(got_bi) != want_bi:
            bad.append((repr(text), "bigrams", want_bi, got_bi))
    if bad:
        for t, kind, w, g in bad:
            print(f"FAIL q164 {kind} {t}: want {w}, duckdb says {g}")
        raise SystemExit(1)
    print(f"{len(Q164_INPUTS)} q164 tokenizer inputs OK — DuckDB \\S+ mirror "
          "matches the Python/Spark token stream (unigrams and bigrams)")

if __name__ == "__main__":
    main()
    check_q164_mirror()
