#!/usr/bin/env python3
"""Refresh BENCH_BAND.json medians from one or more bench.json runs.

Usage: python3 tools/refresh_band.py bench_run1.json [bench_run2.json ...]

Takes the per-query MEDIAN across the given runs (each bench.json's
per-query value is already a median of its reps) and rewrites the
medians section of BENCH_BAND.json, preserving factor/abs_slack/allow.
Dev tooling only — run on a quiet box; the band is the committed
regression gate BenchBandSpec asserts against.
"""
import json, sys, statistics

def main(paths):
    runs = []
    for p in paths:
        with open(p) as f:
            runs.append(json.load(f)["queries"])
    names = sorted(set().union(*[set(r) for r in runs]))
    with open("BENCH_BAND.json") as f:
        band = json.load(f)
    med = {}
    for n in names:
        vals = [float(r[n]) for r in runs if n in r]
        med[n] = round(statistics.median(vals), 3)
    band["medians"] = med
    band["_comment"] = band["_comment"].split(" medians:")[0] + \
        f" medians: refreshed from {len(paths)} quiet-box run(s), {len(names)} queries."
    with open("BENCH_BAND.json", "w") as f:
        json.dump(band, f, indent=1)
        f.write("\n")
    print(f"[band] wrote {len(names)} medians")

if __name__ == "__main__":
    main(sys.argv[1:])
