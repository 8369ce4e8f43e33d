#!/usr/bin/env python3
"""Build bench_recorded.json from N bench_full.json run files: per-query
min across runs, plus run totals in the note.

Usage: python3 tools/record_bench.py out.json note-prefix run1.json run2.json ...
"""
import json
import sys


def main():
    out_path, note_prefix = sys.argv[1], sys.argv[2]
    runs = [json.load(open(p)) for p in sys.argv[3:]]
    names = set()
    for r in runs:
        names.update(r["queries"].keys())
    mins = {}
    for n in sorted(names):
        vals = [r["queries"][n] for r in runs
                if n in r["queries"] and r["queries"][n] >= 0]
        if vals:
            mins[n] = min(vals)
    totals = "/".join(f"{sum(r['queries'].values()):.1f}" for r in runs)
    rec = {
        "total": sum(mins.values()),
        "sf": runs[0].get("sf", "/root/testdata/sf0.1"),
        "note": f"{note_prefix} (run totals {totals} s, {len(mins)} "
                f"queries, min-of-{len(runs)})",
        "queries": mins,
    }
    json.dump(rec, open(out_path, "w"))
    print(f"{out_path}: {rec['total']:.1f}s over {len(mins)} queries "
          f"({rec['total']/len(mins):.3f} s/query)")


if __name__ == "__main__":
    main()
