#!/usr/bin/env python3
"""Median-of-3 bench-of-record selection (round-18 protocol, r17 verdict #4).

Reads three same-boot quiet sf0.1 rep files (the full-precision JSON line
graft.Bench writes via SPARK_GRAFT_BENCH_OUT), copies the rep with the
MEDIAN total verbatim to the bench-of-record path (so the downstream
format is unchanged — it IS a real run, not a synthetic average), and
writes a summary artifact with all three totals, the median/min/max, and
the spread the median absorbs.

Usage: bench_median.py rep1.json rep2.json rep3.json record_out summary_out
"""
import json
import shutil
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    reps = sys.argv[1:4]
    record_out, summary_out = sys.argv[4], sys.argv[5]
    parsed = [(p, load(p)) for p in reps]
    for p, d in parsed:
        if d.get("errors"):
            sys.exit(f"rep {p} has query errors: {d['errors']}")
        if d.get("load_stamp") not in (None, "quiet"):
            sys.exit(f"rep {p} load_stamp is {d['load_stamp']!r}, not quiet")
    by_total = sorted(parsed, key=lambda pd: pd[1]["value"])
    median_path, median = by_total[1]
    totals = [d["value"] for _, d in parsed]
    lo, hi = by_total[0][1]["value"], by_total[2][1]["value"]
    shutil.copyfile(median_path, record_out)
    summary = {
        "protocol": "median-of-3 same-boot quiet sf0.1 reps (r17 verdict #4): "
                    "the record is the median rep copied verbatim; min/max "
                    "recorded so round-over-round deltas inside the band "
                    "need no adjudication",
        "reps": {p: d["value"] for p, d in parsed},
        "median_sec": median["value"],
        "min_sec": lo,
        "max_sec": hi,
        "spread_pct": round(100.0 * (hi - lo) / lo, 1),
        "record_path": record_out,
        "median_rep": median_path,
    }
    with open(summary_out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"[median] totals={['%.1f' % t for t in totals]} -> "
          f"median {median['value']:.1f} s ({median_path}) -> {record_out}")


if __name__ == "__main__":
    main()
