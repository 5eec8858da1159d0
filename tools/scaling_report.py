#!/usr/bin/env python3
"""Builds the measured scaling table from per-sf BENCH_full.json copies.

Usage: python3 tools/scaling_report.py out.md sf0.001=path sf0.01=path ...

For each query: wall seconds per tier plus the slope between adjacent
tiers (t_hi / t_lo). Data volume grows ~10x per official tier for the
relational/stream tables (documents/embeddings grow 1x/1x/10x/4x — see
TESTDATA.md), so a slope well below 10 means fixed overheads dominate
(fine), ~linear-in-rows is the design target, and clearly super-linear
slopes need an explanation or a fix.
"""
import json
import sys


def main(out_path, *pairs):
    tiers = []
    for p in pairs:
        name, path = p.split("=", 1)
        with open(path) as fh:
            j = json.load(fh)
        tiers.append((name, j["queries"], j.get("errors", {})))
    names = sorted({q for _, qs, _ in tiers for q in qs})
    lines = []
    lines.append("| query | " + " | ".join(n for n, _, _ in tiers)
                 + " | " + " | ".join(f"slope {tiers[i][0]}→{tiers[i+1][0]}"
                                      for i in range(len(tiers) - 1)) + " |")
    lines.append("|" + "---|" * (1 + len(tiers) + len(tiers) - 1))
    totals = [sum(qs.values()) for _, qs, _ in tiers]
    for q in names:
        vals = [qs.get(q) for _, qs, _ in tiers]
        cells = [f"{v:.2f}" if v is not None else "—" for v in vals]
        slopes = []
        for i in range(len(vals) - 1):
            if vals[i] and vals[i + 1]:
                slopes.append(f"{vals[i+1]/vals[i]:.1f}x")
            else:
                slopes.append("—")
        lines.append(f"| {q} | " + " | ".join(cells) + " | " + " | ".join(slopes) + " |")
    lines.append(f"| **total** | " + " | ".join(f"**{t:.1f}**" for t in totals)
                 + " | " + " | ".join(f"{totals[i+1]/totals[i]:.1f}x"
                                      for i in range(len(totals) - 1)) + " |")
    errs = {n: e for n, _, e in tiers if e}
    if errs:
        lines.append("")
        lines.append(f"Errors: {errs}")
    with open(out_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines[:5]))
    print(f"... wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1], *sys.argv[2:])
