#!/usr/bin/env python3
"""Parse the wall-3 x1000 run console (tools/wall3_r18.sh ->
/tmp/wall3_r18.log) into the round's scratch artifact: the [scratch]
sampler series (t, free_gb, blockmgr_gb, reaped) reduced to the
per-reap-epoch high-water table that shows whether the iteration-scoped
shuffle reaping holds the scratch peak flat across iterations, plus the
[probe] result lines. Usage:

    python3 tools/wall3_parse.py /tmp/wall3_r18.log <free_at_start_gb> out.json
"""
import json
import re
import sys


def main() -> None:
    log_path, free_start, out_path = sys.argv[1], float(sys.argv[2]), sys.argv[3]
    samples = []
    probe_lines = []
    with open(log_path, errors="replace") as f:
        for line in f:
            m = re.search(
                r"\[scratch\] t=(\d+) free_gb=([\d.]+) blockmgr_gb=([\d.]+) reaped=(\d+)",
                line)
            if m:
                samples.append({
                    "t": int(m.group(1)),
                    "free_gb": float(m.group(2)),
                    "blockmgr_gb": float(m.group(3)),
                    "reaped": int(m.group(4)),
                })
            elif "[probe]" in line:
                probe_lines.append(line.split("[probe]", 1)[1].strip())

    # Reduce the 5 s series to one row per reap epoch (the span between
    # ledger increments): the scratch high-water INSIDE each epoch is the
    # number that must stay flat across iterations if the reap works.
    epochs = []
    cur = None
    for s in samples:
        if cur is None or s["reaped"] != cur["reaped"]:
            if cur is not None:
                epochs.append(cur)
            cur = {"reaped": s["reaped"], "t_start": s["t"],
                   "min_free_gb": s["free_gb"], "max_blockmgr_gb": s["blockmgr_gb"]}
        cur["t_end"] = s["t"]
        cur["min_free_gb"] = min(cur["min_free_gb"], s["free_gb"])
        cur["max_blockmgr_gb"] = max(cur["max_blockmgr_gb"], s["blockmgr_gb"])
    if cur is not None:
        epochs.append(cur)

    out = {
        "free_at_start_gb": free_start,
        "min_free_gb_overall": min((s["free_gb"] for s in samples), default=None),
        "max_blockmgr_gb_overall": max((s["blockmgr_gb"] for s in samples), default=None),
        "total_reaps": samples[-1]["reaped"] if samples else 0,
        "samples": len(samples),
        "reap_epochs": epochs,
        "probe_lines": probe_lines,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("free_at_start_gb", "min_free_gb_overall",
                       "max_blockmgr_gb_overall", "total_reaps", "samples")}))


if __name__ == "__main__":
    main()
