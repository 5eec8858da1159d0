#!/usr/bin/env python3
"""Reduce the four round-19 ABBA legs (pre1, post1, post2, pre2) to the
drift-normalized per-query code deltas (r15/r18 protocol): per query,
ratio = mean(post legs) / mean(pre legs); the median ratio over UNTOUCHED
rows is the window-drift normalizer, and each touched row's normalized
ratio is the code-attributable delta. Writes
bench_artifacts/opt_ab_summary_r19.json.
"""
import json
import statistics

ART = "/root/repo/bench_artifacts"
TOUCHED = [
    # rows whose code changed this round (directly or via a changed shared
    # operator): CC loop, ngram kernel emission, Lloyd fold consumers
    "dedup_clusters", "dedup_ngram_kernel",
    "sim_ivf_codebook", "sim_mips_codebook", "sim_pq_codebook",
    "sim_drift_codebook",
    # codebook consumers (cached floats identical; cost shifts only where
    # the training pass itself is timed in-row)
    "als_index_build", "sim_topk_ivf", "sim_topk_ivfpq", "sim_topk_mips",
    "sim_drift_recall", "sim_recall", "embedding_pca",
]


def load(name):
    with open(f"{ART}/{name}") as f:
        return json.load(f)


def main():
    legs = {n: load(f"opt_ab_{n}_r19.json") for n in ("pre1", "post1", "post2", "pre2")}
    qs = {n: legs[n]["queries"] for n in legs}
    common = set.intersection(*(set(q) for q in qs.values()))
    common.discard("_rest")
    common.discard("_rest_n")

    ratios = {}
    for q in sorted(common):
        pre = (qs["pre1"][q] + qs["pre2"][q]) / 2
        post = (qs["post1"][q] + qs["post2"][q]) / 2
        ratios[q] = post / pre if pre > 0 else None

    untouched = [q for q in ratios if q not in TOUCHED and ratios[q]]
    drift = statistics.median(ratios[q] for q in untouched)
    out = {
        "protocol": "same-window ABBA: pre binary (6be7580) legs 1+4, post binary legs 2+3, "
                    "full-suite quiet-gated Bench; per-query post/pre mean ratio normalized by "
                    "the untouched-row median drift",
        "legs": {n: {"total": legs[n]["value"], "meter": [legs[n]["meter_sec"], legs[n]["meter_end_sec"]],
                     "stamp": legs[n]["load_stamp"]} for n in legs},
        "untouched_row_median_drift": round(drift, 4),
        "n_untouched": len(untouched),
        "touched_normalized": {
            q: round(ratios[q] / drift, 3) for q in TOUCHED if q in ratios
        },
        "suite_total_ratio": round(
            (legs["post1"]["value"] + legs["post2"]["value"])
            / (legs["pre1"]["value"] + legs["pre2"]["value"]), 4),
        "all_normalized": {q: round(r / drift, 3) for q, r in sorted(ratios.items()) if r},
    }
    with open(f"{ART}/opt_ab_summary_r19.json", "w") as f:
        json.dump(out, f, indent=1)
    print("drift", out["untouched_row_median_drift"], "suite", out["suite_total_ratio"])
    for q, r in sorted(out["touched_normalized"].items(), key=lambda kv: kv[1]):
        print(f"{q:28s} {r:.3f}")


if __name__ == "__main__":
    main()
