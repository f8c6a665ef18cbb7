"""Merge multiple scaling_run.py reports into one canonical
BENCH_SCALING.json.

Under time-varying hypervisor steal, individual N→4N pairs swing with the
host, not the job. This tool collects every same-trial pair across the
given run reports, annotates each with the steal its two runs measured,
and writes a canonical report whose headline is the pair from the
CLEANEST window — lowest combined measured steal, never max efficiency
(max-of-noisy-ratios is upward-biased) — plus the median paired
efficiency — the paired-comparison answer to a time-varying nuisance
variable (see tools/scaling_run.py for the estimator rationale).

Usage: python tools/merge_scaling_evidence.py out.json run1.json run2.json ...
"""

from __future__ import annotations

import json
import sys


def pairs_from(report: dict) -> list[dict]:
    trials = report["trials"]
    levels = sorted(int(k) for k in trials)
    lo, hi = levels[0], levels[-1]
    out = []
    lo_runs, hi_runs = trials[str(lo)], trials[str(hi)]
    for t in range(min(len(lo_runs), len(hi_runs))):
        a, b = lo_runs[t], hi_runs[t]
        sp = a["wall_s"] / b["wall_s"]
        # a window is externally loaded (another job on THIS guest — e.g. a
        # test suite — which host steal cannot see) when measured busy CPUs
        # far exceed what the pinned executors can use; flag, never select
        ext = any(
            (r.get("host_busy_cpus") or 0.0) > n_exec + 0.5
            for r, n_exec in ((a, lo), (b, hi))
        )
        out.append(
            {
                "n": lo,
                "n4": hi,
                "wall_n": a["wall_s"],
                "wall_4n": b["wall_s"],
                "rows_per_sec_n": a["rows_per_sec"],
                "rows_per_sec_4n": b["rows_per_sec"],
                "steal_cpus_n": a.get("host_steal_cpus"),
                "steal_cpus_4n": b.get("host_steal_cpus"),
                "busy_cpus_n": a.get("host_busy_cpus"),
                "busy_cpus_4n": b.get("host_busy_cpus"),
                "external_load": ext,
                "speedup": round(sp, 3),
                "efficiency": round(sp / (hi / lo), 3),
            }
        )
    return out


def main() -> None:
    out_path, run_paths = sys.argv[1], sys.argv[2:]
    all_pairs = []
    base = None
    for p in run_paths:
        with open(p) as f:
            rep = json.load(f)
        base = base or rep
        all_pairs.extend(pairs_from(rep))
    for p in all_pairs:
        p["pair_steal_cpus"] = round(
            (p.get("steal_cpus_n") or 0.0) + (p.get("steal_cpus_4n") or 0.0), 2
        )
    # externally-loaded windows (busy >> pinned executors) are excluded from
    # BOTH selection and the median: their walls measure the other job, not
    # the cluster (in either direction — an inflated serial wall would
    # *overstate* efficiency). They stay listed in all_pairs, flagged.
    clean = [p for p in all_pairs if not p["external_load"]] or all_pairs
    # cleanest window = lowest combined steal; ties broken by input order,
    # never by efficiency (that would reintroduce the max-of-noise bias)
    best = min(enumerate(clean), key=lambda ip: (ip[1]["pair_steal_cpus"], ip[0]))[1]
    eff_sorted = sorted(p["efficiency"] for p in clean)
    mid = len(eff_sorted) // 2
    median_eff = (
        eff_sorted[mid]
        if len(eff_sorted) % 2
        else round((eff_sorted[mid - 1] + eff_sorted[mid]) / 2, 3)
    )
    report = {
        "metric": base["metric"],
        "sf_dir": base["sf_dir"],
        "replicate": base["replicate"],
        "all_pairs": sorted(all_pairs, key=lambda x: x["pair_steal_cpus"]),
        "best_pair": best,
        "pair_selection": "lowest combined host steal (cleanest window)",
        "pairs_excluded_external_load": len(all_pairs) - len(clean),
        "speedup": best["speedup"],
        "scaling_efficiency": best["efficiency"],
        "efficiency_median_paired": median_eff,
        "levels": {
            str(best["n"]): {
                "cpus": best["n"],
                "wall_s": best["wall_n"],
                "rows_per_sec": best["rows_per_sec_n"],
            },
            str(best["n4"]): {
                "cpus": best["n4"],
                "wall_s": best["wall_4n"],
                "rows_per_sec": best["rows_per_sec_4n"],
            },
        },
        "estimator": (
            "same-trial (same host window) N/4N pair with the lowest combined "
            "measured hypervisor steal across runs; median paired efficiency "
            "reported alongside — see BASELINE.md"
        ),
        "target": 0.8,
        "pass": best["efficiency"] >= 0.8,
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"pairs": len(all_pairs), "best": best}))


if __name__ == "__main__":
    main()
