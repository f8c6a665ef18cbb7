"""Compare two full bench JSONs (per-key medians) round-over-round.

Prints geomean of (new/old) per-key ratios over the common key set, the
totals, and the biggest movers in each direction — the round-over-round
summary BASELINE.md publishes. Day-to-day host-tenancy swing on this VM
is ~±20% with identical plans (see BASELINE.md round-5 notes), so only
movements well outside that band are real.

Usage: python tools/bench_compare.py OLD.json NEW.json [top_n]
"""

from __future__ import annotations

import json
import math
import sys


def main(old_path: str, new_path: str, top_n: int = 8) -> None:
    old = json.load(open(old_path))["queries"]
    new = json.load(open(new_path))["queries"]
    common = sorted(set(old) & set(new))
    ratios = {k: new[k] / old[k] for k in common if old[k] > 0}
    geomean = math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios))
    out = {
        "old": old_path,
        "new": new_path,
        "common_keys": len(common),
        "old_total_s": round(sum(old[k] for k in common), 2),
        "new_total_s": round(sum(new[k] for k in common), 2),
        "geomean_ratio": round(geomean, 3),
        "regressed_gt_1.3x": sorted(
            (
                {"key": k, "ratio": round(r, 2), "old_s": old[k], "new_s": new[k]}
                for k, r in ratios.items()
                if r > 1.3
            ),
            key=lambda d: -d["ratio"],
        )[:top_n],
        "improved_lt_0.77x": sorted(
            (
                {"key": k, "ratio": round(r, 2), "old_s": old[k], "new_s": new[k]}
                for k, r in ratios.items()
                if r < 0.77
            ),
            key=lambda d: d["ratio"],
        )[:top_n],
        "only_in_new": sorted(set(new) - set(old)),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 8)
