#!/usr/bin/env python
"""Headline benchmark: runs the engine's query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

"value" is the total wall time (sec) across the headline query set; the
per-query dict carries each query's wall seconds. A "queries_per_sec"
field reports the BASELINE.json throughput metric over the timed set.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from neural_search_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="neural-search-bench")

    import __spark_entry__ as entry_mod

    # Warm path: build + materialize the index once (the engine's index/query
    # split; BASELINE.md measures q/s on a warm index) and warm JVM/Python.
    t_idx0 = time.perf_counter()
    eng = entry_mod._engine(spark, sf_dir)
    eng.postings.count()
    _ = eng.stats
    entry_mod._index(spark, sf_dir)  # compressed block-max index (WAND path)
    entry_mod._pos_index(spark, sf_dir)  # positional postings (phrase path)
    entry_mod._ivf_artifacts(spark, sf_dir)  # IVF centroids + list assignment
    for fld in entry_mod.MULTI_MATCH_FIELDS:  # per-field indexes (multi_match)
        p, _d, _s = eng.field_artifacts(fld)
        p.count()
    index_build = time.perf_counter() - t_idx0

    qmap = entry_mod.queries()
    timings: dict[str, float] = {}
    t_all0 = time.perf_counter()
    for name, fn in qmap.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 4)
        print(f"# {name}: {n} rows in {dt:.3f}s", file=sys.stderr)
    total = time.perf_counter() - t_all0

    # attach the latest postings-build scaling evidence (tools/scaling_run.py)
    scaling = None
    scaling_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_SCALING.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            rep = json.load(f)
        scaling = {
            "scaling_efficiency": rep.get("scaling_efficiency"),
            "build_rows_per_sec": {
                k: v.get("rows_per_sec") for k, v in rep.get("levels", {}).items()
            },
        }

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline query set wall time (BM25 + hybrid + pipeline ops)",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "queries_per_sec": round(len(timings) / total, 4) if total else None,
        "index_build_sec": round(index_build, 4),
        "cpus": int(cpus),
        "scaling": scaling,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
