#!/usr/bin/env python
"""Headline benchmark: runs the engine's query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

"value" is the sum over keys of the per-key MEDIAN wall time (sec) across
N interleaved repetitions (SPARK_GRAFT_BENCH_REPS, default 3 — the host VM
swings +/-2x on sub-second keys, so single samples are unreadable);
"queries" carries the per-key medians and "queries_stats" the
{median, n, min, max} detail. A "queries_per_sec" field reports the
BASELINE.json throughput metric over the timed set.
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
    for fld in entry_mod.MULTI_MATCH_FIELDS:  # positional postings (phrase paths)
        entry_mod._pos_index(spark, sf_dir, field=fld)
    entry_mod._ivf_artifacts(spark, sf_dir)  # IVF centroids + list assignment
    entry_mod._doc_embeddings(spark, sf_dir)  # ingest-time embedding column
    entry_mod._doc_ivf_artifacts(spark, sf_dir)  # doc-embedding IVF (hybrid_ann_dense)
    entry_mod._sparse_postings(spark, sf_dir).count()  # sparse ingest artifact
    entry_mod._pq_codebook_artifacts(spark, sf_dir)  # PQ codebooks (ann_pq / ivfpq)
    entry_mod._updated_index(spark, sf_dir)  # incremental-maintenance artifact
    for fld in entry_mod.MULTI_MATCH_FIELDS:  # per-field indexes (multi_match)
        p, _d, _s = eng.field_artifacts(fld)
        p.count()
    index_build = time.perf_counter() - t_idx0

    # stats API opt-in for the run: the bench emits the event-counter
    # snapshot (EventStatName catalog families) alongside the timings
    from neural_search_spark import settings as nss_settings, stats as nss_stats

    nss_stats.reset()
    nss_settings.put("stats_enabled", True)

    qmap = entry_mod.queries()
    # Median of N repetitions per key: the host VM is hypervisor-
    # overcommitted and single samples of sub-second keys swing +/-2x, so
    # a per-key median is the only readable statistic. Repetitions are
    # interleaved (rep 1 of every key, then rep 2, ...) so one noisy host
    # window cannot bias all of a key's samples.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    samples: dict[str, list[float]] = {name: [] for name in qmap}
    t_all0 = time.perf_counter()
    for rep in range(reps):
        for name, fn in qmap.items():
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.perf_counter() - t0
            samples[name].append(dt)
            print(f"# rep{rep} {name}: {n} rows in {dt:.3f}s", file=sys.stderr)
    wall_all_reps = time.perf_counter() - t_all0

    def _median(xs: list[float]) -> float:
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    timings = {name: round(_median(xs), 4) for name, xs in samples.items()}
    stats = {
        name: {
            "median": round(_median(xs), 4),
            "n": len(xs),
            "min": round(min(xs), 4),
            "max": round(max(xs), 4),
        }
        for name, xs in samples.items()
    }
    total = sum(_median(xs) for xs in samples.values())

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
        "metric": "headline query set wall time (BM25 + hybrid + pipeline ops); per-key MEDIAN of N interleaved repetitions",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "queries_stats": stats,
        "bench_reps": reps,
        "wall_all_reps_sec": round(wall_all_reps, 4),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "queries_per_sec": round(len(timings) / total, 4) if total else None,
        "index_build_sec": round(index_build, 4),
        "cpus": int(cpus),
        "scaling": scaling,
        # plan-time event counters over the whole timed set (counts are
        # reps × per-key executions; grouped by EventStatName path)
        "stats_events": nss_stats.event_counts_by_path(),
    }
    nss_settings.reset("stats_enabled")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
