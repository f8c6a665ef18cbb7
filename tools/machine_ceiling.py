"""Measure this machine's own parallel-scaling ceiling for the engine's
per-core kernel (regex tokenize + Counter over real corpus text), with no
Spark involved: N worker processes, same total work, wall-clock compared.

The result bounds ANY Spark job's achievable N→4N efficiency on this
sandbox VM (hypervisor-overcommitted vCPUs, shared memory bandwidth) and
is reported next to the Spark numbers in BASELINE.md so the engine's
scaling is judged against the hardware's, not against an ideal 4x.

Usage: python tools/machine_ceiling.py [n_low n_high repeat_factor]
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import re
import sys
import time
from collections import Counter

import duckdb

TOKEN_RE = re.compile(r"[a-z0-9_]+")


def _work(texts: list[str]) -> int:
    n = 0
    for t in texts:
        n += len(Counter(TOKEN_RE.findall(t.lower())))
    return n


def run_level(procs: int, chunks: list[list[str]]) -> float:
    with mp.Pool(procs) as pool:
        pool.map(_work, chunks[:procs])  # warm workers
        t0 = time.perf_counter()
        pool.map(_work, chunks)
        return time.perf_counter() - t0


def main(n_low: int = 2, n_high: int = 8, repeat: int = 40) -> None:
    texts = [
        r[0]
        for r in duckdb.sql(
            "SELECT text FROM '/root/testdata/sf0.1/documents.parquet'"
        ).fetchall()
    ] * repeat
    # fixed chunking independent of level: 8 chunks per high-level proc
    n_chunks = n_high * 8
    step = max(1, len(texts) // n_chunks)
    chunks = [texts[i : i + step] for i in range(0, len(texts), step)]
    t_low = min(run_level(n_low, chunks) for _ in range(2))
    t_high = min(run_level(n_high, chunks) for _ in range(2))
    speedup = t_low / t_high
    print(
        json.dumps(
            {
                "kernel": "regex tokenize + Counter (the engine's per-core hot loop)",
                "docs": len(texts),
                "levels": {n_low: round(t_low, 2), n_high: round(t_high, 2)},
                "speedup": round(speedup, 3),
                "ceiling_efficiency": round(speedup / (n_high / n_low), 3),
            }
        )
    )


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
