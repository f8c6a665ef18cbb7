"""Postings-build scaling on a REAL multi-executor cluster (north rule).

The north rule's criterion is throughput scaling efficiency >= 0.8 from N
to 4N EXECUTORS. ``tools/scaling_run.py`` stands that in with one JVM at
two thread counts (local[N] vs local[4N]) — but one JVM with 4x threads
shares a single heap/GC/shuffle pipeline, which is NOT how a cluster
scales: a real cluster adds whole executors, each with its own JVM heap,
GC, Python workers, and shuffle server. This harness builds that shape
inside the sandbox:

- one Spark STANDALONE master (separate JVM),
- N worker JVMs, each offering exactly 1 core and its own memory, each
  optionally pinned to its own host CPU with ``taskset`` (a real
  executor is cpuset-limited),
- the SAME build job (same input files, same n_shards / shuffle
  partitions) submitted with ``spark.executor.cores=1`` — so the two
  levels differ ONLY in executor count: N=1 vs 4N=4.

Shuffles between executors cross real JVM boundaries (netty transfer),
per-executor overheads replicate with the executor count exactly as on a
1000-node cluster, and host steal is sampled per run like scaling_run.

Defaults tuned for this sandbox from measured probes (all overridable by
env): 16 MB scan splits / 1 MB open cost so the 128-file corpus fans out
to every executor (the stock 128 MB split packed it into ~5 splits and
capped the scan stage at 5-way); 64 shards so reduce waves stay balanced
at 8 executors; workers pinned to CPUs 8,11,... because guest CPUs 0-7
carry host IRQ/virtio load and run ~16% slower.

Usage:
    python tools/scaling_cluster.py            # full report (2 trials x {1,4} executors)
    SPARK_GRAFT_SCALING_TRIALS=3 python tools/scaling_cluster.py
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPLICATE = int(os.environ.get("SPARK_GRAFT_SCALING_REPLICATE", "800"))
TRIALS = int(os.environ.get("SPARK_GRAFT_SCALING_TRIALS", "2"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CORPUS_DIR = "/tmp/nss_scaling_corpus"
LEVELS = tuple(
    sorted(int(x) for x in os.environ.get("SPARK_GRAFT_SCALING_LEVELS", "1,4").split(","))
)
N_SHARDS = int(os.environ.get("SPARK_GRAFT_SCALING_SHARDS", "64"))
EXEC_MEM = os.environ.get("SPARK_GRAFT_SCALING_EXEC_MEM", "6g")


def _spark_home() -> str:
    import pyspark

    return os.path.dirname(os.path.abspath(pyspark.__file__))


def _spark_class() -> list[str]:
    home = _spark_home()
    script = os.path.join(home, "bin", "spark-class")
    if os.path.exists(script):
        return [script]
    raise SystemExit(f"spark-class not found under {home}/bin")


def cpu_sample() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    busy = int(parts[1]) + int(parts[2]) + int(parts[3])
    steal = int(parts[8]) if len(parts) > 8 else 0
    return busy, steal


class Cluster:
    """A standalone master + n single-core pinned worker JVMs."""

    def __init__(self, n_workers: int, port: int):
        self.n = n_workers
        self.port = port
        self.procs: list[subprocess.Popen] = []

    def __enter__(self):
        env = {
            **os.environ,
            "SPARK_LOCAL_IP": "127.0.0.1",
            "SPARK_NO_DAEMONIZE": "1",
            "SPARK_HOME": _spark_home(),
            "PYSPARK_PYTHON": sys.executable,
        }
        devnull = open(os.devnull, "wb")
        self.procs.append(
            subprocess.Popen(
                _spark_class()
                + [
                    "org.apache.spark.deploy.master.Master",
                    "-h", "127.0.0.1", "-p", str(self.port), "--webui-port", "0",
                ],
                env=env, stdout=devnull, stderr=devnull,
            )
        )
        time.sleep(5)
        pin = shutil.which("taskset")
        for i in range(self.n):
            cmd = _spark_class() + [
                "org.apache.spark.deploy.worker.Worker",
                f"spark://127.0.0.1:{self.port}",
                "-c", "1", "-m", EXEC_MEM, "--webui-port", "0",
            ]
            if pin:
                # CPUs 0-7 are measurably slower on this guest (host
                # IRQ/virtio work lands there): an 8-exec level pinned to
                # 0-7 ran ~16% slower than the same level pinned to
                # 8,11,...,29. Spread high by default.
                base = int(os.environ.get("SPARK_GRAFT_PIN_BASE", "8"))
                stride = int(os.environ.get("SPARK_GRAFT_PIN_STRIDE", "3"))
                cmd = ["taskset", "-c", str(base + i * stride)] + cmd
            wenv = {**env, "SPARK_WORKER_DIR": f"/tmp/nss_worker_{self.port}_{i}"}
            self.procs.append(
                subprocess.Popen(cmd, env=wenv, stdout=devnull, stderr=devnull)
            )
        time.sleep(8)
        return self

    def __exit__(self, *exc):
        for p in reversed(self.procs):
            p.terminate()
        for p in self.procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()


def run_level(n_exec: int, port: int) -> dict:
    from pyspark.sql import SparkSession

    from neural_search_spark.index.builder import build_index, raw_postings, read_manifest

    with Cluster(n_exec, port):
        spark = (
            SparkSession.builder.appName(f"scaling-cluster-{n_exec}x1")
            .master(f"spark://127.0.0.1:{port}")
            .config("spark.executor.cores", "1")
            .config("spark.executor.memory", EXEC_MEM)
            .config("spark.cores.max", str(n_exec))
            .config("spark.driver.memory", "6g")
            .config("spark.driver.host", "127.0.0.1")
            .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "64"))
            .config(
                "spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PART_BYTES", "16777216"),
            )
            .config(
                "spark.sql.files.openCostInBytes",
                os.environ.get("SPARK_GRAFT_OPEN_COST", "1048576"),
            )
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .config("spark.executorEnv.PYTHONPATH", REPO)
            .getOrCreate()
        )
        try:
            corpus = spark.read.parquet(CORPUS_DIR)
            # untimed warmup: executor registration, python worker spawn, codegen
            warm = corpus.limit(256).repartition(2 * n_exec)
            raw_postings(warm, 4).groupBy("shard").count().collect()
            out_dir = f"/tmp/nss_scaling_cluster_{n_exec}"
            shutil.rmtree(out_dir, ignore_errors=True)
            b0, s0 = cpu_sample()
            t0 = time.perf_counter()
            stats = build_index(spark, corpus, out_dir, n_shards=N_SHARDS, resume=False)
            wall = time.perf_counter() - t0
            b1, s1 = cpu_sample()
            manifest = read_manifest(out_dir)
            rows = sum(e["rows"] for e in manifest if e["stage"] == "raw")
            stage_walls = {e["stage"]: e["wall_s"] for e in manifest}
            for e in manifest:
                if e["stage"] == "raw":
                    for k in ("wall_shuffle_s", "wall_docmap_s", "wall_doclens_s", "wall_stats_s"):
                        if k in e:
                            stage_walls[k] = e[k]
            shutil.rmtree(out_dir, ignore_errors=True)
            return {
                "executors": n_exec,
                "wall_s": round(wall, 3),
                "stage_walls": stage_walls,
                "posting_rows": rows,
                "rows_per_sec": round(rows / wall, 1),
                "n_docs": stats["n_docs"],
                "host_busy_cpus": round((b1 - b0) / 100.0 / wall, 2),
                "host_steal_cpus": round((s1 - s0) / 100.0 / wall, 2),
            }
        finally:
            spark.stop()


def main() -> None:
    if not os.path.exists(os.path.join(CORPUS_DIR, "_SUCCESS")):
        raise SystemExit("run tools/scaling_run.py once first to materialize the corpus")
    n, n4 = LEVELS[0], LEVELS[-1]
    trials: dict[int, list[dict]] = {c: [] for c in LEVELS}
    port = 7201
    for t in range(TRIALS):
        for lvl in LEVELS:
            # each level runs in its own subprocess: a stopped SparkContext
            # in-process leaves a dead Python accumulator endpoint that the
            # next context trips over (EOF before Python server acknowledged)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", str(lvl), str(port)],
                capture_output=True,
                text=True,
                check=True,
            )
            r = json.loads(
                [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
            )
            port += 1
            trials[lvl].append(r)
            print(f"trial {t} {lvl} executor(s): {json.dumps(r)}", file=sys.stderr)
    per_trial = []
    for t in range(min(len(trials[n]), len(trials[n4]))):
        sp = trials[n][t]["wall_s"] / trials[n4][t]["wall_s"]
        per_trial.append(
            {
                "trial": t,
                "wall_n": trials[n][t]["wall_s"],
                "wall_4n": trials[n4][t]["wall_s"],
                "pair_steal_cpus": round(
                    trials[n][t]["host_steal_cpus"] + trials[n4][t]["host_steal_cpus"], 2
                ),
                "speedup": round(sp, 3),
                "efficiency": round(sp / (n4 / n), 3),
            }
        )
    best_pair = min(per_trial, key=lambda p: (p["pair_steal_cpus"], p["trial"]))
    effs = sorted(p["efficiency"] for p in per_trial)
    mid = len(effs) // 2
    median_eff = effs[mid] if len(effs) % 2 else round((effs[mid - 1] + effs[mid]) / 2, 3)
    report = {
        "metric": "postings-build scaling efficiency, N -> 4N single-core executors (standalone cluster)",
        "sf_dir": SF_DIR,
        "replicate": REPLICATE,
        "protocol": (
            "separate master + per-executor worker JVMs (own heap/GC/Python "
            "workers/shuffle server), each worker taskset-pinned to one host "
            "CPU; spark.executor.cores=1; levels differ only in executor count"
        ),
        "trials": trials,
        "levels": {
            str(lvl): min(rs, key=lambda r: r["wall_s"]) for lvl, rs in trials.items()
        },
        "per_trial_pairs": per_trial,
        "pair_selection": "lowest combined host_steal_cpus (cleanest window)",
        "speedup": best_pair["speedup"],
        "scaling_efficiency": best_pair["efficiency"],
        "efficiency_median_paired": median_eff,
        "target": 0.8,
        "pass": best_pair["efficiency"] >= 0.8,
    }
    out = os.environ.get(
        "SPARK_GRAFT_SCALING_OUT", os.path.join(REPO, "BENCH_SCALING_CLUSTER.json")
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        print(json.dumps(run_level(int(sys.argv[2]), int(sys.argv[3]))))
    else:
        main()
