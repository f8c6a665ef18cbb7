#!/usr/bin/env python
"""ANN quality exhibit: measured recall@k of every approximate method
against brute-force cosine on the driver corpus.

The correctness gate proves each method computes ITS OWN contract
hash-exactly; this tool measures the other axis — how much of the TRUE
top-k each approximation recalls, at the registry's default parameters
(the speed/quality trade the BASELINE narrative cites). Query set: the
``n_queries`` lowest vec_ids (deterministic).

Usage: python tools/ann_recall.py [sf_dir] [n_queries] [k]
Prints one JSON line; paste the table into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.1", n_queries: int = 20, k: int = 10) -> None:
    from neural_search_spark.pipeline import ann
    from neural_search_spark.pipeline import params as P
    from neural_search_spark.session import get_spark

    spark = get_spark(
        master="local[8]", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .selectExpr("CAST(vec_id AS LONG) vec_id", "embedding")
        .cache()
    )
    n = emb.count()
    qids = [r["vec_id"] for r in emb.orderBy("vec_id").limit(int(n_queries)).collect()]

    # ingest-time artifacts, built once (the deployment shape)
    cents = ann.ivf_centroids(emb).cache()
    assigned = ann.ivf_assign(emb, cents).cache()
    assigned.count()
    pq = ann.pq_codebooks(emb).cache()
    pq.count()

    methods = {
        "lsh": lambda q: ann.ann_lsh_topk(emb, q, k=k),
        "lsh_multiprobe": lambda q: ann.ann_lsh_topk(emb, q, k=k, multi_probe=4),
        "ivf": lambda q: ann.ann_ivf_topk(emb, q, k=k, centroids=cents, assigned=assigned),
        "int8": lambda q: ann.ann_quantized_topk(emb, q, k=k),
        "int8_rescore": lambda q: ann.ann_quantized_rescore_topk(emb, q, k=k),
        "pq": lambda q: ann.ann_pq_topk(emb, q, k=k, codebooks=pq),
        "ivfpq": lambda q: ann.ann_ivfpq_topk(
            emb, q, k=k, centroids=cents, assigned=assigned, codebooks=pq
        ),
    }
    truth = {
        q: {r["vec_id"] for r in ann.cosine_topk(emb, q, k=k).collect()} for q in qids
    }
    out = {}
    for name, fn in methods.items():
        recalls = []
        for q in qids:
            got = {r["vec_id"] for r in fn(q).collect()}
            recalls.append(len(got & truth[q]) / float(k))
        out[name] = round(sum(recalls) / len(recalls), 3)

    # the user-facing IVF knob: recall vs nprobe at the fixed list count
    # (fraction of the corpus scanned = nprobe / n_lists)
    sweep = {}
    from neural_search_spark.pipeline.params import IVF_N_LISTS

    for nprobe in (1, 2, 4, IVF_N_LISTS):
        recalls = []
        for q in qids:
            got = {
                r["vec_id"]
                for r in ann.ann_ivf_topk(
                    emb, q, k=k, nprobe=nprobe, centroids=cents, assigned=assigned
                ).collect()
            }
            recalls.append(len(got & truth[q]) / float(k))
        sweep[f"nprobe_{nprobe}"] = round(sum(recalls) / len(recalls), 3)
    print(
        json.dumps(
            {
                "metric": f"mean recall@{k} vs brute cosine",
                "sf_dir": sf_dir,
                "n_vectors": n,
                "n_queries": len(qids),
                "params": {
                    "ivf": {"n_lists": P.IVF_N_LISTS, "nprobe": P.IVF_NPROBE},
                    "pq": {"m": P.PQ_M, "codes": P.PQ_K, "oversample": 3},
                    "lsh": {"hyperplanes": P.N_HYPERPLANES},
                },
                "recall": out,
                "ivf_nprobe_sweep": sweep,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        a[0] if len(a) > 0 else "/root/testdata/sf0.1",
        int(a[1]) if len(a) > 1 else 20,
        int(a[2]) if len(a) > 2 else 10,
    )
