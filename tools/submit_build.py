"""spark-submit entry point for the index build (north-rule launch path).

Cluster launch (the intended deployment):

    zip -r nss.zip neural_search_spark
    spark-submit --py-files nss.zip tools/submit_build.py \\
        --source my_catalog.code.files --out s3://bucket/index \\
        --n-shards 4096 [--update] [--text-col content] [--id-col docID]

Local smoke (this sandbox):

    python tools/submit_build.py --source /root/testdata/sf0.01 \\
        --out /tmp/nss_submit_idx --n-shards 8

Reads the corpus via :mod:`neural_search_spark.sources` (Iceberg table
name or parquet path), runs the resumable build (or an incremental
``--update`` against an existing index), and prints one JSON line of
build metrics (per-partition lineage lives in ``<out>/manifest.jsonl``).
Re-running after a failure resumes from the manifest automatically.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", required=True, help="Iceberg table name or parquet path")
    ap.add_argument("--out", required=True, help="index output directory")
    ap.add_argument("--n-shards", type=int, default=32)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--id-col", default="docID")
    ap.add_argument("--update", action="store_true", help="incremental update of an existing index")
    ap.add_argument("--no-resume", action="store_true", help="ignore an existing manifest")
    args = ap.parse_args()

    from neural_search_spark.index.builder import build_index, update_index
    from neural_search_spark.session import get_spark
    from neural_search_spark.sources import read_corpus_table
    from neural_search_spark.stats import build_metrics

    # under spark-submit the session inherits the submitted master/conf;
    # standalone it falls back to the env-configured local master
    spark = get_spark(app_name="nss-index-build")
    source = args.source
    if os.path.isdir(source) and os.path.exists(os.path.join(source, "documents.parquet")):
        source = os.path.join(source, "documents.parquet")
        from neural_search_spark.corpus import corpus_from_documents

        corpus = corpus_from_documents(spark, os.path.dirname(source))
    else:
        corpus = read_corpus_table(spark, source, id_col=args.id_col)

    if args.update:
        summary = update_index(
            spark, corpus, args.out, text_col=args.text_col, id_col=args.id_col
        )
    else:
        summary = build_index(
            spark,
            corpus,
            args.out,
            n_shards=args.n_shards,
            block_size=args.block_size,
            text_col=args.text_col,
            id_col=args.id_col,
            resume=not args.no_resume,
        )
    print(json.dumps({"summary": summary, "metrics": build_metrics(args.out)}))
    spark.stop()


if __name__ == "__main__":
    main()
