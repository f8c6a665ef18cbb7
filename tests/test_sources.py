"""Corpus source resolution, the spark-submit build entry, and the
text_embedding stub plumbing."""

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from neural_search_spark.sources import read_corpus_table


def test_read_corpus_parquet_with_derived_ids(spark, tiny_corpus, tmp_path):
    p = str(tmp_path / "corpus_pq")
    tiny_corpus.drop("docID", "content_sha256").write.parquet(p)
    df = read_corpus_table(spark, p)
    assert "docID" in df.columns and "content_sha256" in df.columns
    # docID is deterministic and unique per (repo, path, commit)
    n = df.count()
    assert df.select("docID").distinct().count() == n
    again = read_corpus_table(spark, p)
    assert df.select("docID").collect() == again.select("docID").collect()
    # invariant column is correct
    bad = df.where(F.sha2(F.col("content"), 256) != F.col("content_sha256")).count()
    assert bad == 0


def test_read_corpus_validates_schema(spark, tmp_path):
    p = str(tmp_path / "bad_pq")
    spark.range(3).write.parquet(p)
    with pytest.raises(ValueError, match="missing required columns"):
        read_corpus_table(spark, p)


def test_submit_build_local_smoke(tmp_path):
    out = str(tmp_path / "subidx")
    r = subprocess.run(
        [
            sys.executable,
            "tools/submit_build.py",
            "--source",
            "/root/testdata/sf0.001",
            "--out",
            out,
            "--n-shards",
            "4",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    rep = json.loads(line)
    assert rep["summary"]["n_docs"] == 500
    assert rep["metrics"]["raw_rows"] > 0


def test_text_embedding_stub_shape(spark, tiny_corpus):
    from neural_search_spark.pipeline.embedding import text_embedding_stub

    emb = text_embedding_stub(tiny_corpus).collect()
    assert len(emb) == tiny_corpus.count()
    for r in emb[:10]:
        v = r["embedding"]
        assert len(v) == 8
        assert abs(sum(x * x for x in v) - 1.0) < 1e-9  # L2-normalized
