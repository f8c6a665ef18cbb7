"""Compressed block-max index: build, query parity, pruning, resume.

The correctness bar: the index path must return the SAME top-k docIDs and
scores as the DataFrame BM25 path (tests/test_bm25.py ties that path to
the pure-Python Lucene oracle), with and without block-max pruning.
"""

import json
import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from neural_search_spark.corpus import synthetic_code_corpus
from neural_search_spark.index.builder import build_index, read_manifest
from neural_search_spark.search.bm25 import BM25Engine, topk
from neural_search_spark.search.wand import BlockMaxIndex

QUERIES = [
    "import ident1 ident2",
    "def uniq_000003",
    "class ident0 ident7 ident42",
    "return self ident5",
    "nonexistent_token_xyz",
    "import",  # max-skew single term: present in ~every doc
]


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    corpus = synthetic_code_corpus(spark, n_rows=300, seed=7)
    d = str(tmp_path_factory.mktemp("bmidx"))
    build_index(spark, corpus, d, n_shards=4, block_size=16)
    return d


@pytest.fixture(scope="module")
def engine(spark):
    return BM25Engine(spark, synthetic_code_corpus(spark, n_rows=300, seed=7)).cache()


def _rows(df):
    return [(r["docID"], r["score"]) for r in df.collect()]


@pytest.mark.parametrize("query", QUERIES)
@pytest.mark.parametrize("prune", [True, False])
def test_index_matches_dataframe_path(spark, index_dir, engine, query, prune):
    idx = BlockMaxIndex(spark, index_dir)
    got = _rows(idx.match_topk(query, k=10, prune=prune))
    want = _rows(topk(engine.match(query), 10))
    assert [d for d, _ in got] == [d for d, _ in want]
    np.testing.assert_allclose(
        [s for _, s in got], [s for _, s in want], rtol=0, atol=1e-9
    )


def test_stats_match_corpus(spark, index_dir, engine):
    idx = BlockMaxIndex(spark, index_dir)
    assert idx.stats["n_docs"] == engine.stats.n_docs
    assert idx.stats["total_tokens"] == engine.stats.total_tokens


def test_index_compresses(spark, index_dir):
    idx = BlockMaxIndex(spark, index_dir)
    row = (
        idx.postings.where(F.col("term") == "import")
        .select("df", F.length("doc_bytes").alias("nb"))
        .collect()
    )
    total_df = sum(r["df"] for r in row)
    total_bytes = sum(r["nb"] for r in row)
    assert total_df > 0
    # delta+varint: sorted in-shard docIDs (<300 docs, 4 shards) fit ~1 B/doc
    assert total_bytes <= 2 * total_df


def test_skewed_term_splits_across_shards(spark, index_dir):
    idx = BlockMaxIndex(spark, index_dir)
    shards = idx.postings.where(F.col("term") == "import").select("shard").distinct().count()
    assert shards == 4  # the salt: every shard holds a sub-list


def test_resume_skips_completed_shards(spark, tmp_path):
    corpus = synthetic_code_corpus(spark, n_rows=120, seed=11)
    d = str(tmp_path / "idx")
    build_index(spark, corpus, d, n_shards=4, block_size=16, shard_batch=2)
    m1 = read_manifest(d)
    assert [e["stage"] for e in m1] == ["raw", "postings", "postings"]

    # full results before the simulated crash
    idx = BlockMaxIndex(spark, d)
    want = _rows(idx.match_topk("import ident1", k=5))

    # simulate a crash after batch 1: drop batch 2 from manifest + disk
    lost = m1[-1]["shards"]
    with open(os.path.join(d, "manifest.jsonl"), "w") as f:
        for e in m1[:-1]:
            f.write(json.dumps(e) + "\n")
    for s in lost:
        shutil.rmtree(os.path.join(d, "postings", f"shard={s}"))

    build_index(spark, corpus, d, n_shards=4, block_size=16, shard_batch=2)
    m2 = read_manifest(d)
    # raw stage NOT redone (one raw entry), exactly one new postings entry
    assert [e["stage"] for e in m2] == ["raw", "postings", "postings"]
    assert m2[-1]["shards"] == lost

    got = _rows(BlockMaxIndex(spark, d).match_topk("import ident1", k=5))
    assert got == want


def test_rebuild_is_noop_when_complete(spark, tmp_path):
    corpus = synthetic_code_corpus(spark, n_rows=60, seed=3)
    d = str(tmp_path / "idx2")
    build_index(spark, corpus, d, n_shards=2, block_size=16)
    n1 = len(read_manifest(d))
    build_index(spark, corpus, d, n_shards=2, block_size=16)
    assert len(read_manifest(d)) == n1
