"""Dense neural clause + ml rerank: stand-in model parity and hybrid wiring."""

from __future__ import annotations

import math
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from neural_search_spark.pipeline.embedding import N_DIMS, text_embedding_stub
from neural_search_spark.search.neural import (
    cross_encoder_stub_scores,
    neural_clause_scores,
    query_embedding_stub,
    rerank_ml,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "spark join window partition stream"),
        (1, "customer stream window partition"),
        (2, "import numpy as np and pandas"),
        (3, "the quick brown fox"),
        (4, ""),  # no tokens -> no embedding row
    ]
    return spark.createDataFrame(rows, "docID long, content string")


@pytest.fixture(scope="module")
def emb(docs):
    return text_embedding_stub(docs).cache()


def _py_embed(text: str) -> list[float]:
    counts: dict[int, float] = {}
    for t in re.findall(r"[a-z0-9_]+", text.lower()):
        counts[len(t) % N_DIMS] = counts.get(len(t) % N_DIMS, 0.0) + 1.0
    dims = [counts.get(i, 0.0) for i in range(N_DIMS)]
    nrm = math.sqrt(sum(v * v for v in dims))
    return [v / nrm if nrm else 0.0 for v in dims]


def test_query_embedding_stub_matches_doc_stub():
    """Query-side and doc-side stand-ins are the SAME model."""
    text = "customer stream window partition"
    assert query_embedding_stub(text) == pytest.approx(_py_embed(text), abs=0)
    nrm = math.sqrt(sum(v * v for v in query_embedding_stub(text)))
    assert nrm == pytest.approx(1.0, abs=1e-12)


def test_neural_clause_matches_numpy(docs, emb):
    qv = query_embedding_stub("customer stream window partition")
    got = {r["docID"]: r["score"] for r in neural_clause_scores(emb, qv).collect()}
    for row in docs.collect():
        dv = _py_embed(row["content"])
        if not any(dv):
            assert row["docID"] not in got  # no-token doc never matches
            continue
        want = float(np.floor(np.dot(dv, qv) * 1e6 + 0.5) / 1e6)
        assert got[row["docID"]] == pytest.approx(want, abs=0), row["docID"]
    # doc 1 is exactly the query text -> cosine 1.0
    assert got[1] == pytest.approx(1.0, abs=1e-6)


def test_neural_clause_k_min_score_filter(spark, docs, emb):
    qv = query_embedding_stub("customer stream window partition")
    top2 = neural_clause_scores(emb, qv, k=2).collect()
    assert len(top2) == 2
    assert top2[0]["score"] >= top2[1]["score"]
    hi = neural_clause_scores(emb, qv, min_score=0.99).collect()
    assert {r["docID"] for r in hi} == {1}
    cand = spark.createDataFrame([(2,), (3,)], "docID long")
    flt = neural_clause_scores(emb, qv, candidate_docs=cand).collect()
    assert {r["docID"] for r in flt} <= {2, 3}


def test_rerank_ml_replaces_and_resorts(spark, docs, emb):
    """Window scores are REPLACED by the similarity model and re-sorted
    (RescoringRerankProcessor); docs without embeddings zero-fill."""
    window = spark.createDataFrame(
        [(3, 9.0), (1, 5.0), (4, 4.0)], "docID long, score double"
    )
    got = rerank_ml(window, emb, "customer stream window partition").collect()
    assert [r["docID"] for r in got][0] == 1  # exact text match ranks first
    assert {r["docID"] for r in got} == {1, 3, 4}  # window membership kept
    by_id = {r["docID"]: r["score"] for r in got}
    assert by_id[4] == 0.0  # empty doc zero-filled
    assert by_id[1] == pytest.approx(1.0, abs=1e-6)
    # scores strictly from the model, not the previous ranking
    assert by_id[3] < by_id[1]


def test_cross_encoder_restricted_to_window(spark, emb):
    window = spark.createDataFrame([(0,)], "docID long")
    got = cross_encoder_stub_scores(window, emb, "spark join").collect()
    assert {r["docID"] for r in got} == {0}


def test_spec_neural_clause_in_hybrid(spark, docs, emb):
    """Dict-shaped hybrid spec with a dense neural clause (the
    NeuralQueryBuilder rewrite surface through parse_hybrid_spec)."""
    from neural_search_spark.search.bm25 import BM25Engine
    from neural_search_spark.search.spec import parse_hybrid_spec

    eng = BM25Engine(spark, docs, text_col="content", id_col="docID")
    spec = {
        "queries": [
            {"match": {"query": "spark join"}},
            {"neural": {"query": "customer stream window partition", "embeddings": emb, "k": 5}},
        ],
        "pagination_depth": 5,
    }
    out = parse_hybrid_spec(eng, spec, k=3).collect()
    assert 1 <= len(out) <= 3
    ids = [r["docID"] for r in out]
    assert 1 in ids  # dense clause surfaces the exact-text doc


def test_spec_neural_clause_respects_filter(spark, emb):
    from neural_search_spark.search.bm25 import BM25Engine
    from neural_search_spark.search.spec import parse_hybrid_spec

    docs2 = spark.createDataFrame(
        [(0, "a", "customer stream window partition"), (1, "b", "customer stream window partition")],
        "docID long, lang string, content string",
    )
    eng = BM25Engine(spark, docs2, text_col="content", id_col="docID")
    emb2 = text_embedding_stub(docs2)
    spec = {
        "queries": [{"neural": {"query": "customer stream", "embeddings": emb2}}],
        "filter": "lang = 'a'",
        "pagination_depth": 5,
    }
    out = parse_hybrid_spec(eng, spec, k=5).collect()
    assert [r["docID"] for r in out] == [0]


def test_max_distance_bound(spark, docs, emb):
    """max_distance keeps docs with 2·(1−cos) ≤ d² and excludes min_score
    (NeuralKNNQueryBuilder exposes exactly one of the two bounds)."""
    qv = query_embedding_stub("customer stream window partition")
    all_scores = {
        r["docID"]: r["score"] for r in neural_clause_scores(emb, qv).collect()
    }
    # bound placed just under the best score's distance: only docs at
    # distance <= d survive
    best = max(all_scores.values())
    d = math.sqrt(2 * (1 - best)) + 1e-9
    got = {r["docID"] for r in neural_clause_scores(emb, qv, max_distance=d).collect()}
    want = {i for i, s in all_scores.items() if 2 * (1 - s) <= d * d}
    assert got == want and got  # non-empty and exact
    # very large bound keeps everything
    assert {
        r["docID"] for r in neural_clause_scores(emb, qv, max_distance=2.0).collect()
    } == set(all_scores)
    with pytest.raises(ValueError, match="min_score OR max_distance"):
        neural_clause_scores(emb, qv, min_score=0.1, max_distance=0.5)


def test_quantized_rescore_matches_exact_on_separated_data(spark):
    """With well-separated vectors the coarse int8 window contains the true
    top-k, so rescored results equal the exact ones."""
    from neural_search_spark.pipeline.ann import ann_quantized_rescore_topk, cosine_topk

    rng = np.random.RandomState(3)
    rows = [(i, (rng.randn(64) + (i % 4)).tolist()) for i in range(40)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = [r["vec_id"] for r in cosine_topk(e, 0, k=5).collect()]
    resc = [r["vec_id"] for r in ann_quantized_rescore_topk(e, 0, k=5, oversample=4).collect()]
    assert resc == exact


def test_neural_nested_expand_modes(spark):
    from neural_search_spark.search.neural import neural_nested_scores

    chunks = spark.createDataFrame(
        [
            (0, 0, "customer stream window partition"),  # exact query text
            (0, 1, "the quick brown fox"),
            (1, 0, "customer stream window"),
            (2, 0, ""),  # empty chunk drops out
        ],
        "docID long, chunk_idx int, chunk string",
    )
    qv = query_embedding_stub("customer stream window partition")
    best = neural_nested_scores(chunks, qv, expand_nested=False, k=10).collect()
    assert [r["docID"] for r in best][0] == 0  # exact-text chunk wins
    assert best[0]["best_chunk_idx"] == 0
    assert all(r["docID"] != 2 for r in best)
    expanded = neural_nested_scores(chunks, qv, expand_nested=True, k=10).collect()
    # every scored chunk of the selected parents, parent/chunk ordered
    assert [(r["docID"], r["chunk_idx"]) for r in expanded] == [(0, 0), (0, 1), (1, 0)]
