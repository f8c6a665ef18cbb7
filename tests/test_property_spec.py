"""Property-based round-trip of the query-spec parser (hypothesis):
randomized clause trees through ``_score_clause`` (the parse_spec scoring
path) versus an INDEPENDENT pure-Python evaluator over a fixed tiny
corpus — the one kernel family the round-5 property suite skipped.

Covers 20 of the parser's 21 clause kinds, nested to bounded depth with
random ``boost`` wrappers: match (or/and/msm), term, match_phrase,
prefix, fuzzy, terms, wildcard, range, match_all, ids, regexp,
simple_query_string, bool, dis_max, boosting, constant_score, neural,
neural_sparse, rank_feature, function_score. ``span_near`` is excluded
here because ``tests/test_index.py::test_phrase_and_span_randomized_vs_python``
already randomizes it against a Python brute-force; ``more_like_this``'s
term cut is the DOCUMENTED non-Lucene-orderable deviation
(search/bm25.py:735-748) and is pinned by its own oracle key instead.

The Python evaluator re-derives every score from scratch (tokenize →
tf/df/dlq → double-precision BM25 / constant-score / stand-in cosine),
sharing ONLY the tokenizer and SmallFloat quantizer constants with the
engine — exactly what the DuckDB oracles share.
"""

from __future__ import annotations

import math
import re

import pytest
from hypothesis import HealthCheck, given, settings as hsettings, strategies as st
from pyspark.sql import functions as F

from neural_search_spark.analysis.tokenizer import tokenize_text
from neural_search_spark.index.smallfloat import quantize_length
from neural_search_spark.search.bm25 import BM25Engine
from neural_search_spark.search.spec import _score_clause, parse_simple_query_string

hsettings.register_profile(
    "spec-spark",
    deadline=None,
    max_examples=200,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)

K1, B = 1.2, 0.75
N_DIMS = 8

# Fixed 14-doc corpus: small vocabulary so clauses collide often (the
# interesting regime), one exact-phrase pair, one numeric feature column.
_DOCS = [
    "import table value spark join",
    "def table value merge window sort",
    "import spark stream window partition",
    "table value table value spark",
    "join merge hash window sort stream",
    "def class return self import",
    "partition shuffle executor spark table",
    "value stream join table import",
    "window sort partition merge def",
    "spark spark spark table join merge",
    "import def class table",
    "stream window join value partition",
    "hash shuffle sort executor merge",
    "table import window value spark stream",
]
_VOCAB = sorted({t for d in _DOCS for t in tokenize_text(d)})


@pytest.fixture(scope="module")
def prop_setup(spark):
    rows = [
        (i, text, (i * 7) % 11, f"lang{i % 3}") for i, text in enumerate(_DOCS)
    ]
    corpus = spark.createDataFrame(
        rows, "docID long, content string, nchars int, lang string"
    ).cache()
    eng = BM25Engine(spark, corpus).cache()
    from neural_search_spark.pipeline.embedding import text_embedding_stub
    from neural_search_spark.search.sparse import (
        sparse_features_from_tf,
        sparse_postings,
    )

    emb = text_embedding_stub(corpus).cache()
    spost = sparse_postings(sparse_features_from_tf(corpus)).cache()
    feats = corpus.select("docID", "nchars").cache()
    return eng, emb, spost, feats


# ---------------------------------------------------------------------------
# Pure-Python evaluator
# ---------------------------------------------------------------------------


class PyCorpus:
    def __init__(self, docs: list[str], nchars: list[int]):
        self.toks = {i: tokenize_text(d) for i, d in enumerate(docs)}
        self.tf = {
            i: {t: ts.count(t) for t in set(ts)} for i, ts in self.toks.items()
        }
        self.dl = {i: len(ts) for i, ts in self.toks.items()}
        self.dlq = {i: quantize_length(n) for i, n in self.dl.items()}
        self.df: dict[str, int] = {}
        for tf in self.tf.values():
            for t in tf:
                self.df[t] = self.df.get(t, 0) + 1
        self.n = len(docs)
        self.avgdl = sum(self.dl.values()) / self.n
        self.nchars = dict(enumerate(nchars))
        self.vocab = sorted(self.df)
        self.emb = {i: _py_embed(ts) for i, ts in self.toks.items() if ts}

    def idf(self, t: str) -> float:
        n = self.df.get(t, 0)
        return math.log(1.0 + (self.n - n + 0.5) / (n + 0.5))

    def tf_norm(self, tf: int, d: int) -> float:
        return tf / (tf + K1 * ((1 - B) + B * self.dlq[d] / self.avgdl))


def _py_embed(tokens: list[str]) -> list[float]:
    dims = [0.0] * N_DIMS
    for t in tokens:
        dims[len(t) % N_DIMS] += 1.0
    nrm = math.sqrt(sum(v * v for v in dims))
    return [v / nrm if nrm else 0.0 for v in dims]


def _round6(v: float) -> float:
    return math.floor(v * 1_000_000 + 0.5) / 1_000_000


def _membership(pc: PyCorpus, terms: set[str]) -> dict[int, float]:
    return {
        d: 1.0
        for d, tf in pc.tf.items()
        if any(t in tf for t in terms)
    }


def py_eval(pc: PyCorpus, clause: dict) -> dict[int, float]:
    """(docID → score) for one clause dict — parser semantics re-derived."""
    (ctype, body), = clause.items()
    if isinstance(body, dict) and "boost" in body:
        boost = float(body["boost"])
        inner = {ctype: {k: v for k, v in body.items() if k != "boost"}}
        return {d: s * boost for d, s in py_eval(pc, inner).items()}
    if ctype == "match":
        text = body["query"] if isinstance(body, dict) else body
        terms = sorted(set(tokenize_text(text)))
        op = body.get("operator", "or") if isinstance(body, dict) else "or"
        msm = (
            int(body.get("minimum_should_match", 0))
            if isinstance(body, dict)
            else 0
        )
        need = len(terms) if op == "and" else msm
        out = {}
        for d, tf in pc.tf.items():
            hit = [t for t in terms if t in tf]
            if not hit or len(hit) < need:
                continue
            out[d] = sum(pc.idf(t) * pc.tf_norm(tf[t], d) for t in hit)
        return out
    if ctype == "term":
        t = body if isinstance(body, str) else body["query"]
        return {
            d: pc.idf(t) * pc.tf_norm(tf[t], d)
            for d, tf in pc.tf.items()
            if t in tf
        }
    if ctype == "match_phrase":
        text = body["query"] if isinstance(body, dict) else body
        pt = tokenize_text(text)
        if not pt:
            return {}
        w = sum(pc.idf(t) for t in pt)  # duplicates included
        out = {}
        for d, ts in pc.toks.items():
            ptf = sum(
                1
                for i in range(len(ts) - len(pt) + 1)
                if ts[i : i + len(pt)] == pt
            )
            if ptf:
                out[d] = w * pc.tf_norm(ptf, d)
        return out
    if ctype == "prefix":
        v = (body["value"] if isinstance(body, dict) else body).lower()
        return _membership(pc, {t for t in pc.vocab if t.startswith(v)})
    if ctype == "fuzzy":
        v = (body["value"] if isinstance(body, dict) else body).lower()
        me = int(body.get("fuzziness", 1)) if isinstance(body, dict) else 1
        pl = int(body.get("prefix_length", 0)) if isinstance(body, dict) else 0
        cand = {
            t
            for t in pc.vocab
            if (pl == 0 or t.startswith(v[:pl]))
            and abs(len(t) - len(v)) <= me
            and _lev(t, v) <= me
        }
        return _membership(pc, cand)
    if ctype == "terms":
        vals = body if isinstance(body, list) else body["values"]
        return _membership(pc, {t.lower() for t in vals})
    if ctype == "wildcard":
        v = (body["value"] if isinstance(body, dict) else body).lower()
        rx = re.compile(
            "^" + "".join(".*" if c == "*" else "." if c == "?" else re.escape(c) for c in v) + "$"
        )
        return _membership(pc, {t for t in pc.vocab if rx.match(t)})
    if ctype == "regexp":
        v = body["value"] if isinstance(body, dict) else body
        rx = re.compile(f"^(?:{v})$")
        return _membership(pc, {t for t in pc.vocab if rx.match(t)})
    if ctype == "range":
        gte, lt = body.get("gte"), body.get("lt")
        out = {}
        for d, v in pc.nchars.items():
            if gte is not None and v < gte:
                continue
            if lt is not None and v >= lt:
                continue
            out[d] = 1.0
        return out
    if ctype == "match_all":
        return {d: 1.0 for d in pc.tf}
    if ctype == "ids":
        vals = body if isinstance(body, list) else body["values"]
        return {d: 1.0 for d in pc.tf if d in {int(v) for v in vals}}
    if ctype == "bool":
        must = [py_eval(pc, c) for c in body.get("must", [])]
        should = [py_eval(pc, c) for c in body.get("should", [])]
        msm = body.get("minimum_should_match")
        if msm is None:
            msm = 0 if must else 1
        out = {}
        cand = (
            set.intersection(*[set(m) for m in must])
            if must
            else set().union(*[set(s) for s in should])
        )
        for d in cand:
            matched = sum(1 for s in should if d in s)
            if should and msm > 0 and matched < msm:
                continue
            out[d] = sum(m[d] for m in must) + sum(s.get(d, 0.0) for s in should)
        return out
    if ctype == "dis_max":
        subs = [py_eval(pc, c) for c in body["queries"]]
        tb = float(body.get("tie_breaker", 0.0))
        out = {}
        for d in set().union(*[set(s) for s in subs]):
            vals = [s[d] for s in subs if d in s]
            out[d] = max(vals) + tb * (sum(vals) - max(vals))
        return out
    if ctype == "boosting":
        pos = py_eval(pc, body["positive"])
        neg = set(py_eval(pc, body["negative"]))
        nb = float(body.get("negative_boost", 0.5))
        return {d: (s * nb if d in neg else s) for d, s in pos.items()}
    if ctype == "constant_score":
        inner = py_eval(pc, body["filter"])
        boost = float(body.get("boost", 1.0))
        return {d: boost for d in inner}
    if ctype == "simple_query_string":
        q = body["query"] if isinstance(body, dict) else body
        parsed = parse_simple_query_string(q)
        clause_maps = []
        for c in parsed["should"]:
            if c["kind"] == "phrase":
                m = py_eval(pc, {"match_phrase": " ".join(c["terms"])})
                clause_maps.append({d: _round6(s) for d, s in m.items()})
            else:
                clause_maps.append(py_eval(pc, {"match": " ".join(c["terms"])}))
        if not clause_maps:
            return {}
        out: dict[int, float] = {}
        for m in clause_maps:
            for d, s in m.items():
                out[d] = out.get(d, 0.0) + s
        for mn in parsed["must_not"]:
            excl = set(py_eval(pc, {"match": " ".join(mn)}))
            out = {d: s for d, s in out.items() if d not in excl}
        return out
    if ctype == "neural":
        qv = _py_embed(tokenize_text(body["query"]))
        out = {
            d: _round6(sum(a * b for a, b in zip(e, qv)))
            for d, e in pc.emb.items()
        }
        ms = body.get("min_score")
        if ms is not None:
            out = {d: s for d, s in out.items() if s >= ms}
        return out
    if ctype == "neural_sparse":
        qt = body["_py_tokens"]
        out = {}
        for d, tf in pc.tf.items():
            s = sum(w * tf[t] for t, w in qt.items() if t in tf)
            if any(t in tf for t in qt):
                out[d] = s
        return out
    if ctype == "rank_feature":
        pivot = float(body["pivot"])
        boost = float(body.get("boost", 1.0))
        return {
            d: boost * v / (v + pivot) for d, v in pc.nchars.items() if v > 0
        }
    if ctype == "function_score":
        inner = py_eval(pc, body["query"])
        factor = float(body.get("factor", 1.0))
        return {
            d: s * math.log1p(factor * pc.nchars.get(d, 0))
            for d, s in inner.items()
        }
    raise AssertionError(f"py_eval missing kind {ctype}")


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


# ---------------------------------------------------------------------------
# Strategies
# ---------------------------------------------------------------------------

_tok = st.sampled_from(_VOCAB)
_text = st.lists(_tok, min_size=1, max_size=3).map(" ".join)
_boost = st.sampled_from([None, 0.5, 2.0])


def _with_boost(d: st.SearchStrategy) -> st.SearchStrategy:
    def add(t):
        clause, b = t
        if b is None:
            return clause
        (ctype, body), = clause.items()
        if not isinstance(body, dict):
            key = {
                "match": "query", "match_phrase": "query", "term": "query",
                "prefix": "value", "fuzzy": "value", "wildcard": "value",
                "regexp": "value", "simple_query_string": "query",
            }.get(ctype)
            if key is None:
                return clause  # list-bodied kinds keep their shorthand
            body = {key: body}
        return {ctype: {**body, "boost": b}}

    return st.tuples(d, _boost).map(add)


_leaf = st.one_of(
    st.builds(lambda t: {"match": t}, _text),
    st.builds(lambda t: {"match": {"query": t, "operator": "and"}}, _text),
    st.builds(
        lambda t, m: {"match": {"query": t, "minimum_should_match": m}},
        _text,
        st.integers(1, 2),
    ),
    st.builds(lambda t: {"term": t}, _tok),
    st.builds(lambda t: {"match_phrase": t}, _text),
    st.builds(lambda t: {"prefix": {"value": t[:3]}}, _tok),
    st.builds(
        lambda t, p: {"fuzzy": {"value": t, "fuzziness": 1, "prefix_length": p}},
        _tok,
        st.integers(0, 2),
    ),
    st.builds(lambda ts: {"terms": ts}, st.lists(_tok, min_size=1, max_size=3)),
    st.builds(lambda t: {"wildcard": {"value": t[:2] + "*"}}, _tok),
    st.builds(lambda t: {"regexp": {"value": t[:3] + ".*"}}, _tok),
    st.builds(
        lambda a, b: {"range": {"field": "nchars", "gte": min(a, b), "lt": max(a, b) + 1}},
        st.integers(0, 10),
        st.integers(0, 10),
    ),
    st.just({"match_all": {}}),
    st.builds(lambda ids: {"ids": ids}, st.lists(st.integers(0, 15), min_size=1, max_size=4)),
    st.builds(
        lambda ts, neg: {"simple_query_string": " ".join(ts) + (f" -{neg}" if neg else "")},
        st.lists(_tok, min_size=1, max_size=3),
        st.one_of(st.none(), _tok),
    ),
    st.builds(
        lambda t: {"neural": {"query": t, "_artifact": "emb"}},
        _text,
    ),
    st.builds(
        lambda toks: {
            "neural_sparse": {
                "_artifact": "spost",
                "_py_tokens": {t: round(1.0 + (len(t) % 3) * 0.5, 1) for t in toks},
            }
        },
        st.lists(_tok, min_size=1, max_size=3),
    ),
    st.builds(
        lambda p: {"rank_feature": {"field": "nchars", "pivot": p, "_artifact": "feats"}},
        st.sampled_from([2.0, 5.0]),
    ),
)

_clause = st.recursive(
    _with_boost(_leaf),
    lambda c: st.one_of(
        st.builds(
            lambda m, s, msm: {
                "bool": {
                    "must": m,
                    "should": s,
                    **({"minimum_should_match": msm} if s else {}),
                }
            },
            st.lists(c, min_size=0, max_size=2),
            st.lists(c, min_size=0, max_size=2),
            st.integers(0, 2),
        ).filter(lambda d: d["bool"]["must"] or d["bool"]["should"]),
        st.builds(
            lambda qs, tb: {"dis_max": {"queries": qs, "tie_breaker": tb}},
            st.lists(c, min_size=1, max_size=3),
            st.sampled_from([0.0, 0.3]),
        ),
        st.builds(
            lambda p, n, nb: {"boosting": {"positive": p, "negative": n, "negative_boost": nb}},
            c,
            c,
            st.sampled_from([0.2, 0.5]),
        ),
        st.builds(
            lambda f, b: {"constant_score": {"filter": f, "boost": b}},
            c,
            st.sampled_from([1.0, 3.0]),
        ),
        st.builds(
            lambda q, f: {"function_score": {"query": q, "field": "nchars", "factor": f, "_artifact": "feats"}},
            c,
            st.sampled_from([1.0, 2.0]),
        ),
    ),
    max_leaves=5,
)


def _bind_artifacts(clause, emb, spost, feats):
    """Replace _artifact markers with the real DataFrame handles (the
    strategy stays picklable/shrinkable; DataFrames are injected here)."""
    (ctype, body), = clause.items()
    if not isinstance(body, dict):
        return clause
    body = dict(body)
    art = body.pop("_artifact", None)
    if art == "emb":
        body["embeddings"] = emb
    elif art == "spost":
        body["postings"] = spost
        body["query_tokens"] = body["_py_tokens"]
    elif art == "feats":
        body["features"] = feats
    for key in ("must", "should", "queries"):
        if key in body:
            body[key] = [_bind_artifacts(c, emb, spost, feats) for c in body[key]]
    for key in ("positive", "negative", "filter", "query"):
        if key in body and isinstance(body[key], dict):
            body[key] = _bind_artifacts(body[key], emb, spost, feats)
    return {ctype: body}


@given(clause=_clause)
@hsettings(
    deadline=None,
    max_examples=200,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
def test_spec_parser_matches_python_evaluator(prop_setup, clause):
    eng, emb, spost, feats = prop_setup
    pc = _PC
    want = py_eval(pc, clause)
    bound = _bind_artifacts(clause, emb, spost, feats)
    got = {
        r["docID"]: r["score"]
        for r in _score_clause(eng, bound, None).collect()
    }
    assert set(got) == set(want), (clause, set(got) ^ set(want))
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-8, rel=1e-9), (
            clause,
            d,
            got[d],
            want[d],
        )


_PC = PyCorpus(_DOCS, [(i * 7) % 11 for i in range(len(_DOCS))])
