"""Independent pure-Python (non-Spark) oracle for pytest.

Implements, with the reference's float32 discipline (SURVEY.md §1.2):
standard-analyzer tokenization, Lucene BM25 with SmallFloat byte4 norm
quantization (k1=1.2, b=0.75, no (k1+1) factor — Lucene ≥ 8), and the
normalize/combine pipeline. Used to produce expected top-k docIDs/scores;
score tolerance 0.001 mirrors the reference ITs'
``DELTA_FOR_SCORE_ASSERTION`` (``testFixtures/.../util/TestUtils.java:43``),
rankings must be exact.

Float behavior mirrors Lucene/the plugin:
- ``avgdl``: float32 of (total tokens / doc count)   [BM25Similarity]
- per-term weight = float32(idf) computed in float64 log
- per-doc clause score: float32 per-term scores summed in float64,
  cast back to float32                                 [DisjunctionSumScorer]
- normalization/combination in float32 with float64 log/exp intermediates
  (``GeometricMeanScoreCombinationTechnique.java:44-58``).
"""

from __future__ import annotations

import math

import numpy as np

from neural_search_spark.analysis.tokenizer import tokenize_text
from neural_search_spark.index.smallfloat import quantize_length

K1 = 1.2
B = 0.75


class OracleIndex:
    def __init__(self, docs: dict[int, str]):
        self.tf: dict[int, dict[str, int]] = {}
        self.dl: dict[int, int] = {}
        self.df: dict[str, int] = {}
        for doc_id, text in docs.items():
            toks = tokenize_text(text)
            tf: dict[str, int] = {}
            for t in toks:
                tf[t] = tf.get(t, 0) + 1
            self.tf[doc_id] = tf
            self.dl[doc_id] = len(toks)
            for t in tf:
                self.df[t] = self.df.get(t, 0) + 1
        self.n_docs = len(docs)
        total = sum(self.dl.values())
        self.avgdl = np.float32(total / self.n_docs) if self.n_docs else np.float32(0)

    def idf(self, term: str) -> np.float32:
        n = self.df.get(term, 0)
        return np.float32(math.log(1.0 + (self.n_docs - n + 0.5) / (n + 0.5)))

    def clause_scores(self, terms: list[str], k1: float = K1, b: float = B) -> dict[int, np.float32]:
        """BM25 OR-clause: docID → float32 score (only matching docs)."""
        out: dict[int, float] = {}
        uniq = sorted(set(terms))
        for doc_id, tf_map in self.tf.items():
            acc = 0.0  # float64 accumulator, per Lucene disjunction scorer
            hit = False
            dlq = np.float32(quantize_length(self.dl[doc_id]))
            for t in uniq:
                tf = tf_map.get(t)
                if not tf:
                    continue
                hit = True
                norm = np.float32(k1) * (
                    np.float32(1 - b) + np.float32(b) * dlq / self.avgdl
                )
                term_score = self.idf(t) * (np.float32(tf) / (np.float32(tf) + norm))
                acc += float(term_score)
            if hit:
                out[doc_id] = np.float32(acc)
        return out

    def topk(self, terms: list[str], k: int) -> list[tuple[int, float]]:
        """Rank by score desc, docID asc (reference tie-break,
        ``ScoreCombiner.java:43-56``)."""
        scores = self.clause_scores(terms)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return [(d, float(s)) for d, s in ranked[:k]]


# ---------------------------------------------------------------------------
# normalization / combination oracle (float32)
# ---------------------------------------------------------------------------

MIN_SCORE = np.float32(0.001)


def normalize_min_max(scores: dict[int, float]) -> dict[int, np.float32]:
    """``MinMaxScoreNormalizationTechnique.java:258-295`` (no bounds)."""
    if not scores:
        return {}
    vals = [np.float32(v) for v in scores.values()]
    mn, mx = min(vals), max(vals)
    out = {}
    for d, s in scores.items():
        s = np.float32(s)
        if mx == mn:
            out[d] = np.float32(1.0)
            continue
        n = np.float32((s - mn) / (mx - mn))
        out[d] = MIN_SCORE if n == np.float32(0.0) else n
    return out


def normalize_l2(scores: dict[int, float]) -> dict[int, np.float32]:
    if not scores:
        return {}
    norm = np.float32(math.sqrt(sum(float(np.float32(v)) ** 2 for v in scores.values())))
    if norm == np.float32(0.0):
        return {d: np.float32(0.0) for d in scores}
    return {d: np.float32(np.float32(v) / norm) for d, v in scores.items()}


def normalize_z_score(scores: dict[int, float]) -> dict[int, np.float32]:
    """``ZScoreNormalizationTechnique.java:204-222``; DescriptiveStatistics
    uses the *sample* standard deviation (n-1)."""
    if not scores:
        return {}
    vals = np.array([np.float32(v) for v in scores.values()], dtype=np.float64)
    mean = np.float32(vals.mean())
    sd = np.float32(vals.std(ddof=1)) if len(vals) > 1 else np.float32(0.0)
    mx = np.float32(vals.max())
    mn = np.float32(vals.min())
    out = {}
    for d, s in scores.items():
        s = np.float32(s)
        if s == mean:
            out[d] = mx
        elif sd == np.float32(0.0):
            out[d] = mn
        else:
            z = np.float32((s - mean) / sd)
            out[d] = MIN_SCORE if z <= np.float32(0.0) else z
    return out


def normalize_rrf(scores: dict[int, float], rank_constant: int = 60) -> dict[int, np.float32]:
    """``RRFNormalizationTechnique.java:136-138``: 1/(rank_constant+pos+1),
    BigDecimal scale 10 HALF_UP, rank by score desc in collected order.

    Collected order: reference ranks by position within the clause's
    TopDocs, which is score desc with docID-asc tie-break.
    """
    from decimal import Decimal, ROUND_HALF_UP

    ranked = sorted(scores.items(), key=lambda kv: (-np.float32(kv[1]), kv[0]))
    out = {}
    for pos, (d, _) in enumerate(ranked):
        val = (Decimal(1) / Decimal(rank_constant + pos + 1)).quantize(
            Decimal("1e-10"), rounding=ROUND_HALF_UP
        )
        out[d] = np.float32(float(val))
    return out


def combine(
    per_clause: list[dict[int, np.float32]],
    technique: str = "arithmetic_mean",
    weights: list[float] | None = None,
) -> dict[int, np.float32]:
    """Combination over zero-filled score arrays
    (``ScoreCombiner.java:291-305`` zero-fills absent clauses)."""
    n = len(per_clause)
    w = [np.float32(x) for x in (weights or [1.0] * n)]
    all_docs = set()
    for c in per_clause:
        all_docs.update(c)
    out = {}
    for d in sorted(all_docs):
        arr = [np.float32(c.get(d, 0.0)) for c in per_clause]
        if technique == "arithmetic_mean":
            num = np.float32(0.0)
            den = np.float32(0.0)
            for s, wi in zip(arr, w):
                if s >= 0.0:
                    num += s * wi
                    den += wi
            out[d] = np.float32(0.0) if den == 0.0 else np.float32(num / den)
        elif technique == "harmonic_mean":
            sw = np.float32(0.0)
            sh = np.float32(0.0)
            for s, wi in zip(arr, w):
                if s <= 0.0:
                    continue
                sw += wi
                sh += np.float32(wi / s)
            out[d] = np.float32(sw / sh) if sh > 0 else np.float32(0.0)
        elif technique == "geometric_mean":
            sw = np.float32(0.0)
            sl = np.float32(0.0)
            for s, wi in zip(arr, w):
                if s <= 0.0:
                    continue
                sw += wi
                sl += np.float32(wi * np.float32(math.log(float(s))))
            out[d] = np.float32(0.0) if sw == 0.0 else np.float32(math.exp(float(sl / sw)))
        elif technique == "rrf":
            num = np.float32(0.0)
            den = np.float32(0.0)
            for s, wi in zip(arr, w):
                if s >= 0.0:
                    num += s * wi
                    den += wi
            out[d] = np.float32(0.0) if den == 0.0 else num
        else:
            raise ValueError(technique)
    return out
