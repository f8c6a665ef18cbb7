"""DuckDB oracle-SQL generators for the driver's correctness gate.

Each function renders an ANSI-SQL string, runnable by DuckDB over the
pre-registered ``documents`` view, that is semantically identical to the
corresponding Spark plan in :mod:`neural_search_spark.search`. The
analyzer, SmallFloat quantization, and BM25 formula are shared verbatim
(same regex pattern, same ``quantize_length_sql`` expression string, same
constants), so a hash-level match is expected, with scores rounded to 4
decimals on both sides to absorb float summation-order noise.
"""

from __future__ import annotations

from neural_search_spark.analysis.tokenizer import SQL_TOKEN_PATTERN
from neural_search_spark.index.smallfloat import quantize_length_sql


def _term_list(terms: list[str]) -> str:
    quoted = ", ".join("'" + t.replace("'", "''") + "'" for t in sorted(set(terms)))
    return f"[{quoted}]"


# Common prelude: corpus → tokens → tf → doc lengths → stats.
# `documents` is the driver's pre-registered view.
_PRELUDE = f"""
WITH corpus AS (
    SELECT CAST(doc_id AS BIGINT) AS docID, lower(text) AS t, source AS repo, lang
    FROM documents
),
toks AS (
    SELECT docID, unnest(regexp_extract_all(t, '{SQL_TOKEN_PATTERN}')) AS term
    FROM corpus
),
tf AS (
    SELECT docID, term, CAST(COUNT(*) AS INT) AS tf FROM toks GROUP BY docID, term
),
dls AS (
    SELECT c.docID, COALESCE(x.dl, 0) AS dl
    FROM corpus c LEFT JOIN (SELECT docID, COUNT(*) AS dl FROM toks GROUP BY docID) x
    ON c.docID = x.docID
),
stats AS (
    SELECT (SELECT COUNT(*) FROM corpus) AS n_docs,
           (SELECT CAST(COALESCE(SUM(dl), 0) AS DOUBLE) FROM dls) AS total
)
"""


def bm25_topk_sql(
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    doc_filter: str | None = None,
) -> str:
    """BM25 top-k over ``documents``. ``doc_filter`` is a predicate over the
    ``corpus`` CTE columns (repo/lang/docID); per Lucene semantics it
    restricts *candidates* only — idf and avgdl stay index-wide
    (filters are pushed into sub-queries, ``HybridQueryBuilder.java:107-122``,
    but Lucene stats never depend on the filter)."""
    dlq = quantize_length_sql("dls.dl")
    filt = (
        f"AND tf.docID IN (SELECT docID FROM corpus WHERE {doc_filter})"
        if doc_filter
        else ""
    )
    return f"""{_PRELUDE},
q AS (SELECT unnest({_term_list(terms)}) AS term),
nd AS (SELECT tf.term, COUNT(*) AS ndoc FROM tf JOIN q USING (term) GROUP BY tf.term),
scored AS (
    SELECT tf.docID,
           SUM(
             ln(1 + (s.n_docs - nd.ndoc + 0.5) / (nd.ndoc + 0.5))
             * tf.tf / (tf.tf + {k1} * ((1 - {b}) + {b} * {dlq} / (s.total / s.n_docs)))
           ) AS score
    FROM tf
    JOIN nd ON tf.term = nd.term
    JOIN dls ON tf.docID = dls.docID
    CROSS JOIN stats s
    WHERE 1=1 {filt}
    GROUP BY tf.docID
)
SELECT docID, ROUND(score, 4) AS score
FROM scored
ORDER BY score DESC, docID
LIMIT {k}
"""


def _clause_ctes(i: int, terms: list[str], k1: float, b: float, depth: int | None, doc_filter: str | None) -> str:
    dlq = quantize_length_sql("dls.dl")
    filt = (
        f"AND tf.docID IN (SELECT docID FROM corpus WHERE {doc_filter})"
        if doc_filter
        else ""
    )
    limit = f"ORDER BY score DESC, docID LIMIT {depth}" if depth is not None else ""
    return f"""
q{i} AS (SELECT unnest({_term_list(terms)}) AS term),
nd{i} AS (SELECT tf.term, COUNT(*) AS ndoc FROM tf JOIN q{i} USING (term) GROUP BY tf.term),
sc{i} AS (
    SELECT tf.docID,
           SUM(
             ln(1 + (s.n_docs - nd{i}.ndoc + 0.5) / (nd{i}.ndoc + 0.5))
             * tf.tf / (tf.tf + {k1} * ((1 - {b}) + {b} * {dlq} / (s.total / s.n_docs)))
           ) AS score
    FROM tf
    JOIN nd{i} ON tf.term = nd{i}.term
    JOIN dls ON tf.docID = dls.docID
    CROSS JOIN stats s
    WHERE 1=1 {filt}
    GROUP BY tf.docID
),
cut{i} AS (SELECT docID, score FROM sc{i} {limit})"""


def _normalize_cte(i: int, technique: str, rank_constant: int) -> str:
    if technique == "min_max":
        return f"""
n{i} AS (
    SELECT docID,
           CASE WHEN mx = mn THEN 1.0
                WHEN (score - mn) / (mx - mn) = 0.0 THEN 0.001
                ELSE (score - mn) / (mx - mn) END AS nscore
    FROM (SELECT docID, score, MIN(score) OVER () AS mn, MAX(score) OVER () AS mx FROM cut{i})
)"""
    if technique == "l2":
        return f"""
n{i} AS (
    SELECT docID, CASE WHEN nrm = 0.0 THEN 0.0 ELSE score / nrm END AS nscore
    FROM (SELECT docID, score, SQRT(SUM(score * score) OVER ()) AS nrm FROM cut{i})
)"""
    if technique == "z_score":
        return f"""
n{i} AS (
    SELECT docID,
           CASE WHEN score = mean THEN mx
                WHEN sd = 0.0 THEN mn
                WHEN (score - mean) / sd <= 0.0 THEN 0.001
                ELSE (score - mean) / sd END AS nscore
    FROM (SELECT docID, score,
                 AVG(score) OVER () AS mean,
                 COALESCE(STDDEV_SAMP(score) OVER (), 0.0) AS sd,
                 MAX(score) OVER () AS mx,
                 MIN(score) OVER () AS mn
          FROM cut{i})
)"""
    if technique == "rrf":
        return f"""
n{i} AS (
    SELECT docID,
           ROUND(1.0 / ({rank_constant} + ROW_NUMBER() OVER (ORDER BY score DESC, docID)), 10) AS nscore
    FROM cut{i}
)"""
    raise ValueError(technique)


def _combine_expr(technique: str, weights: list[float]) -> str:
    n = len(weights)
    s = [f"s_{i}" for i in range(n)]
    w = [repr(float(x)) for x in weights]
    if technique == "arithmetic_mean":
        num = " + ".join(f"{si} * {wi}" for si, wi in zip(s, w))
        return f"({num}) / ({' + '.join(w)})"
    if technique == "harmonic_mean":
        sw = " + ".join(f"CASE WHEN {si} > 0.0 THEN {wi} ELSE 0.0 END" for si, wi in zip(s, w))
        sh = " + ".join(f"CASE WHEN {si} > 0.0 THEN {wi} / {si} ELSE 0.0 END" for si, wi in zip(s, w))
        return f"CASE WHEN ({sh}) > 0.0 THEN ({sw}) / ({sh}) ELSE 0.0 END"
    if technique == "geometric_mean":
        sw = " + ".join(f"CASE WHEN {si} > 0.0 THEN {wi} ELSE 0.0 END" for si, wi in zip(s, w))
        sl = " + ".join(f"CASE WHEN {si} > 0.0 THEN {wi} * ln({si}) ELSE 0.0 END" for si, wi in zip(s, w))
        return f"CASE WHEN ({sw}) = 0.0 THEN 0.0 ELSE exp(({sl}) / ({sw})) END"
    if technique == "rrf":
        return " + ".join(f"{si} * {wi}" for si, wi in zip(s, w))
    raise ValueError(technique)


def hybrid_topk_sql(
    clause_terms: list[list[str]],
    normalization: str = "min_max",
    combination: str = "arithmetic_mean",
    weights: list[float] | None = None,
    k: int = 10,
    depth: int | None = 50,
    rank_constant: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
    doc_filter: str | None = None,
) -> str:
    """Full hybrid pipeline in DuckDB SQL, mirroring
    :func:`neural_search_spark.search.hybrid.hybrid_search`."""
    n = len(clause_terms)
    w = weights or [1.0] * n
    clause_sql = ",".join(_clause_ctes(i, t, k1, b, depth, doc_filter) for i, t in enumerate(clause_terms))
    norm_sql = ",".join(_normalize_cte(i, normalization, rank_constant) for i in range(n))
    union = " UNION ALL ".join(f"SELECT docID, {i} AS c, nscore FROM n{i}" for i in range(n))
    wide_cols = ", ".join(
        f"COALESCE(SUM(CASE WHEN c = {i} THEN nscore END), 0.0) AS s_{i}" for i in range(n)
    )
    return f"""{_PRELUDE},{clause_sql},{norm_sql},
long AS ({union}),
wide AS (SELECT docID, {wide_cols} FROM long GROUP BY docID),
comb AS (SELECT docID, {_combine_expr(combination, w)} AS score FROM wide)
SELECT docID, ROUND(score, 4) AS score
FROM comb
ORDER BY score DESC, docID
LIMIT {k}
"""


def hybrid_agg_sql(clause_terms: list[list[str]], group_col: str = "lang", k1: float = 1.2, b: float = 0.75) -> str:
    """Aggregation under a hybrid query (§2.7): each matching doc counted
    once with score = SUM of raw sub-query scores
    (``query/HybridQueryScorer.java:104-120``), bucketed by ``group_col``."""
    n = len(clause_terms)
    clause_sql = ",".join(_clause_ctes(i, t, k1, b, None, None) for i, t in enumerate(clause_terms))
    union = " UNION ALL ".join(f"SELECT docID, score FROM cut{i}" for i in range(n))
    return f"""{_PRELUDE},{clause_sql},
docsum AS (SELECT docID, SUM(score) AS score FROM ({union}) GROUP BY docID)
SELECT c.{group_col} AS {group_col},
       COUNT(*) AS doc_count,
       ROUND(SUM(d.score), 4) AS sum_score
FROM docsum d JOIN corpus c ON d.docID = c.docID
GROUP BY c.{group_col}
ORDER BY {group_col}
"""


def doclen_quantized_sql() -> str:
    """Whole-table (docID, dl, dlq) — gates the tokenizer + SmallFloat path."""
    dlq = quantize_length_sql("dls.dl")
    return f"""{_PRELUDE}
SELECT dls.docID, CAST(dls.dl AS BIGINT) AS dl, CAST({dlq} AS BIGINT) AS dlq
FROM dls
ORDER BY dls.docID
"""


def corpus_adapter_sql() -> str:
    """The corpus-shape adapter incl. the sha256 invariant column."""
    return """
SELECT CAST(doc_id AS BIGINT) AS docID,
       source AS repo,
       'src/' || CAST(doc_id AS VARCHAR) || '.txt' AS path,
       substr(sha256(text), 1, 40) AS commit_sha,
       lang,
       sha256(text) AS content_sha256
FROM documents
"""
