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
from neural_search_spark.pipeline.params import round6_sql


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
    min_term_match: int | None = None,
) -> str:
    """BM25 top-k over ``documents``. ``doc_filter`` is a predicate over the
    ``corpus`` CTE columns (repo/lang/docID); per Lucene semantics it
    restricts *candidates* only — idf and avgdl stay index-wide
    (filters are pushed into sub-queries, ``HybridQueryBuilder.java:107-122``,
    but Lucene stats never depend on the filter). ``min_term_match``
    requires that many distinct query terms per doc (operator=and passes
    the full distinct-term count; minimum_should_match passes its floor)."""
    dlq = quantize_length_sql("dls.dl")
    filt = (
        f"AND tf.docID IN (SELECT docID FROM corpus WHERE {doc_filter})"
        if doc_filter
        else ""
    )
    having = (
        f"HAVING COUNT(*) >= {int(min_term_match)}" if min_term_match is not None else ""
    )
    return f"""{_PRELUDE},
q AS (SELECT DISTINCT unnest({_term_list(terms)}) AS term),
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
    {having}
)
SELECT docID, ROUND(score, 4) AS score
FROM scored
ORDER BY score DESC, docID
LIMIT {k}
"""


def match_phrase_topk_sql(
    phrase_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """Exact-phrase (slop 0) BM25 twin of
    :func:`neural_search_spark.search.bm25.match_phrase_scores`:
    phrase tf = adjacent-run count over the analyzed token array; query
    weight = Σ idf over phrase positions (duplicates included)."""
    m = len(phrase_terms)
    dlq = quantize_length_sql("dls.dl")
    conds = " AND ".join(
        f"toks[i+{j}] = '{t.replace(chr(39), chr(39) * 2)}'"
        for j, t in enumerate(phrase_terms)
    )
    pos_terms = ", ".join("'" + t.replace("'", "''") + "'" for t in phrase_terms)
    return f"""{_PRELUDE},
toksa AS (
    SELECT docID, regexp_extract_all(t, '{SQL_TOKEN_PATTERN}') AS toks FROM corpus
),
pq AS (SELECT unnest([{pos_terms}]) AS term),
nd AS (
    SELECT tf.term, COUNT(*) AS ndoc
    FROM tf JOIN (SELECT DISTINCT term FROM pq) d USING (term)
    GROUP BY tf.term
),
qidf AS (
    SELECT SUM(ln(1 + (s.n_docs - nd.ndoc + 0.5) / (nd.ndoc + 0.5))) AS w
    FROM pq JOIN nd USING (term) CROSS JOIN stats s
),
ph AS (
    SELECT docID, COUNT(*) AS ptf
    FROM (SELECT docID, toks, unnest(generate_series(1, len(toks) - {m - 1})) AS i
          FROM toksa WHERE len(toks) >= {m})
    WHERE {conds}
    GROUP BY docID
)
SELECT ph.docID AS docID,
       ROUND(q.w * ph.ptf / (ph.ptf + {k1} * ((1 - {b}) + {b} * {dlq} / (s.total / s.n_docs))), 4) AS score
FROM ph
JOIN dls ON ph.docID = dls.docID
CROSS JOIN qidf q
CROSS JOIN stats s
ORDER BY score DESC, docID
LIMIT {k}
"""


def _clause_ctes(
    i: int,
    terms: list[str],
    k1: float,
    b: float,
    depth: int | None,
    doc_filter: str | None,
    boost: float | None = None,
) -> str:
    dlq = quantize_length_sql("dls.dl")
    filt = (
        f"AND tf.docID IN (SELECT docID FROM corpus WHERE {doc_filter})"
        if doc_filter
        else ""
    )
    limit = f"ORDER BY score DESC, docID LIMIT {depth}" if depth is not None else ""
    # boost multiplies AFTER the sum — the engine's BoostQuery wrapper
    # multiplies the clause's summed score, so the doubles stay identical
    mul = f" * {float(boost)!r}" if boost is not None else ""
    return f"""
q{i} AS (SELECT DISTINCT unnest({_term_list(terms)}) AS term),
nd{i} AS (SELECT tf.term, COUNT(*) AS ndoc FROM tf JOIN q{i} USING (term) GROUP BY tf.term),
sc{i} AS (
    SELECT tf.docID,
           SUM(
             ln(1 + (s.n_docs - nd{i}.ndoc + 0.5) / (nd{i}.ndoc + 0.5))
             * tf.tf / (tf.tf + {k1} * ((1 - {b}) + {b} * {dlq} / (s.total / s.n_docs)))
           ){mul} AS score
    FROM tf
    JOIN nd{i} ON tf.term = nd{i}.term
    JOIN dls ON tf.docID = dls.docID
    CROSS JOIN stats s
    WHERE 1=1 {filt}
    GROUP BY tf.docID
),
cut{i} AS (SELECT docID, score FROM sc{i} {limit})"""


# ---------------------------------------------------------------------------
# Dense (neural) clause support: the deterministic stand-in embedding model
# (dim = token length % n_dims, L2-normalized — pipeline/embedding.py) as
# shared CTEs, one normalized value column per dimension so the query dot
# product unrolls left-associated exactly like the Spark fold.
# ---------------------------------------------------------------------------


def _neural_prelude(n_dims: int = 8) -> str:
    dims = ",\n           ".join(
        f"COALESCE(SUM(CASE WHEN c.dim = {j} THEN c.v END), 0.0) / n.nrm AS d{j}"
        for j in range(n_dims)
    )
    return f"""
etoks AS (
    SELECT CAST(doc_id AS BIGINT) AS docID,
           unnest(regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}')) AS term
    FROM documents
),
ecnt AS (
    SELECT docID, CAST(length(term) % {n_dims} AS INT) AS dim,
           CAST(COUNT(*) AS DOUBLE) AS v
    FROM etoks GROUP BY docID, dim
),
enrm AS (SELECT docID, SQRT(SUM(v * v)) AS nrm FROM ecnt GROUP BY docID),
edim AS (
    SELECT c.docID,
           {dims}
    FROM ecnt c JOIN enrm n USING (docID)
    GROUP BY c.docID, n.nrm
)"""


def _neural_dot(qvec: list[float], prefix: str = "") -> str:
    """Left-associated unrolled dot against the literal query vector —
    same add order as the Spark ``aggregate`` fold → identical doubles."""
    return "(" + " + ".join(f"{prefix}d{j} * {float(q)!r}" for j, q in enumerate(qvec)) + ")"


def _neural_clause_ctes(i: int, qvec: list[float], depth: int | None, doc_filter: str | None) -> str:
    filt = (
        f"WHERE docID IN (SELECT docID FROM corpus WHERE {doc_filter})"
        if doc_filter
        else ""
    )
    limit = f"ORDER BY score DESC, docID LIMIT {depth}" if depth is not None else ""
    return f"""
sc{i} AS (
    SELECT docID, {round6_sql(_neural_dot(qvec))} AS score FROM edim {filt}
),
cut{i} AS (SELECT docID, score FROM sc{i} {limit})"""


def _cos8_sql(a: str, b: str, n_dims: int = 8) -> str:
    """Cosine between two 8-dim DuckDB lists, unrolled left-associated —
    same fold order as ``pipeline.ann._cosine`` (zip_with + aggregate)."""
    from neural_search_spark.pipeline.params import pairwise_dot_sql

    dot = pairwise_dot_sql(a, b, n_dims, one_based=True)
    na = pairwise_dot_sql(a, a, n_dims, one_based=True)
    nb = pairwise_dot_sql(b, b, n_dims, one_based=True)
    return f"({dot} / (sqrt({na}) * sqrt({nb})))"


def _neural_ann_clause_ctes(
    i: int,
    qvec: list[float],
    depth: int | None,
    doc_filter: str | None,
    kq: int,
    n_lists: int = 8,
    nprobe: int = 2,
    n_dims: int = 8,
) -> str:
    """IVF-pruned dense clause twin of
    :func:`neural_search_spark.search.neural.neural_clause_scores_ann`
    (method="ivf"): same deterministic coarse quantizer as the ann_ivf
    oracle (seeds = lowest docIDs, one Lloyd step with 6-dp per-dim means,
    argmax ties to the smaller list_id), probe = top-nprobe centroids by
    (cosine desc, list_id asc) against the literal query vector, clause
    score = round6 dot over the probed lists only, cut to the clause k."""
    from neural_search_spark.pipeline.params import dot_sql

    qlist = "[" + ", ".join(f"{float(v)!r}" for v in qvec) + "]"
    qq = " + ".join(f"{float(v)!r} * {float(v)!r}" for v in qvec)
    vdims = ", ".join(f"d{j}" for j in range(n_dims))
    # cosine(centroid, literal qv): dot unrolled over the centroid list,
    # |qv| rendered from the same literals the engine folds
    cq_dot = dot_sql("c", [float(v) for v in qvec], one_based=True)
    filt = (
        f"WHERE docID IN (SELECT docID FROM corpus WHERE {doc_filter})"
        if doc_filter
        else ""
    )
    cut_k = kq if depth is None else min(kq, depth)
    return f"""
ev{i} AS (SELECT docID, [{vdims}] AS v FROM edim),
seeds{i} AS (
    SELECT row_number() OVER (ORDER BY docID) - 1 AS list_id, v AS c
    FROM (SELECT * FROM ev{i} ORDER BY docID LIMIT {n_lists})
),
a0_{i} AS (
    SELECT docID, v, list_id,
           row_number() OVER (
               PARTITION BY docID
               ORDER BY {_cos8_sql('v', 'c', n_dims)} DESC, list_id ASC
           ) AS rn
    FROM ev{i}, seeds{i}
),
dims{i} AS (
    SELECT list_id, di, {round6_sql('avg(CAST(v[di] AS DOUBLE))')} AS m
    FROM (SELECT list_id, v, unnest(generate_series(1, {n_dims})) AS di
          FROM a0_{i} WHERE rn = 1)
    GROUP BY list_id, di
),
cents{i} AS (SELECT list_id, list(m ORDER BY di) AS c FROM dims{i} GROUP BY list_id),
a1_{i} AS (
    SELECT docID, v, list_id,
           row_number() OVER (
               PARTITION BY docID
               ORDER BY {_cos8_sql('v', 'c', n_dims)} DESC, list_id ASC
           ) AS rn
    FROM ev{i}, cents{i}
),
assigned{i} AS (SELECT docID, v, list_id FROM a1_{i} WHERE rn = 1),
probe{i} AS (
    SELECT list_id FROM cents{i}
    ORDER BY ({cq_dot}) / (sqrt({pairwise_dot8(n_dims)('c')}) * sqrt({qq})) DESC,
             list_id ASC
    LIMIT {nprobe}
),
sc{i} AS (
    SELECT a.docID, {round6_sql(dot_sql('a.v', [float(v) for v in qvec], one_based=True))} AS score
    FROM assigned{i} a JOIN probe{i} USING (list_id)
    {filt.replace('WHERE docID', 'WHERE a.docID') if filt else ''}
    ORDER BY score DESC, docID ASC
    LIMIT {cut_k}
),
cut{i} AS (SELECT docID, score FROM sc{i})"""


def _neural_ivfpq_clause_ctes(
    i: int,
    qvec: list[float],
    depth: int | None,
    doc_filter: str | None,
    kq: int,
    n_lists: int = 8,
    nprobe: int = 2,
    oversample: int = 3,
    pq_m: int = 2,
    pq_codes: int = 8,
    n_dims: int = 8,
) -> str:
    """IVF×PQ dense clause twin of
    :func:`neural_search_spark.search.neural.neural_clause_scores_ann`
    (method="ivfpq"): the IVF chain of :func:`_neural_ann_clause_ctes`
    prunes candidates to the probed lists, the PQ chain (per-subspace L2
    codebooks, lowest-docID seeds, one Lloyd step with 6-dp means, argmin
    ties to the smaller code — the ann_pq oracle recipe) ADC-scores ONLY
    those into a k×oversample window (round4, docID-asc tie-break), and
    the exact round6 dot rescores the window, cut to the clause k."""
    from neural_search_spark.pipeline.params import (
        dot_sql,
        pairwise_dot_sql,
        round4_sql,
    )
    from neural_search_spark.pipeline.sql import _l2_sub_sql

    subdim = n_dims // pq_m
    qd = [float(v) for v in qvec]
    qq = " + ".join(f"{v!r} * {v!r}" for v in qd)
    vdims = ", ".join(f"d{j}" for j in range(n_dims))
    cq_dot = dot_sql("c", qd, one_based=True)
    qsub_rows = " UNION ALL ".join(
        f"SELECT {mm} AS m, ["
        + ", ".join(f"{v!r}" for v in qd[mm * subdim : (mm + 1) * subdim])
        + "] AS qsv"
        for mm in range(pq_m)
    )
    sub_dot = pairwise_dot_sql("qs.qsv", "ct.c", subdim, one_based=True)
    cc_dot = pairwise_dot_sql("ct.c", "ct.c", subdim, one_based=True)
    code_cols = ", ".join(
        f"MAX(CASE WHEN m = {mm} THEN code END) AS c{mm}" for mm in range(pq_m)
    )
    adc_joins = "\n    ".join(
        f"JOIN adc{i} x{mm} ON x{mm}.m = {mm} AND x{mm}.code = cd.c{mm}"
        for mm in range(pq_m)
    )
    adot = " + ".join(f"x{mm}.pdot" for mm in range(pq_m))
    an2 = " + ".join(f"x{mm}.pn2" for mm in range(pq_m))
    filt = (
        f"WHERE e2.docID IN (SELECT docID FROM corpus WHERE {doc_filter})"
        if doc_filter
        else ""
    )
    cut_k = kq if depth is None else min(kq, depth)
    return f"""
ev{i} AS (SELECT docID, [{vdims}] AS v FROM edim),
seeds{i} AS (
    SELECT row_number() OVER (ORDER BY docID) - 1 AS list_id, v AS c
    FROM (SELECT * FROM ev{i} ORDER BY docID LIMIT {n_lists})
),
a0_{i} AS (
    SELECT docID, v, list_id,
           row_number() OVER (
               PARTITION BY docID
               ORDER BY {_cos8_sql('v', 'c', n_dims)} DESC, list_id ASC
           ) AS rn
    FROM ev{i}, seeds{i}
),
dims{i} AS (
    SELECT list_id, di, {round6_sql('avg(CAST(v[di] AS DOUBLE))')} AS m
    FROM (SELECT list_id, v, unnest(generate_series(1, {n_dims})) AS di
          FROM a0_{i} WHERE rn = 1)
    GROUP BY list_id, di
),
cents{i} AS (SELECT list_id, list(m ORDER BY di) AS c FROM dims{i} GROUP BY list_id),
a1_{i} AS (
    SELECT docID, v, list_id,
           row_number() OVER (
               PARTITION BY docID
               ORDER BY {_cos8_sql('v', 'c', n_dims)} DESC, list_id ASC
           ) AS rn
    FROM ev{i}, cents{i}
),
assigned{i} AS (SELECT docID, v, list_id FROM a1_{i} WHERE rn = 1),
probe{i} AS (
    SELECT list_id FROM cents{i}
    ORDER BY ({cq_dot}) / (sqrt({pairwise_dot8(n_dims)('c')}) * sqrt({qq})) DESC,
             list_id ASC
    LIMIT {nprobe}
),
cand{i} AS (SELECT a.docID FROM assigned{i} a JOIN probe{i} USING (list_id)),
pqms{i} AS (SELECT unnest(generate_series(0, {pq_m - 1})) AS m),
pqsub{i} AS (SELECT docID, m, v[m*{subdim}+1 : (m+1)*{subdim}] AS sv FROM ev{i}, pqms{i}),
pqsd{i} AS (
    SELECT row_number() OVER (ORDER BY docID) - 1 AS code, v
    FROM (SELECT * FROM ev{i} ORDER BY docID LIMIT {pq_codes})
),
pqseeds{i} AS (SELECT code, m, v[m*{subdim}+1 : (m+1)*{subdim}] AS c0 FROM pqsd{i}, pqms{i}),
pqa0{i} AS (
    SELECT s.docID, s.m, sd2.code, s.sv,
           row_number() OVER (
               PARTITION BY s.docID, s.m
               ORDER BY {_l2_sub_sql('s.sv', 'sd2.c0', subdim)} ASC, sd2.code ASC
           ) AS rn
    FROM pqsub{i} s JOIN pqseeds{i} sd2 USING (m)
),
pqdims{i} AS (
    SELECT m, code, si, {round6_sql('avg(CAST(sv[si] AS DOUBLE))')} AS mu
    FROM (SELECT m, code, sv, unnest(generate_series(1, {subdim})) AS si
          FROM pqa0{i} WHERE rn = 1)
    GROUP BY m, code, si
),
pqcents{i} AS (SELECT m, code, list(mu ORDER BY si) AS c FROM pqdims{i} GROUP BY m, code),
pqa1{i} AS (
    SELECT s.docID, s.m, ct.code,
           row_number() OVER (
               PARTITION BY s.docID, s.m
               ORDER BY {_l2_sub_sql('s.sv', 'ct.c', subdim)} ASC, ct.code ASC
           ) AS rn
    FROM pqsub{i} s JOIN pqcents{i} ct USING (m)
),
pqcodes{i} AS (SELECT docID, {code_cols} FROM pqa1{i} WHERE rn = 1 GROUP BY docID),
qsub{i} AS ({qsub_rows}),
adc{i} AS (
    SELECT ct.m, ct.code, {sub_dot} AS pdot, {cc_dot} AS pn2
    FROM pqcents{i} ct JOIN qsub{i} qs USING (m)
),
win{i} AS (
    SELECT cd.docID,
           {round4_sql(f'({adot}) / (sqrt({qq}) * sqrt({an2}))')} AS cscore
    FROM cand{i} JOIN pqcodes{i} cd USING (docID)
    {adc_joins}
    ORDER BY cscore DESC, cd.docID ASC
    LIMIT {int(kq) * int(oversample)}
),
sc{i} AS (
    SELECT e2.docID, {round6_sql(dot_sql('e2.v', qd, one_based=True))} AS score
    FROM ev{i} e2 JOIN win{i} USING (docID)
    {filt}
    ORDER BY score DESC, docID ASC
    LIMIT {cut_k}
),
cut{i} AS (SELECT docID, score FROM sc{i})"""


def pairwise_dot8(n_dims: int):
    """self-dot renderer for a list column (unrolled, left-associated)."""
    from neural_search_spark.pipeline.params import pairwise_dot_sql

    return lambda a: pairwise_dot_sql(a, a, n_dims, one_based=True)


def _sparse_clause_ctes(
    i: int, query_tokens: dict[str, float], depth: int | None, doc_filter: str | None
) -> str:
    """neural_sparse clause over the _PRELUDE tf rows; the clause score is
    rounded to 6 dp on BOTH engines (see search.neural — rounded clause
    scores make the normalization stats bit-identical across engines)."""
    filt = (
        f"AND tf.docID IN (SELECT docID FROM corpus WHERE {doc_filter})"
        if doc_filter
        else ""
    )
    limit = f"ORDER BY score DESC, docID LIMIT {depth}" if depth is not None else ""
    vals = ", ".join(f"('{t}', {float(w)!r})" for t, w in sorted(query_tokens.items()))
    return f"""
q{i}(term, qw) AS (VALUES {vals}),
sc{i} AS (
    SELECT tf.docID, {round6_sql(f"SUM(q{i}.qw * tf.tf)")} AS score
    FROM tf JOIN q{i} USING (term)
    WHERE 1=1 {filt}
    GROUP BY tf.docID
),
cut{i} AS (SELECT docID, score FROM sc{i} {limit})"""


def _sparse_two_phase_clause_ctes(
    i: int,
    hi: dict[str, float],
    lo: dict[str, float],
    window: int,
    depth: int | None,
    doc_filter: str | None,
) -> str:
    """Two-phase neural_sparse clause — the spec-path twin of the
    ``neural_sparse_two_phase_processor`` rewrite
    (``search/spec.py apply_two_phase_processor``): round6 heavy-token
    phase-1 scores select the top-``window`` candidates (score desc,
    docID asc); the light tokens rescore ONLY that window; docs outside
    the window keep their phase-1 score. All three roundings (phase 1,
    light sum, final sum) mirror the Spark plan exactly."""
    filt = (
        f"AND tf.docID IN (SELECT docID FROM corpus WHERE {doc_filter})"
        if doc_filter
        else ""
    )
    limit = f"ORDER BY score DESC, docID LIMIT {depth}" if depth is not None else ""
    hvals = ", ".join(f"('{t}', {float(w)!r})" for t, w in sorted(hi.items()))
    ctes = f"""
qh{i}(term, qw) AS (VALUES {hvals}),
p{i} AS (
    SELECT tf.docID, {round6_sql(f"SUM(qh{i}.qw * tf.tf)")} AS score
    FROM tf JOIN qh{i} USING (term)
    WHERE 1=1 {filt}
    GROUP BY tf.docID
),
w{i} AS (
    SELECT docID, score,
           row_number() OVER (ORDER BY score DESC, docID) AS rn
    FROM p{i}
)"""
    if not lo:
        return f"""{ctes},
sc{i} AS (SELECT docID, score FROM p{i}),
cut{i} AS (SELECT docID, score FROM sc{i} {limit})"""
    lvals = ", ".join(f"('{t}', {float(w)!r})" for t, w in sorted(lo.items()))
    return f"""{ctes},
ql{i}(term, qw) AS (VALUES {lvals}),
l{i} AS (
    SELECT tf.docID, {round6_sql(f"SUM(ql{i}.qw * tf.tf)")} AS score
    FROM tf JOIN ql{i} USING (term)
    WHERE tf.docID IN (SELECT docID FROM w{i} WHERE rn <= {int(window)})
    GROUP BY tf.docID
),
sc{i} AS (
    SELECT w.docID,
           {round6_sql("(w.score + COALESCE(l.score, 0.0))")} AS score
    FROM w{i} w LEFT JOIN l{i} l USING (docID)
),
cut{i} AS (SELECT docID, score FROM sc{i} {limit})"""


def match_only_text_topk_sql(terms: list[str], k: int = 10) -> str:
    """match against a ``match_only_text`` delegate raw field: docs-only
    index → constant 1.0 per matched term; score = count of distinct
    analyzed query terms present (twin of
    :func:`neural_search_spark.search.bm25.match_only_text_scores`)."""
    return f"""{_PRELUDE}
SELECT docID, ROUND(CAST(COUNT(*) AS DOUBLE), 4) AS score
FROM tf
WHERE term IN (SELECT unnest({_term_list(terms)}))
GROUP BY docID
ORDER BY score DESC, docID
LIMIT {int(k)}
"""


def token_count_range_sql(gte: int, lte: int) -> str:
    """Numeric range over the ANALYZED token count — the ``token_count``
    delegate raw field (TokenCountFieldMapper); matches score 1.0."""
    return f"""{_PRELUDE}
SELECT docID, 1.0 AS score
FROM dls
WHERE dl BETWEEN {int(gte)} AND {int(lte)}
ORDER BY docID
"""


def prefix_topk_sql(prefix: str, k: int = 10) -> str:
    """Constant-score prefix query: docs containing any term with the
    prefix score 1.0; top-k by docID asc (the deterministic tie-break)."""
    p = prefix.lower().replace("'", "''")
    return f"""{_PRELUDE}
SELECT DISTINCT docID, 1.0 AS score
FROM tf
WHERE starts_with(term, '{p}')
ORDER BY docID
LIMIT {k}
"""


def terms_topk_sql(terms: list[str], k: int = 10) -> str:
    """Constant-score terms query: membership in any of the exact terms."""
    return f"""{_PRELUDE},
q AS (SELECT unnest({_term_list(terms)}) AS term)
SELECT DISTINCT docID, 1.0 AS score
FROM tf JOIN q USING (term)
ORDER BY docID
LIMIT {k}
"""


def wildcard_topk_sql(pattern: str, k: int = 10) -> str:
    """Constant-score wildcard query twin: * → %, ? → _, LIKE over the
    distinct term dictionary."""
    like = (
        pattern.lower()
        .replace("\\", "\\\\")
        .replace("%", "\\%")
        .replace("_", "\\_")
        .replace("*", "%")
        .replace("?", "_")
        .replace("'", "''")
    )
    return f"""{_PRELUDE}
SELECT DISTINCT docID, 1.0 AS score
FROM tf
WHERE term LIKE '{like}' ESCAPE '\\'
ORDER BY docID
LIMIT {k}
"""


def range_topk_sql(field: str, gte: int, lt: int, k: int = 10) -> str:
    """Constant-score range query twin over a documents column."""
    return f"""
SELECT CAST(doc_id AS BIGINT) AS docID, 1.0 AS score
FROM documents
WHERE {field} >= {gte} AND {field} < {lt}
ORDER BY docID
LIMIT {k}
"""


def dis_max_topk_sql(
    clause_terms: list[list[str]],
    tie_breaker: float = 0.0,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """Twin of :func:`neural_search_spark.search.bm25.dis_max_scores` over
    match clauses: max + tie_breaker · Σ(others)."""
    n = len(clause_terms)
    clause_sql = ",".join(
        _clause_ctes(i, t, k1, b, None, None) for i, t in enumerate(clause_terms)
    )
    union = " UNION ALL ".join(f"SELECT docID, score FROM cut{i}" for i in range(n))
    return f"""{_PRELUDE},{clause_sql},
longd AS ({union}),
aggd AS (SELECT docID, MAX(score) AS mx, SUM(score) AS sm FROM longd GROUP BY docID)
SELECT docID, ROUND(mx + {float(tie_breaker)!r} * (sm - mx), 4) AS score
FROM aggd
ORDER BY score DESC, docID
LIMIT {k}
"""


def boosting_topk_sql(
    pos_terms: list[str],
    neg_terms: list[str],
    negative_boost: float,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """Twin of :func:`neural_search_spark.search.bm25.boosting_query_scores`:
    positive match scores, × negative_boost where the negative clause also
    matches (membership demotion, not exclusion)."""
    clause_sql = _clause_ctes(0, pos_terms, k1, b, None, None)
    negl = _term_list(neg_terms)
    return f"""{_PRELUDE},{clause_sql},
negd AS (
    SELECT DISTINCT docID FROM tf JOIN (SELECT unnest({negl}) AS term) nq USING (term)
)
SELECT sc0.docID,
       ROUND(CASE WHEN negd.docID IS NOT NULL
                  THEN sc0.score * {float(negative_boost)!r}
                  ELSE sc0.score END, 4) AS score
FROM sc0 LEFT JOIN negd ON sc0.docID = negd.docID
ORDER BY score DESC, sc0.docID
LIMIT {k}
"""


def constant_score_topk_sql(terms: list[str], boost: float, k: int = 10) -> str:
    """Twin of :func:`neural_search_spark.search.bm25.constant_score_query`
    wrapping a match clause: membership → score = boost."""
    return f"""{_PRELUDE},
q AS (SELECT DISTINCT unnest({_term_list(terms)}) AS term)
SELECT DISTINCT docID, {float(boost)!r} AS score
FROM tf JOIN q USING (term)
ORDER BY docID
LIMIT {k}
"""


def fuzzy_topk_sql(term: str, max_edits: int = 1, prefix_length: int = 0, k: int = 10) -> str:
    """Constant-score fuzzy query: docs containing any term within
    ``max_edits`` Levenshtein edits (sharing ``prefix_length`` chars)."""
    t = term.lower().replace("'", "''")
    pre = (
        f"starts_with(term, '{t[:prefix_length]}') AND " if prefix_length > 0 else ""
    )
    return f"""{_PRELUDE}
SELECT DISTINCT docID, 1.0 AS score
FROM tf
WHERE {pre}levenshtein(term, '{t}') <= {max_edits}
ORDER BY docID
LIMIT {k}
"""


def span_near_topk_sql(
    phrase_terms: list[str],
    slop: int = 0,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """Twin of :meth:`neural_search_spark.index.positions.PositionalIndex.span_near`:
    in-order proximity with per-gap slop, frequency = distinct reachable
    end positions, phrase BM25 formula."""
    distinct_terms = sorted(set(phrase_terms))
    dlq = quantize_length_sql("dls.dl")
    idx = {t: i for i, t in enumerate(distinct_terms)}
    pos_cols = ", ".join(
        f"[i - 1 FOR i IN generate_series(1, len(toks)) IF toks[i] = '{t.replace(chr(39), chr(39) * 2)}'] AS p{i}"
        for t, i in idx.items()
    )
    non_empty = " AND ".join(f"len(p{i}) > 0" for i in range(len(distinct_terms)))
    chain = f"p{idx[phrase_terms[0]]}"
    for t in phrase_terms[1:]:
        steps = ", ".join(
            f"list_intersect(list_transform({chain}, x -> x + {d}), p{idx[t]})"
            for d in range(1, slop + 2)
        )
        if slop == 0:
            chain = f"list_intersect(list_transform({chain}, x -> x + 1), p{idx[t]})"
        else:
            chain = f"list_distinct(list_concat({steps}))"
    pos_terms = ", ".join("'" + t.replace("'", "''") + "'" for t in phrase_terms)
    return f"""{_PRELUDE},
toksa AS (
    SELECT docID, regexp_extract_all(t, '{SQL_TOKEN_PATTERN}') AS toks FROM corpus
),
pq AS (SELECT unnest([{pos_terms}]) AS term),
nd AS (
    SELECT tf.term, COUNT(*) AS ndoc
    FROM tf JOIN (SELECT DISTINCT term FROM pq) d USING (term)
    GROUP BY tf.term
),
qidf AS (
    SELECT SUM(ln(1 + (s.n_docs - nd.ndoc + 0.5) / (nd.ndoc + 0.5))) AS w
    FROM pq JOIN nd USING (term) CROSS JOIN stats s
),
wide AS (
    SELECT docID, {pos_cols} FROM toksa
),
ph AS (
    SELECT docID, len({chain}) AS ptf
    FROM wide WHERE {non_empty}
)
SELECT ph.docID AS docID,
       ROUND(q.w * ph.ptf / (ph.ptf + {k1} * ((1 - {b}) + {b} * {dlq} / (s.total / s.n_docs))), 4) AS score
FROM ph
JOIN dls ON ph.docID = dls.docID
CROSS JOIN qidf q
CROSS JOIN stats s
WHERE ph.ptf > 0
ORDER BY score DESC, docID
LIMIT {k}
"""


def bool_topk_sql(
    must_terms: list[list[str]],
    should_terms: list[list[str]] | None = None,
    must_not_terms: list[list[str]] | None = None,
    minimum_should_match: int | None = None,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """Twin of :func:`neural_search_spark.search.bm25.bool_query_scores`
    (lexical clauses): must = inner joins, should = left/full joins with
    zero-fill, must_not = NOT IN, score added in the same written order."""
    should_terms = should_terms or []
    must_not_terms = must_not_terms or []
    nm, ns = len(must_terms), len(should_terms)
    if minimum_should_match is None:
        minimum_should_match = 0 if must_terms else 1
    all_clauses = list(must_terms) + list(should_terms) + list(must_not_terms)
    ctes = ",".join(
        _clause_ctes(i, t, k1, b, None, None) for i, t in enumerate(all_clauses)
    )
    cols = [f"cut{i}.score AS m{i}" for i in range(nm)] + [
        f"cut{nm + j}.score AS s{j}" for j in range(ns)
    ]
    if nm:
        joins = ["cut0"]
        joins += [f"JOIN cut{i} USING (docID)" for i in range(1, nm)]
        joins += [f"LEFT JOIN cut{nm + j} USING (docID)" for j in range(ns)]
    else:
        joins = ["cut0"]
        joins += [f"FULL JOIN cut{j} USING (docID)" for j in range(1, ns)]
    msm_pred = ""
    if ns and minimum_should_match > 0:
        cnt = " + ".join(
            f"(CASE WHEN cut{nm + j}.score IS NOT NULL THEN 1 ELSE 0 END)"
            for j in range(ns)
        )
        msm_pred = f"WHERE {cnt} >= {minimum_should_match}"
    score_terms = [f"m{i}" for i in range(nm)] + [
        f"COALESCE(s{j}, 0.0)" for j in range(ns)
    ]
    score = " + ".join(score_terms)
    not_in = " AND ".join(
        f"docID NOT IN (SELECT docID FROM cut{nm + ns + l})"
        for l in range(len(must_not_terms))
    )
    where_not = f"WHERE {not_in}" if not_in else ""
    return f"""{_PRELUDE},{ctes},
base AS (
    SELECT docID, {', '.join(cols)}
    FROM {' '.join(joins)}
    {msm_pred}
)
SELECT docID, ROUND({score}, 4) AS score
FROM base
{where_not}
ORDER BY score DESC, docID
LIMIT {k}
"""


#: documents-view SQL expression for each multi_match-able corpus field
#: (mirrors neural_search_spark.corpus.corpus_from_documents)
MULTI_MATCH_FIELD_EXPRS = {
    "content": "lower(text)",
    "repo": "lower(source)",
    "lang": "lower(lang)",
}


def multi_match_phrase_topk_sql(
    fields: dict[str, float],
    phrase_terms: list[str],
    tie_breaker: float = 0.0,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """Twin of ``multi_match_scores(match_type="phrase")``: each field runs
    the exact-phrase BM25 formula against its own statistics; fields
    combine DisMax (max + tie_breaker · rest) like best_fields
    (``MultiMatchQueryBuilder.Type.PHRASE``)."""
    m = len(phrase_terms)
    field_items = sorted(fields.items())
    conds = " AND ".join(
        f"toks[i+{j}] = '{t.replace(chr(39), chr(39) * 2)}'"
        for j, t in enumerate(phrase_terms)
    )
    pos_terms = ", ".join("'" + t.replace("'", "''") + "'" for t in phrase_terms)
    parts = [f"pq AS (SELECT unnest([{pos_terms}]) AS term)"]
    for i, (fld, boost) in enumerate(field_items):
        expr = MULTI_MATCH_FIELD_EXPRS[fld]
        dlq = quantize_length_sql(f"dlsf{i}.dl")
        parts.append(f"""
cf{i} AS (SELECT CAST(doc_id AS BIGINT) AS docID, {expr} AS t FROM documents),
toksf{i} AS (
    SELECT docID, unnest(regexp_extract_all(t, '{SQL_TOKEN_PATTERN}')) AS term FROM cf{i}
),
tff{i} AS (
    SELECT docID, term, CAST(COUNT(*) AS INT) AS tf FROM toksf{i} GROUP BY docID, term
),
dlsf{i} AS (
    SELECT c.docID, COALESCE(x.dl, 0) AS dl
    FROM cf{i} c LEFT JOIN (SELECT docID, COUNT(*) AS dl FROM toksf{i} GROUP BY docID) x
    ON c.docID = x.docID
),
statsf{i} AS (
    SELECT (SELECT COUNT(*) FROM cf{i}) AS n_docs,
           (SELECT CAST(COALESCE(SUM(dl), 0) AS DOUBLE) FROM dlsf{i}) AS total
),
ndf{i} AS (
    SELECT tff{i}.term, COUNT(*) AS ndoc
    FROM tff{i} JOIN (SELECT DISTINCT term FROM pq) qd{i} USING (term)
    GROUP BY tff{i}.term
),
qidff{i} AS (
    SELECT SUM(ln(1 + (s.n_docs - ndf{i}.ndoc + 0.5) / (ndf{i}.ndoc + 0.5))) AS w
    FROM pq JOIN ndf{i} USING (term) CROSS JOIN statsf{i} s
),
toksa{i} AS (
    SELECT docID, regexp_extract_all(t, '{SQL_TOKEN_PATTERN}') AS toks FROM cf{i}
),
phf{i} AS (
    SELECT docID, COUNT(*) AS ptf
    FROM (SELECT docID, toks, unnest(generate_series(1, len(toks) - {m - 1})) AS i
          FROM toksa{i} WHERE len(toks) >= {m})
    WHERE {conds}
    GROUP BY docID
),
scf{i} AS (
    SELECT phf{i}.docID,
           (q.w * phf{i}.ptf
            / (phf{i}.ptf + {k1} * ((1 - {b}) + {b} * {dlq} / (s.total / s.n_docs))))
           * {float(boost)!r} AS fscore
    FROM phf{i}
    JOIN dlsf{i} ON phf{i}.docID = dlsf{i}.docID
    CROSS JOIN qidff{i} q
    CROSS JOIN statsf{i} s
)""")
    union = " UNION ALL ".join(
        f"SELECT docID, fscore FROM scf{i}" for i in range(len(field_items))
    )
    return f"""
WITH {','.join(parts)},
longf AS ({union}),
aggf AS (SELECT docID, MAX(fscore) AS mx, SUM(fscore) AS sm FROM longf GROUP BY docID)
SELECT docID, ROUND(mx + {float(tie_breaker)!r} * (sm - mx), 4) AS score
FROM aggf
ORDER BY score DESC, docID
LIMIT {k}
"""


def multi_match_topk_sql(
    fields: dict[str, float],
    terms: list[str],
    match_type: str = "best_fields",
    tie_breaker: float = 0.0,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """Twin of :func:`neural_search_spark.search.bm25.multi_match_scores`:
    per-field BM25 with per-field df/avgdl statistics, DisMax
    (best_fields + tie_breaker) or sum (most_fields) combine."""
    field_items = sorted(fields.items())
    parts = []
    for i, (fld, _) in enumerate(field_items):
        expr = MULTI_MATCH_FIELD_EXPRS[fld]
        dlq = quantize_length_sql(f"dlsf{i}.dl")
        parts.append(f"""
cf{i} AS (SELECT CAST(doc_id AS BIGINT) AS docID, {expr} AS t FROM documents),
toksf{i} AS (
    SELECT docID, unnest(regexp_extract_all(t, '{SQL_TOKEN_PATTERN}')) AS term FROM cf{i}
),
tff{i} AS (
    SELECT docID, term, CAST(COUNT(*) AS INT) AS tf FROM toksf{i} GROUP BY docID, term
),
dlsf{i} AS (
    SELECT c.docID, COALESCE(x.dl, 0) AS dl
    FROM cf{i} c LEFT JOIN (SELECT docID, COUNT(*) AS dl FROM toksf{i} GROUP BY docID) x
    ON c.docID = x.docID
),
statsf{i} AS (
    SELECT (SELECT COUNT(*) FROM cf{i}) AS n_docs,
           (SELECT CAST(COALESCE(SUM(dl), 0) AS DOUBLE) FROM dlsf{i}) AS total
),
ndf{i} AS (
    SELECT tff{i}.term, COUNT(*) AS ndoc
    FROM tff{i} JOIN (SELECT DISTINCT term FROM q) qd{i} USING (term)
    GROUP BY tff{i}.term
),
scf{i} AS (
    SELECT tff{i}.docID,
           SUM(
             ln(1 + (s.n_docs - ndf{i}.ndoc + 0.5) / (ndf{i}.ndoc + 0.5))
             * tff{i}.tf / (tff{i}.tf + {k1} * ((1 - {b}) + {b} * {dlq} / (s.total / s.n_docs)))
           ) * {float(field_items[i][1])!r} AS fscore
    FROM tff{i}
    JOIN ndf{i} ON tff{i}.term = ndf{i}.term
    JOIN dlsf{i} ON tff{i}.docID = dlsf{i}.docID
    CROSS JOIN statsf{i} s
    GROUP BY tff{i}.docID
)""")
    union = " UNION ALL ".join(f"SELECT docID, fscore FROM scf{i}" for i in range(len(field_items)))
    if match_type == "best_fields":
        score = f"mx + {float(tie_breaker)!r} * (sm - mx)"
    elif match_type == "most_fields":
        score = "sm"
    else:
        raise ValueError(f"unknown multi_match type {match_type}")
    return f"""
WITH q AS (SELECT unnest({_term_list(terms)}) AS term),
{','.join(parts)},
longf AS ({union}),
aggf AS (SELECT docID, MAX(fscore) AS mx, SUM(fscore) AS sm FROM longf GROUP BY docID)
SELECT docID, ROUND({score}, 4) AS score
FROM aggf
ORDER BY score DESC, docID
LIMIT {k}
"""


def _phrase_clause_ctes(
    i: int, phrase_terms: list[str], k1: float, b: float, depth: int | None, doc_filter: str | None
) -> str:
    """match_phrase clause (slop 0) — same formula as
    :func:`match_phrase_topk_sql`, clause score rounded to 6 dp at the
    clause boundary (like sparse/neural) so normalization stats are
    computed over bit-identical values on both engines."""
    m = len(phrase_terms)
    dlq = quantize_length_sql("dls.dl")
    conds = " AND ".join(
        f"toks[p+{j}] = '{t.replace(chr(39), chr(39) * 2)}'"
        for j, t in enumerate(phrase_terms)
    )
    pos_terms = ", ".join("'" + t.replace("'", "''") + "'" for t in phrase_terms)
    filt = (
        f"AND ph{i}.docID IN (SELECT docID FROM corpus WHERE {doc_filter})"
        if doc_filter
        else ""
    )
    limit = f"ORDER BY score DESC, docID LIMIT {depth}" if depth is not None else ""
    score = round6_sql(
        f"q.w * ph{i}.ptf / (ph{i}.ptf + {k1} * ((1 - {b}) + {b} * {dlq} / (s.total / s.n_docs)))"
    )
    return f"""
toksa{i} AS (
    SELECT docID, regexp_extract_all(t, '{SQL_TOKEN_PATTERN}') AS toks FROM corpus
),
pq{i} AS (SELECT unnest([{pos_terms}]) AS term),
nd{i} AS (
    SELECT tf.term, COUNT(*) AS ndoc
    FROM tf JOIN (SELECT DISTINCT term FROM pq{i}) d USING (term)
    GROUP BY tf.term
),
qidf{i} AS (
    SELECT SUM(ln(1 + (s.n_docs - nd{i}.ndoc + 0.5) / (nd{i}.ndoc + 0.5))) AS w
    FROM pq{i} JOIN nd{i} USING (term) CROSS JOIN stats s
),
ph{i} AS (
    SELECT docID, COUNT(*) AS ptf
    FROM (SELECT docID, toks, unnest(generate_series(1, len(toks) - {m - 1})) AS p
          FROM toksa{i} WHERE len(toks) >= {m})
    WHERE {conds}
    GROUP BY docID
),
sc{i} AS (
    SELECT ph{i}.docID, {score} AS score
    FROM ph{i}
    JOIN dls ON ph{i}.docID = dls.docID
    CROSS JOIN qidf{i} q
    CROSS JOIN stats s
    WHERE 1=1 {filt}
),
cut{i} AS (SELECT docID, score FROM sc{i} {limit})"""


def _bool_clause_ctes(
    i: int,
    must: list[list[str]],
    should: list[list[str]],
    minimum_should_match: int,
    k1: float,
    b: float,
    depth: int | None,
    doc_filter: str | None,
    must_not: list[list[str]] | None = None,
) -> str:
    """bool sub-query inside a hybrid: the bool_topk_sql composition
    exposed as a clause's sc{i}/cut{i} CTE pair. Sub-clause CTEs use the
    offset namespace (i+1)*100 + j to avoid collisions. must_not is
    membership-only exclusion (NOT IN over the sub-clause cut), matching
    bool_topk_sql and the engine's bool_query_scores."""
    must_not = must_not or []
    nm, ns, nn = len(must), len(should), len(must_not)
    base_idx = (i + 1) * 100
    subs = list(must) + list(should) + list(must_not)

    # a sub-clause is either a plain term list or {"terms": [...],
    # "boost": x} — the BoostQuery wrap on a bool sub-clause
    def _sub(t):
        if isinstance(t, dict):
            return t["terms"], t.get("boost")
        return t, None

    ctes = ",".join(
        _clause_ctes(base_idx + j, _sub(t)[0], k1, b, None, doc_filter, boost=_sub(t)[1])
        for j, t in enumerate(subs)
    )
    if nm:
        joins = [f"cut{base_idx}"]
        joins += [f"JOIN cut{base_idx + j} USING (docID)" for j in range(1, nm)]
        joins += [f"LEFT JOIN cut{base_idx + nm + j} USING (docID)" for j in range(ns)]
    else:
        joins = [f"cut{base_idx}"]
        joins += [f"FULL JOIN cut{base_idx + j} USING (docID)" for j in range(1, ns)]
    conds = []
    if ns and minimum_should_match > 0:
        cnt = " + ".join(
            f"(CASE WHEN cut{base_idx + nm + j}.score IS NOT NULL THEN 1 ELSE 0 END)"
            for j in range(ns)
        )
        conds.append(f"{cnt} >= {minimum_should_match}")
    for j in range(nn):
        conds.append(f"docID NOT IN (SELECT docID FROM cut{base_idx + nm + ns + j})")
    pred = f"WHERE {' AND '.join(conds)}" if conds else ""
    score_terms = [f"cut{base_idx + j}.score" for j in range(nm)] + [
        f"COALESCE(cut{base_idx + nm + j}.score, 0.0)" for j in range(ns)
    ]
    score = " + ".join(score_terms)
    limit = f"ORDER BY score DESC, docID LIMIT {depth}" if depth is not None else ""
    return f"""{ctes},
sc{i} AS (
    SELECT docID, {score} AS score
    FROM {' '.join(joins)}
    {pred}
),
cut{i} AS (SELECT docID, score FROM sc{i} {limit})"""


def _prefix_clause_ctes(i: int, prefix: str, depth: int | None, doc_filter: str | None) -> str:
    """Constant-score prefix clause inside a hybrid (MultiTermQuery
    CONSTANT_SCORE rewrite — every matching doc scores 1.0; the depth cut
    falls back to the docID-asc tie-break)."""
    p = prefix.lower().replace("'", "''")
    filt = (
        f"AND tf.docID IN (SELECT docID FROM corpus WHERE {doc_filter})"
        if doc_filter
        else ""
    )
    limit = f"ORDER BY score DESC, docID LIMIT {depth}" if depth is not None else ""
    return f"""
sc{i} AS (
    SELECT DISTINCT docID, 1.0 AS score FROM tf
    WHERE starts_with(term, '{p}') {filt}
),
cut{i} AS (SELECT docID, score FROM sc{i} {limit})"""


def _mixed_clause_ctes(
    i: int, spec: dict, k1: float, b: float, depth: int | None, doc_filter: str | None
) -> str:
    kind = spec["kind"]
    if kind == "bool":
        extra = set(spec) - {"kind", "must", "should", "must_not", "minimum_should_match"}
        if extra:
            raise ValueError(f"unsupported bool clause keys {sorted(extra)}")
        return _bool_clause_ctes(
            i,
            spec.get("must", []),
            spec.get("should", []),
            spec.get("minimum_should_match", 0),
            k1,
            b,
            depth,
            doc_filter,
            must_not=spec.get("must_not", []),
        )
    if kind == "match":
        return _clause_ctes(
            i, spec["terms"], k1, b, depth, doc_filter, boost=spec.get("boost")
        )
    if kind == "neural":
        return _neural_clause_ctes(i, spec["qvec"], depth, doc_filter)
    if kind == "neural_ann":
        return _neural_ann_clause_ctes(
            i,
            spec["qvec"],
            depth,
            doc_filter,
            kq=spec["k"],
            n_lists=spec.get("n_lists", 8),
            nprobe=spec.get("nprobe", 2),
        )
    if kind == "neural_ivfpq":
        return _neural_ivfpq_clause_ctes(
            i,
            spec["qvec"],
            depth,
            doc_filter,
            kq=spec["k"],
            n_lists=spec.get("n_lists", 8),
            nprobe=spec.get("nprobe", 2),
            oversample=spec.get("oversample", 3),
            pq_m=spec.get("pq_m", 2),
            pq_codes=spec.get("pq_codes", 8),
        )
    if kind == "sparse":
        return _sparse_clause_ctes(i, spec["tokens"], depth, doc_filter)
    if kind == "sparse_two_phase":
        return _sparse_two_phase_clause_ctes(
            i, spec["hi"], spec["lo"], spec["window"], depth, doc_filter
        )
    if kind == "phrase":
        return _phrase_clause_ctes(i, spec["terms"], k1, b, depth, doc_filter)
    if kind == "prefix":
        return _prefix_clause_ctes(i, spec["prefix"], depth, doc_filter)
    raise ValueError(f"unknown clause kind {kind}")


def hybrid_mixed_topk_sql(
    clauses: list[dict],
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
    """Hybrid pipeline over HETEROGENEOUS clause types — lexical BM25,
    dense stand-in kNN, neural_sparse — mirroring
    :func:`neural_search_spark.search.hybrid.hybrid_search` fed by
    :mod:`neural_search_spark.search.neural` / ``search.sparse`` clauses.
    Clause spec dicts: ``{"kind": "match", "terms": [...]}``,
    ``{"kind": "neural", "qvec": [...]}``, ``{"kind": "sparse",
    "tokens": {...}}``."""
    n = len(clauses)
    w = weights or [1.0] * n
    needs_emb = any(
        c["kind"] in ("neural", "neural_ann", "neural_ivfpq") for c in clauses
    )
    prelude = _PRELUDE + ("," + _neural_prelude() if needs_emb else "")
    clause_sql = ",".join(
        _mixed_clause_ctes(i, c, k1, b, depth, doc_filter) for i, c in enumerate(clauses)
    )
    norm_sql = ",".join(_normalize_cte(i, normalization, rank_constant) for i in range(n))
    union = " UNION ALL ".join(f"SELECT docID, {i} AS c, nscore FROM n{i}" for i in range(n))
    wide_cols = ", ".join(
        f"COALESCE(SUM(CASE WHEN c = {i} THEN nscore END), 0.0) AS s_{i}" for i in range(n)
    )
    return f"""{prelude},{clause_sql},{norm_sql},
long AS ({union}),
wide AS (SELECT docID, {wide_cols} FROM long GROUP BY docID),
comb AS (SELECT docID, {_combine_expr(combination, w)} AS score FROM wide)
SELECT docID, ROUND(score, 4) AS score
FROM comb
ORDER BY score DESC, docID
LIMIT {k}
"""


def neural_topk_sql(
    qvec: list[float],
    k: int = 10,
    min_score: float | None = None,
    max_distance: float | None = None,
) -> str:
    """Standalone dense ``neural`` query (the NeuralKNNQueryBuilder rewrite
    surface: k + optional min_score OR max_distance over the stand-in
    embedding column; the distance bound is 2·(1−score) ≤ max_distance²
    on the rounded score, matching ``search.neural``)."""
    score = round6_sql(_neural_dot(qvec))
    filt = ""
    if min_score is not None:
        filt = f"WHERE {score} >= {float(min_score)!r}"
    elif max_distance is not None:
        filt = f"WHERE 2.0 * (1.0 - {score}) <= {float(max_distance) ** 2!r}"
    return f"""
WITH {_neural_prelude().strip()}
SELECT docID, {score} AS score
FROM edim
{filt}
ORDER BY score DESC, docID
LIMIT {k}
"""


def neural_batch_topk_sql(query_vectors: dict[int, list[float]], k: int = 10) -> str:
    """Batched dense retrieval twin: every query vector scored against the
    stand-in embedding view in one pass, per-qid round6-then-cut window —
    mirrors :func:`neural_search_spark.search.neural.neural_batch_topk`."""
    branches = "\n    UNION ALL ".join(
        f"SELECT {int(qid)} AS qid, docID, {round6_sql(_neural_dot(qv))} AS score FROM edim"
        for qid, qv in sorted(query_vectors.items())
    )
    return f"""
WITH {_neural_prelude().strip()},
s AS (
    {branches}
),
r AS (
    SELECT qid, docID, score,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, docID) AS rn
    FROM s
)
SELECT CAST(qid AS INT) AS qid, docID, score
FROM r WHERE rn <= {int(k)}
ORDER BY qid, score DESC, docID
"""


def neural_nested_sql(
    qvec: list[float],
    delimiter: str,
    k: int = 10,
    expand_nested: bool = False,
    n_dims: int = 8,
) -> str:
    """Twin of :func:`neural_search_spark.search.neural.neural_nested_scores`:
    delimiter-chunked nested docs, stand-in embedding per chunk, cosine vs
    the query (6 dp), parents ranked by best chunk (score_mode=max).
    ``expand_nested`` switches between the per-parent inner-hit view and
    every chunk row of the selected parents."""
    d = delimiter.replace("'", "''")
    dims = ",\n           ".join(
        f"COALESCE(SUM(CASE WHEN c.dim = {j} THEN c.v END), 0.0) / n.nrm AS d{j}"
        for j in range(n_dims)
    )
    score = round6_sql(_neural_dot(qvec))
    base = f"""
WITH split AS (
    SELECT CAST(doc_id AS BIGINT) AS docID, string_split(text, '{d}') AS parts
    FROM documents
),
chunks AS (
    SELECT docID,
           CAST(ord - 1 AS INT) AS chunk_idx,
           part || CASE WHEN ord < n THEN '{d}' ELSE '' END AS chunk
    FROM (
        SELECT docID,
               unnest(parts) AS part,
               unnest(range(1, len(parts) + 1)) AS ord,
               len(parts) AS n
        FROM split
    )
    WHERE NOT (ord = n AND part = '')
),
ctoks AS (
    SELECT docID, chunk_idx,
           unnest(regexp_extract_all(lower(chunk), '{SQL_TOKEN_PATTERN}')) AS term
    FROM chunks
),
ccnt AS (
    SELECT docID, chunk_idx, CAST(length(term) % {n_dims} AS INT) AS dim,
           CAST(COUNT(*) AS DOUBLE) AS v
    FROM ctoks GROUP BY docID, chunk_idx, dim
),
cnrm AS (
    SELECT docID, chunk_idx, SQRT(SUM(v * v)) AS nrm
    FROM ccnt GROUP BY docID, chunk_idx
),
cdim AS (
    SELECT c.docID, c.chunk_idx,
           {dims}
    FROM ccnt c JOIN cnrm n USING (docID, chunk_idx)
    GROUP BY c.docID, c.chunk_idx, n.nrm
),
csc AS (SELECT docID, chunk_idx, {score} AS score FROM cdim),
best AS (
    SELECT docID, score, chunk_idx AS best_chunk_idx
    FROM (
        SELECT docID, chunk_idx, score,
               ROW_NUMBER() OVER (
                   PARTITION BY docID ORDER BY score DESC, chunk_idx
               ) AS rn
        FROM csc
    )
    WHERE rn = 1
    ORDER BY score DESC, docID
    LIMIT {k}
)"""
    if not expand_nested:
        return base + "\nSELECT docID, score, best_chunk_idx FROM best\n"
    return (
        base
        + """
SELECT csc.docID, csc.chunk_idx, csc.score
FROM csc JOIN best USING (docID)
ORDER BY docID, chunk_idx
"""
    )


def rerank_ml_sql(terms: list[str], qvec: list[float], window: int, k: int) -> str:
    """``rerank.ml_opensearch``: BM25 top-``window`` hits rescored by the
    stand-in similarity model (score REPLACED), re-sorted, cut to ``k``.
    Docs without an embedding (no tokens) zero-fill like the Spark side."""
    inner = bm25_topk_sql(terms, k=window)
    score = round6_sql(_neural_dot(qvec, prefix="e."))
    return f"""
WITH cand AS ({inner}),
{_neural_prelude().strip()}
SELECT cand.docID, COALESCE({score}, 0.0) AS score
FROM cand LEFT JOIN edim e ON cand.docID = e.docID
ORDER BY score DESC, cand.docID
LIMIT {k}
"""


def rerank_context_sql(
    terms: list[str], qvec: list[float], window: int, k: int
) -> str:
    """Spec-level ``ext.rerank`` twin of
    :func:`neural_search_spark.search.spec.parse_spec_with_rerank`
    (ml_opensearch): single-match hybrid window → similarity rescore
    (score REPLACED, round6) → cut to k → fetched document context field
    (``lang``) joined onto the hits."""
    inner = hybrid_mixed_topk_sql(
        [{"kind": "match", "terms": terms}], k=window, depth=window
    )
    score = round6_sql(_neural_dot(qvec, prefix="e."))
    return f"""
WITH cand AS ({inner}),
{_neural_prelude().strip()},
rr AS (
    SELECT cand.docID AS docID, COALESCE({score}, 0.0) AS score
    FROM cand LEFT JOIN edim e ON cand.docID = e.docID
    ORDER BY score DESC, docID
    LIMIT {k}
)
SELECT rr.docID, rr.score, d.lang
FROM rr JOIN documents d ON rr.docID = CAST(d.doc_id AS BIGINT)
ORDER BY rr.score DESC, rr.docID
"""


def _bound_exprs(
    lower_bound: tuple[str, float] | None, upper_bound: tuple[str, float] | None
) -> tuple[str, str, str]:
    """(eff_min, eff_max, clip_cases) SQL fragments mirroring
    ``normalization/bounds/{Lower,Upper}Bound.java:determineEffectiveScore``
    and the clip short-circuits in ``MinMaxScoreNormalizationTechnique.java``."""
    if lower_bound is None or lower_bound[0] == "ignore":
        eff_min = "mn"
    else:
        mode, bv = lower_bound
        b = repr(float(bv))
        if mode == "apply":
            eff_min = f"CASE WHEN mx > {b} AND score > {b} THEN {b} ELSE mn END"
        else:  # clip
            eff_min = f"CASE WHEN mx < {b} THEN mn ELSE {b} END"
    if upper_bound is None or upper_bound[0] == "ignore":
        eff_max = "mx"
    else:
        mode, bv = upper_bound
        b = repr(float(bv))
        if mode == "apply":
            eff_max = f"CASE WHEN mn < {b} AND score < {b} THEN {b} ELSE mx END"
        else:  # clip
            eff_max = f"CASE WHEN mn > {b} THEN mx ELSE {b} END"
    clip = ""
    if lower_bound is not None and lower_bound[0] == "clip":
        clip += f"WHEN score < ({eff_min}) THEN 0.001\n                "
    if upper_bound is not None and upper_bound[0] == "clip":
        clip += f"WHEN score > ({eff_max}) THEN 1.0\n                "
    return eff_min, eff_max, clip


def _normalize_cte(
    i: int,
    technique: str,
    rank_constant: int,
    lower_bound: tuple[str, float] | None = None,
    upper_bound: tuple[str, float] | None = None,
    src: str | None = None,
) -> str:
    src = src or f"cut{i}"
    if technique == "min_max":
        eff_min, eff_max, clip = _bound_exprs(lower_bound, upper_bound)
        return f"""
n{i} AS (
    SELECT docID,
           CASE WHEN mx = mn AND mx = score THEN 1.0
                {clip}WHEN ({eff_max}) = ({eff_min}) THEN 1.0
                WHEN (score - ({eff_min})) / (({eff_max}) - ({eff_min})) = 0.0 THEN 0.001
                ELSE (score - ({eff_min})) / (({eff_max}) - ({eff_min})) END AS nscore
    FROM (SELECT docID, score, MIN(score) OVER () AS mn, MAX(score) OVER () AS mx FROM {src})
)"""
    if technique == "l2":
        return f"""
n{i} AS (
    SELECT docID, CASE WHEN nrm = 0.0 THEN 0.0 ELSE score / nrm END AS nscore
    FROM (SELECT docID, score, SQRT(SUM(score * score) OVER ()) AS nrm FROM {src})
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
          FROM {src})
)"""
    if technique == "rrf":
        return f"""
n{i} AS (
    SELECT docID,
           ROUND(1.0 / ({rank_constant} + ROW_NUMBER() OVER (ORDER BY score DESC, docID)), 10) AS nscore
    FROM {src}
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
    lower_bounds: list[tuple[str, float] | None] | None = None,
    upper_bounds: list[tuple[str, float] | None] | None = None,
    post_filter: str | None = None,
) -> str:
    """Full hybrid pipeline in DuckDB SQL, mirroring
    :func:`neural_search_spark.search.hybrid.hybrid_search`.

    ``post_filter``: membership-only predicate over ``corpus`` columns,
    applied to combined results before the final cut (post_filter
    semantics, ``HybridCollectorManager.java:121-133``)."""
    n = len(clause_terms)
    w = weights or [1.0] * n
    lbs = lower_bounds or [None] * n
    ubs = upper_bounds or [None] * n
    clause_sql = ",".join(_clause_ctes(i, t, k1, b, depth, doc_filter) for i, t in enumerate(clause_terms))
    norm_sql = ",".join(
        _normalize_cte(i, normalization, rank_constant, lbs[i], ubs[i]) for i in range(n)
    )
    union = " UNION ALL ".join(f"SELECT docID, {i} AS c, nscore FROM n{i}" for i in range(n))
    wide_cols = ", ".join(
        f"COALESCE(SUM(CASE WHEN c = {i} THEN nscore END), 0.0) AS s_{i}" for i in range(n)
    )
    pf = (
        f"WHERE docID IN (SELECT docID FROM corpus WHERE {post_filter})"
        if post_filter
        else ""
    )
    return f"""{_PRELUDE},{clause_sql},{norm_sql},
long AS ({union}),
wide AS (SELECT docID, {wide_cols} FROM long GROUP BY docID),
comb AS (SELECT docID, {_combine_expr(combination, w)} AS score FROM wide)
SELECT docID, ROUND(score, 4) AS score
FROM comb
{pf}
ORDER BY score DESC, docID
LIMIT {k}
"""


def hybrid_batch_topk_sql(
    batches: dict[int, list[list[str]]],
    k: int = 10,
    depth: int | None = 50,
) -> str:
    """Batched hybrid twin: one :func:`hybrid_topk_sql` block per request
    (min_max + arithmetic_mean, the pairing every single-request hybrid
    key is already proven against), tagged with its qid and unioned."""
    parts = [
        f"SELECT {int(qid)} AS qid, docID, score FROM ("
        + hybrid_topk_sql(clauses, "min_max", "arithmetic_mean", k=k, depth=depth)
        + ")"
        for qid, clauses in sorted(batches.items())
    ]
    union = "\nUNION ALL\n".join(parts)
    return f"""
SELECT CAST(qid AS INT) AS qid, docID, score FROM (
{union}
)
ORDER BY qid, score DESC, docID
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


def hybrid_agg_range_sql(
    clause_terms: list[list[str]],
    lo: int,
    hi: int,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """Explicit range buckets (n_chars) under a hybrid query — twin of the
    engine's range aggregation (§2.7)."""
    n = len(clause_terms)
    clause_sql = ",".join(_clause_ctes(i, t, k1, b, None, None) for i, t in enumerate(clause_terms))
    union = " UNION ALL ".join(f"SELECT docID, score FROM cut{i}" for i in range(n))
    return f"""{_PRELUDE},{clause_sql},
docsum AS (SELECT docID, SUM(score) AS score FROM ({union}) GROUP BY docID)
SELECT CASE WHEN doc.n_chars < {lo} THEN '*-{lo}'
            WHEN doc.n_chars < {hi} THEN '{lo}-{hi}'
            ELSE '{hi}-*' END AS range_key,
       COUNT(*) AS doc_count,
       ROUND(SUM(d.score), 4) AS sum_score
FROM docsum d JOIN documents doc ON d.docID = CAST(doc.doc_id AS BIGINT)
GROUP BY range_key
ORDER BY range_key
"""


def hybrid_agg_metrics_sql(clause_terms: list[list[str]], k1: float = 1.2, b: float = 0.75) -> str:
    """Metric aggregations under a hybrid query (§2.7,
    ``MetricAggregationsWithHybridQueryIT``): one row of corpus-level
    metrics over the matched docs, score = SUM of sub-query scores."""
    n = len(clause_terms)
    clause_sql = ",".join(_clause_ctes(i, t, k1, b, None, None) for i, t in enumerate(clause_terms))
    union = " UNION ALL ".join(f"SELECT docID, score FROM cut{i}" for i in range(n))
    return f"""{_PRELUDE},{clause_sql},
docsum AS (SELECT docID, SUM(score) AS score FROM ({union}) GROUP BY docID)
SELECT COUNT(*) AS doc_count,
       ROUND(AVG(d.n_chars), 4) AS avg_chars,
       CAST(MAX(d.n_chars) AS BIGINT) AS max_chars,
       CAST(MIN(d.n_chars) AS BIGINT) AS min_chars,
       ROUND(SUM(s.score), 4) AS sum_score,
       ROUND(MAX(s.score), 4) AS max_score
FROM docsum s JOIN documents d ON s.docID = CAST(d.doc_id AS BIGINT)
"""


def hybrid_agg_pipeline_sql(clause_terms: list[list[str]], k1: float = 1.2, b: float = 0.75) -> str:
    """Bucket + pipeline aggregation under a hybrid query (§2.7,
    ``BucketAggregationsWithHybridQueryIT`` /
    ``PipelineAggregationsWithHybridQueryIT``): terms buckets by lang with
    per-bucket sum, plus avg_bucket / max_bucket pipeline values."""
    n = len(clause_terms)
    clause_sql = ",".join(_clause_ctes(i, t, k1, b, None, None) for i, t in enumerate(clause_terms))
    union = " UNION ALL ".join(f"SELECT docID, score FROM cut{i}" for i in range(n))
    return f"""{_PRELUDE},{clause_sql},
docsum AS (SELECT docID, SUM(score) AS score FROM ({union}) GROUP BY docID),
buckets AS (
    SELECT c.lang AS lang, COUNT(*) AS doc_count, SUM(s.score) AS sum_score
    FROM docsum s JOIN corpus c ON s.docID = c.docID
    GROUP BY c.lang
)
SELECT lang, doc_count,
       ROUND(sum_score, 4) AS sum_score,
       ROUND(AVG(sum_score) OVER (), 4) AS avg_bucket_sum,
       ROUND(MAX(sum_score) OVER (), 4) AS max_bucket_sum
FROM buckets
ORDER BY lang
"""


def hybrid_agg_extended_stats_sql(
    clause_terms: list[list[str]], k1: float = 1.2, b: float = 0.75
) -> str:
    """extended_stats under a hybrid query (§2.7): per-lang buckets with
    the full OpenSearch extended_stats payload over the hybrid score —
    count/min/max/avg/sum/sum_of_squares plus POPULATION variance and
    std deviation (Elastic/OpenSearch extended_stats defaults), 4-dp
    rounds on both sides."""
    n = len(clause_terms)
    clause_sql = ",".join(_clause_ctes(i, t, k1, b, None, None) for i, t in enumerate(clause_terms))
    union = " UNION ALL ".join(f"SELECT docID, score FROM cut{i}" for i in range(n))
    return f"""{_PRELUDE},{clause_sql},
docsum AS (SELECT docID, SUM(score) AS score FROM ({union}) GROUP BY docID)
SELECT c.lang AS lang,
       COUNT(*) AS doc_count,
       ROUND(MIN(s.score), 4) AS min_score,
       ROUND(MAX(s.score), 4) AS max_score,
       ROUND(AVG(s.score), 4) AS avg_score,
       ROUND(SUM(s.score), 4) AS sum_score,
       ROUND(SUM(s.score * s.score), 4) AS sum_of_squares,
       ROUND(VAR_POP(s.score), 4) AS variance,
       ROUND(STDDEV_POP(s.score), 4) AS std_deviation
FROM docsum s JOIN corpus c ON s.docID = c.docID
GROUP BY c.lang
ORDER BY lang
"""


def hybrid_agg_terms_subagg_sql(
    clause_terms: list[list[str]],
    size: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """terms aggregation ordered by a sub-aggregation under a hybrid query
    (§2.7): repo buckets ordered by their avg hybrid score (the OpenSearch
    ``"order": {"avg_score": "desc"}`` form), top ``size`` buckets kept;
    order key is the 4-dp-rounded avg with bucket-key tie-break so the cut
    is engine-independent."""
    n = len(clause_terms)
    clause_sql = ",".join(_clause_ctes(i, t, k1, b, None, None) for i, t in enumerate(clause_terms))
    union = " UNION ALL ".join(f"SELECT docID, score FROM cut{i}" for i in range(n))
    return f"""{_PRELUDE},{clause_sql},
docsum AS (SELECT docID, SUM(score) AS score FROM ({union}) GROUP BY docID),
buckets AS (
    SELECT c.repo AS repo, COUNT(*) AS doc_count,
           ROUND(AVG(s.score), 4) AS avg_score,
           ROUND(MAX(s.score), 4) AS max_score
    FROM docsum s JOIN corpus c ON s.docID = c.docID
    GROUP BY c.repo
)
SELECT repo, doc_count, avg_score, max_score
FROM buckets
ORDER BY avg_score DESC, repo ASC
LIMIT {int(size)}
"""


def nested_inner_hits_sql(delimiter: str, terms: list[str], k: int = 10) -> str:
    """Nested-docs analog: chunks as nested children; chunk score = number
    of query-term occurrences, parent score = MAX over its chunks
    (nested score_mode=max), inner hit = the best chunk (lowest chunk_idx
    on ties). Mirrors the reference's nested/inner-hits surface
    (``HybridQueryInnerHitsIT``) over the chunk table."""
    d = delimiter.replace("'", "''")
    from neural_search_spark.analysis.tokenizer import SQL_TOKEN_PATTERN

    return f"""
WITH split AS (
    SELECT CAST(doc_id AS BIGINT) AS docID, string_split(text, '{d}') AS parts
    FROM documents
),
chunks AS (
    SELECT docID,
           CAST(ord - 1 AS INT) AS chunk_idx,
           part || CASE WHEN ord < n THEN '{d}' ELSE '' END AS chunk
    FROM (
        SELECT docID, unnest(parts) AS part,
               unnest(range(1, len(parts) + 1)) AS ord, len(parts) AS n
        FROM split
    )
    WHERE NOT (ord = n AND part = '')
),
scored AS (
    SELECT docID, chunk_idx,
           len(list_filter(regexp_extract_all(lower(chunk), '{SQL_TOKEN_PATTERN}'),
                           t -> list_contains({_term_list(terms)}, t))) AS cscore
    FROM chunks
),
best AS (
    SELECT docID, chunk_idx, cscore,
           ROW_NUMBER() OVER (PARTITION BY docID ORDER BY cscore DESC, chunk_idx) AS rn,
           MAX(cscore) OVER (PARTITION BY docID) AS score
    FROM scored
)
SELECT docID, CAST(score AS BIGINT) AS score, chunk_idx AS best_chunk_idx
FROM best
WHERE rn = 1 AND score > 0
ORDER BY score DESC, docID
LIMIT {k}
"""


def highlight_sql(terms: list[str], fragment_delim: str, depth: int, k1: float = 1.2, b: float = 0.75) -> str:
    """Best fragment per BM25 top-``depth`` hit (lexical highlighter analog;
    fragment score = query-term occurrence count, ties to earliest)."""
    d = fragment_delim.replace("'", "''")
    inner = bm25_topk_sql(terms, k=depth, k1=k1, b=b)
    return f"""
WITH cand AS ({inner}),
frags AS (
    SELECT cand.docID, cand.score,
           unnest(string_split(doc.text, '{d}')) AS fragment,
           CAST(unnest(range(0, len(string_split(doc.text, '{d}')))) AS INT) AS frag_idx
    FROM cand JOIN documents doc ON cand.docID = CAST(doc.doc_id AS BIGINT)
),
scored AS (
    SELECT docID, score, frag_idx, fragment,
           CAST(len(list_filter(regexp_extract_all(lower(fragment), '{SQL_TOKEN_PATTERN}'),
                           t -> list_contains({_term_list(terms)}, t))) AS BIGINT) AS hits,
           ROW_NUMBER() OVER (PARTITION BY docID ORDER BY len(list_filter(regexp_extract_all(lower(fragment), '{SQL_TOKEN_PATTERN}'),
                           t -> list_contains({_term_list(terms)}, t))) DESC, frag_idx) AS rn
    FROM frags
)
SELECT docID, score, frag_idx, fragment, hits
FROM scored WHERE rn = 1
ORDER BY score DESC, docID
"""


def highlight_semantic_sql(
    terms: list[str],
    qvec: list[float],
    fragment_delim: str,
    depth: int,
    k1: float = 1.2,
    b: float = 0.75,
    n_dims: int = 8,
) -> str:
    """Twin of :func:`neural_search_spark.search.ops.highlight_semantic`:
    BM25 top-``depth`` hits, per-fragment stand-in embedding, best
    fragment by cosine vs the query embedding (6 dp; token-free fragments
    score 0), ties to the earliest fragment."""
    return _semantic_fragments_sql(
        bm25_topk_sql(terms, k=depth, k1=k1, b=b), qvec, fragment_delim, n_dims
    )


def highlight_spec_sql(
    spec: dict,
    fragment_delim: str,
    k: int = 10,
    depth: int = 50,
    n_dims: int = 8,
) -> str:
    """Twin of :func:`neural_search_spark.search.spec.parse_spec_with_highlight`:
    hybrid top-k candidates from the spec's clauses, highlight text
    EXTRACTED from the same spec dict (shared
    :func:`neural_search_spark.search.spec.extract_query_text` — no
    explicit query-text argument on either side), best fragment by
    stand-in cosine."""
    from neural_search_spark.analysis.tokenizer import tokenize_text
    from neural_search_spark.search.neural import query_embedding_stub
    from neural_search_spark.search.spec import extract_query_text

    body = spec["hybrid"] if "hybrid" in spec else spec
    hl = body["highlight"]
    clause_terms = []
    for c in body["queries"]:
        (ctype, cb), = c.items()
        text = cb["query"] if isinstance(cb, dict) else cb
        if ctype == "match":
            clause_terms.append(tokenize_text(text))
        elif ctype == "term":
            clause_terms.append([text])
        else:
            raise ValueError(
                f"highlight_spec oracle supports match/term clauses, got {ctype}"
            )
    cand = hybrid_topk_sql(clause_terms, k=k, depth=body.get("pagination_depth", depth))
    qtext = extract_query_text(
        {"queries": body["queries"]}, hl.get("field", "content")
    )
    return _semantic_fragments_sql(
        cand, query_embedding_stub(qtext), fragment_delim, n_dims
    )


def _semantic_fragments_sql(
    inner: str,
    qvec: list[float],
    fragment_delim: str,
    n_dims: int = 8,
) -> str:
    """Best fragment per candidate hit by stand-in cosine — the shared
    tail of the semantic-highlighter oracles (``inner`` yields
    (docID, score) candidates)."""
    d = fragment_delim.replace("'", "''")
    dims = ",\n           ".join(
        f"COALESCE(SUM(CASE WHEN c.dim = {j} THEN c.v END), 0.0) / n.nrm AS d{j}"
        for j in range(n_dims)
    )
    sim = round6_sql(_neural_dot(qvec))
    return f"""
WITH cand AS ({inner}),
frags AS (
    SELECT cand.docID, cand.score,
           unnest(string_split(doc.text, '{d}')) AS fragment,
           CAST(unnest(range(0, len(string_split(doc.text, '{d}')))) AS INT) AS frag_idx
    FROM cand JOIN documents doc ON cand.docID = CAST(doc.doc_id AS BIGINT)
),
ftoks AS (
    SELECT docID, frag_idx,
           unnest(regexp_extract_all(lower(fragment), '{SQL_TOKEN_PATTERN}')) AS term
    FROM frags
),
fcnt AS (
    SELECT docID, frag_idx, CAST(length(term) % {n_dims} AS INT) AS dim,
           CAST(COUNT(*) AS DOUBLE) AS v
    FROM ftoks GROUP BY docID, frag_idx, dim
),
fnrm AS (
    SELECT docID, frag_idx, SQRT(SUM(v * v)) AS nrm
    FROM fcnt GROUP BY docID, frag_idx
),
fdim AS (
    SELECT c.docID, c.frag_idx,
           {dims}
    FROM fcnt c JOIN fnrm n USING (docID, frag_idx)
    GROUP BY c.docID, c.frag_idx, n.nrm
),
fsim AS (SELECT docID, frag_idx, {sim} AS sim FROM fdim),
scored AS (
    SELECT f.docID, f.score, f.frag_idx, f.fragment,
           COALESCE(s.sim, 0.0) AS sim,
           ROW_NUMBER() OVER (
               PARTITION BY f.docID ORDER BY COALESCE(s.sim, 0.0) DESC, f.frag_idx
           ) AS rn
    FROM frags f LEFT JOIN fsim s ON f.docID = s.docID AND f.frag_idx = s.frag_idx
)
SELECT docID, score, frag_idx, fragment, sim
FROM scored WHERE rn = 1
ORDER BY score DESC, docID
"""


def text_embedding_sql(n_dims: int = 8) -> str:
    """Deterministic text_embedding stand-in (dim = token length %% n_dims,
    L2-normalized), long form (docID, dim, value) — mirrors
    :func:`neural_search_spark.pipeline.embedding.text_embedding_stub`."""
    return f"""
WITH toks AS (
    SELECT CAST(doc_id AS BIGINT) AS docID,
           unnest(regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}')) AS term
    FROM documents
),
counts AS (
    SELECT docID, CAST(length(term) % {n_dims} AS INT) AS dim,
           CAST(COUNT(*) AS DOUBLE) AS v
    FROM toks GROUP BY docID, dim
),
norms AS (SELECT docID, SQRT(SUM(v * v)) AS nrm FROM counts GROUP BY docID),
grid AS (
    SELECT d.docID, CAST(g.dim AS INT) AS dim
    FROM (SELECT DISTINCT docID FROM toks) d
    CROSS JOIN (SELECT unnest(range(0, {n_dims})) AS dim) g
)
SELECT grid.docID, grid.dim,
       ROUND(CASE WHEN n.nrm > 0 THEN COALESCE(c.v, 0.0) / n.nrm ELSE 0.0 END, 6) AS value
FROM grid
JOIN norms n ON grid.docID = n.docID
LEFT JOIN counts c ON grid.docID = c.docID AND grid.dim = c.dim
ORDER BY grid.docID, grid.dim
"""


def doclen_quantized_sql() -> str:
    """Whole-table (docID, dl, dlq) — gates the tokenizer + SmallFloat path."""
    dlq = quantize_length_sql("dls.dl")
    return f"""{_PRELUDE}
SELECT dls.docID, CAST(dls.dl AS BIGINT) AS dl, CAST({dlq} AS BIGINT) AS dlq
FROM dls
ORDER BY dls.docID
"""


def chunk_delimiter_sql(delimiter: str) -> str:
    """Delimiter chunker (delimiter kept on the preceding chunk; empty
    trailing remainder dropped), exploded to (docID, chunk_idx, chunk)."""
    d = delimiter.replace("'", "''")
    return f"""
WITH split AS (
    SELECT CAST(doc_id AS BIGINT) AS docID, string_split(text, '{d}') AS parts
    FROM documents
),
parts AS (
    SELECT docID,
           unnest(parts) AS part,
           unnest(range(1, len(parts) + 1)) AS ord,
           len(parts) AS n
    FROM split
)
SELECT docID,
       CAST(ord - 1 AS INT) AS chunk_idx,
       part || CASE WHEN ord < n THEN '{d}' ELSE '' END AS chunk
FROM parts
WHERE NOT (ord = n AND part = '')
ORDER BY docID, chunk_idx
"""


def chunk_fixed_char_sql(char_limit: int, overlap_rate: float) -> str:
    """Fixed-char chunker windows as substr arithmetic."""
    import math

    interval = char_limit - math.floor(char_limit * overlap_rate)
    return f"""
WITH c AS (SELECT CAST(doc_id AS BIGINT) AS docID, text, length(text) AS len FROM documents)
SELECT docID,
       CAST(i AS INT) AS chunk_idx,
       substr(text, CAST(i * {interval} + 1 AS BIGINT),
              CAST(CASE WHEN i * {interval} + {char_limit} >= len
                        THEN len - i * {interval} ELSE {char_limit} END AS BIGINT)) AS chunk
FROM c,
     (SELECT unnest(range(0, (SELECT CAST(MAX(length(text)) / {interval} AS BIGINT) + 1 FROM documents))) AS i) g
WHERE len > 0 AND (i = 0 OR (i - 1) * {interval} + {char_limit} < len)
ORDER BY docID, chunk_idx
"""


def chunk_fixed_token_counts_sql(token_limit: int, overlap_rate: float) -> str:
    """Fixed-token chunker: chunk COUNT per doc (chunk text needs token
    offsets, which SQL can't extract — counts depend only on token totals;
    text equality is asserted by the pure-Python oracle in pytest)."""
    import math

    step = token_limit - math.floor(token_limit * overlap_rate)
    return f"""
WITH n AS (
    SELECT CAST(doc_id AS BIGINT) AS docID,
           len(regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}')) AS nt
    FROM documents
)
SELECT docID,
       CAST(CASE WHEN nt = 0 THEN 0
            ELSE 1 + GREATEST(0, CAST(ceil((nt - {token_limit}) / {step}.0) AS BIGINT))
       END AS BIGINT) AS n_chunks
FROM n
ORDER BY docID
"""


def _qtok_values(query_tokens: dict[str, float]) -> str:
    return ", ".join(
        f"('{t}', {repr(float(w))})" for t, w in sorted(query_tokens.items())
    )


def sparse_score_topk_sql(
    query_tokens: dict[str, float], k: int = 10, doc_prune: tuple[str, float] | None = None
) -> str:
    """neural_sparse scoring: doc features = term frequency (exact under
    FeatureField quantization), score = Σ qw·tf. ``doc_prune`` optionally
    applies max_ratio/abs_value pruning to the stored doc vectors first."""
    prune = ""
    if doc_prune is not None:
        ptype, ratio = doc_prune
        if ptype == "max_ratio":
            prune = f"QUALIFY tf >= {ratio} * MAX(tf) OVER (PARTITION BY docID)"
        elif ptype == "abs_value":
            prune = f"QUALIFY tf >= {ratio}"
        else:
            raise ValueError(f"no SQL oracle for prune type {ptype}")
    return f"""
WITH toks AS (
    SELECT CAST(doc_id AS BIGINT) AS docID,
           unnest(regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}')) AS term
    FROM documents
),
tf AS (
    SELECT docID, term, COUNT(*) AS tf FROM toks GROUP BY docID, term {prune}
),
q(term, qw) AS (VALUES {_qtok_values(query_tokens)})
SELECT tf.docID, ROUND(SUM(q.qw * tf.tf), 4) AS score
FROM tf JOIN q USING (term)
GROUP BY tf.docID
ORDER BY score DESC, docID
LIMIT {k}
"""


def match_bool_prefix_topk_sql(
    fixed_terms: list[str],
    prefix: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """match_bool_prefix twin: BM25 sum over the fixed terms UNION a
    1.0 constant-score row per doc containing any prefix-matched term,
    summed per doc (bool SHOULD, msm=1)."""
    pre = prefix.replace("'", "''")
    parts = [
        f"""SELECT DISTINCT docID, 1.0 AS score
    FROM tf WHERE starts_with(term, '{pre}')"""
    ]
    clause = ""
    if fixed_terms:
        clause = "," + _clause_ctes(0, fixed_terms, k1, b, None, None)
        parts.append("SELECT docID, score FROM cut0")
    union = "\n    UNION ALL\n    ".join(parts)
    return f"""{_PRELUDE}{clause}
SELECT docID, ROUND(SUM(score), 4) AS score
FROM (
    {union}
)
GROUP BY docID
ORDER BY score DESC, docID
LIMIT {int(k)}
"""


def bm25_batch_topk_sql(
    queries: dict[int, list[str]], k: int = 10, k1: float = 1.2, b: float = 0.75
) -> str:
    """Batched multi-query BM25 twin: one (qid, term) table joined against
    postings once, per-(qid, docID) sum, per-qid round-then-cut top-k —
    mirrors :func:`neural_search_spark.search.bm25.bm25_batch_topk`."""
    dlq = quantize_length_sql("dls.dl")
    pairs = sorted({(int(q), t) for q, ts in queries.items() for t in ts if t})
    vals = ", ".join(
        f"({qid}, '" + t.replace("'", "''") + "')" for qid, t in pairs
    )
    return f"""{_PRELUDE},
qb(qid, term) AS (VALUES {vals}),
nd AS (
    SELECT tf.term, COUNT(*) AS ndoc
    FROM tf JOIN (SELECT DISTINCT term FROM qb) d USING (term)
    GROUP BY tf.term
),
sc AS (
    SELECT qb.qid, tf.docID,
           SUM(
             ln(1 + (s.n_docs - nd.ndoc + 0.5) / (nd.ndoc + 0.5))
             * tf.tf / (tf.tf + {k1} * ((1 - {b}) + {b} * {dlq} / (s.total / s.n_docs)))
           ) AS score
    FROM tf
    JOIN qb ON tf.term = qb.term
    JOIN nd ON tf.term = nd.term
    JOIN dls ON tf.docID = dls.docID
    CROSS JOIN stats s
    GROUP BY qb.qid, tf.docID
),
r AS (
    SELECT qid, docID, ROUND(score, 4) AS score,
           ROW_NUMBER() OVER (
               PARTITION BY qid ORDER BY ROUND(score, 4) DESC, docID
           ) AS rn
    FROM sc
)
SELECT CAST(qid AS INT) AS qid, docID, score
FROM r WHERE rn <= {int(k)}
ORDER BY qid, score DESC, docID
"""


def sparse_analyzer_topk_sql(query_text: str, k: int = 10) -> str:
    """neural_sparse ANALYZER-mode twin: the token-weight map is built IN
    SQL from the query text — distinct analyzed tokens, weight 1.0 each
    (payload-less analyzer; duplicates collapse), then the same
    Σ qw·tf linear-feature scoring as :func:`sparse_score_topk_sql`."""
    qt = query_text.replace("'", "''")
    return f"""
WITH toks AS (
    SELECT CAST(doc_id AS BIGINT) AS docID,
           unnest(regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}')) AS term
    FROM documents
),
tf AS (
    SELECT docID, term, COUNT(*) AS tf FROM toks GROUP BY docID, term
),
q AS (
    SELECT DISTINCT term, 1.0 AS qw
    FROM (SELECT unnest(regexp_extract_all(lower('{qt}'), '{SQL_TOKEN_PATTERN}')) AS term)
    WHERE term <> ''
)
SELECT tf.docID, ROUND(SUM(q.qw * tf.tf), 4) AS score
FROM tf JOIN q USING (term)
GROUP BY tf.docID
ORDER BY score DESC, docID
LIMIT {k}
"""


def rerank_by_field_sql(terms: list[str], target_field: str, depth: int, k: int) -> str:
    """BM25 top-``depth`` candidates reranked by a numeric source field."""
    inner = bm25_topk_sql(terms, k=depth)
    return f"""
WITH cand AS ({inner})
SELECT cand.docID, CAST(d.{target_field} AS DOUBLE) AS score
FROM cand JOIN documents d ON cand.docID = CAST(d.doc_id AS BIGINT)
ORDER BY score DESC, docID
LIMIT {k}
"""


def sort_search_after_sql(terms: list[str], depth: int, after_lang: str, after_doc: int, k: int) -> str:
    """Sort-by-field (lang asc, docID asc) + search_after cursor."""
    inner = bm25_topk_sql(terms, k=depth)
    return f"""
WITH cand AS ({inner})
SELECT cand.docID, d.lang
FROM cand JOIN documents d ON cand.docID = CAST(d.doc_id AS BIGINT)
WHERE d.lang > '{after_lang}' OR (d.lang = '{after_lang}' AND cand.docID > {after_doc})
ORDER BY d.lang, cand.docID
LIMIT {k}
"""


def hybrid_paginated_sql(
    clause_terms: list[list[str]],
    from_: int,
    size: int,
    depth: int,
    normalization: str = "min_max",
    combination: str = "arithmetic_mean",
) -> str:
    inner = hybrid_topk_sql(
        clause_terms, normalization, combination, k=from_ + size, depth=depth
    )
    return f"SELECT * FROM ({inner}) OFFSET {from_} LIMIT {size}"


def hybrid_collapse_sql(
    clause_terms: list[list[str]],
    field: str,
    k: int,
    depth: int,
    normalization: str = "min_max",
    combination: str = "arithmetic_mean",
) -> str:
    """Best doc per distinct field value over the combined scores."""
    n = len(clause_terms)
    w = [1.0] * n
    clause_sql = ",".join(_clause_ctes(i, t, 1.2, 0.75, depth, None) for i, t in enumerate(clause_terms))
    norm_sql = ",".join(_normalize_cte(i, normalization, 60) for i in range(n))
    union = " UNION ALL ".join(f"SELECT docID, {i} AS c, nscore FROM n{i}" for i in range(n))
    wide_cols = ", ".join(
        f"COALESCE(SUM(CASE WHEN c = {i} THEN nscore END), 0.0) AS s_{i}" for i in range(n)
    )
    return f"""{_PRELUDE},{clause_sql},{norm_sql},
long AS ({union}),
wide AS (SELECT docID, {wide_cols} FROM long GROUP BY docID),
comb AS (SELECT docID, {_combine_expr(combination, w)} AS score FROM wide),
best AS (
    SELECT comb.docID, c.{field} AS {field}, comb.score,
           ROW_NUMBER() OVER (PARTITION BY c.{field} ORDER BY comb.score DESC, comb.docID) AS rn
    FROM comb JOIN corpus c ON comb.docID = c.docID
)
SELECT docID, {field}, ROUND(score, 4) AS score
FROM best WHERE rn = 1
ORDER BY score DESC, docID
LIMIT {k}
"""


def hybrid_collapse_sorted_sql(
    clause_terms: list[list[str]],
    collapse_field: str,
    sort_field: str,
    sort_asc: bool,
    k: int,
    depth: int,
    normalization: str = "min_max",
    combination: str = "arithmetic_mean",
) -> str:
    """Collapse under a field sort: group winner = first doc in the sort
    order (docID tie-break), final order = the same sort — twin of
    :func:`neural_search_spark.search.ops.collapse_sorted` over the
    combined hybrid scores."""
    n = len(clause_terms)
    w = [1.0] * n
    direction = "ASC" if sort_asc else "DESC"
    clause_sql = ",".join(_clause_ctes(i, t, 1.2, 0.75, depth, None) for i, t in enumerate(clause_terms))
    norm_sql = ",".join(_normalize_cte(i, normalization, 60) for i in range(n))
    union = " UNION ALL ".join(f"SELECT docID, {i} AS c, nscore FROM n{i}" for i in range(n))
    wide_cols = ", ".join(
        f"COALESCE(SUM(CASE WHEN c = {i} THEN nscore END), 0.0) AS s_{i}" for i in range(n)
    )
    return f"""{_PRELUDE},{clause_sql},{norm_sql},
long AS ({union}),
wide AS (SELECT docID, {wide_cols} FROM long GROUP BY docID),
comb AS (SELECT docID, {_combine_expr(combination, w)} AS score FROM wide),
best AS (
    SELECT comb.docID, c.{collapse_field} AS {collapse_field},
           CAST(d.{sort_field} AS BIGINT) AS {sort_field}, comb.score,
           ROW_NUMBER() OVER (
               PARTITION BY c.{collapse_field}
               ORDER BY d.{sort_field} {direction}, comb.docID
           ) AS rn
    FROM comb
    JOIN corpus c ON comb.docID = c.docID
    JOIN documents d ON comb.docID = CAST(d.doc_id AS BIGINT)
)
SELECT docID, {collapse_field}, {sort_field}, ROUND(score, 4) AS score
FROM best WHERE rn = 1
ORDER BY {sort_field} {direction}, docID
LIMIT {k}
"""


def hybrid_explain_sql(
    clause_terms: list[list[str]],
    k: int,
    depth: int,
    normalization: str = "min_max",
    combination: str = "arithmetic_mean",
) -> str:
    """Per-doc breakdown: combined score plus each clause's normalized score
    (the explanation_response_processor payload as columns)."""
    n = len(clause_terms)
    w = [1.0] * n
    clause_sql = ",".join(_clause_ctes(i, t, 1.2, 0.75, depth, None) for i, t in enumerate(clause_terms))
    norm_sql = ",".join(_normalize_cte(i, normalization, 60) for i in range(n))
    union = " UNION ALL ".join(f"SELECT docID, {i} AS c, nscore FROM n{i}" for i in range(n))
    wide_cols = ", ".join(
        f"COALESCE(SUM(CASE WHEN c = {i} THEN nscore END), 0.0) AS s_{i}" for i in range(n)
    )
    out_cols = ", ".join(f"ROUND(s_{i}, 4) AS clause_{i}" for i in range(n))
    return f"""{_PRELUDE},{clause_sql},{norm_sql},
long AS ({union}),
wide AS (SELECT docID, {wide_cols} FROM long GROUP BY docID)
SELECT docID, ROUND({_combine_expr(combination, w)}, 4) AS score, {out_cols}
FROM wide
ORDER BY score DESC, docID
LIMIT {k}
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


def hybrid_collapse_per_clause_sql(
    clause_terms: list[list[str]],
    field: str,
    k: int,
    depth: int,
    normalization: str = "min_max",
    combination: str = "arithmetic_mean",
) -> str:
    """Per-sub-query collapse during collection + coordinator re-collapse
    (``HybridCollapsingTopDocsCollector.java`` group queues per sub-query;
    ``CollapseDTO.java:24-36`` re-collapse after combination): each clause
    keeps its best doc per ``field`` value, cut to ``depth`` groups by
    clause score, BEFORE normalization; the combined result collapses
    again."""
    n = len(clause_terms)
    w = [1.0] * n
    clause_sql = ",".join(
        _clause_ctes(i, t, 1.2, 0.75, None, None) for i, t in enumerate(clause_terms)
    )
    ccuts = ",".join(
        f"""
ccut{i} AS (
    SELECT docID, score FROM (
        SELECT s.docID, s.score,
               ROW_NUMBER() OVER (PARTITION BY c.{field} ORDER BY s.score DESC, s.docID) AS rn
        FROM cut{i} s JOIN corpus c ON s.docID = c.docID
    ) WHERE rn = 1
    ORDER BY score DESC, docID LIMIT {depth}
)"""
        for i in range(n)
    )
    norm_sql = ",".join(
        _normalize_cte(i, normalization, 60, src=f"ccut{i}") for i in range(n)
    )
    union = " UNION ALL ".join(f"SELECT docID, {i} AS c, nscore FROM n{i}" for i in range(n))
    wide_cols = ", ".join(
        f"COALESCE(SUM(CASE WHEN c = {i} THEN nscore END), 0.0) AS s_{i}" for i in range(n)
    )
    return f"""{_PRELUDE},{clause_sql},{ccuts},{norm_sql},
long AS ({union}),
wide AS (SELECT docID, {wide_cols} FROM long GROUP BY docID),
comb AS (SELECT docID, {_combine_expr(combination, w)} AS score FROM wide),
best AS (
    SELECT comb.docID, c.{field} AS {field}, comb.score,
           ROW_NUMBER() OVER (PARTITION BY c.{field} ORDER BY comb.score DESC, comb.docID) AS rn
    FROM comb JOIN corpus c ON comb.docID = c.docID
)
SELECT docID, {field}, ROUND(score, 4) AS score
FROM best WHERE rn = 1
ORDER BY score DESC, docID
LIMIT {k}
"""


def hybrid_sort_field_sql(clause_terms: list[list[str]], field: str, k: int) -> str:
    """Hybrid collected by sort field with per-clause scores tracked
    (``HybridTopFieldDocSortCollector.java``): docs matching ANY clause,
    ordered by (field asc, docID asc), per-clause raw scores zero-filled —
    no normalization/combination on the sort path."""
    n = len(clause_terms)
    clause_sql = ",".join(
        _clause_ctes(i, t, 1.2, 0.75, None, None) for i, t in enumerate(clause_terms)
    )
    union = " UNION ALL ".join(f"SELECT docID, {i} AS c, score FROM cut{i}" for i in range(n))
    wide_cols = ", ".join(
        f"ROUND(COALESCE(SUM(CASE WHEN c = {i} THEN score END), 0.0), 4) AS clause_{i}"
        for i in range(n)
    )
    return f"""{_PRELUDE},{clause_sql},
long AS ({union}),
wide AS (SELECT docID, {wide_cols} FROM long GROUP BY docID)
SELECT w.docID, c.{field} AS {field}, {", ".join(f"clause_{i}" for i in range(n))}
FROM wide w JOIN corpus c ON w.docID = c.docID
ORDER BY c.{field} ASC, w.docID ASC
LIMIT {k}
"""


def hybrid_explain_full_sql(
    clause_terms: list[list[str]],
    k: int,
    depth: int,
    normalization: str = "min_max",
    combination: str = "arithmetic_mean",
    weights: list[float] | None = None,
    norm_desc: str = "",
    comb_desc: str = "",
) -> str:
    """Full explanation payload (``ExplanationResponseProcessor.java`` +
    ``NormalizationProcessorWorkflow.java:140-177``): combined score, each
    clause's normalized AND source (raw) score, plus the technique
    description strings (``"{describe} normalization of:"`` /
    ``"{describe} combination of:"``)."""
    n = len(clause_terms)
    w = weights or [1.0] * n
    clause_sql = ",".join(
        _clause_ctes(i, t, 1.2, 0.75, depth, None) for i, t in enumerate(clause_terms)
    )
    norm_sql = ",".join(_normalize_cte(i, normalization, 60) for i in range(n))
    union = " UNION ALL ".join(f"SELECT docID, {i} AS c, nscore FROM n{i}" for i in range(n))
    runion = " UNION ALL ".join(f"SELECT docID, {i} AS c, score FROM cut{i}" for i in range(n))
    wide_cols = ", ".join(
        f"COALESCE(SUM(CASE WHEN c = {i} THEN nscore END), 0.0) AS s_{i}" for i in range(n)
    )
    raw_cols = ", ".join(
        f"COALESCE(SUM(CASE WHEN c = {i} THEN score END), 0.0) AS r_{i}" for i in range(n)
    )
    out_cols = ", ".join(f"ROUND(s_{i}, 4) AS clause_{i}" for i in range(n))
    raw_out = ", ".join(f"ROUND(r.r_{i}, 4) AS raw_{i}" for i in range(n))
    nd = norm_desc.replace("'", "''")
    cd = comb_desc.replace("'", "''")
    return f"""{_PRELUDE},{clause_sql},{norm_sql},
long AS ({union}),
wide AS (SELECT docID, {wide_cols} FROM long GROUP BY docID),
rlong AS ({runion}),
raws AS (SELECT docID, {raw_cols} FROM rlong GROUP BY docID)
SELECT w.docID, ROUND({_combine_expr(combination, w)}, 4) AS score, {out_cols}, {raw_out},
       '{nd}' AS norm_desc, '{cd}' AS comb_desc
FROM wide w JOIN raws r ON w.docID = r.docID
ORDER BY score DESC, w.docID
LIMIT {k}
"""


def hybrid_max_score_sql(
    clause_terms: list[list[str]],
    depth: int,
    k: int = 10,
    normalization: str = "min_max",
    combination: str = "arithmetic_mean",
) -> str:
    """Final hybrid top-k plus the response max_score column
    (``ScoreCombiner.java:41`` — 0.0 when no hits, else max over hits)."""
    inner = hybrid_topk_sql(clause_terms, normalization, combination, k=k, depth=depth)
    return f"""
WITH hits AS ({inner})
SELECT docID, score, COALESCE(MAX(score) OVER (), 0.0) AS max_score
FROM hits
ORDER BY score DESC, docID
"""


def rescore_topk_sql(
    primary_terms: list[str],
    secondary_terms: list[str],
    window_size: int,
    query_weight: float = 1.0,
    rescore_query_weight: float = 1.0,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """Twin of :func:`neural_search_spark.search.ops.rescore_window` over
    two BM25 ``match`` clauses: window = top ``window_size`` of the
    primary (score desc, docID tie-break), final score = qw * primary +
    rqw * COALESCE(secondary, 0) over exactly that window."""
    dlq = quantize_length_sql("dls.dl")

    def _scored(alias: str, terms: list[str]) -> str:
        return f"""
{alias}q AS (SELECT DISTINCT unnest({_term_list(terms)}) AS term),
{alias}nd AS (SELECT tf.term, COUNT(*) AS ndoc FROM tf JOIN {alias}q USING (term) GROUP BY tf.term),
{alias}scored AS (
    SELECT tf.docID,
           SUM(
             ln(1 + (s.n_docs - {alias}nd.ndoc + 0.5) / ({alias}nd.ndoc + 0.5))
             * tf.tf / (tf.tf + {k1} * ((1 - {b}) + {b} * {dlq} / (s.total / s.n_docs)))
           ) AS score
    FROM tf
    JOIN {alias}nd ON tf.term = {alias}nd.term
    JOIN dls ON tf.docID = dls.docID
    CROSS JOIN stats s
    GROUP BY tf.docID
)"""

    return f"""{_PRELUDE},
{_scored("p", primary_terms)},
{_scored("r", secondary_terms)},
win AS (
    SELECT docID, score FROM pscored ORDER BY score DESC, docID LIMIT {int(window_size)}
)
SELECT w.docID,
       ROUND({query_weight} * w.score + {rescore_query_weight} * COALESCE(s.score, 0), 4) AS score
FROM win w LEFT JOIN rscored s USING (docID)
ORDER BY {query_weight} * w.score + {rescore_query_weight} * COALESCE(s.score, 0) DESC, w.docID
LIMIT {int(k)}
"""


def _hybrid_docsum(clause_terms: list[list[str]], k1: float, b: float) -> str:
    """Shared aggregation-path CTE block: clause scores (no depth cut) →
    per-doc raw SUM (HybridQueryScorer.java:104-120), used by every
    §2.7 aggregation oracle."""
    n = len(clause_terms)
    clause_sql = ",".join(
        _clause_ctes(i, t, k1, b, None, None) for i, t in enumerate(clause_terms)
    )
    union = " UNION ALL ".join(f"SELECT docID, score FROM cut{i}" for i in range(n))
    return f"""{clause_sql},
docsum AS (SELECT docID, SUM(score) AS score FROM ({union}) GROUP BY docID)"""


def hybrid_agg_significant_terms_sql(
    clause_terms: list[list[str]], size: int = 5, k1: float = 1.2, b: float = 0.75
) -> str:
    """significant_terms under hybrid: repo buckets whose share of the hit
    set exceeds their share of the corpus, scored with Elastic/OpenSearch
    JLH — (fgPct − bgPct) · (fgPct / bgPct) — top ``size`` by (rounded
    score desc, repo asc). Background stats are index-wide like Lucene's."""
    return f"""{_PRELUDE},{_hybrid_docsum(clause_terms, k1, b)},
hits AS (SELECT s.docID, c.repo FROM docsum s JOIN corpus c USING (docID)),
fg AS (SELECT repo, COUNT(*) AS doc_count FROM hits GROUP BY repo),
fgt AS (SELECT SUM(doc_count) AS t FROM fg),
bg AS (SELECT repo, COUNT(*) AS bg_count FROM corpus GROUP BY repo),
sig AS (
    SELECT f.repo, f.doc_count, g.bg_count,
           CAST(f.doc_count AS DOUBLE) / t.t AS fgp,
           CAST(g.bg_count AS DOUBLE) / s.n_docs AS bgp
    FROM fg f JOIN bg g USING (repo) CROSS JOIN fgt t CROSS JOIN stats s
)
SELECT repo,
       CAST(doc_count AS BIGINT) AS doc_count,
       CAST(bg_count AS BIGINT) AS bg_count,
       ROUND((fgp - bgp) * (fgp / bgp), 4) AS score
FROM sig
WHERE fgp > bgp
ORDER BY score DESC, repo ASC
LIMIT {int(size)}
"""


def hybrid_agg_top_hits_sql(
    clause_terms: list[list[str]], per_bucket: int = 2, k1: float = 1.2, b: float = 0.75
) -> str:
    """top_hits sub-aggregation under hybrid: per-lang buckets each carrying
    their top ``per_bucket`` docs by hybrid score (docID tie-break)."""
    return f"""{_PRELUDE},{_hybrid_docsum(clause_terms, k1, b)},
hits AS (
    SELECT c.lang, s.docID, s.score,
           ROW_NUMBER() OVER (
               PARTITION BY c.lang ORDER BY s.score DESC, s.docID ASC
           ) AS rank
    FROM docsum s JOIN corpus c USING (docID)
)
SELECT lang, CAST(rank AS INT) AS rank, docID, ROUND(score, 4) AS score
FROM hits
WHERE rank <= {int(per_bucket)}
ORDER BY lang, rank
"""


def hybrid_agg_histogram_sql(
    clause_terms: list[list[str]], interval: float = 0.5, k1: float = 1.2, b: float = 0.75
) -> str:
    """histogram aggregation under hybrid: fixed-interval buckets over the
    hybrid score (bucket key = floor(score/interval)·interval on the
    4-dp-rounded score so the bucketing is engine-independent)."""
    return f"""{_PRELUDE},{_hybrid_docsum(clause_terms, k1, b)}
SELECT FLOOR(ROUND(score, 4) / {float(interval)!r}) * {float(interval)!r} AS bucket,
       CAST(COUNT(*) AS BIGINT) AS doc_count
FROM docsum
GROUP BY bucket
ORDER BY bucket
"""


def hybrid_agg_percentiles_sql(
    clause_terms: list[list[str]],
    probs: tuple = (0.25, 0.5, 0.75, 0.95),
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """percentiles aggregation under hybrid: linear-interpolated quantiles
    of the hybrid score (DuckDB quantile_cont ≡ Spark percentile)."""
    cols = ", ".join(
        f"ROUND(quantile_cont(score, {float(p)!r}), 4) AS p{int(p * 100)}" for p in probs
    )
    return f"""{_PRELUDE},{_hybrid_docsum(clause_terms, k1, b)}
SELECT CAST(COUNT(*) AS BIGINT) AS doc_count, {cols}
FROM docsum
"""


def hybrid_agg_cardinality_sql(
    clause_terms: list[list[str]], k1: float = 1.2, b: float = 0.75
) -> str:
    """cardinality aggregation under hybrid (exact distinct counts; the
    HLL++ approx path is the same plan with approx_count_distinct —
    rows-only checkable, so the oracle key pins the exact variant)."""
    return f"""{_PRELUDE},{_hybrid_docsum(clause_terms, k1, b)}
SELECT CAST(COUNT(*) AS BIGINT) AS doc_count,
       CAST(COUNT(DISTINCT c.repo) AS BIGINT) AS distinct_repos,
       CAST(COUNT(DISTINCT c.lang) AS BIGINT) AS distinct_langs
FROM docsum s JOIN corpus c USING (docID)
"""


def mlt_topk_sql(
    seed_doc: int,
    max_query_terms: int = 10,
    min_term_freq: int = 2,
    min_doc_freq: int = 2,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """more_like_this twin: query terms = the seed doc's terms with
    tf ≥ min_term_freq and df ≥ min_doc_freq, ranked by the integer-exact
    proxy (tf desc, df asc, term asc) for Lucene MLT's tf·idf interest
    ranking (integer sort ⇒ the term cut is reproducible across engines),
    top max_query_terms; those terms then score BM25 over everything but
    the seed doc."""
    dlq = quantize_length_sql("dls.dl")
    return f"""{_PRELUDE},
seedtf AS (
    SELECT term, tf FROM tf WHERE docID = {int(seed_doc)} AND tf >= {int(min_term_freq)}
),
mnd AS (
    SELECT tf.term, COUNT(*) AS ndoc FROM tf JOIN seedtf USING (term) GROUP BY tf.term
),
mq AS (
    SELECT s.term, n.ndoc
    FROM seedtf s JOIN mnd n USING (term)
    WHERE n.ndoc >= {int(min_doc_freq)}
    ORDER BY s.tf DESC, n.ndoc ASC, s.term ASC
    LIMIT {int(max_query_terms)}
),
scored AS (
    SELECT tf.docID,
           SUM(
             ln(1 + (s.n_docs - mq.ndoc + 0.5) / (mq.ndoc + 0.5))
             * tf.tf / (tf.tf + {k1} * ((1 - {b}) + {b} * {dlq} / (s.total / s.n_docs)))
           ) AS score
    FROM tf
    JOIN mq ON tf.term = mq.term
    JOIN dls ON tf.docID = dls.docID
    CROSS JOIN stats s
    WHERE tf.docID != {int(seed_doc)}
    GROUP BY tf.docID
)
SELECT docID, ROUND(score, 4) AS score
FROM scored
ORDER BY score DESC, docID
LIMIT {int(k)}
"""


def simple_query_string_sql(
    should_clauses: list[dict],
    must_not_terms: list[list[str]] | None = None,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """simple_query_string twin (default_operator=OR, msm=1): score = sum of
    matching should-clause scores (bare term → match clause, quoted text →
    phrase clause), ``-`` atoms exclude. Clause dicts:
    ``{"kind": "match"|"phrase", "terms": [...]}``.

    An all-negated / empty input legitimately parses to zero should
    clauses (the parser never throws); the engine returns an empty frame
    there, so mirror it with a SELECT-nothing query instead of rendering
    malformed ``FROM ()`` SQL."""
    must_not_terms = must_not_terms or []
    ns = len(should_clauses)
    if ns == 0:
        return (
            "SELECT CAST(NULL AS BIGINT) AS docID,"
            " CAST(NULL AS DOUBLE) AS score WHERE FALSE"
        )
    parts = []
    for i, c in enumerate(should_clauses):
        if c["kind"] == "phrase":
            parts.append(_phrase_clause_ctes(i, c["terms"], k1, b, None, None))
        else:
            parts.append(_clause_ctes(i, c["terms"], k1, b, None, None))
    for j, t in enumerate(must_not_terms):
        parts.append(_clause_ctes(ns + j, t, k1, b, None, None))
    union = " UNION ALL ".join(f"SELECT docID, score FROM cut{i}" for i in range(ns))
    not_in = " AND ".join(
        f"docID NOT IN (SELECT docID FROM cut{ns + j})" for j in range(len(must_not_terms))
    )
    where_not = f"WHERE {not_in}" if not_in else ""
    return f"""{_PRELUDE},{",".join(parts)},
docsum AS (SELECT docID, SUM(score) AS score FROM ({union}) GROUP BY docID)
SELECT docID, ROUND(score, 4) AS score
FROM docsum
{where_not}
ORDER BY score DESC, docID
LIMIT {int(k)}
"""


def regexp_topk_sql(pattern: str, k: int = 10) -> str:
    """Constant-score ``regexp`` query twin: the pattern (RE2∩Java common
    dialect) filters the distinct term dictionary. Wrapped ``^(?:...)$``
    here exactly like the engine path — Lucene's implicit whole-term
    anchoring is enforced by both sides, not by caller convention."""
    pat = f"^(?:{pattern})$".replace("'", "''")
    return f"""{_PRELUDE}
SELECT DISTINCT docID, 1.0 AS score
FROM tf
WHERE regexp_matches(term, '{pat}')
ORDER BY docID
LIMIT {k}
"""


def rank_feature_topk_sql(
    terms: list[str], pivot: float, boost: float = 1.0, k: int = 10,
    k1: float = 1.2, b: float = 0.75,
) -> str:
    """rank_feature (saturation) as a bool should beside a BM25 must
    clause: score = bm25 + boost · v/(v + pivot) over ``n_chars``
    (feature must be positive to contribute, like the field type)."""
    return f"""{_PRELUDE},{_clause_ctes(0, terms, k1, b, None, None)},
feat AS (
    SELECT CAST(doc_id AS BIGINT) AS docID, CAST(n_chars AS DOUBLE) AS v
    FROM documents WHERE n_chars > 0
)
SELECT c.docID,
       ROUND(c.score + COALESCE({float(boost)!r} * f.v / (f.v + {float(pivot)!r}), 0.0), 4) AS score
FROM cut0 c LEFT JOIN feat f USING (docID)
ORDER BY score DESC, docID
LIMIT {int(k)}
"""


def function_score_topk_sql(
    terms: list[str], factor: float = 1.0, k: int = 10,
    k1: float = 1.2, b: float = 0.75,
) -> str:
    """function_score(field_value_factor, modifier=log1p,
    boost_mode=multiply) twin: score = bm25 · ln(1 + factor · n_chars)."""
    return f"""{_PRELUDE},{_clause_ctes(0, terms, k1, b, None, None)},
feat AS (SELECT CAST(doc_id AS BIGINT) AS docID, CAST(n_chars AS DOUBLE) AS v FROM documents)
SELECT c.docID,
       ROUND(c.score * ln(1 + {float(factor)!r} * COALESCE(f.v, 0.0)), 4) AS score
FROM cut0 c LEFT JOIN feat f USING (docID)
ORDER BY score DESC, docID
LIMIT {int(k)}
"""


def term_suggest_sql(text: str, max_edits: int = 2, size: int = 5) -> str:
    """term-suggester twin: Levenshtein candidates over the distinct term
    dictionary, integer-exact (distance, -freq, term) ranking."""
    q = text.lower().replace("'", "''")
    return f"""{_PRELUDE},
cand AS (
    SELECT DISTINCT term FROM tf
    WHERE levenshtein(term, '{q}') <= {int(max_edits)} AND term != '{q}'
),
freqs AS (
    SELECT tf.term, COUNT(*) AS freq FROM tf JOIN cand USING (term) GROUP BY tf.term
)
SELECT term,
       CAST(levenshtein(term, '{q}') AS INT) AS distance,
       CAST(freq AS BIGINT) AS freq
FROM freqs
ORDER BY distance ASC, freq DESC, term ASC
LIMIT {int(size)}
"""


def hybrid_agg_significant_text_sql(
    clause_terms: list[list[str]], size: int = 10, k1: float = 1.2, b: float = 0.75
) -> str:
    """significant_text under hybrid: JLH over analyzed terms (fg = hit
    docs containing the term, bg = index-wide doc freq)."""
    return f"""{_PRELUDE},{_hybrid_docsum(clause_terms, k1, b)},
fg AS (
    SELECT tf.term, COUNT(*) AS doc_count FROM tf
    WHERE tf.docID IN (SELECT docID FROM docsum)
    GROUP BY tf.term
),
fgt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM docsum),
bg AS (SELECT term, COUNT(*) AS bg_count FROM tf GROUP BY term),
sig AS (
    SELECT f.term, f.doc_count, g.bg_count,
           CAST(f.doc_count AS DOUBLE) / t.t AS fgp,
           CAST(g.bg_count AS DOUBLE) / s.n_docs AS bgp
    FROM fg f JOIN bg g USING (term) CROSS JOIN fgt t CROSS JOIN stats s
)
SELECT term,
       CAST(doc_count AS BIGINT) AS doc_count,
       CAST(bg_count AS BIGINT) AS bg_count,
       ROUND((fgp - bgp) * (fgp / bgp), 4) AS score
FROM sig
WHERE fgp > bgp
ORDER BY score DESC, term ASC
LIMIT {int(size)}
"""


def match_phrase_prefix_topk_sql(
    fixed_terms: list[str],
    prefix: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_expansions: int = 50,
) -> str:
    """match_phrase_prefix twin: fixed positions match exactly, the final
    slot by prefix RESTRICTED to the first ``max_expansions`` dictionary
    terms in term-asc order (Lucene's default-50 expansion cut, mirrored
    from ``PositionalIndex.match_phrase_prefix``); query weight = Σ idf
    over the FIXED positions only."""
    m = len(fixed_terms) + 1
    dlq = quantize_length_sql("dls.dl")
    conds = " AND ".join(
        f"toks[i+{j}] = '{t.replace(chr(39), chr(39) * 2)}'"
        for j, t in enumerate(fixed_terms)
    )
    pre = prefix.replace("'", "''")
    conds = (
        f"{conds} AND toks[i+{m - 1}] IN (SELECT term FROM expterms)"
    )
    pos_terms = ", ".join("'" + t.replace("'", "''") + "'" for t in fixed_terms)
    return f"""{_PRELUDE},
toksa AS (
    SELECT docID, regexp_extract_all(t, '{SQL_TOKEN_PATTERN}') AS toks FROM corpus
),
expterms AS (
    SELECT DISTINCT term FROM tf WHERE starts_with(term, '{pre}')
    ORDER BY term LIMIT {int(max_expansions)}
),
pq AS (SELECT unnest([{pos_terms}]) AS term),
nd AS (
    SELECT tf.term, COUNT(*) AS ndoc
    FROM tf JOIN (SELECT DISTINCT term FROM pq) d USING (term)
    GROUP BY tf.term
),
qidf AS (
    SELECT SUM(ln(1 + (s.n_docs - nd.ndoc + 0.5) / (nd.ndoc + 0.5))) AS w
    FROM pq JOIN nd USING (term) CROSS JOIN stats s
),
ph AS (
    SELECT docID, COUNT(*) AS ptf
    FROM (SELECT docID, toks, unnest(generate_series(1, len(toks) - {m - 1})) AS i
          FROM toksa WHERE len(toks) >= {m})
    WHERE {conds}
    GROUP BY docID
)
SELECT ph.docID AS docID,
       ROUND(q.w * ph.ptf / (ph.ptf + {k1} * ((1 - {b}) + {b} * {dlq} / (s.total / s.n_docs))), 4) AS score
FROM ph
JOIN dls ON ph.docID = dls.docID
CROSS JOIN qidf q
CROSS JOIN stats s
ORDER BY score DESC, docID
LIMIT {k}
"""


def hybrid_fields_fetch_sql(
    clause_terms: list[list[str]],
    k: int = 10,
    depth: int | None = 50,
) -> str:
    """fields/docvalue_fields fetch-phase twin: the hybrid top-k cut
    joined to the requested stored columns (query-then-fetch)."""
    inner = hybrid_topk_sql(clause_terms, "min_max", "arithmetic_mean", k=k, depth=depth)
    return f"""
SELECT h.docID AS docID, h.score AS score,
       d.source AS repo, d.lang AS lang,
       'src/' || CAST(d.doc_id AS VARCHAR) || '.txt' AS path
FROM ({inner}) h JOIN documents d ON h.docID = CAST(d.doc_id AS BIGINT)
ORDER BY h.score DESC, h.docID
"""


def hybrid_agg_composite_sql(
    clause_terms: list[list[str]],
    after: tuple,
    size: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """composite aggregation twin: (repo, lang) buckets in key order with
    after-key paging."""
    a_repo = after[0].replace("'", "''")
    a_lang = after[1].replace("'", "''")
    return f"""{_PRELUDE},{_hybrid_docsum(clause_terms, k1, b)},
buckets AS (
    SELECT c.repo, c.lang,
           CAST(COUNT(*) AS BIGINT) AS doc_count,
           ROUND(SUM(s.score), 4) AS sum_score
    FROM docsum s JOIN corpus c USING (docID)
    GROUP BY c.repo, c.lang
)
SELECT repo, lang, doc_count, sum_score
FROM buckets
WHERE repo > '{a_repo}' OR (repo = '{a_repo}' AND lang > '{a_lang}')
ORDER BY repo, lang
LIMIT {int(size)}
"""


def hybrid_agg_filters_sql(
    clause_terms: list[list[str]],
    filters: tuple,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """filters-aggregation twin: each named bucket is one conditional
    aggregate over the hit set (buckets may overlap). Predicates are over
    the corpus CTE columns (repo/lang/content)."""
    selects = []
    for name, pred in filters:
        nm = name.replace("'", "''")
        selects.append(
            f"""SELECT '{nm}' AS bucket,
       CAST(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS doc_count,
       ROUND(SUM(CASE WHEN {pred} THEN s.score ELSE 0.0 END), 4) AS sum_score
FROM docsum s JOIN corpus2 c USING (docID)"""
        )
    union = "\nUNION ALL\n".join(selects)
    return f"""{_PRELUDE},{_hybrid_docsum(clause_terms, k1, b)},
corpus2 AS (
    SELECT CAST(doc_id AS BIGINT) AS docID, source AS repo, lang, text AS content
    FROM documents
)
SELECT * FROM ({union})
ORDER BY bucket
"""


def hybrid_agg_global_sql(
    clause_terms: list[list[str]], k1: float = 1.2, b: float = 0.75
) -> str:
    """global-aggregation twin: hit-set stats beside index-wide stats."""
    return f"""{_PRELUDE},{_hybrid_docsum(clause_terms, k1, b)},
corpus2 AS (SELECT CAST(doc_id AS BIGINT) AS docID, text AS content FROM documents),
h AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS hit_count,
           ROUND(AVG(length(c.content)), 4) AS hit_avg_chars
    FROM docsum s JOIN corpus2 c USING (docID)
),
g AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS global_count,
           ROUND(AVG(length(content)), 4) AS global_avg_chars
    FROM corpus2
)
SELECT h.hit_count, h.hit_avg_chars, g.global_count, g.global_avg_chars
FROM h CROSS JOIN g
"""
