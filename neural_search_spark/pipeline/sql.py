"""DuckDB oracle-SQL generators for the pipeline operators.

Rendered from the SAME constants as the Spark plans
(:mod:`neural_search_spark.pipeline.params`): hash formulas, MinHash
coefficients, hyperplane literals, stopword lists. Tables `documents`
and `embeddings` are the driver's pre-registered views.

The near-dup queries inject duplicates deterministically (the raw
synthetic corpus has none): every doc_id % 5 == 0 gets an 80%-prefix
near-copy at +100000, every doc_id % 7 == 0 an exact copy at +200000;
embeddings get exact copies at +100000 for vec_id % 10 == 0. The Spark
side builds the identical tables (``__spark_entry__``).
"""

from __future__ import annotations

from neural_search_spark.analysis.tokenizer import SQL_TOKEN_PATTERN
from neural_search_spark.pipeline import params as P

# ---------------------------------------------------------------------------
# Shared CTEs
# ---------------------------------------------------------------------------

DUPDOCS_CTE = """
dupdocs AS (
    SELECT CAST(doc_id AS BIGINT) AS docID, lang, text AS content FROM documents
    UNION ALL
    SELECT CAST(doc_id AS BIGINT) + 100000, lang,
           substr(text, 1, CAST(floor(length(text) * 0.8) AS INT))
    FROM documents WHERE doc_id % 5 = 0
    UNION ALL
    SELECT CAST(doc_id AS BIGINT) + 200000, lang, text
    FROM documents WHERE doc_id % 7 = 0
)
"""

DUPVECS_CTE = """
dupvecs AS (
    SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding FROM embeddings
    UNION ALL
    SELECT CAST(vec_id AS BIGINT) + 100000, embedding
    FROM embeddings WHERE vec_id % 10 = 0
)
"""


def _h32(expr: str) -> str:
    return P.hash32_sql_duckdb(expr)


def _shingle_ctes(src: str = "dupdocs") -> str:
    n = P.SHINGLE_N
    return f"""
toks AS (
    SELECT docID, lang, regexp_extract_all(lower(content), '{SQL_TOKEN_PATTERN}') AS toks
    FROM {src}
),
pos AS (
    SELECT docID, lang, toks, unnest(generate_series(1, len(toks) - {n - 1})) AS i
    FROM toks
),
sh AS (
    SELECT DISTINCT docID, lang,
           {_h32(f"array_to_string(toks[i:i+{n - 1}], ' ')")} AS sh
    FROM pos
)
"""


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------


def dedup_exact_sql() -> str:
    return f"""
WITH {DUPDOCS_CTE.strip()},
h AS (SELECT docID, sha256(content) AS h FROM dupdocs),
k AS (SELECT h, MIN(docID) AS keep_docID FROM h GROUP BY h)
SELECT h.docID AS docID, k.keep_docID AS keep_docID
FROM h JOIN k USING (h)
WHERE h.docID != k.keep_docID
ORDER BY docID
"""


def _minhash_pairs_block() -> str:
    """CTE block ending in ``pairs`` (docA, docB, jaccard) — the verified
    MinHash-LSH near-dup pairs; shared by :func:`dedup_minhash_sql` and
    :func:`dedup_clusters_sql`."""
    sig_cols = ",\n           ".join(
        f"MIN({P.minhash_sql(i, 'sh')}) AS m{i}" for i in range(P.NUM_MINHASHES)
    )
    band_selects = []
    for b in range(P.LSH_BANDS):
        exprs = [f"m{b * P.LSH_ROWS + r}" for r in range(P.LSH_ROWS)]
        band_selects.append(
            f"SELECT docID, {b} AS band_idx, {P.band_sql(exprs)} AS band_val FROM sig"
        )
    bands = "\n    UNION ALL\n    ".join(band_selects)
    thr = P.MINHASH_JACCARD_THRESHOLD
    return f"""{DUPDOCS_CTE.strip()},
{_shingle_ctes().strip()},
sig AS (
    SELECT docID, {sig_cols}
    FROM sh GROUP BY docID
),
bands AS (
    {bands}
),
cand AS (
    SELECT DISTINCT x.docID AS docA, y.docID AS docB
    FROM bands x JOIN bands y
      ON x.band_idx = y.band_idx AND x.band_val = y.band_val AND x.docID < y.docID
),
sizes AS (SELECT docID, COUNT(*) AS cnt FROM sh GROUP BY docID),
inter AS (
    SELECT c.docA, c.docB, COUNT(*) AS inter
    FROM cand c
    JOIN sh a ON a.docID = c.docA
    JOIN sh b ON b.docID = c.docB AND b.sh = a.sh
    GROUP BY c.docA, c.docB
),
pairs AS (
    SELECT i.docA AS docA, i.docB AS docB,
           (floor(i.inter / (ca.cnt + cb.cnt - i.inter) * 10000 + 0.5) / 10000) AS jaccard
    FROM inter i
    JOIN sizes ca ON ca.docID = i.docA
    JOIN sizes cb ON cb.docID = i.docB
    WHERE i.inter / (ca.cnt + cb.cnt - i.inter) >= {thr}
)"""


def dedup_minhash_sql() -> str:
    return f"""
WITH {_minhash_pairs_block()}
SELECT docA, docB, jaccard
FROM pairs
ORDER BY docA, docB
"""


def dedup_clusters_sql() -> str:
    """Twin of :func:`neural_search_spark.pipeline.dedup.connected_components`
    over the MinHash near-dup pairs: transitive closure via a recursive
    min-label CTE; cluster_id = MIN docID reachable (undirected)."""
    return f"""
WITH RECURSIVE {_minhash_pairs_block()},
edges AS (
    SELECT docA AS src, docB AS dst FROM pairs
    UNION
    SELECT docB AS src, docA AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS docID FROM edges),
reach AS (
    SELECT docID, docID AS root FROM nodes
    UNION
    SELECT e.dst AS docID, r.root AS root
    FROM reach r JOIN edges e ON e.src = r.docID
)
SELECT docID, MIN(root) AS cluster_id
FROM reach
GROUP BY docID
ORDER BY docID
"""


def dedup_simhash_sql() -> str:
    """Brute-force 64-bit Hamming <= max over all pairs — equals the
    engine's band-join plan exactly (pigeonhole: <=3 differing bits cannot
    touch all 4 × 16-bit bands). The fingerprint is two 32-bit words
    (params.SIMHASH_*): lo bits from hash32(term), hi bits from
    hash32(term || '#')."""
    w = P.SIMHASH_WORD_BITS
    g_cols = ",\n           ".join(
        f"SUM(CASE WHEN (th_lo >> {j}) & 1 = 1 THEN tf ELSE -tf END) AS gl{j}"
        for j in range(w)
    ) + ",\n           " + ",\n           ".join(
        f"SUM(CASE WHEN (th_hi >> {j}) & 1 = 1 THEN tf ELSE -tf END) AS gh{j}"
        for j in range(w)
    )
    lo_expr = " + ".join(f"(CASE WHEN gl{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(w))
    hi_expr = " + ".join(f"(CASE WHEN gh{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(w))
    ham = "bit_count(xor(x.sim_lo, y.sim_lo)) + bit_count(xor(x.sim_hi, y.sim_hi))"
    sfx = P.SIMHASH_HI_SUFFIX
    return f"""
WITH {DUPDOCS_CTE.strip()},
toks AS (
    SELECT docID, regexp_extract_all(lower(content), '{SQL_TOKEN_PATTERN}') AS toks
    FROM dupdocs
),
tf AS (
    SELECT docID, term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM (SELECT docID, unnest(toks) AS term FROM toks)
    GROUP BY docID, term
),
th AS (SELECT docID, tf, {_h32('term')} AS th_lo, {_h32(f"term || '{sfx}'")} AS th_hi FROM tf),
g AS (
    SELECT docID, {g_cols}
    FROM th GROUP BY docID
),
fp AS (SELECT docID, CAST({lo_expr} AS BIGINT) AS sim_lo, CAST({hi_expr} AS BIGINT) AS sim_hi FROM g)
SELECT x.docID AS docA, y.docID AS docB,
       CAST({ham} AS BIGINT) AS hamming
FROM fp x JOIN fp y ON x.docID < y.docID
WHERE {ham} <= {P.SIMHASH_MAX_HAMMING}
ORDER BY docA, docB
"""


def dedup_ngram_jaccard_sql() -> str:
    thr = P.NGRAM_JACCARD_THRESHOLD
    return f"""
WITH {DUPDOCS_CTE.strip()},
{_shingle_ctes().strip()},
inter AS (
    SELECT a.docID AS docA, b.docID AS docB, COUNT(*) AS inter
    FROM sh a JOIN sh b ON a.sh = b.sh AND a.lang = b.lang AND a.docID < b.docID
    GROUP BY a.docID, b.docID
),
sizes AS (SELECT docID, COUNT(*) AS cnt FROM sh GROUP BY docID)
SELECT i.docA AS docA, i.docB AS docB,
       (floor(i.inter / (ca.cnt + cb.cnt - i.inter) * 10000 + 0.5) / 10000) AS jaccard
FROM inter i
JOIN sizes ca ON ca.docID = i.docA
JOIN sizes cb ON cb.docID = i.docB
WHERE (floor(i.inter / (ca.cnt + cb.cnt - i.inter) * 10000 + 0.5) / 10000) >= {thr}
ORDER BY docA, docB
"""


def dedup_embedding_cosine_sql() -> str:
    dot = P.pairwise_dot_sql("x.v", "y.v", P.EMBEDDING_DIM, one_based=True)
    na = P.pairwise_dot_sql("x.v", "x.v", P.EMBEDDING_DIM, one_based=True)
    nb = P.pairwise_dot_sql("y.v", "y.v", P.EMBEDDING_DIM, one_based=True)
    cos = P.round4_sql(f"{dot} / (sqrt({na}) * sqrt({nb}))")
    return f"""
WITH {DUPVECS_CTE.strip()},
b AS (
    SELECT vec_id AS id, embedding AS v, {P.bucket_sql('embedding', one_based=True)} AS bucket
    FROM dupvecs
)
SELECT x.id AS idA, y.id AS idB, {cos} AS cosine
FROM b x JOIN b y ON x.bucket = y.bucket AND x.id < y.id
WHERE {cos} >= {P.COSINE_DUP_THRESHOLD}
ORDER BY idA, idB
"""


# ---------------------------------------------------------------------------
# ANN
# ---------------------------------------------------------------------------


def ann_cosine_topk_sql(query_id: int, k: int) -> str:
    dot = P.pairwise_dot_sql("e.embedding", "q.qv", P.EMBEDDING_DIM, one_based=True)
    na = P.pairwise_dot_sql("e.embedding", "e.embedding", P.EMBEDDING_DIM, one_based=True)
    nb = P.pairwise_dot_sql("q.qv", "q.qv", P.EMBEDDING_DIM, one_based=True)
    score_expr = P.round4_sql(f"{dot} / (sqrt({na}) * sqrt({nb}))")
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_id})
SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
       {score_expr} AS score
FROM embeddings e, q
WHERE e.vec_id != {query_id}
ORDER BY score DESC, vec_id ASC
LIMIT {k}
"""


def _cos_sql(a: str, b: str) -> str:
    dot = P.pairwise_dot_sql(a, b, P.EMBEDDING_DIM, one_based=True)
    na = P.pairwise_dot_sql(a, a, P.EMBEDDING_DIM, one_based=True)
    nb = P.pairwise_dot_sql(b, b, P.EMBEDDING_DIM, one_based=True)
    return f"({dot} / (sqrt({na}) * sqrt({nb})))"


def ann_ivf_topk_sql(
    query_id: int,
    k: int,
    n_lists: int = P.IVF_N_LISTS,
    nprobe: int = P.IVF_NPROBE,
) -> str:
    """IVF twin of :func:`neural_search_spark.pipeline.ann.ann_ivf_topk` —
    same deterministic seeding (lowest ids), one Lloyd step with 6-dp
    per-dim means, argmax ties to the smaller list_id."""
    return f"""
WITH e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding AS v FROM embeddings),
seeds AS (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list_id, v AS c0
    FROM (SELECT * FROM e ORDER BY vec_id LIMIT {n_lists})
),
a0 AS (
    SELECT vec_id, v, list_id,
           row_number() OVER (
               PARTITION BY vec_id
               ORDER BY {_cos_sql('v', 'c0')} DESC, list_id ASC
           ) AS rn
    FROM e, seeds
),
dims AS (
    SELECT list_id, i, {P.round6_sql('avg(CAST(v[i] AS DOUBLE))')} AS m
    FROM (SELECT list_id, v, unnest(generate_series(1, {P.EMBEDDING_DIM})) AS i
          FROM a0 WHERE rn = 1)
    GROUP BY list_id, i
),
cents AS (SELECT list_id, list(m ORDER BY i) AS c FROM dims GROUP BY list_id),
a1 AS (
    SELECT vec_id, v, list_id,
           row_number() OVER (
               PARTITION BY vec_id
               ORDER BY {_cos_sql('v', 'c')} DESC, list_id ASC
           ) AS rn
    FROM e, cents
),
assigned AS (SELECT vec_id, v, list_id FROM a1 WHERE rn = 1),
q AS (SELECT v AS qv FROM e WHERE vec_id = {query_id}),
probe AS (
    SELECT list_id FROM cents, q
    ORDER BY {_cos_sql('c', 'qv')} DESC, list_id ASC LIMIT {nprobe}
)
SELECT a.vec_id AS vec_id,
       {P.round4_sql(_cos_sql('a.v', 'q.qv'))} AS score
FROM assigned a JOIN probe USING (list_id), q
WHERE a.vec_id != {query_id}
ORDER BY score DESC, vec_id ASC
LIMIT {k}
"""


def _ivf_ctes(src: str, n_lists: int | str) -> str:
    """The deterministic IVF coarse-quantizer CTE chain (seeds = lowest
    ids, one Lloyd step with 6-dp per-dim means, argmax ties to the
    smaller list_id) over an arbitrary (vec_id, v) source CTE — shared by
    the batch-ANN and SemDeDup oracles (same contract as
    :func:`ann_ivf_topk_sql`'s inline chain). ``n_lists`` may be an int or
    a scalar-subquery string (e.g. ``"(SELECT n FROM nl)"``) for
    data-adaptive cluster counts."""
    return f"""
seeds AS (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list_id, v AS c0
    FROM (SELECT * FROM {src} ORDER BY vec_id LIMIT {n_lists})
),
a0 AS (
    SELECT vec_id, v, list_id,
           row_number() OVER (
               PARTITION BY vec_id
               ORDER BY {_cos_sql('v', 'c0')} DESC, list_id ASC
           ) AS rn
    FROM {src}, seeds
),
dims AS (
    SELECT list_id, i, {P.round6_sql('avg(CAST(v[i] AS DOUBLE))')} AS m
    FROM (SELECT list_id, v, unnest(generate_series(1, {P.EMBEDDING_DIM})) AS i
          FROM a0 WHERE rn = 1)
    GROUP BY list_id, i
),
cents AS (SELECT list_id, list(m ORDER BY i) AS c FROM dims GROUP BY list_id),
a1 AS (
    SELECT vec_id, v, list_id,
           row_number() OVER (
               PARTITION BY vec_id
               ORDER BY {_cos_sql('v', 'c')} DESC, list_id ASC
           ) AS rn
    FROM {src}, cents
),
assigned AS (SELECT vec_id, v, list_id FROM a1 WHERE rn = 1)"""


def ann_ivf_batch_topk_sql(
    query_ids: list[int],
    k: int,
    n_lists: int = P.IVF_N_LISTS,
    nprobe: int = P.IVF_NPROBE,
) -> str:
    """Batch twin of :func:`ann_ivf_topk_sql`: per-qid probe window over
    (Q × n_lists) rows, one candidate pass, round4-then-cut per qid."""
    ids = ", ".join(str(int(q)) for q in query_ids)
    return f"""
WITH e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding AS v FROM embeddings),
{_ivf_ctes('e', n_lists).strip()},
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN ({ids})),
pr AS (
    SELECT q.qid, cents.list_id,
           row_number() OVER (
               PARTITION BY q.qid
               ORDER BY {_cos_sql('c', 'qv')} DESC, list_id ASC
           ) AS rn
    FROM cents, q
),
probe AS (SELECT qid, list_id FROM pr WHERE rn <= {nprobe}),
cand AS (
    SELECT p.qid, a.vec_id, {P.round4_sql(_cos_sql('a.v', 'q.qv'))} AS score
    FROM assigned a
    JOIN probe p USING (list_id)
    JOIN q ON q.qid = p.qid
    WHERE a.vec_id != p.qid
),
r AS (
    SELECT qid, vec_id, score,
           row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC) AS rn
    FROM cand
)
SELECT qid, vec_id, score FROM r
WHERE rn <= {k}
ORDER BY qid, score DESC, vec_id
"""


def semantic_dedup_sql(n_lists: int | None = None) -> str:
    """SemDeDup twin of
    :func:`neural_search_spark.pipeline.dedup.semantic_dedup` over the
    dup-injected vector table: IVF-cluster buckets, within-cluster pair
    cosine (round4) against the shared threshold, keeper = lowest id.
    ``n_lists=None`` applies the corpus-scaled cluster-count rule
    (:func:`neural_search_spark.pipeline.params.semantic_dedup_n_lists`)
    IN SQL, so the oracle adapts to whatever sf the driver runs."""
    cos = P.round4_sql(_cos_sql("x.v", "y.v"))
    if n_lists is None:
        nl_cte = f"nl AS (SELECT {P.semantic_dedup_n_lists_sql('COUNT(*)')} AS n FROM e),\n"
        n_arg: int | str = "(SELECT n FROM nl)"
    else:
        nl_cte = ""
        n_arg = n_lists
    return f"""
WITH {DUPVECS_CTE.strip()},
e AS (SELECT vec_id, embedding AS v FROM dupvecs),
{nl_cte}{_ivf_ctes('e', n_arg).strip()},
dropped AS (
    SELECT DISTINCT y.vec_id
    FROM assigned x JOIN assigned y
      ON x.list_id = y.list_id AND x.vec_id < y.vec_id
    WHERE {cos} >= {P.COSINE_DUP_THRESHOLD}
)
SELECT e.vec_id AS vec_id, (d.vec_id IS NULL) AS keep
FROM e LEFT JOIN dropped d ON e.vec_id = d.vec_id
ORDER BY vec_id
"""


def ann_quantized_topk_sql(query_id: int, k: int) -> str:
    """Twin of :func:`neural_search_spark.pipeline.ann.ann_quantized_topk`:
    global-interval int8 quantize → dequantize → exact cosine. The
    (min, max) extremes involve no summation, so both engines quantize
    with bit-identical parameters."""
    dot = P.pairwise_dot_sql("d.v", "q.qv", P.EMBEDDING_DIM, one_based=True)
    na = P.pairwise_dot_sql("d.v", "d.v", P.EMBEDDING_DIM, one_based=True)
    nb = P.pairwise_dot_sql("q.qv", "q.qv", P.EMBEDDING_DIM, one_based=True)
    score_expr = P.round4_sql(f"{dot} / (sqrt({na}) * sqrt({nb}))")
    return f"""
WITH e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding AS v FROM embeddings),
st AS (
    SELECT CAST(MIN(list_min(v)) AS DOUBLE) AS mn,
           CAST(MAX(list_max(v)) AS DOUBLE) AS mx
    FROM e
),
sc AS (
    SELECT mn, mx,
           CASE WHEN mx > mn THEN (mx - mn) / 255.0 ELSE 1.0 END AS scale
    FROM st
),
qt AS (
    SELECT vec_id,
           list_transform(v, x -> CAST(floor((CAST(x AS DOUBLE) - s.mn) / s.scale + 0.5) AS INT)) AS qv
    FROM e, sc s
),
d AS (
    SELECT vec_id, list_transform(qv, x -> s.mn + CAST(x AS DOUBLE) * s.scale) AS v
    FROM qt, sc s
),
q AS (SELECT v AS qv FROM d WHERE vec_id = {query_id})
SELECT d.vec_id AS vec_id, {score_expr} AS score
FROM d, q
WHERE d.vec_id != {query_id}
ORDER BY score DESC, vec_id ASC
LIMIT {k}
"""


def ann_quantized_rescore_topk_sql(query_id: int, k: int, oversample: int = 3) -> str:
    """Twin of :func:`neural_search_spark.pipeline.ann.ann_quantized_rescore_topk`:
    coarse dequantized-int8 cosine window (k × oversample, 4-dp rounded,
    vec_id-asc tie-break) → exact float cosine over the window only."""
    cdot = P.pairwise_dot_sql("d.v", "q.qv", P.EMBEDDING_DIM, one_based=True)
    cna = P.pairwise_dot_sql("d.v", "d.v", P.EMBEDDING_DIM, one_based=True)
    cnb = P.pairwise_dot_sql("q.qv", "q.qv", P.EMBEDDING_DIM, one_based=True)
    coarse_expr = P.round4_sql(f"{cdot} / (sqrt({cna}) * sqrt({cnb}))")
    edot = P.pairwise_dot_sql("e.v", "r.qv", P.EMBEDDING_DIM, one_based=True)
    ena = P.pairwise_dot_sql("e.v", "e.v", P.EMBEDDING_DIM, one_based=True)
    enb = P.pairwise_dot_sql("r.qv", "r.qv", P.EMBEDDING_DIM, one_based=True)
    exact_expr = P.round4_sql(f"{edot} / (sqrt({ena}) * sqrt({enb}))")
    return f"""
WITH e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding AS v FROM embeddings),
st AS (
    SELECT CAST(MIN(list_min(v)) AS DOUBLE) AS mn,
           CAST(MAX(list_max(v)) AS DOUBLE) AS mx
    FROM e
),
sc AS (
    SELECT mn, mx,
           CASE WHEN mx > mn THEN (mx - mn) / 255.0 ELSE 1.0 END AS scale
    FROM st
),
qt AS (
    SELECT vec_id,
           list_transform(v, x -> CAST(floor((CAST(x AS DOUBLE) - s.mn) / s.scale + 0.5) AS INT)) AS qv
    FROM e, sc s
),
d AS (
    SELECT vec_id, list_transform(qv, x -> s.mn + CAST(x AS DOUBLE) * s.scale) AS v
    FROM qt, sc s
),
q AS (SELECT v AS qv FROM d WHERE vec_id = {query_id}),
win AS (
    SELECT d.vec_id, {coarse_expr} AS cscore
    FROM d, q
    WHERE d.vec_id != {query_id}
    ORDER BY cscore DESC, vec_id ASC
    LIMIT {k * oversample}
),
r AS (SELECT v AS qv FROM e WHERE vec_id = {query_id})
SELECT e.vec_id AS vec_id, {exact_expr} AS score
FROM e JOIN win USING (vec_id), r
ORDER BY score DESC, vec_id ASC
LIMIT {k}
"""


def ann_quantized_batch_topk_sql(
    query_ids: list[int], k: int, oversample: int = 3
) -> str:
    """Batch twin of :func:`ann_quantized_rescore_topk_sql`: every query's
    coarse dequantized-int8 window in one pass (per-qid row_number over
    round4 coarse cosine), exact float cosine over the window union only,
    round4-then-cut per qid."""
    ids = ", ".join(str(int(q)) for q in query_ids)
    cdot = P.pairwise_dot_sql("d.v", "q.qv", P.EMBEDDING_DIM, one_based=True)
    cna = P.pairwise_dot_sql("d.v", "d.v", P.EMBEDDING_DIM, one_based=True)
    cnb = P.pairwise_dot_sql("q.qv", "q.qv", P.EMBEDDING_DIM, one_based=True)
    coarse_expr = P.round4_sql(f"{cdot} / (sqrt({cna}) * sqrt({cnb}))")
    edot = P.pairwise_dot_sql("e.v", "r.qv", P.EMBEDDING_DIM, one_based=True)
    ena = P.pairwise_dot_sql("e.v", "e.v", P.EMBEDDING_DIM, one_based=True)
    enb = P.pairwise_dot_sql("r.qv", "r.qv", P.EMBEDDING_DIM, one_based=True)
    exact_expr = P.round4_sql(f"{edot} / (sqrt({ena}) * sqrt({enb}))")
    return f"""
WITH e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding AS v FROM embeddings),
st AS (
    SELECT CAST(MIN(list_min(v)) AS DOUBLE) AS mn,
           CAST(MAX(list_max(v)) AS DOUBLE) AS mx
    FROM e
),
sc AS (
    SELECT mn, mx,
           CASE WHEN mx > mn THEN (mx - mn) / 255.0 ELSE 1.0 END AS scale
    FROM st
),
qt AS (
    SELECT vec_id,
           list_transform(v, x -> CAST(floor((CAST(x AS DOUBLE) - s.mn) / s.scale + 0.5) AS INT)) AS qv
    FROM e, sc s
),
d AS (
    SELECT vec_id, list_transform(qv, x -> s.mn + CAST(x AS DOUBLE) * s.scale) AS v
    FROM qt, sc s
),
q AS (SELECT vec_id AS qid, v AS qv FROM d WHERE vec_id IN ({ids})),
cw AS (
    SELECT q.qid, d.vec_id, {coarse_expr} AS cscore,
           row_number() OVER (
               PARTITION BY q.qid
               ORDER BY {coarse_expr} DESC, d.vec_id ASC
           ) AS rn
    FROM d, q
    WHERE d.vec_id != q.qid
),
win AS (SELECT qid, vec_id FROM cw WHERE rn <= {int(k) * int(oversample)}),
r AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN ({ids})),
ex AS (
    SELECT w.qid, e.vec_id, {exact_expr} AS score
    FROM e JOIN win w USING (vec_id)
    JOIN r ON r.qid = w.qid
),
fr AS (
    SELECT qid, vec_id, score,
           row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC) AS rn
    FROM ex
)
SELECT qid, vec_id, score FROM fr
WHERE rn <= {int(k)}
ORDER BY qid, score DESC, vec_id
"""


def _l2_sub_sql(a: str, b: str, subdim: int) -> str:
    """Unrolled left-associated squared-L2 chain over two subdim-length
    lists (1-based) — bit-identical to the engine's zip_with/aggregate
    fold in :func:`neural_search_spark.pipeline.ann._l2`."""
    terms = [
        f"(CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE))"
        f" * (CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE))"
        for i in range(1, subdim + 1)
    ]
    return "(" + " + ".join(terms) + ")"


def ann_pq_topk_sql(
    query_id: int,
    k: int,
    oversample: int = 3,
    n_sub: int = P.PQ_M,
    n_codes: int = P.PQ_K,
    subdim: int = P.PQ_SUBDIM,
) -> str:
    """PQ twin of :func:`neural_search_spark.pipeline.ann.ann_pq_topk` —
    per-subspace codebooks (lowest-id seeds, one Lloyd step with 6-dp
    means, L2 argmin ties to the smaller code), ADC coarse score from the
    per-(m, code) partial dots / squared norms, k×oversample window, exact
    float rescore. Every sum is an explicit left-associated chain so the
    engine's driver-side Python folds produce the same bits."""
    sub_dot = "(" + " + ".join(
        f"(CAST(qs.qsv[{i}] AS DOUBLE) * CAST(ct.c[{i}] AS DOUBLE))"
        for i in range(1, subdim + 1)
    ) + ")"
    cc_dot = "(" + " + ".join(
        f"(CAST(ct.c[{i}] AS DOUBLE) * CAST(ct.c[{i}] AS DOUBLE))"
        for i in range(1, subdim + 1)
    ) + ")"
    code_cols = ", ".join(
        f"MAX(CASE WHEN m = {mm} THEN code END) AS c{mm}" for mm in range(n_sub)
    )
    adc_joins = "\n    ".join(
        f"JOIN adc x{mm} ON x{mm}.m = {mm} AND x{mm}.code = cd.c{mm}"
        for mm in range(n_sub)
    )
    adot = " + ".join(f"x{mm}.pdot" for mm in range(n_sub))
    an2 = " + ".join(f"x{mm}.pn2" for mm in range(n_sub))
    qn = P.pairwise_dot_sql("q.qv", "q.qv", P.EMBEDDING_DIM, one_based=True)
    edot = P.pairwise_dot_sql("e.v", "r.qv", P.EMBEDDING_DIM, one_based=True)
    ena = P.pairwise_dot_sql("e.v", "e.v", P.EMBEDDING_DIM, one_based=True)
    enb = P.pairwise_dot_sql("r.qv", "r.qv", P.EMBEDDING_DIM, one_based=True)
    exact_expr = P.round4_sql(f"{edot} / (sqrt({ena}) * sqrt({enb}))")
    return f"""
WITH e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding AS v FROM embeddings),
ms AS (SELECT unnest(generate_series(0, {n_sub - 1})) AS m),
sub AS (SELECT vec_id, m, v[m*{subdim}+1 : (m+1)*{subdim}] AS sv FROM e, ms),
sd AS (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v
    FROM (SELECT * FROM e ORDER BY vec_id LIMIT {n_codes})
),
seeds AS (SELECT code, m, v[m*{subdim}+1 : (m+1)*{subdim}] AS c0 FROM sd, ms),
a0 AS (
    SELECT s.vec_id, s.m, sd2.code, s.sv,
           row_number() OVER (
               PARTITION BY s.vec_id, s.m
               ORDER BY {_l2_sub_sql('s.sv', 'sd2.c0', subdim)} ASC, sd2.code ASC
           ) AS rn
    FROM sub s JOIN seeds sd2 USING (m)
),
dims AS (
    SELECT m, code, i, {P.round6_sql('avg(CAST(sv[i] AS DOUBLE))')} AS mu
    FROM (SELECT m, code, sv, unnest(generate_series(1, {subdim})) AS i
          FROM a0 WHERE rn = 1)
    GROUP BY m, code, i
),
cents AS (SELECT m, code, list(mu ORDER BY i) AS c FROM dims GROUP BY m, code),
a1 AS (
    SELECT s.vec_id, s.m, ct.code,
           row_number() OVER (
               PARTITION BY s.vec_id, s.m
               ORDER BY {_l2_sub_sql('s.sv', 'ct.c', subdim)} ASC, ct.code ASC
           ) AS rn
    FROM sub s JOIN cents ct USING (m)
),
codes AS (SELECT vec_id, {code_cols} FROM a1 WHERE rn = 1 GROUP BY vec_id),
q AS (SELECT v AS qv FROM e WHERE vec_id = {query_id}),
qsub AS (SELECT m, qv[m*{subdim}+1 : (m+1)*{subdim}] AS qsv FROM q, ms),
adc AS (
    SELECT ct.m, ct.code, {sub_dot} AS pdot, {cc_dot} AS pn2
    FROM cents ct JOIN qsub qs USING (m)
),
qn AS (SELECT sqrt({qn}) AS qnorm FROM q),
coarse AS (
    SELECT cd.vec_id,
           {P.round4_sql(f'({adot}) / (qn.qnorm * sqrt({an2}))')} AS cscore
    FROM codes cd
    {adc_joins}, qn
    WHERE cd.vec_id != {query_id}
    ORDER BY cscore DESC, cd.vec_id ASC
    LIMIT {int(k) * int(oversample)}
),
r AS (SELECT v AS qv FROM e WHERE vec_id = {query_id})
SELECT e.vec_id AS vec_id, {exact_expr} AS score
FROM e JOIN coarse USING (vec_id), r
ORDER BY score DESC, vec_id ASC
LIMIT {k}
"""


def ann_pq_batch_topk_sql(
    query_ids: list[int],
    k: int,
    oversample: int = 3,
    n_sub: int = P.PQ_M,
    n_codes: int = P.PQ_K,
    subdim: int = P.PQ_SUBDIM,
) -> str:
    """Batch twin of :func:`ann_pq_topk_sql`: one shared code table (the
    encode is query-independent), per-qid ADC partials from the same
    codebooks, round4-then-cut k×oversample windows per qid, one exact
    float rescore over the window union."""
    sub_dot = "(" + " + ".join(
        f"(CAST(qs.qsv[{i}] AS DOUBLE) * CAST(ct.c[{i}] AS DOUBLE))"
        for i in range(1, subdim + 1)
    ) + ")"
    cc_dot = "(" + " + ".join(
        f"(CAST(ct.c[{i}] AS DOUBLE) * CAST(ct.c[{i}] AS DOUBLE))"
        for i in range(1, subdim + 1)
    ) + ")"
    code_cols = ", ".join(
        f"MAX(CASE WHEN m = {mm} THEN code END) AS c{mm}" for mm in range(n_sub)
    )
    adc_joins = "\n    ".join(
        f"JOIN adc x{mm} ON x{mm}.qid = qn.qid AND x{mm}.m = {mm} AND x{mm}.code = cd.c{mm}"
        for mm in range(n_sub)
    )
    adot = " + ".join(f"x{mm}.pdot" for mm in range(n_sub))
    an2 = " + ".join(f"x{mm}.pn2" for mm in range(n_sub))
    qq = P.pairwise_dot_sql("q.qv", "q.qv", P.EMBEDDING_DIM, one_based=True)
    edot = P.pairwise_dot_sql("e.v", "r.qv", P.EMBEDDING_DIM, one_based=True)
    ena = P.pairwise_dot_sql("e.v", "e.v", P.EMBEDDING_DIM, one_based=True)
    enb = P.pairwise_dot_sql("r.qv", "r.qv", P.EMBEDDING_DIM, one_based=True)
    exact_expr = P.round4_sql(f"{edot} / (sqrt({ena}) * sqrt({enb}))")
    ids = ", ".join(str(int(q)) for q in query_ids)
    return f"""
WITH e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding AS v FROM embeddings),
ms AS (SELECT unnest(generate_series(0, {n_sub - 1})) AS m),
sub AS (SELECT vec_id, m, v[m*{subdim}+1 : (m+1)*{subdim}] AS sv FROM e, ms),
sd AS (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v
    FROM (SELECT * FROM e ORDER BY vec_id LIMIT {n_codes})
),
seeds AS (SELECT code, m, v[m*{subdim}+1 : (m+1)*{subdim}] AS c0 FROM sd, ms),
a0 AS (
    SELECT s.vec_id, s.m, sd2.code, s.sv,
           row_number() OVER (
               PARTITION BY s.vec_id, s.m
               ORDER BY {_l2_sub_sql('s.sv', 'sd2.c0', subdim)} ASC, sd2.code ASC
           ) AS rn
    FROM sub s JOIN seeds sd2 USING (m)
),
dims AS (
    SELECT m, code, i, {P.round6_sql('avg(CAST(sv[i] AS DOUBLE))')} AS mu
    FROM (SELECT m, code, sv, unnest(generate_series(1, {subdim})) AS i
          FROM a0 WHERE rn = 1)
    GROUP BY m, code, i
),
cents AS (SELECT m, code, list(mu ORDER BY i) AS c FROM dims GROUP BY m, code),
a1 AS (
    SELECT s.vec_id, s.m, ct.code,
           row_number() OVER (
               PARTITION BY s.vec_id, s.m
               ORDER BY {_l2_sub_sql('s.sv', 'ct.c', subdim)} ASC, ct.code ASC
           ) AS rn
    FROM sub s JOIN cents ct USING (m)
),
codes AS (SELECT vec_id, {code_cols} FROM a1 WHERE rn = 1 GROUP BY vec_id),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN ({ids})),
qsub AS (SELECT qid, m, qv[m*{subdim}+1 : (m+1)*{subdim}] AS qsv FROM q, ms),
adc AS (
    SELECT qs.qid, ct.m, ct.code, {sub_dot} AS pdot, {cc_dot} AS pn2
    FROM cents ct JOIN qsub qs USING (m)
),
qn AS (SELECT qid, sqrt({qq}) AS qnorm FROM q),
cand AS (
    SELECT qn.qid, cd.vec_id,
           {P.round4_sql(f'({adot}) / (qn.qnorm * sqrt({an2}))')} AS cscore
    FROM codes cd
    CROSS JOIN qn
    {adc_joins}
    WHERE cd.vec_id != qn.qid
),
cw AS (
    SELECT qid, vec_id, cscore,
           row_number() OVER (PARTITION BY qid ORDER BY cscore DESC, vec_id ASC) AS rn
    FROM cand
),
win AS (SELECT qid, vec_id FROM cw WHERE rn <= {int(k) * int(oversample)}),
r AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN ({ids})),
fs AS (
    SELECT w.qid, e.vec_id, {exact_expr} AS score
    FROM e JOIN win w USING (vec_id) JOIN r ON r.qid = w.qid
),
fr AS (
    SELECT qid, vec_id, score,
           row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC) AS rn
    FROM fs
)
SELECT qid, vec_id, score FROM fr
WHERE rn <= {k}
ORDER BY qid, score DESC, vec_id
"""


def ann_ivfpq_topk_sql(
    query_id: int,
    k: int,
    oversample: int = 3,
    n_lists: int = P.IVF_N_LISTS,
    nprobe: int = P.IVF_NPROBE,
    n_sub: int = P.PQ_M,
    n_codes: int = P.PQ_K,
    subdim: int = P.PQ_SUBDIM,
) -> str:
    """IVF×PQ twin of :func:`neural_search_spark.pipeline.ann.ann_ivfpq_topk`:
    the shared IVF coarse chain (:func:`_ivf_ctes`) prunes candidates to
    the probed lists, the PQ chain (same recipe as
    :func:`ann_pq_topk_sql`, pq-prefixed CTEs) scores ONLY those via ADC,
    exact float rescore over the k×oversample window."""
    sub_dot = "(" + " + ".join(
        f"(CAST(qs.qsv[{i}] AS DOUBLE) * CAST(ct.c[{i}] AS DOUBLE))"
        for i in range(1, subdim + 1)
    ) + ")"
    cc_dot = "(" + " + ".join(
        f"(CAST(ct.c[{i}] AS DOUBLE) * CAST(ct.c[{i}] AS DOUBLE))"
        for i in range(1, subdim + 1)
    ) + ")"
    code_cols = ", ".join(
        f"MAX(CASE WHEN m = {mm} THEN code END) AS c{mm}" for mm in range(n_sub)
    )
    adc_joins = "\n    ".join(
        f"JOIN adc x{mm} ON x{mm}.m = {mm} AND x{mm}.code = cd.c{mm}"
        for mm in range(n_sub)
    )
    adot = " + ".join(f"x{mm}.pdot" for mm in range(n_sub))
    an2 = " + ".join(f"x{mm}.pn2" for mm in range(n_sub))
    qn = P.pairwise_dot_sql("q.qv", "q.qv", P.EMBEDDING_DIM, one_based=True)
    edot = P.pairwise_dot_sql("e.v", "r.qv", P.EMBEDDING_DIM, one_based=True)
    ena = P.pairwise_dot_sql("e.v", "e.v", P.EMBEDDING_DIM, one_based=True)
    enb = P.pairwise_dot_sql("r.qv", "r.qv", P.EMBEDDING_DIM, one_based=True)
    exact_expr = P.round4_sql(f"{edot} / (sqrt({ena}) * sqrt({enb}))")
    return f"""
WITH e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding AS v FROM embeddings),
{_ivf_ctes('e', n_lists).strip()},
q AS (SELECT v AS qv FROM e WHERE vec_id = {query_id}),
probe AS (
    SELECT list_id FROM cents, q
    ORDER BY {_cos_sql('c', 'qv')} DESC, list_id ASC LIMIT {nprobe}
),
cand AS (
    SELECT a.vec_id, a.v FROM assigned a JOIN probe USING (list_id)
    WHERE a.vec_id != {query_id}
),
ms AS (SELECT unnest(generate_series(0, {n_sub - 1})) AS m),
sub AS (SELECT vec_id, m, v[m*{subdim}+1 : (m+1)*{subdim}] AS sv FROM e, ms),
pqsd AS (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v
    FROM (SELECT * FROM e ORDER BY vec_id LIMIT {n_codes})
),
pqseeds AS (SELECT code, m, v[m*{subdim}+1 : (m+1)*{subdim}] AS c0 FROM pqsd, ms),
pqa0 AS (
    SELECT s.vec_id, s.m, sd2.code, s.sv,
           row_number() OVER (
               PARTITION BY s.vec_id, s.m
               ORDER BY {_l2_sub_sql('s.sv', 'sd2.c0', subdim)} ASC, sd2.code ASC
           ) AS rn
    FROM sub s JOIN pqseeds sd2 USING (m)
),
pqdims AS (
    SELECT m, code, i, {P.round6_sql('avg(CAST(sv[i] AS DOUBLE))')} AS mu
    FROM (SELECT m, code, sv, unnest(generate_series(1, {subdim})) AS i
          FROM pqa0 WHERE rn = 1)
    GROUP BY m, code, i
),
pqcents AS (SELECT m, code, list(mu ORDER BY i) AS c FROM pqdims GROUP BY m, code),
pqa1 AS (
    SELECT s.vec_id, s.m, ct.code,
           row_number() OVER (
               PARTITION BY s.vec_id, s.m
               ORDER BY {_l2_sub_sql('s.sv', 'ct.c', subdim)} ASC, ct.code ASC
           ) AS rn
    FROM sub s JOIN pqcents ct USING (m)
),
codes AS (SELECT vec_id, {code_cols} FROM pqa1 WHERE rn = 1 GROUP BY vec_id),
qsub AS (SELECT m, qv[m*{subdim}+1 : (m+1)*{subdim}] AS qsv FROM q, ms),
adc AS (
    SELECT ct.m, ct.code, {sub_dot} AS pdot, {cc_dot} AS pn2
    FROM pqcents ct JOIN qsub qs USING (m)
),
qn AS (SELECT sqrt({qn}) AS qnorm FROM q),
coarse AS (
    SELECT cd.vec_id,
           {P.round4_sql(f'({adot}) / (qn.qnorm * sqrt({an2}))')} AS cscore
    FROM cand JOIN codes cd USING (vec_id)
    {adc_joins}, qn
    ORDER BY cscore DESC, cd.vec_id ASC
    LIMIT {int(k) * int(oversample)}
),
r AS (SELECT v AS qv FROM e WHERE vec_id = {query_id})
SELECT e.vec_id AS vec_id, {exact_expr} AS score
FROM e JOIN coarse USING (vec_id), r
ORDER BY score DESC, vec_id ASC
LIMIT {k}
"""


def ann_lsh_topk_sql(query_id: int, k: int, multi_probe: int = 0) -> str:
    """LSH twin; ``multi_probe=j`` also probes the j Hamming-1 neighbor
    buckets (hyperplane bit 0..j-1 flipped), matching
    :func:`neural_search_spark.pipeline.ann.ann_lsh_topk`."""
    dot = P.pairwise_dot_sql("e.v", "q.qv", P.EMBEDDING_DIM, one_based=True)
    na = P.pairwise_dot_sql("e.v", "e.v", P.EMBEDDING_DIM, one_based=True)
    nb = P.pairwise_dot_sql("q.qv", "q.qv", P.EMBEDDING_DIM, one_based=True)
    score_expr = P.round4_sql(f"{dot} / (sqrt({na}) * sqrt({nb}))")
    probe = " OR ".join(
        ["e.bucket = q.qbucket"]
        + [f"e.bucket = xor(q.qbucket, {1 << j})" for j in range(int(multi_probe))]
    )
    return f"""
WITH b AS (
    SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding AS v,
           {P.bucket_sql('embedding', one_based=True)} AS bucket
    FROM embeddings
),
q AS (SELECT v AS qv, bucket AS qbucket FROM b WHERE vec_id = {query_id})
SELECT e.vec_id AS vec_id,
       {score_expr} AS score
FROM b e, q
WHERE e.vec_id != {query_id} AND ({probe})
ORDER BY score DESC, vec_id ASC
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Text analysis (over the raw documents view)
# ---------------------------------------------------------------------------

_DOC_TOKS = f"""
toks AS (
    SELECT CAST(doc_id AS BIGINT) AS docID, text,
           regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}') AS toks
    FROM documents
)
"""


def _in_list(items: list[str]) -> str:
    return ", ".join("'" + w + "'" for w in items)


def text_token_counts_sql() -> str:
    return f"""
SELECT CAST(doc_id AS BIGINT) AS docID,
       CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '{P.BPE_ISH_PATTERN}')) AS BIGINT)
           AS bpe_ish_tokens
FROM documents
"""


def text_lang_id_sql() -> str:
    cnt = {
        lang: f"len(list_filter(toks, t -> t IN ({_in_list(P.STOPWORDS[lang])})))"
        for lang in P.LANGS
    }
    sel = ",\n           ".join(f"{cnt[lang]} AS c_{lang}" for lang in P.LANGS)
    g = "greatest(" + ", ".join(f"c_{lang}" for lang in P.LANGS) + ")"
    case = "CASE WHEN " + g + " = 0 THEN 'und' " + " ".join(
        f"WHEN c_{lang} = {g} THEN '{lang}'" for lang in P.LANGS
    ) + " END"
    return f"""
WITH {_DOC_TOKS.strip()},
c AS (
    SELECT docID, {sel}
    FROM toks
)
SELECT docID, {case} AS pred_lang FROM c
"""


def text_quality_sql() -> str:
    stop = _in_list(P.QUALITY_STOPWORDS)
    return f"""
WITH {_DOC_TOKS.strip()},
m AS (
    SELECT docID,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) AS alpha,
           CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE) AS punct,
           CAST(len(list_filter(toks, t -> t IN ({stop}))) AS DOUBLE) AS stop,
           CAST(COALESCE(list_sum(list_transform(toks, t -> strlen(t))), 0) AS DOUBLE)
               AS tok_chars
    FROM toks
),
r AS (
    SELECT docID, n_chars, n_tokens,
           CASE WHEN n_chars > 0 THEN alpha / n_chars ELSE 0.0 END AS alpha_ratio,
           CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0.0 END AS punct_ratio,
           CASE WHEN n_tokens > 0 THEN stop / n_tokens ELSE 0.0 END AS stopword_ratio,
           CASE WHEN n_tokens > 0 THEN tok_chars / n_tokens ELSE 0.0 END AS mean_token_len
    FROM m
)
SELECT docID, n_chars, n_tokens,
       round(alpha_ratio, 4) AS alpha_ratio,
       round(punct_ratio, 4) AS punct_ratio,
       round(stopword_ratio, 4) AS stopword_ratio,
       round(mean_token_len, 4) AS mean_token_len,
       round(alpha_ratio * (1.0 - punct_ratio) * least(n_tokens / 64.0, 1.0), 4) AS quality
FROM r
"""


def quality_threshold_sweep_sql(thresholds: tuple[float, ...]) -> str:
    """Keep-rate twin of ``textstats.quality_threshold_sweep``: the same
    round4 quality per doc, conditional doc/token sums per ladder rung."""
    stop = _in_list(P.QUALITY_STOPWORDS)
    vals = ", ".join(f"({float(t)!r})" for t in thresholds)
    return f"""
WITH {_DOC_TOKS.strip()},
m AS (
    SELECT docID,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) AS alpha,
           CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE) AS punct
    FROM toks
),
q AS (
    SELECT n_tokens,
           round(
               (CASE WHEN n_chars > 0 THEN alpha / n_chars ELSE 0.0 END)
               * (1.0 - CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0.0 END)
               * least(n_tokens / 64.0, 1.0), 4) AS quality
    FROM m
),
thr(threshold) AS (VALUES {vals})
SELECT threshold,
       CAST(COUNT(*) FILTER (WHERE quality >= threshold) AS BIGINT) AS docs_kept,
       round(COUNT(*) FILTER (WHERE quality >= threshold) * 1.0 / COUNT(*), 4)
           AS doc_keep_rate,
       CAST(COALESCE(SUM(n_tokens) FILTER (WHERE quality >= threshold), 0) AS BIGINT)
           AS tokens_kept,
       round(COALESCE(SUM(n_tokens) FILTER (WHERE quality >= threshold), 0) * 1.0
             / SUM(n_tokens), 4) AS token_keep_rate
FROM q CROSS JOIN thr
GROUP BY threshold
ORDER BY threshold
"""


def text_fingerprint_sql() -> str:
    return f"""
WITH {_DOC_TOKS.strip()}
SELECT docID,
       list_reduce(
           list_prepend(CAST(0 AS BIGINT), list_transform(toks, t -> {_h32('t')})),
           (a, b) -> (a * {P.FINGERPRINT_MULT} + b) % {P.MERSENNE_P}
       ) AS fingerprint
FROM toks
"""


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------


def mm_image_meta_sql() -> str:
    # strlen counts BYTES; the corpus is ASCII so this equals the utf-8
    # payload length the Spark side measures. md5(text) == md5(utf-8 bytes).
    return f"""
SELECT CAST(doc_id AS BIGINT) AS docID,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       {_h32('text')} AS checksum
FROM documents
"""


def mm_text_image_embedding_sql(text_dims: int = 8, image_dims: int = 4) -> str:
    """Joint text+image embedding stand-in (mirrors
    ``multimodal.text_image_embedding_stub``): nonzero text-count dims ∪
    ALL checksum-byte image dims, L2-normalized together, long form."""
    img_rows = " UNION ALL ".join(
        f"SELECT docID, CAST({text_dims + j} AS INT) AS dim, "
        f"CAST((checksum >> {8 * j}) & 255 AS DOUBLE) AS v FROM meta"
        for j in range(image_dims)
    )
    return f"""
WITH toks AS (
    SELECT CAST(doc_id AS BIGINT) AS docID,
           unnest(regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}')) AS term
    FROM documents
),
tcnt AS (
    SELECT docID, CAST(length(term) % {text_dims} AS INT) AS dim,
           CAST(COUNT(*) AS DOUBLE) AS v
    FROM toks GROUP BY docID, dim
),
meta AS (SELECT CAST(doc_id AS BIGINT) AS docID, {_h32('text')} AS checksum FROM documents),
long AS (
    SELECT docID, dim, v FROM tcnt
    UNION ALL
    {img_rows}
),
nrm AS (SELECT docID, SQRT(SUM(v * v)) AS nrm FROM long GROUP BY docID)
SELECT long.docID AS docID, long.dim AS dim,
       ROUND(CASE WHEN n.nrm > 0 THEN long.v / n.nrm ELSE 0.0 END, 6) AS value
FROM long JOIN nrm n ON long.docID = n.docID
ORDER BY long.docID, long.dim
"""


def mm_frame_sample_sql(frame_stride: int, max_frames: int) -> str:
    return f"""
WITH f AS (
    SELECT CAST(doc_id AS BIGINT) AS docID,
           least(CAST(floor((strlen(text) + {frame_stride - 1}) / {frame_stride}) AS INT),
                 {max_frames}) AS n_frames
    FROM documents
)
SELECT docID,
       CAST(unnest(generate_series(0, n_frames - 1)) AS BIGINT) AS frame_idx,
       CAST(unnest(generate_series(0, n_frames - 1)) AS BIGINT) * {frame_stride}
           AS byte_offset
FROM f
WHERE n_frames > 0
"""


# ---------------------------------------------------------------------------
# Event analytics (over the raw events view)
# ---------------------------------------------------------------------------


def train_split_assign_sql(seed: str = "split-v1") -> str:
    """Twin of :func:`neural_search_spark.pipeline.training.split_assign`
    (default 90/5/5 weights, md5-prefix hash32, seed-versioned)."""
    h = P.hash32_sql_duckdb(f"'{seed}' || ':' || CAST(doc_id AS VARCHAR)")
    return f"""
SELECT CAST(doc_id AS BIGINT) AS docID,
       CAST({h} % 10000 AS INT) AS bucket,
       CASE WHEN {h} % 10000 < 9000 THEN 'train'
            WHEN {h} % 10000 < 9500 THEN 'val'
            ELSE 'test' END AS split
FROM documents
ORDER BY docID
"""


def pack_plan_sql(budget: int) -> str:
    """Twin of :func:`neural_search_spark.pipeline.training.pack_plan`:
    exclusive prefix sum of token counts in docID order, pack = offset
    div budget, span = packs touched by [start, start+dl)."""
    return f"""
WITH dl AS (
    SELECT CAST(doc_id AS BIGINT) AS docID,
           CAST(len(regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}')) AS BIGINT) AS dl
    FROM documents
),
c AS (
    SELECT docID, dl,
           -- DuckDB's windowed SUM(BIGINT) returns HUGEINT, which pandas
           -- fetches as float64 and hash-mismatches Spark's BIGINT; CAST
           -- keeps start_offset integral on the oracle side.
           CAST(COALESCE(SUM(dl) OVER (
               ORDER BY docID ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS start_offset
    FROM dl
)
SELECT docID, dl, start_offset,
       CAST(floor(start_offset / {budget}) AS BIGINT) AS pack_id,
       CAST(CASE WHEN dl = 0 THEN 0
            ELSE floor((start_offset + dl - 1) / {budget}) - floor(start_offset / {budget}) + 1
       END AS BIGINT) AS n_packs
FROM c
ORDER BY docID
"""


def stream_window_stats_batch_sql() -> str:
    """Twin of the batch-mode run of
    :func:`neural_search_spark.streaming.analytics.windowed_doc_stats`
    (synthetic event time = 2026-01-01 + doc_id seconds, 1-minute
    tumbling windows grouped by lang)."""
    return f"""
WITH docs AS (
    SELECT TIMESTAMP '2026-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND AS event_time,
           lang,
           len(regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}')) AS dl
    FROM documents
)
SELECT time_bucket(INTERVAL 1 MINUTE, event_time) AS window_start,
       lang,
       COUNT(*) AS n_docs,
       CAST(SUM(dl) AS BIGINT) AS total_tokens,
       {P.round4_sql('SUM(dl) / COUNT(*)')} AS avg_dl
FROM docs
GROUP BY 1, 2
ORDER BY window_start, lang
"""


def events_window_agg_sql(window_hours: int = 1) -> str:
    """Twin of :func:`neural_search_spark.pipeline.events.window_agg`."""
    return f"""
SELECT time_bucket(INTERVAL {window_hours} HOUR, ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {P.round4_sql('SUM(value)')} AS sum_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


def session_window_stats_sql(gap_minutes: int = 480) -> str:
    """Twin of
    :func:`neural_search_spark.streaming.sessions.session_window_stats`
    (Spark's built-in ``session_window``, run in batch mode). Boundary
    contract: an inter-event gap of EXACTLY ``gap`` starts a new session
    (``gap_s >= gap*60`` — Spark merges only while the next event is
    strictly inside last+gap); ``session_end`` is last event + gap,
    Spark's session close time."""
    return f"""
WITH gaps AS (
    SELECT user_id, event_id, ts, value,
           epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
    FROM events
),
tagged AS (
    SELECT user_id, ts, value,
           SUM(CASE WHEN gap_s IS NULL OR gap_s >= {gap_minutes * 60} THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_id
    FROM gaps
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL {gap_minutes} MINUTE AS session_end,
       COUNT(*) AS n_events,
       {P.round4_sql('SUM(value)')} AS total_value
FROM tagged
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


def events_sessionize_sql(gap_minutes: int = 30) -> str:
    """Twin of :func:`neural_search_spark.pipeline.events.sessionize` —
    same lag + cumulative-sum session assignment, per-user ordinals."""
    return f"""
WITH gaps AS (
    SELECT user_id, event_id, ts,
           epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
    FROM events
),
tagged AS (
    SELECT user_id, ts,
           SUM(CASE WHEN gap_s IS NULL OR gap_s > {gap_minutes * 60} THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_id
    FROM gaps
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(session_id AS BIGINT) AS session_id,
       MIN(ts) AS session_start,
       COUNT(*) AS n_events,
       {P.round4_sql('(epoch(MAX(ts)) - epoch(MIN(ts)))')} AS duration_sec
FROM tagged
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


def events_json_prop_sql(prop: str = "k") -> str:
    """Twin of :func:`neural_search_spark.pipeline.events.json_prop_stats`."""
    return f"""
SELECT event_type,
       COUNT(*) AS n_with_prop,
       {P.round4_sql('AVG(v)')} AS avg_prop
FROM (
    SELECT event_type, TRY_CAST(json_extract_string(props, '$.{prop}') AS BIGINT) AS v
    FROM events
)
WHERE v IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


def events_percentiles_sql(probs: tuple = (0.5, 0.95, 0.99)) -> str:
    """Twin of :func:`neural_search_spark.pipeline.events.value_percentiles`."""
    cols = ",\n       ".join(
        f"{P.round4_sql(f'quantile_cont(value, {p!r})')} AS p{int(p * 100)}"
        for p in probs
    )
    return f"""
SELECT event_type,
       {cols}
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def text_repetition_sql(line_delim: str) -> str:
    """Twin of :func:`neural_search_spark.pipeline.textstats.repetition_stats`
    (Gopher-style duplicate-line fraction + top word-2-gram fraction)."""
    d = line_delim.replace("'", "''")
    return f"""
WITH base AS (
    SELECT CAST(doc_id AS BIGINT) AS docID,
           string_split(text, '{d}') AS lines,
           regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}') AS ts
    FROM documents
),
linestats AS (
    SELECT docID, CAST(len(lines) AS BIGINT) AS n_lines,
           ROUND(CASE WHEN len(lines) > 0
                 THEN CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE) / len(lines)
                 ELSE 0.0 END, 6) AS dup_line_frac
    FROM base
),
bi AS (
    SELECT docID,
           unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1])) AS bigram
    FROM base
),
cnt AS (SELECT docID, bigram, COUNT(*) AS c FROM bi GROUP BY docID, bigram),
agg AS (
    SELECT docID, CAST(SUM(c) AS BIGINT) AS n_bigrams, CAST(MAX(c) AS BIGINT) AS top_c
    FROM cnt GROUP BY docID
)
SELECT l.docID, l.n_lines, l.dup_line_frac,
       CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       ROUND(CASE WHEN COALESCE(a.n_bigrams, 0) > 0
             THEN CAST(a.top_c AS DOUBLE) / a.n_bigrams ELSE 0.0 END, 6) AS top_bigram_frac
FROM linestats l LEFT JOIN agg a USING (docID)
ORDER BY docID
"""


def text_decontaminate_sql(n: int, bench_mod: int) -> str:
    """Twin of :func:`neural_search_spark.pipeline.decontam.ngram_decontaminate`
    with benchmark = documents where doc_id % bench_mod == 0 (the driver's
    deterministic stand-in eval set) and corpus = the rest."""
    grams = (
        f"unnest(list_distinct(list_transform(range(1, len(ts) - {n - 2}),"
        f" i -> array_to_string(ts[i:i + {n - 1}], ' ')))) AS ngram"
    )
    return f"""
WITH toks AS (
    SELECT CAST(doc_id AS BIGINT) AS docID,
           regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}') AS ts
    FROM documents
),
corpus_grams AS (
    SELECT docID, {grams} FROM toks WHERE docID % {bench_mod} != 0
),
bench_grams AS (
    SELECT DISTINCT {grams.replace(' AS ngram', '')} AS ngram
    FROM toks WHERE docID % {bench_mod} = 0
)
SELECT docID, CAST(COUNT(*) AS BIGINT) AS n_hit_ngrams
FROM corpus_grams
WHERE ngram IN (SELECT ngram FROM bench_grams)
GROUP BY docID
ORDER BY docID
"""


def stratified_sample_sql(
    strata_col: str, fractions: dict[str, float], seed: str = "sample-v1"
) -> str:
    """Twin of :func:`neural_search_spark.pipeline.training.stratified_sample`:
    keep iff hash32(seed ':' docID) % 1e6 < fraction(stratum) * 1e6;
    strata absent from the map are dropped."""
    h = P.hash32_sql_duckdb(f"'{seed}' || ':' || CAST(doc_id AS VARCHAR)")
    scale = 1_000_000
    cases = " ".join(
        f"WHEN '{s}' THEN {int(round(f * scale))}"
        for s, f in sorted(fractions.items())
    )
    return f"""
SELECT CAST(doc_id AS BIGINT) AS docID, {strata_col}
FROM documents
WHERE {h} % {scale} < CASE {strata_col} {cases} ELSE 0 END
ORDER BY docID
"""


def text_pii_sql() -> str:
    """Twin of :func:`neural_search_spark.pipeline.textstats.pii_scrub`
    over the contact-line fixture (``with_contact_lines``): same injected
    text, same mask chain (emails -> IPv4 on the email-masked text ->
    phones last), same sentinel tokens."""
    em, ip, ph = P.PII_EMAIL_PATTERN, P.PII_IPV4_PATTERN, P.PII_PHONE_PATTERN
    emt, ipt, pht = P.PII_EMAIL_TOKEN, P.PII_IPV4_TOKEN, P.PII_PHONE_TOKEN
    return f"""
WITH corpus AS (
    SELECT CAST(doc_id AS BIGINT) AS docID,
           CASE WHEN doc_id % 5 = 0 THEN
                text || ' contact user' || CAST(CAST(doc_id AS BIGINT) AS VARCHAR)
                     || '@example.com or +1415550' || CAST(CAST(doc_id AS BIGINT) % 1000 AS VARCHAR)
                     || ' from 10.' || CAST(CAST(doc_id AS BIGINT) % 256 AS VARCHAR) || '.0.13'
           ELSE text END AS content
    FROM documents
),
masked AS (
    SELECT docID,
           CAST(len(regexp_extract_all(content, '{em}')) AS BIGINT) AS n_emails,
           regexp_replace(content, '{em}', '{emt}', 'g') AS no_email
    FROM corpus
),
masked2 AS (
    SELECT docID, n_emails,
           CAST(len(regexp_extract_all(no_email, '{ip}')) AS BIGINT) AS n_ips,
           regexp_replace(no_email, '{ip}', '{ipt}', 'g') AS no_ip
    FROM masked
)
SELECT docID, n_emails, n_ips,
       CAST(len(regexp_extract_all(no_ip, '{ph}')) AS BIGINT) AS n_phones,
       regexp_replace(no_ip, '{ph}', '{pht}', 'g') AS clean
FROM masked2
ORDER BY docID
"""


def text_line_dedup_sql(min_docs: int, boilerplate: tuple) -> str:
    """Twin of :func:`neural_search_spark.pipeline.textstats.line_dedup`
    over the ``with_boilerplate_lines`` fixture: same injected lines (the
    chained appends reduce to ordered conditional concats), same
    normalized key (``lower(trim(line))``), same >= ``min_docs``
    distinct-document threshold, same in-order reassembly."""
    inject = " || ".join(
        f"CASE WHEN doc_id % {mod} = 0 THEN chr(10) || '{line}' ELSE '' END"
        for mod, line in boilerplate
    )
    return f"""
WITH docs AS (
    SELECT CAST(doc_id AS BIGINT) AS docID, text || {inject} AS content
    FROM documents
),
lines AS (
    SELECT docID,
           generate_subscripts(string_split(content, chr(10)), 1) - 1 AS pos,
           unnest(string_split(content, chr(10))) AS line
    FROM docs
),
keyed AS (SELECT docID, pos, line, lower(trim(line)) AS key FROM lines),
counts AS (SELECT key, COUNT(DISTINCT docID) AS nd FROM keyed GROUP BY key),
flagged AS (
    SELECT k.docID, k.pos, k.line, c.nd >= {int(min_docs)} AS freq
    FROM keyed k JOIN counts c USING (key)
)
SELECT docID,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN freq THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       COALESCE(string_agg(line, chr(10) ORDER BY pos) FILTER (WHERE NOT freq), '') AS clean
FROM flagged
GROUP BY docID
ORDER BY docID
"""


def vocab_topk_sql(k: int, min_count: int) -> str:
    """Twin of :func:`neural_search_spark.pipeline.textstats.vocab_topk`:
    corpus term frequencies over the shared analyzer, min-count floor,
    top-k by (count desc, term asc)."""
    from neural_search_spark.analysis.tokenizer import SQL_TOKEN_PATTERN

    return f"""
WITH toks AS (
    SELECT unnest(regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}')) AS term
    FROM documents
)
SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
FROM toks
GROUP BY term
HAVING COUNT(*) >= {int(min_count)}
ORDER BY cnt DESC, term ASC
LIMIT {int(k)}
"""


def gopher_rules_sql() -> str:
    """Twin of :func:`neural_search_spark.pipeline.textstats.gopher_rules`:
    the same seven MassiveText rule signals from DuckDB list lambdas (words
    = non-empty whitespace splits, lines = newline splits), 6-dp rounds,
    conjunctive keep."""
    from neural_search_spark.analysis.tokenizer import SQL_TOKEN_PATTERN
    from neural_search_spark.pipeline import textstats as T

    stop_list = ", ".join(f"'{s}'" for s in T.GOPHER_STOPWORDS)
    r6 = P.round6_sql
    return f"""
WITH base AS (
    SELECT CAST(doc_id AS BIGINT) AS docID,
           list_filter(string_split_regex(text, '\\s+'), w -> len(w) > 0) AS words,
           string_split(text, chr(10)) AS lines,
           len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS symbols,
           regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}') AS toks
    FROM documents
),
sig AS (
    SELECT docID,
           CAST(len(words) AS BIGINT) AS n_words,
           CAST(len(lines) AS DOUBLE) AS n_lines,
           CAST(COALESCE(list_aggregate(list_transform(words, w -> len(w)), 'sum'), 0) AS DOUBLE) AS word_chars,
           CAST(symbols AS DOUBLE) AS symbols,
           CAST(len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]'))) AS DOUBLE) AS bullet,
           CAST(len(list_filter(lines, l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$'))) AS DOUBLE) AS ellipsis,
           CAST(len(list_filter(words, w -> regexp_matches(w, '[a-zA-Z]'))) AS DOUBLE) AS alpha_words,
           CAST(len(list_filter([{stop_list}], s -> list_contains(toks, s))) AS BIGINT) AS stop_hits
    FROM base
),
ratio AS (
    SELECT docID, n_words, stop_hits,
           CASE WHEN n_words > 0 THEN word_chars / n_words ELSE 0.0 END AS mean_word_len,
           CASE WHEN n_words > 0 THEN symbols / n_words ELSE 0.0 END AS symbol_ratio,
           CASE WHEN n_lines > 0 THEN bullet / n_lines ELSE 0.0 END AS bullet_frac,
           CASE WHEN n_lines > 0 THEN ellipsis / n_lines ELSE 0.0 END AS ellipsis_frac,
           CASE WHEN n_words > 0 THEN alpha_words / n_words ELSE 0.0 END AS alpha_word_frac
    FROM sig
)
SELECT docID, n_words,
       {r6('mean_word_len')} AS mean_word_len,
       {r6('symbol_ratio')} AS symbol_ratio,
       {r6('bullet_frac')} AS bullet_frac,
       {r6('ellipsis_frac')} AS ellipsis_frac,
       {r6('alpha_word_frac')} AS alpha_word_frac,
       stop_hits,
       CAST(
         n_words >= {T.GOPHER_MIN_WORDS} AND n_words <= {T.GOPHER_MAX_WORDS}
         AND mean_word_len >= {T.GOPHER_MIN_MEAN_LEN} AND mean_word_len <= {T.GOPHER_MAX_MEAN_LEN}
         AND symbol_ratio <= {T.GOPHER_MAX_SYMBOL_RATIO}
         AND bullet_frac < {T.GOPHER_MAX_BULLET_FRAC}
         AND ellipsis_frac <= {T.GOPHER_MAX_ELLIPSIS_FRAC}
         AND alpha_word_frac >= {T.GOPHER_MIN_ALPHA_FRAC}
         AND stop_hits >= {T.GOPHER_MIN_STOP_HITS}
       AS INT) AS keep
FROM ratio
ORDER BY docID
"""


def doc_shuffle_order_sql(seed: str = "shuffle-v1") -> str:
    """Twin of :func:`neural_search_spark.pipeline.training.shuffle_order`:
    dense 0-based rank in the hash32(seed ':' docID) permutation, docID
    tie-break."""
    h = P.hash32_sql_duckdb(f"'{seed}' || ':' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH keyed AS (SELECT CAST(doc_id AS BIGINT) AS docID, {h} AS skey FROM documents)
SELECT docID, skey,
       CAST(ROW_NUMBER() OVER (ORDER BY skey, docID) - 1 AS BIGINT) AS pos
FROM keyed
ORDER BY docID
"""


def domain_mixture_sql(
    strata_col: str, target: dict[str, float], seed: str = "mix-v1"
) -> str:
    """Twin of :func:`neural_search_spark.pipeline.training.domain_mixture`
    over ``documents`` weighted by ``n_chars``: keep_rate_s =
    t_s * min_s(w_s / t_s) / w_s (6-dp round), draw via
    hash32(seed ':' docID) % 1e6. SUM(n_chars) is CAST to DOUBLE before
    division so the HUGEINT sum never reaches the comparison (the
    pack_plan lesson)."""
    h = P.hash32_sql_duckdb(f"'{seed}' || ':' || CAST(doc_id AS VARCHAR)")
    scale = 1_000_000
    cases = " ".join(f"WHEN '{s}' THEN {float(t)}" for s, t in sorted(target.items()))
    return f"""
WITH corpus AS (
    SELECT CAST(doc_id AS BIGINT) AS docID, {strata_col} AS stratum,
           CAST(n_chars AS BIGINT) AS w,
           {h} % {scale} AS draw
    FROM documents
),
masses AS (
    SELECT stratum, CAST(SUM(w) AS DOUBLE) AS sw,
           CASE stratum {cases} ELSE NULL END AS share
    FROM corpus GROUP BY stratum
),
cap AS (SELECT MIN(sw / share) AS c FROM masses WHERE share IS NOT NULL),
rates AS (
    SELECT stratum, ROUND(share * cap.c / sw, 6) AS keep_rate
    FROM masses CROSS JOIN cap WHERE share IS NOT NULL
)
SELECT c.docID, c.stratum,
       COALESCE(r.keep_rate, 0.0) AS keep_rate,
       CAST(c.draw < CAST(ROUND(COALESCE(r.keep_rate, 0.0) * {scale}) AS BIGINT) AS INT) AS kept
FROM corpus c LEFT JOIN rates r USING (stratum)
ORDER BY c.docID
"""


def funnel_sql(steps: list[str], window_us: int | None = None) -> str:
    """Twin of :func:`neural_search_spark.pipeline.events.funnel`: chained
    conditional-min windows per user over the integer microsecond key,
    strict '>' between consecutive steps (optionally bounded to
    ``window_us`` past the anchor t0); counts CAST to BIGINT (DuckDB
    SUM returns HUGEINT)."""
    ctes = ["ev AS (SELECT user_id, event_type, epoch_us(ts) AS k FROM events)"]
    src = "ev"
    for i, s in enumerate(steps):
        after = f" AND k > t{i - 1}" if i else ""
        if i and window_us is not None:
            after += f" AND k <= t0 + {int(window_us)}"
        ctes.append(
            f"w{i} AS (SELECT *, MIN(CASE WHEN event_type = '{s}'{after} THEN k END)"
            f" OVER (PARTITION BY user_id) AS t{i} FROM {src})"
        )
        src = f"w{i}"
    tcols = ", ".join(f"MAX(t{i}) AS t{i}" for i in range(len(steps)))
    ccols = ", ".join(
        f"CAST(SUM(CASE WHEN t{i} IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS c{i}"
        for i in range(len(steps))
    )
    ctes.append(f"pu AS (SELECT user_id, {tcols} FROM {src} GROUP BY user_id)")
    ctes.append(f"c AS (SELECT {ccols} FROM pu)")
    sel = " UNION ALL ".join(
        f"SELECT CAST({i} AS INT) AS step_idx, '{s}' AS step, c{i} AS users FROM c"
        for i, s in enumerate(steps)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + sel + "\nORDER BY step_idx"


def text_entropy_sql() -> str:
    """Twin of :func:`neural_search_spark.pipeline.textstats.entropy_stats`:
    unigram entropy per doc via log2(dl) - sum(tf*log2 tf)/dl, type-token
    ratio, conjunctive keep (entropy >= 2 bits AND >= 10 tokens)."""
    from neural_search_spark.pipeline import textstats as T

    return f"""
WITH tk AS (
    SELECT CAST(doc_id AS BIGINT) AS docID,
           unnest(regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}')) AS term
    FROM documents
),
tf AS (
    SELECT docID, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM tk GROUP BY docID, term
),
per AS (
    SELECT docID,
           CAST(SUM(tf) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS distinct_terms,
           SUM(tf * log2(tf)) AS tlog
    FROM tf GROUP BY docID
)
SELECT docID, n_tokens, distinct_terms,
       ROUND(log2(CAST(n_tokens AS DOUBLE)) - tlog / n_tokens, 4) AS entropy,
       ROUND(CAST(distinct_terms AS DOUBLE) / n_tokens, 4) AS ttr,
       ROUND(log2(CAST(n_tokens AS DOUBLE)) - tlog / n_tokens, 6) >= {T.ENTROPY_MIN_BITS!r}
           AND n_tokens >= {T.ENTROPY_MIN_TOKENS} AS keep
FROM per
ORDER BY docID
"""


def vocab_oov_sql(k: int, min_count: int) -> str:
    """Twin of :func:`neural_search_spark.pipeline.textstats.oov_rates`
    against the :func:`vocab_topk` vocabulary (same cut: count desc, term
    asc, min-count floor)."""
    return f"""
WITH tk AS (
    SELECT CAST(doc_id AS BIGINT) AS docID,
           unnest(regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}')) AS term
    FROM documents
),
vocab AS (
    SELECT term FROM (
        SELECT term, COUNT(*) AS cnt FROM tk GROUP BY term
        HAVING COUNT(*) >= {int(min_count)}
        ORDER BY cnt DESC, term ASC LIMIT {int(k)}
    )
)
SELECT t.docID,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       ROUND(CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 4) AS oov_rate
FROM tk t LEFT JOIN vocab v ON t.term = v.term
GROUP BY t.docID
ORDER BY t.docID
"""


def dedup_substring_sql(n: int) -> str:
    """Twin of :func:`neural_search_spark.pipeline.dedup.substring_dup_stats`
    over the injected-duplicates table: per-doc count and fraction of word
    ``n``-gram positions whose gram occurs in >= 2 distinct docs."""
    grams = (
        f"unnest(list_transform(range(1, len(ts) - {n - 2}),"
        f" i -> array_to_string(ts[i:i + {n - 1}], ' '))) AS gram"
    )
    return f"""
WITH {DUPDOCS_CTE.strip()},
tk AS (
    SELECT docID, regexp_extract_all(lower(content), '{SQL_TOKEN_PATTERN}') AS ts
    FROM dupdocs
),
grams AS (SELECT docID, {grams} FROM tk),
dupg AS (
    SELECT gram FROM (
        SELECT gram, COUNT(DISTINCT docID) AS nd FROM grams GROUP BY gram
    ) WHERE nd >= 2
),
ng AS (SELECT docID, COUNT(*) AS n FROM grams GROUP BY docID),
ndp AS (
    SELECT docID, COUNT(*) AS n FROM grams
    WHERE gram IN (SELECT gram FROM dupg) GROUP BY docID
)
SELECT t.docID,
       CAST(COALESCE(ng.n, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(ndp.n, 0) AS BIGINT) AS n_dup_grams,
       ROUND(CASE WHEN COALESCE(ng.n, 0) > 0
                  THEN CAST(COALESCE(ndp.n, 0) AS DOUBLE) / ng.n
                  ELSE 0.0 END, 4) AS dup_fraction
FROM tk t LEFT JOIN ng USING (docID) LEFT JOIN ndp USING (docID)
ORDER BY t.docID
"""


def doc_keywords_sql(k: int) -> str:
    """Twin of :func:`neural_search_spark.pipeline.textstats.doc_keywords`:
    per-doc top-k terms by the integer-exact (tf desc, df asc, term asc)
    salience rank, tfidf reported with the BM25 idf."""
    return f"""
WITH tk AS (
    SELECT CAST(doc_id AS BIGINT) AS docID,
           unnest(regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}')) AS term
    FROM documents
),
tf AS (SELECT docID, term, COUNT(*) AS tf FROM tk GROUP BY docID, term),
nd AS (SELECT term, COUNT(*) AS ndoc FROM tf GROUP BY term),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
kw AS (
    SELECT tf.docID, tf.term, tf.tf, nd.ndoc,
           ROW_NUMBER() OVER (
               PARTITION BY tf.docID
               ORDER BY tf.tf DESC, nd.ndoc ASC, tf.term ASC
           ) AS rank
    FROM tf JOIN nd USING (term)
)
SELECT docID, CAST(rank AS INT) AS rank, term,
       ROUND(CAST(tf AS DOUBLE)
             * ln(1 + (t.n - ndoc + 0.5) / (ndoc + 0.5)), 4) AS tfidf
FROM kw CROSS JOIN tot t
WHERE rank <= {int(k)}
ORDER BY docID, rank
"""


def events_retention_sql(horizon_days: int) -> str:
    """Twin of :func:`neural_search_spark.pipeline.events.retention`."""
    return f"""
WITH first AS (
    SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort FROM events GROUP BY user_id
),
active AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
SELECT f.cohort,
       CAST(date_diff('day', f.cohort, a.day) AS INT) AS d,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS users
FROM active a JOIN first f USING (user_id)
WHERE date_diff('day', f.cohort, a.day) BETWEEN 0 AND {int(horizon_days)}
GROUP BY f.cohort, d
ORDER BY f.cohort, d
"""


def length_buckets_sql() -> str:
    """Twin of :func:`neural_search_spark.pipeline.training.length_buckets`:
    power-of-2 token-length buckets with padding-waste mass."""
    return f"""
WITH b AS (
    SELECT CAST(doc_id AS BIGINT) AS docID,
           len(regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}')) AS n
    FROM documents
),
bk AS (
    SELECT n, CAST(POWER(2, CEIL(log2(n))) AS BIGINT) AS bucket
    FROM b WHERE n >= 1
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS total_tokens,
       CAST(SUM(bucket - n) AS BIGINT) AS pad_waste
FROM bk
GROUP BY bucket
ORDER BY bucket
"""


def contrastive_pairs_sql(seed: str = "pairs-v1") -> str:
    """Twin of :func:`neural_search_spark.pipeline.training.contrastive_pairs`
    over the injected-duplicates table: positives = verified MinHash
    pairs, negatives = shuffle-order-adjacent doc pairs minus positives."""
    h = P.hash32_sql_duckdb(f"'{seed}' || ':' || CAST(docID AS VARCHAR)")
    return f"""
WITH {_minhash_pairs_block()},
keyed AS (SELECT docID, {h} AS skey FROM dupdocs),
ordered AS (
    SELECT docID, ROW_NUMBER() OVER (ORDER BY skey, docID) - 1 AS pos FROM keyed
),
adj AS (
    SELECT LEAST(a.docID, b.docID) AS idA, GREATEST(a.docID, b.docID) AS idB
    FROM ordered a JOIN ordered b ON b.pos = a.pos + 1
),
posset AS (SELECT docA AS idA, docB AS idB FROM pairs)
SELECT idA, idB, 1 AS label FROM posset
UNION ALL
SELECT a.idA, a.idB, 0 AS label FROM adj a
WHERE NOT EXISTS (
    SELECT 1 FROM posset p WHERE p.idA = a.idA AND p.idB = a.idB
)
"""


def token_ids_sql(k: int, min_count: int, unk_id: int = -1) -> str:
    """Twin of :func:`neural_search_spark.pipeline.training.token_ids`
    against the :func:`vocab_topk` vocabulary."""
    return f"""
WITH tk AS (
    SELECT CAST(doc_id AS BIGINT) AS docID,
           regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}') AS ts
    FROM documents
),
vc AS (
    SELECT term, COUNT(*) AS cnt
    FROM (SELECT unnest(ts) AS term FROM tk)
    GROUP BY term HAVING COUNT(*) >= {int(min_count)}
    ORDER BY cnt DESC, term ASC LIMIT {int(k)}
),
vids AS (
    SELECT term,
           CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC) - 1 AS INT) AS token_id
    FROM vc
),
posx AS (
    SELECT docID, CAST(unnest(generate_series(1, len(ts))) AS INT) AS pos, ts FROM tk
),
longf AS (SELECT docID, pos, ts[pos] AS term FROM posx)
SELECT l.docID, l.pos,
       CAST(COALESCE(v.token_id, {int(unk_id)}) AS INT) AS token_id
FROM longf l LEFT JOIN vids v USING (term)
ORDER BY docID, pos
"""


def pipeline_end_to_end_sql(budget: int, seed: str = "split-v1") -> str:
    """Composition twin of the full pretraining prep DAG: Gopher
    word-count rule ∧ entropy gate ∧ train split → sequence packing over
    the survivors (offsets are positions on the FILTERED tape)."""
    from neural_search_spark.pipeline import textstats as T

    return f"""
WITH gk AS (
    SELECT docID FROM ({gopher_rules_sql()})
    WHERE n_words >= {T.GOPHER_MIN_WORDS} AND n_words <= {T.GOPHER_MAX_WORDS}
),
ek AS (SELECT docID FROM ({text_entropy_sql()}) WHERE keep),
tr AS (SELECT docID FROM ({train_split_assign_sql(seed)}) WHERE split = 'train'),
dl AS (
    SELECT CAST(doc_id AS BIGINT) AS docID,
           CAST(len(regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}')) AS BIGINT) AS dl
    FROM documents
    WHERE CAST(doc_id AS BIGINT) IN (SELECT docID FROM gk)
      AND CAST(doc_id AS BIGINT) IN (SELECT docID FROM ek)
      AND CAST(doc_id AS BIGINT) IN (SELECT docID FROM tr)
),
c AS (
    SELECT docID, dl,
           CAST(COALESCE(SUM(dl) OVER (
               ORDER BY docID ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS start_offset
    FROM dl
)
SELECT docID, dl, start_offset,
       CAST(floor(start_offset / {budget}) AS BIGINT) AS pack_id,
       CAST(CASE WHEN dl = 0 THEN 0
            ELSE floor((start_offset + dl - 1) / {budget}) - floor(start_offset / {budget}) + 1
       END AS BIGINT) AS n_packs
FROM c
ORDER BY docID
"""


#: shared CTE chain for the unigram-LM perplexity signal (tokenize →
#: per-doc tf → corpus unigram model → per-doc mass); used by both
#: :func:`unigram_ppl_sql` and :func:`ccnet_ppl_buckets_sql`.
_PPL_CTES = f"""
tk AS (
    SELECT CAST(doc_id AS BIGINT) AS docID,
           unnest(regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}')) AS term
    FROM documents
),
tf AS (
    SELECT docID, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM tk GROUP BY docID, term
),
cnt AS (SELECT term, SUM(tf) AS cnt FROM tf GROUP BY term),
tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS t FROM cnt),
per AS (
    SELECT f.docID,
           CAST(SUM(f.tf) AS BIGINT) AS n_tokens,
           SUM(f.tf * -log2(c.cnt / t.t)) AS mass
    FROM tf f JOIN cnt c USING (term) CROSS JOIN tot t
    GROUP BY f.docID
)"""


def unigram_ppl_sql() -> str:
    """Twin of :func:`neural_search_spark.pipeline.textstats.unigram_ppl`."""
    return f"""
WITH {_PPL_CTES}
SELECT docID, n_tokens,
       ROUND(mass / n_tokens, 4) AS avg_nll,
       ROUND(POWER(2.0, mass / n_tokens), 4) AS ppl
FROM per
ORDER BY docID
"""


def ccnet_ppl_buckets_sql() -> str:
    """Twin of :func:`neural_search_spark.pipeline.textstats.ccnet_ppl_buckets`.

    Shares the bucket contract verbatim: 1-indexed (ppl, docID) rank r
    within the language, bucket index = (r−1)·3 // c (integer floor
    division), 0 = head / 1 = middle / 2 = tail.
    """
    return f"""
WITH {_PPL_CTES},
ppl AS (
    SELECT docID, ROUND(POWER(2.0, mass / n_tokens), 4) AS ppl FROM per
),
sc AS (
    SELECT p.docID, p.ppl, d.lang
    FROM ppl p JOIN documents d ON p.docID = CAST(d.doc_id AS BIGINT)
),
r AS (
    SELECT lang, ppl,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY ppl, docID) AS rn,
           COUNT(*) OVER (PARTITION BY lang) AS c
    FROM sc
)
SELECT lang,
       CASE ((rn - 1) * 3) // c WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
            ELSE 'tail' END AS bucket,
       COUNT(*) AS n_docs,
       MIN(ppl) AS ppl_lo,
       MAX(ppl) AS ppl_hi
FROM r
GROUP BY lang, bucket
ORDER BY lang, bucket
"""


def mix_report_sql(strata_col: str = "lang", seed: str = "split-v1") -> str:
    """Twin of :func:`neural_search_spark.pipeline.training.mix_report`."""
    h = P.hash32_sql_duckdb(f"'{seed}' || ':' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH base AS (
    SELECT {strata_col} AS stratum,
           CASE WHEN {h} % 10000 < 9000 THEN 'train'
                WHEN {h} % 10000 < 9500 THEN 'val'
                ELSE 'test' END AS split,
           len(regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}')) AS n
    FROM documents
),
cells AS (
    SELECT stratum, split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS n_tokens
    FROM base GROUP BY stratum, split
)
SELECT stratum, split, n_docs, n_tokens,
       ROUND(CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER (), 4) AS token_frac
FROM cells
ORDER BY stratum, split
"""


def events_date_histogram_sql() -> str:
    """Twin of :func:`neural_search_spark.pipeline.events.date_histogram`."""
    return """
SELECT CAST(ts AS DATE) AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS doc_count,
       ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY day, event_type
ORDER BY day, event_type
"""


def events_anomaly_sql(z_threshold: float = 2.0) -> str:
    """Twin of :func:`neural_search_spark.pipeline.events.daily_anomalies`:
    per-type daily counts, population-stddev z-score, round6-quantized
    |z| gate."""
    return f"""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS doc_count
    FROM events GROUP BY event_type, day
),
z AS (
    SELECT event_type, day, doc_count,
           CASE WHEN stddev_pop(doc_count) OVER (PARTITION BY event_type) > 0
                THEN (doc_count - avg(doc_count) OVER (PARTITION BY event_type))
                     / stddev_pop(doc_count) OVER (PARTITION BY event_type)
                ELSE 0.0 END AS zz
    FROM daily
)
SELECT event_type, day, doc_count, ROUND(zz, 4) AS zscore
FROM z
WHERE ABS(ROUND(zz, 6)) >= {float(z_threshold)!r}
ORDER BY event_type, day
"""


def packing_efficiency_sql(context_len: int = 2048) -> str:
    """Twin of
    :func:`neural_search_spark.pipeline.training.packing_efficiency`."""
    L = int(context_len)
    return f"""
WITH b AS (
    SELECT len(regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}')) AS n
    FROM documents
),
a AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           CAST(SUM(CAST(CEIL(n / {L}.0) AS BIGINT)) AS BIGINT) AS slots_padded
    FROM b WHERE n >= 1
)
SELECT CAST({L} AS BIGINT) AS context_len, n_docs, total_tokens, slots_padded,
       CAST(CEIL(total_tokens / {L}.0) AS BIGINT) AS slots_packed,
       ROUND(CAST(total_tokens AS DOUBLE) / (slots_padded * {L}), 4) AS util_padded,
       ROUND(CAST(total_tokens AS DOUBLE)
             / (CAST(CEIL(total_tokens / {L}.0) AS BIGINT) * {L}), 4) AS util_packed
FROM a
"""


def dedup_canonical_sql() -> str:
    """Twin of :func:`neural_search_spark.pipeline.dedup.canonical_per_cluster`
    over the MinHash clusters: keeper = most analyzed tokens, tie lowest
    docID (integer-exact rank)."""
    return f"""
WITH RECURSIVE {_minhash_pairs_block()},
edges AS (
    SELECT docA AS src, docB AS dst FROM pairs
    UNION
    SELECT docB AS src, docA AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS docID FROM edges),
reach AS (
    SELECT docID, docID AS root FROM nodes
    UNION
    SELECT e.dst AS docID, r.root AS root
    FROM reach r JOIN edges e ON e.src = r.docID
),
cl AS (SELECT docID, MIN(root) AS cluster_id FROM reach GROUP BY docID),
dl AS (
    SELECT docID,
           CAST(len(regexp_extract_all(lower(content), '{SQL_TOKEN_PATTERN}')) AS BIGINT) AS dl
    FROM dupdocs
),
m AS (
    SELECT cl.cluster_id, cl.docID, dl.dl,
           ROW_NUMBER() OVER (
               PARTITION BY cl.cluster_id ORDER BY dl.dl DESC, cl.docID ASC
           ) AS rn
    FROM cl JOIN dl USING (docID)
),
mem AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members FROM cl GROUP BY cluster_id)
SELECT m.cluster_id, m.docID AS canonical, mem.n_members,
       m.dl AS canonical_tokens
FROM m JOIN mem USING (cluster_id)
WHERE m.rn = 1
ORDER BY m.cluster_id
"""


def dsir_weights_sql(target_expr: str) -> str:
    """Twin of :func:`neural_search_spark.pipeline.textstats.dsir_weights`:
    add-1-smoothed unigram target/corpus LMs over the corpus vocabulary,
    per-token average log ratio, round6-quantized keep gate.
    ``target_expr`` is a boolean SQL expression over the ``documents``
    columns (engine side evaluates the same expression over the adapted
    corpus columns)."""
    return f"""
WITH tk AS (
    SELECT CAST(doc_id AS BIGINT) AS docID, ({target_expr}) AS is_t,
           unnest(regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}')) AS term
    FROM documents
),
tf AS (
    SELECT docID, term, CAST(COUNT(*) AS DOUBLE) AS tf, ANY_VALUE(is_t) AS is_t
    FROM tk GROUP BY docID, term
),
lm AS (
    SELECT term, SUM(tf) AS cnt_c,
           SUM(CASE WHEN is_t THEN tf ELSE 0.0 END) AS cnt_t
    FROM tf GROUP BY term
),
scal AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS v, SUM(cnt_c) AS nc, SUM(cnt_t) AS nt
    FROM lm
),
per AS (
    SELECT f.docID,
           CAST(SUM(f.tf) AS BIGINT) AS n_tokens,
           SUM(f.tf * (ln((l.cnt_t + 1.0) / (s.nt + s.v))
                       - ln((l.cnt_c + 1.0) / (s.nc + s.v)))) AS mass
    FROM tf f JOIN lm l USING (term) CROSS JOIN scal s
    GROUP BY f.docID
)
SELECT docID, n_tokens,
       ROUND(mass / n_tokens, 4) + 0.0 AS logratio,
       ROUND(mass / n_tokens, 6) >= 0.0 AS keep
FROM per
ORDER BY docID
"""
