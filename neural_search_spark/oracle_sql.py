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
