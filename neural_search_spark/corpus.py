"""Corpus table handling.

BASELINE.json input_hint mandates the corpus shape
``(repo, path, commit, lang, content)`` (+ ``content_sha256`` per-row
invariant, computed at generation and preserved through every transform).

Two deterministic sources:

1. :func:`corpus_from_documents` — adapts the driver's synthetic
   ``documents`` parquet (doc_id, text, lang, source, n_chars) into the
   corpus shape. ``CORPUS_FROM_DOCUMENTS_SQL`` is the byte-identical
   DuckDB rendition, so the oracle gate sees the same rows.
2. :func:`synthetic_code_corpus` — seeded generator of code-shaped text
   (keyword-heavy lines, Zipfian identifiers, rare unique tokens) used by
   unit tests and the skew-path benchmarks (FIXTURES.md §1).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


def corpus_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return doc.select(
        F.col("doc_id").cast("long").alias("docID"),
        F.col("source").alias("repo"),
        F.concat(F.lit("src/"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        F.substring(F.sha2(F.col("text"), 256), 1, 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
        F.sha2(F.col("text"), 256).alias("content_sha256"),
    )


#: DuckDB equivalent of corpus_from_documents (documents is a pre-registered view)
CORPUS_FROM_DOCUMENTS_SQL = """
    SELECT CAST(doc_id AS BIGINT) AS docID,
           source AS repo,
           'src/' || CAST(doc_id AS VARCHAR) || '.txt' AS path,
           substr(sha256(text), 1, 40) AS "commit",
           lang,
           text AS content,
           sha256(text) AS content_sha256
    FROM documents
"""


_KEYWORDS = ["import", "def", "class", "return", "public", "void", "if", "for", "self"]
_LANGS = ["python", "java", "go", "js", "c"]


def synthetic_code_corpus(
    spark: SparkSession,
    n_rows: int = 200,
    seed: int = 42,
    vocab_size: int = 500,
    lines_per_doc: tuple[int, int] = (3, 30),
) -> DataFrame:
    """Deterministic code-shaped corpus. Keywords follow a near-Zipf draw so
    the skewed-token path ('import', 'def', …) is always exercised; every
    doc also gets one globally-unique rare token for selective queries."""
    pdf = synthetic_code_corpus_pdf(n_rows, seed, vocab_size, lines_per_doc)
    return spark.createDataFrame(pdf)


def synthetic_code_corpus_pdf(
    n_rows: int = 200,
    seed: int = 42,
    vocab_size: int = 500,
    lines_per_doc: tuple[int, int] = (3, 30),
) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    vocab = np.array([f"ident{i}" for i in range(vocab_size)])
    # Zipf-ish identifier ranks
    zipf_p = 1.0 / np.arange(1, vocab_size + 1)
    zipf_p /= zipf_p.sum()
    rows = []
    for i in range(n_rows):
        n_lines = rng.randint(lines_per_doc[0], lines_per_doc[1] + 1)
        lines = []
        for _ in range(n_lines):
            kw = _KEYWORDS[rng.randint(0, len(_KEYWORDS))]
            idents = vocab[rng.choice(vocab_size, size=rng.randint(1, 5), p=zipf_p)]
            lines.append(kw + " " + " ".join(idents))
        lines.append(f"def uniq_{i:06d}():")
        content = "\n".join(lines)
        lang = _LANGS[i % len(_LANGS)]
        repo = f"org{i % 7}/proj{i % 13}"
        path = f"src/mod{i % 11}/file{i}.{ {'python':'py','java':'java','go':'go','js':'js','c':'c'}[lang] }"
        commit = hashlib.sha1(f"{seed}:{i}".encode()).hexdigest()
        rows.append(
            {
                "docID": i,
                "repo": repo,
                "path": path,
                "commit": commit,
                "lang": lang,
                "content": content,
                "content_sha256": hashlib.sha256(content.encode()).hexdigest(),
            }
        )
    return pd.DataFrame(rows)


def inject_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dup-injected corpus for the dedup operators (the raw
    synthetic texts are all distinct): every doc_id % 5 == 0 gets an
    80%-prefix near-copy at +100000; every doc_id % 7 == 0 an exact copy
    at +200000. Mirrors ``pipeline/sql.py DUPDOCS_CTE`` byte-for-byte."""
    doc = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("docID"), "lang", F.col("text").alias("content")
    )
    near = doc.where(F.col("docID") % 5 == 0).select(
        (F.col("docID") + 100000).alias("docID"),
        "lang",
        F.expr("substring(content, 1, CAST(floor(length(content) * 0.8) AS INT))").alias(
            "content"
        ),
    )
    exact = doc.where(F.col("docID") % 7 == 0).select(
        (F.col("docID") + 200000).alias("docID"), "lang", "content"
    )
    return doc.unionByName(near).unionByName(exact)


def inject_vector_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings ∪ exact copies at +100000 for vec_id % 10 == 0
    (mirrors ``pipeline/sql.py DUPVECS_CTE``)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").cast("long").alias("vec_id"), "embedding"
    )
    dups = emb.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    return emb.unionByName(dups)


def assert_sha256_invariant(df: DataFrame, content_col: str = "content", sha_col: str = "content_sha256") -> None:
    """The per-row invariant (BASELINE.json input_hint): recompute
    sha256(content) and compare to the carried column; raises on drift."""
    bad = df.where(F.sha2(F.col(content_col), 256) != F.col(sha_col)).count()
    if bad:
        raise AssertionError(f"sha256 invariant violated on {bad} rows")
