"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard LLM pretraining hygiene step (the GPT-3 appendix-C /
PaLM-style 8-to-13-gram overlap filter): any training document containing
an exact word n-gram that also appears in a held-out benchmark document is
flagged (and usually dropped or scrubbed) so eval numbers are not
memorization artifacts.

Scale shape for 100 TB: the benchmark side is eval-set-sized (thousands of
documents), so its distinct n-gram set broadcasts; the corpus side is one
tokenize + n-gram projection (pure codegen array expressions) and one
broadcast join — the corpus is never shuffled. If the benchmark outgrows
broadcast (unusual), drop the explicit ``F.broadcast`` and let AQE pick a
shuffle join; the op stays correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from neural_search_spark.analysis.tokenizer import TOKEN_PATTERN

DECONTAM_N = 8  # word n-gram width (GPT-3 used 13; 8 suits short docs)


def _distinct_ngrams(df: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    """(docID, ngram) — each document's DISTINCT word n-grams (analyzed
    tokens, space-joined). The ``size >= n`` guard matters: Spark's
    ``sequence(1, 0)`` counts down."""
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)")
    base = df.select(F.col(id_col).alias("docID"), toks.alias("_toks"))
    grams = F.when(
        F.size("_toks") >= n,
        F.expr(
            f"transform(sequence(1, size(_toks) - {n - 1}),"
            f" i -> array_join(slice(_toks, i, {n}), ' '))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return base.select(
        "docID", F.explode(F.array_distinct(grams)).alias("ngram")
    )


def ngram_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = DECONTAM_N,
    text_col: str = "content",
    id_col: str = "docID",
) -> DataFrame:
    """(docID, n_hit_ngrams) for every corpus doc sharing at least one
    word ``n``-gram with any benchmark doc; ``n_hit_ngrams`` counts the
    doc's distinct contaminated n-grams (the drop/scrub decision input).
    Docs with no overlap are absent (the clean set is the anti-join).
    """
    import re

    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    # The benchmark side is eval-set-sized BY CONTRACT (module docstring),
    # so its distinct n-gram set is driver-collectable — the same bound
    # the broadcast semi-join relied on, now held as one Python set.
    # Grams are built with the identical recipe as _distinct_ngrams
    # (lower → TOKEN_PATTERN runs → space-join of n consecutive tokens);
    # the engine's tokenizer already runs this exact Python path for
    # postings (term_freqs_udf), so the two tokenizations agree.
    tok_re = re.compile(TOKEN_PATTERN)

    def _grams_of(text: str) -> set:
        toks = tok_re.findall((text or "").lower())
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    bench_set = set()
    for r in benchmark.select(F.col(text_col).alias("_t")).collect():
        bench_set |= _grams_of(r["_t"])
    bc = corpus.sparkSession.sparkContext.broadcast(bench_set)

    out_schema = StructType(
        [
            StructField("docID", LongType(), False),
            StructField("n_hit_ngrams", LongType(), False),
        ]
    )

    def _count_hits(batches):
        bset = bc.value
        for pdf in batches:
            ids, hits = [], []
            for doc_id, text in zip(pdf["docID"], pdf[text_col]):
                c = len(_grams_of(text) & bset)
                if c:
                    ids.append(doc_id)
                    hits.append(c)
            yield pd.DataFrame({"docID": ids, "n_hit_ngrams": hits}, dtype="int64")

    # one Arrow-batched pass over (docID, text): per-doc distinct grams
    # intersect the broadcast set in-process — no explode, no shuffle, no
    # join; docs with zero overlap are simply not emitted (same contract
    # as the semi-join + groupBy).
    return corpus.select(F.col(id_col).alias("docID"), text_col).mapInPandas(
        _count_hits, out_schema
    )
