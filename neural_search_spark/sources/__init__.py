"""Corpus sources: Iceberg-first table access with parquet fallback."""

from neural_search_spark.sources.corpus_source import read_corpus_table

__all__ = ["read_corpus_table"]
