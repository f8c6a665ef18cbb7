"""Training-data pipeline operators: dedup, similarity search, text
analysis, multimodal plumbing.

These extend the retrieval engine (SURVEY.md §2) with the operations a
large-scale training-data pipeline needs over the same corpus. Every
operator is a declarative DataFrame plan (JVM-side, whole-stage codegen)
unless Arrow-batched Python is genuinely required; each has a DuckDB
oracle generated from the same shared constants (:mod:`.params`).
"""
