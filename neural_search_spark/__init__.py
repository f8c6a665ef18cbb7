"""neural_search_spark — a PySpark-native inverted-index + BM25/hybrid retrieval engine.

Built from scratch against the *behavior* of the OpenSearch plugin
martin-gaievski/neural-search (reference at /root/reference, read-only):
Lucene-compatible BM25 scoring (k1=1.2, b=0.75, SmallFloat byte4 norm
quantization), hybrid multi-clause queries with score normalization
(min_max / l2 / z_score / rrf) and combination (arithmetic / harmonic /
geometric mean / rrf), sparse "rank_features" scoring with prune
strategies, text chunking, collapse / sort / pagination semantics —
re-expressed as idiomatic Spark DataFrame plans, not a port of the
reference's Java execution engine.

Reference citations use the form ``file:line`` relative to
/root/reference/src/main/java/org/opensearch/neuralsearch/.
"""

__version__ = "0.1.0"
