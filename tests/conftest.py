from __future__ import annotations

import pytest

from neural_search_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="nss-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_corpus(spark):
    """Mirrors the reference IT corpus style (HybridQueryIT.java:62-64) plus
    code-shaped docs."""
    from neural_search_spark.corpus import synthetic_code_corpus

    return synthetic_code_corpus(spark, n_rows=120, seed=42).cache()


@pytest.fixture(scope="session")
def tiny_corpus_pdf():
    from neural_search_spark.corpus import synthetic_code_corpus_pdf

    return synthetic_code_corpus_pdf(n_rows=120, seed=42)
