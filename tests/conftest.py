from __future__ import annotations

import pytest

from top2vec_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(parallelism=8, app_name="top2vec_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_corpus():
    """Hand-written corpus with known term statistics."""
    return [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the log"),
        (2, "cats and dogs and cats"),
        (3, "spark builds inverted indexes fast"),
        (4, "the quick brown fox jumps over the lazy dog"),
        (5, "sat sat sat sat"),
    ]


@pytest.fixture(scope="session")
def tiny_docs(spark, tiny_corpus):
    return spark.createDataFrame(tiny_corpus, "doc_id long, text string")
