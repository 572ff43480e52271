import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from ocr_spark.session import get_spark

    session = get_spark(
        app_name="ocr_spark-tests",
        cores=4,
        shuffle_partitions=8,
        driver_memory="4g",
    )
    yield session


@pytest.fixture(scope="session")
def corpus_path(tmp_path_factory):
    """A 300-row full-shape corpus parquet shared across Spark tests."""
    from ocr_spark.corpus import write_corpus

    path = str(tmp_path_factory.mktemp("corpus") / "documents.parquet")
    write_corpus(path, 300, seed=42)
    return path
