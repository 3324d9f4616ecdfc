from __future__ import annotations

import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ksql_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ksql_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture()
def workdir(tmp_path):
    d = str(tmp_path / "engine")
    os.makedirs(d, exist_ok=True)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def transcripts(spark, tmp_path_factory):
    """Deterministic transcripts parquet dir (FIXTURES.md §1), session-scoped."""
    from ksql_spark.sources.transcripts import write_transcripts

    path = str(tmp_path_factory.mktemp("data") / "transcripts")
    df = write_transcripts(spark, path, n_convs=60, avg_turns=10, partitions=8)
    return path, df
