from __future__ import annotations

import pytest

from cli_p_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="cli_p_spark-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_small():
    from cli_p_spark.fixtures.generate import corpus

    return corpus(n_docs=200, n_entities=100)
