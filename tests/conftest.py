import shutil
import tempfile

import pytest

from financial_knowledge_graphs_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "fkg-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture()
def tmp_warehouse():
    d = tempfile.mkdtemp(prefix="fkg_wh_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def small_corpus(spark):
    """300-doc deterministic corpus, cached for the whole test session."""
    from financial_knowledge_graphs_spark import fixtures

    c = fixtures.corpus_df(spark, n_docs=300, seed=42).cache()
    c.count()
    yield c
    c.unpersist()
