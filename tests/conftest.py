import shutil

import pytest


@pytest.fixture(scope="session")
def spark():
    from mias_spark.session import get_spark
    s = get_spark(cpus="8", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def tiny_build(spark, tmp_path_factory):
    """300-doc corpus indexed once per test session."""
    from mias_spark.build import build_index
    from mias_spec import corpus, oracle
    c = corpus.make_corpus(300)
    ix = str(tmp_path_factory.mktemp("ix") / "ix300")
    cat = build_index(spark, spark.createDataFrame(c), ix, n_buckets=4)
    oidx = oracle.build_index(c)
    yield c, cat, oidx, ix
    shutil.rmtree(ix, ignore_errors=True)
