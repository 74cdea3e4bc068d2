"""Index maintenance: upsert (B6), delete (S6), annotate (S10) — checked
by rebuilding the oracle over the logically-equivalent corpus."""

import numpy as np
import pandas as pd
import pytest

from mias_spark.build import build_index, index_stats
from mias_spark.ops import annotate_mterms, delete_by_path, upsert
from mias_spark.search import Engine
from mias_spec import corpus, oracle


@pytest.fixture(scope="module")
def small_ix(spark, tmp_path_factory):
    c = corpus.make_corpus(80)
    ix = str(tmp_path_factory.mktemp("ops") / "ix80")
    build_index(spark, spark.createDataFrame(c), ix, n_buckets=2)
    return c, ix


def _check_query(spark, ix, c_expected, query="energy", k=10):
    """Engine over the maintained index == oracle over the equivalent
    fresh corpus (doc identity via doc_key since ids diverge)."""
    eng = Engine(spark, ix)
    got = eng.search(query, k=k, with_fields=True).hits
    oidx = oracle.build_index(c_expected)
    exp = oracle.search(oidx, query, k=k)
    exp_keys = oidx.docs.set_index("doc_id").loc[exp.doc_id, "doc_key"].tolist()
    got_keys = (got["id"].where(got["id"].str.len() == 64)).tolist() \
        if len(got) else []
    # ids may be arXiv-overridden; join via doc_store instead
    store = eng.cat.read("doc_store").select("doc_id", "doc_key").toPandas()
    got_keys = got.merge(store, on="doc_id")["doc_key"].tolist()
    assert got_keys == exp_keys
    assert np.allclose(got["score"].astype(float),
                       exp["score"].astype(float), atol=1e-6)


def test_upsert_replaces_and_adds(spark, small_ix, tmp_path):
    c, ix = small_ix
    # modified version of doc 0 (same repo/path/commit => same doc_key)
    changed = c.iloc[[0]].copy()
    changed["content"] = ["<html><body><p>energy energy energy data</p>"
                          "</body></html>"]
    extra = corpus.make_corpus(90).iloc[80:90]  # 10 brand-new docs
    delta = pd.concat([changed, extra], ignore_index=True)
    res = upsert(spark, ix, spark.createDataFrame(delta))
    assert res == {"added": 11, "replaced": 1}
    expected = pd.concat([c.iloc[1:], delta], ignore_index=True)
    _check_query(spark, ix, expected)


def test_delete_by_path(spark, small_ix):
    c, ix = small_ix
    eng = Engine(spark, ix)
    store = eng.cat.read("doc_store").toPandas()
    victim_prefix = "src/dir3/"
    n = delete_by_path(spark, ix, victim_prefix)
    assert n == (store["path"].str.startswith(victim_prefix)).sum() > 0
    # NOTE: runs after upsert test (module-scoped ix): expected corpus =
    # upserted corpus minus deleted paths
    changed = c.iloc[[0]].copy()
    changed["content"] = ["<html><body><p>energy energy energy data</p>"
                          "</body></html>"]
    extra = corpus.make_corpus(90).iloc[80:90]
    expected = pd.concat([c.iloc[1:], changed, extra], ignore_index=True)
    expected = expected[~expected["path"].str.startswith(victim_prefix)]
    _check_query(spark, ix, expected)


def test_annotate(spark):
    from pyspark.sql import functions as F
    c = corpus.make_corpus(20)
    docs = spark.createDataFrame(c).withColumn(
        "doc_id", F.monotonically_increasing_id())
    ann = annotate_mterms(docs).toPandas()
    assert len(ann) > 0
    assert {"doc_id", "math_idx", "mterm", "weight"} == set(ann.columns)
    assert (ann["weight"] > 0).all()
    # every xhtml doc with formulae got annotations
    n_math_docs = (c["lang"] == "xhtml").sum()
    assert ann["doc_id"].nunique() == n_math_docs
