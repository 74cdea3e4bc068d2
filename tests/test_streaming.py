"""Structured Streaming micro-batch ingest: readStream -> foreachBatch
-> the delta-only upsert path; results oracle-identical to a batch
build over the union of all batches."""

import os

import numpy as np
import pandas as pd

from mias_spark.build import build_index
from mias_spark.search import Engine
from mias_spark.streaming import stream_upsert
from mias_spec import corpus, oracle


def test_stream_upsert_drain(spark, tmp_path):
    c_all = corpus.make_corpus(90)
    base, b1, b2 = c_all.iloc[:50], c_all.iloc[50:70], c_all.iloc[70:90]
    ix = str(tmp_path / "ix_stream")
    build_index(spark, spark.createDataFrame(base), ix, n_buckets=2)

    src = str(tmp_path / "incoming")
    os.makedirs(src)
    # batch 2 also REPLACES one existing doc (same repo/path/commit key,
    # new content) — the MERGE path inside the stream
    changed = base.iloc[[1]].copy()
    changed["content"] = ["<html><body><p>streamedterm energy data</p>"
                          "</body></html>"]
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(pd.concat([b2, changed], ignore_index=True)) \
        .coalesce(1).write.mode("append").parquet(src)

    stream_upsert(spark, ix, src, trigger_available_now=True,
                  max_files_per_trigger=1)

    expected = pd.concat(
        [base.drop(index=1), b1, b2, changed], ignore_index=True)
    oidx = oracle.build_index(expected)
    eng = Engine(spark, ix)
    for q in ("energy", "streamedterm"):
        exp = oracle.search(oidx, q, k=10)
        got = eng.search(q, k=10, with_fields=True).hits
        store = eng.cat.read("doc_store").select(
            "doc_id", "doc_key").toPandas()
        got_keys = got.merge(store, on="doc_id")["doc_key"].tolist()
        exp_keys = oidx.docs.set_index("doc_id").loc[
            exp.doc_id, "doc_key"].tolist()
        assert got_keys == exp_keys, q
        assert np.allclose(got["score"].astype(float),
                           exp["score"].astype(float), atol=1e-6), q
    # the stream checkpoint makes a re-drain a no-op
    snap_before = eng.cat.manifest()["snapshot"]
    stream_upsert(spark, ix, src, trigger_available_now=True)
    assert Engine(spark, ix).cat.manifest()["snapshot"] == snap_before


def test_stream_bootstrap_from_scratch(spark, tmp_path):
    """No index at all: the first micro-batch builds it, later batches
    MERGE — the 'stream everything from day one' flow."""
    import numpy as np
    root = str(tmp_path / "boot")
    ix, src = os.path.join(root, "ix"), os.path.join(root, "incoming")
    os.makedirs(src)
    c = corpus.make_corpus(50)
    spark.createDataFrame(c.iloc[:30]).coalesce(1) \
        .write.mode("append").parquet(src)
    spark.createDataFrame(c.iloc[30:]).coalesce(1) \
        .write.mode("append").parquet(src)
    stream_upsert(spark, ix, src, trigger_available_now=True,
                  max_files_per_trigger=1, n_buckets=2)
    oidx = oracle.build_index(c)
    eng = Engine(spark, ix)
    exp = oracle.search(oidx, "energy", k=10)
    got = eng.search("energy", k=10, with_fields=False).hits
    store = eng.cat.read("doc_store").select("doc_id", "doc_key").toPandas()
    got_keys = got.merge(store, on="doc_id")["doc_key"].tolist()
    exp_keys = oidx.docs.set_index("doc_id").loc[
        exp.doc_id, "doc_key"].tolist()
    assert got_keys == exp_keys
    assert np.allclose(got["score"].astype(float),
                       exp["score"].astype(float), atol=1e-6)


def test_empty_build_rejected(spark, tmp_path):
    from mias_spark.streaming import CORPUS_SCHEMA
    import pytest
    with pytest.raises(ValueError, match="empty"):
        build_index(spark, spark.createDataFrame([], CORPUS_SCHEMA),
                    str(tmp_path / "ixempty"), n_buckets=2)
