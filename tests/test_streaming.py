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


def test_stream_late_commit_dead_letter(spark, tmp_path):
    """Commit-timestamp watermark (VERDICT r2 #8): a late-arriving OLDER
    commit of an already-ingested path routes to the dead-letter table
    and is NOT merged; on-time rows in the same batch still merge."""
    from mias_spark.streaming import dead_letters

    root = str(tmp_path / "late")
    ix, src = os.path.join(root, "ix"), os.path.join(root, "incoming")
    os.makedirs(src)
    c = corpus.make_corpus(30)
    t2 = pd.Timestamp("2026-02-01 12:00:00")
    first = c.copy()
    first["commit_ts"] = t2
    spark.createDataFrame(first).coalesce(1) \
        .write.mode("append").parquet(src)
    stream_upsert(spark, ix, src, trigger_available_now=True, n_buckets=2)

    # batch 2: an OLDER commit of doc 0's path + one genuinely new doc
    stale = c.iloc[[0]].copy()
    stale["commit"] = "f" * 40
    stale["content"] = ["<html><body><p>stale resurrected</p></body></html>"]
    stale["commit_ts"] = pd.Timestamp("2026-01-15 12:00:00")
    fresh = corpus.make_corpus(31).iloc[30:].copy()
    fresh["commit_ts"] = pd.Timestamp("2026-02-02 12:00:00")
    spark.createDataFrame(pd.concat([stale, fresh], ignore_index=True)) \
        .coalesce(1).write.mode("append").parquet(src)
    stream_upsert(spark, ix, src, trigger_available_now=True)

    dl = dead_letters(spark, ix)
    assert dl is not None
    rows = dl.toPandas()
    assert len(rows) == 1
    assert rows["commit"].iloc[0] == "f" * 40
    assert rows["reason"].iloc[0] == "late_commit_ts"
    eng = Engine(spark, ix)
    keys = set(eng.cat.read("doc_store").toPandas()["doc_key"])
    import hashlib
    stale_key = hashlib.sha256(
        "|".join([stale["repo"].iloc[0], stale["path"].iloc[0],
                  "f" * 40]).encode()).hexdigest()
    fresh_key = hashlib.sha256(
        "|".join([fresh["repo"].iloc[0], fresh["path"].iloc[0],
                  fresh["commit"].iloc[0]]).encode()).hexdigest()
    assert stale_key not in keys          # late commit never merged
    assert fresh_key in keys              # on-time row in same batch did
    # the stale term is unsearchable
    assert len(eng.search("resurrected", k=5,
                          with_fields=False).hits) == 0


def test_versions_table_folds_bounded(spark, tiny_build):
    """_stream_versions must not grow with ingest history: every
    _VERSIONS_FOLD appends it folds to one row per (repo, path)
    (round-3 review finding — it previously grew one row per ingested
    doc forever, and _split_late re-scanned all of it every batch)."""
    from pyspark.sql import functions as F

    from mias_spark.catalog import Catalog
    from mias_spark.streaming import _VERSIONS_FOLD, _record_versions
    c, cat_ix, oidx, ix = tiny_build
    cat = Catalog(spark, ix)
    rows = spark.createDataFrame(
        [("org/r", "a.txt", "c1", "text", "x"),
         ("org/r", "b.txt", "c1", "text", "y")],
        "repo string, path string, commit string, lang string, "
        "content string").withColumn("commit_ts", F.current_timestamp())
    n_calls = _VERSIONS_FOLD + 4
    for _ in range(n_calls):
        _record_versions(cat, rows)
    n = cat.read("_stream_versions").count()
    assert n <= 2 * (_VERSIONS_FOLD + 1)   # bounded, not 2 * n_calls
    assert n < 2 * n_calls
    # max-at-read semantics intact: one max ts per key
    agg = (cat.read("_stream_versions")
           .groupBy("repo", "path").count().count())
    assert agg == 2
