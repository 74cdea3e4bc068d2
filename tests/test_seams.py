"""Round-5 seams: the duck-typed doc_store KV binding (display fetches
as point lookups, zero Spark jobs) and the staleness-based dictionary
fold (VERDICT r4 #7/#8)."""

import time

import pandas as pd
import pytest

from mias_spark.search import Engine


class DictKV:
    """Dict-backed doc-store binding — the unit-test stand-in for a
    RocksDB/Cassandra point-lookup store."""

    def __init__(self, pdf: pd.DataFrame):
        self.pdf = pdf
        self.calls: list[list[int]] = []

    def get_many(self, ids):
        self.calls.append([int(i) for i in ids])
        return self.pdf[self.pdf["doc_id"].isin(ids)].copy()


def test_doc_kv_display_fetch_zero_spark(spark, tiny_build, monkeypatch):
    """With a KV binding, the display fetch never touches Spark (the
    parquet path would call _display_frame) and produces the same
    fields + snippets as the parquet/dseg path."""
    c, cat, oidx, ix = tiny_build
    store = (cat.read("doc_store")
             .select("doc_id", "id", "repo", "path", "title",
                     "content", "lang").toPandas())
    kv = DictKV(store)
    eng = Engine(spark, ix, doc_kv=kv)

    def boom(self, ids):
        raise AssertionError("display fetch touched the Spark path")

    monkeypatch.setattr(Engine, "_display_frame", boom)
    r = eng.search("energy", k=5, snippets=True)
    assert kv.calls, "KV binding was never consulted"
    assert sorted(kv.calls[0]) == sorted(int(d) for d in r.hits["doc_id"])
    assert r.hits["path"].notna().all()
    # some hits legitimately snippet to "" (title-only matches); the
    # parity check below pins byte-equality with the parquet path
    assert r.hits["snippet"].notna().all()
    assert (r.hits["snippet"].str.len() > 0).any()
    monkeypatch.undo()
    r2 = Engine(spark, ix).search("energy", k=5, snippets=True)
    for col in ("doc_id", "id", "repo", "path", "title", "snippet"):
        assert list(r.hits[col]) == list(r2.hits[col]), col


def test_dictionary_fold_on_staleness(spark, tmp_path):
    """A dictionary hovering below the segment-count threshold folds
    once its oldest delta is stale — after which lookups take the
    one-stage (dict_segments == 0) path and the merged df values are
    preserved."""
    from pyspark.sql import functions as F

    from mias_spark.build import build_index
    from mias_spark.ops import maybe_fold_dictionary, upsert
    from mias_spec.corpus import make_corpus

    ix = str(tmp_path / "ix_fold")
    c = make_corpus(40)
    build_index(spark, spark.createDataFrame(c.iloc[:35]), ix,
                n_buckets=2)
    upsert(spark, ix, spark.createDataFrame(c.iloc[35:]))
    from mias_spark.catalog import Catalog
    cat = Catalog(spark, ix)
    assert int(cat.props()["dict_segments"]) == 1
    before = {(r["field"], r["term"]): int(r["df"])
              for r in cat.read_dictionary().where(F.col("df") > 0)
              .collect()}
    # fresh delta: neither count nor staleness triggers
    assert maybe_fold_dictionary(cat) is False
    assert int(cat.props()["dict_segments"]) == 1
    # age the clock past the window -> fold despite 1 segment
    cat.set_props(dict_first_delta_ts=time.time() - 100_000)
    assert maybe_fold_dictionary(cat) is True
    assert int(cat.props()["dict_segments"]) == 0
    assert cat.props().get("dict_first_delta_ts") is None
    dic = cat.read("dictionary").toPandas()
    assert not dic.duplicated(["field", "term"]).any()
    after = {(r.field, r.term): int(r.df) for r in dic.itertuples()}
    assert after == before
    # post-fold lookups (one-stage path) still resolve every term
    eng = Engine(spark, ix)
    res = eng.search("energy", k=5, with_fields=False)
    assert len(res.hits) > 0


def test_dictionary_fold_noop_when_clean(spark, tiny_build):
    from mias_spark.ops import maybe_fold_dictionary
    c, cat, oidx, ix = tiny_build
    assert int(cat.props().get("dict_segments", 0)) == 0
    assert maybe_fold_dictionary(cat, staleness_s=0) is False
