"""Iceberg-binding unit tests (VERDICT r2 #10): no Iceberg jar ships in
this sandbox, so the binding logic — ident mapping, append-vs-create
routing, write(mode=append) delegation, partition overwrite routing,
drop/exists — is exercised against duck-typed session/DataFrame stubs
that record every call."""

import pytest

from mias_spark.catalog import Catalog


class _Conf:
    def __init__(self, catalog=None):
        self._c = catalog

    def get(self, key):
        if key == "mias.catalog" and self._c:
            return self._c
        raise KeyError(key)


class _SparkCatalog:
    def __init__(self, existing):
        self.existing = existing
        self.exists_calls = []

    def tableExists(self, ident):
        self.exists_calls.append(ident)
        return ident in self.existing


class _Session:
    def __init__(self, catalog=None, existing=()):
        self.conf = _Conf(catalog)
        self.catalog = _SparkCatalog(set(existing))
        self.sql_calls = []
        self.table_calls = []

    def sql(self, q):
        self.sql_calls.append(q)

    def table(self, ident):
        self.table_calls.append(ident)
        return f"df:{ident}"


class _WriteTo:
    def __init__(self, log, ident):
        self.log, self.ident = log, ident

    def partitionedBy(self, *cols):
        self.log.append(("partitionedBy", self.ident, len(cols)))
        return self

    def createOrReplace(self):
        self.log.append(("createOrReplace", self.ident))

    def append(self):
        self.log.append(("append", self.ident))

    def overwritePartitions(self):
        self.log.append(("overwritePartitions", self.ident))


class _DF:
    def __init__(self):
        self.log = []

    def writeTo(self, ident):
        return _WriteTo(self.log, ident)

    def select(self, *cols):
        return self


def _cat(existing=(), root="/tmp/ix_ice/my-index"):
    s = _Session(catalog="ice", existing=existing)
    return Catalog(s, root), s


def test_ident_mapping_sanitizes_root_and_table():
    cat, _ = _cat(root="/tmp/x/my-index.v2")
    assert cat._iceberg_ns() == "ice.mias_my_index_v2"
    assert cat._ident("_meta/lineage") == "ice.mias_my_index_v2.t__meta_lineage"
    # parquet binding: no catalog conf -> namespace None
    off = Catalog(_Session(catalog=None), "/tmp/x/my-index.v2")
    assert off._iceberg_ns() is None


def test_write_routes_create_or_replace_and_partitioning(spark):
    # needs the real session only because partitionedBy builds F.col
    # expressions; the write itself still hits the recording stub
    cat, _ = _cat()
    df = _DF()
    cat.write(df, "postings", partition_by=["bucket"])
    assert df.log == [
        ("partitionedBy", "ice.mias_my_index.t_postings", 1),
        ("createOrReplace", "ice.mias_my_index.t_postings")]


def test_write_append_mode_delegates_to_append():
    cat, s = _cat(existing=["ice.mias_my_index.t_tokens"])
    df = _DF()
    cat.write(df, "tokens", mode="append")
    # existing table -> append snapshot, never createOrReplace
    assert df.log == [("append", "ice.mias_my_index.t_tokens")]


def test_append_creates_only_when_table_missing():
    cat, s = _cat(existing=[])
    df = _DF()
    cat.append(df, "tombstones")
    assert ("createOrReplace", "ice.mias_my_index.t_tombstones") in df.log
    cat2, _ = _cat(existing=["ice.mias_my_index.t_tombstones"])
    df2 = _DF()
    cat2.append(df2, "tombstones")
    assert df2.log == [("append", "ice.mias_my_index.t_tombstones")]


def test_overwrite_partitions_never_blanket_replaces():
    cat, s = _cat(existing=["ice.mias_my_index.t_blocks"])
    df = _DF()
    cat.overwrite_partitions(df, "blocks", ["bucket"])
    # existing table -> partition-level overwrite only (a blanket
    # createOrReplace would wipe previously committed partitions)
    assert df.log == [("overwritePartitions", "ice.mias_my_index.t_blocks")]
    cat2, _ = _cat(existing=[])
    df2 = _DF()
    cat2.overwrite_partitions(df2, "blocks", ["bucket"])
    assert df2.log[-1] == ("createOrReplace", "ice.mias_my_index.t_blocks")


def test_overwrite_skips_staging_dance_in_iceberg_mode():
    cat, _ = _cat()
    df = _DF()
    cat.overwrite(df, "doc_store")
    assert df.log == [("createOrReplace", "ice.mias_my_index.t_doc_store")]


def test_read_and_exists_and_drop_route_through_catalog():
    cat, s = _cat(existing=["ice.mias_my_index.t_doc_store"])
    assert cat.read("doc_store") == "df:ice.mias_my_index.t_doc_store"
    assert cat.has_table("doc_store") is True
    assert cat.has_table("tombstones") is False
    assert cat.tombstones() is None
    cat.drop("doc_store")
    assert s.sql_calls == [
        "DROP TABLE IF EXISTS ice.mias_my_index.t_doc_store"]
    cat.clear_tombstones()          # routes to DROP TABLE, not rmtree
    assert s.sql_calls[-1] == \
        "DROP TABLE IF EXISTS ice.mias_my_index.t_tombstones"
