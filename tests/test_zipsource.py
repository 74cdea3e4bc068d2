"""S2 zip-archive expansion + P8 M-term report — the last two SURVEY §2
rows previously declared out of scope, now implemented."""

import io
import zipfile

import pandas as pd
import pytest

from mias_spark.zipsource import entry_ext, expand_zip_corpus
from mias_spec import corpus


def test_entry_ext_hash_rule():
    # FileExtDocumentHandler.java:54-57: '#' truncates the extension
    # only when it FOLLOWS the last dot
    assert entry_ext("doc.xhtml#frag2") == "xhtml"
    assert entry_ext("dir/weird#name.md") == "md"
    assert entry_ext("noext") == ""
    assert entry_ext("a.b.py") == "py"


def _zip_blob(files: dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("ignored_dir/", "")          # directory entry: skipped
        for name, content in files.items():
            zf.writestr(name, content)
    return buf.getvalue()


def test_expand_zip_corpus_and_index(spark, tmp_path):
    c = corpus.make_corpus(40)
    half = 20
    blobs = pd.DataFrame({
        "repo": ["org/zips"] * 2,
        "path": ["arch/a.zip", "arch/b.zip"],
        "commit": ["1" * 40, "2" * 40],
        "blob": [
            _zip_blob({f"d{i}.{p.rsplit('.', 1)[1]}": ct
                       for i, (p, ct) in enumerate(
                           zip(c["path"][:half], c["content"][:half]))}),
            _zip_blob({f"d{i}.{p.rsplit('.', 1)[1]}#x": ct
                       for i, (p, ct) in enumerate(
                           zip(c["path"][half:], c["content"][half:]))}),
        ],
    })
    out = expand_zip_corpus(spark.createDataFrame(blobs)).toPandas()
    assert len(out) == 40                      # one row per file entry
    assert set(out["content"]) == set(c["content"])
    assert all(p.startswith("arch/a.zip#") or p.startswith("arch/b.zip#")
               for p in out["path"])
    # lang re-derived per entry, '#'-suffix entries included
    assert set(out["lang"]) <= {"xhtml", "markdown", "python"}
    # the expanded rows are a real corpus: index + search end-to-end
    from mias_spark.build import build_index
    from mias_spark.search import Engine
    ix = str(tmp_path / "ixzip")
    build_index(spark, expand_zip_corpus(spark.createDataFrame(blobs)),
                ix, n_buckets=2)
    eng = Engine(spark, ix)
    r = eng.search("energy", k=5, with_fields=True)
    assert len(r.hits) > 0
    assert r.hits["path"].str.contains("#").all()


def test_mterm_report_ranked(spark):
    from pyspark.sql import functions as F

    from mias_spark.ops import mterm_report
    docs = (spark.createDataFrame(corpus.make_corpus(30))
            .withColumn("doc_id", F.monotonically_increasing_id()))
    rep = mterm_report(docs, top_n=10).toPandas()
    assert list(rep["rank"]) == list(range(1, len(rep) + 1))
    assert len(rep) == 10
    # ranked by document frequency desc (ties by weight mass desc)
    assert list(rep["docs"]) == sorted(rep["docs"], reverse=True)
    assert {"mterm", "docs", "occurrences", "weight_sum"} <= set(rep.columns)
    assert (rep["occurrences"] >= rep["docs"]).all()


def test_corrupt_zip_skipped_not_fatal(spark):
    """One truncated blob must not abort the expansion job: the bad
    archive is EXCLUDED from the default corpus output (so build_index
    can never index its error string, ADVICE r3) and surfaces on the
    zip_errors dead-letter side; every healthy archive still expands."""
    import io
    import zipfile

    from mias_spark.zipsource import zip_errors
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("ok.txt", "healthy entry")
    good = buf.getvalue()
    rows = [("org/r", "arch/good.zip", "0" * 40, bytearray(good)),
            ("org/r", "arch/bad.zip", "0" * 40, bytearray(b"PK\x03\x04trunc")),
            ("org/r", "arch/notzip.zip", "0" * 40, bytearray(b"plain text"))]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, blob binary")
    out = expand_zip_corpus(df).toPandas()
    assert len(out) == 1 and out.iloc[0]["path"] == "arch/good.zip#ok.txt"
    assert (out["lang"] != "_zip_error").all()
    errs = zip_errors(df).toPandas()
    assert set(errs["path"]) == {"arch/bad.zip", "arch/notzip.zip"}
    assert errs["content"].str.len().gt(0).all()
