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


def test_formula_documents(spark, tiny_build):
    """P7 FORMULA_DOCUMENTS granularity: one corpus row per <math>
    element, id = path#fN, content wraps exactly that formula."""
    from mias_spark.ops import explode_formula_docs
    from mias_spec import corpus as C
    c = spark.createDataFrame(C.make_corpus(60))
    fd = explode_formula_docs(c).toPandas()
    # every xhtml doc contributed each of its <math> elements
    import re
    exp = sum(len(re.findall(r"<math\b", r.content))
              for r in C.make_corpus(60).itertuples())
    assert len(fd) == exp
    assert all("#f" in p for p in fd["path"])
    assert all(r.count("<math") == 1 for r in fd["content"])


def test_formula_doc_index_and_search(spark, tmp_path):
    """A formula-granularity index finds the exact-formula doc as the
    top hit for the exact math query."""
    from mias_spark.build import build_index
    from mias_spark.ops import explode_formula_docs
    from mias_spark.search import Engine
    from mias_spec.corpus import EXACT_AST, make_corpus, render_math
    c = spark.createDataFrame(make_corpus(80))
    fd = explode_formula_docs(c)
    ix = str(tmp_path / "ixf")
    build_index(spark, fd, ix, n_buckets=2)
    eng = Engine(spark, ix)
    res = eng.search(render_math(EXACT_AST), k=5, with_fields=True)
    assert len(res.hits) > 0
    # top hit is a formula-doc from an exact-family parent (i % 37 == 0)
    top_path = res.hits["path"].iloc[0]
    base = top_path.split("#f")[0]
    parents = {r.path: i for i, r in enumerate(make_corpus(80).itertuples())}
    assert parents[base] % 37 == 0


def test_search_snippets_and_explain(spark, tiny_build):
    """Q11 snippets (math fragment highlighted, text terms bolded) and
    Q12 explain (per-clause BM25 breakdown)."""
    from mias_spark.search import Engine
    from mias_spec.corpus import EXACT_AST, render_math
    c, cat, oidx, ix = tiny_build
    eng = Engine(spark, ix)
    q = "einstein " + render_math(EXACT_AST)
    res = eng.search(q, k=5, snippets=True, debug=True)
    assert len(res.hits) > 0
    snips = list(res.hits["snippet"])
    # every hit matched a math term -> a highlighted math fragment
    assert any("math-hit" in s for s in snips)
    # at least one hit matched einstein in the BODY (title-only matches
    # legitimately yield no text fragment)
    assert any("<b>einstein</b>" in s for s in snips)
    exps = list(res.hits["explain"])
    assert all("idf=" in e and "tf=" in e for e in exps)
    # explain covers both the text group and a math group clause
    assert any("einstein" in e for e in exps)
    assert any("pmath:" in e or "cmath:" in e for e in exps)


def _file_set(path):
    import os
    out = set()
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                out.add(os.path.join(root, f))
    return out


def test_delete_is_metadata_only_and_optimize_purges(spark, tmp_path):
    """Segment model: delete moves NO posting data (tombstone +
    stats refresh only); optimize purges tombstoned docs and restores a
    clean single-segment layout — results stay oracle-identical
    throughout."""
    from mias_spark.ops import delete_by_path, optimize
    c = corpus.make_corpus(70)
    ix = str(tmp_path / "ixseg")
    build_index(spark, spark.createDataFrame(c), ix, n_buckets=2)
    eng = Engine(spark, ix)
    before_posts = _file_set(eng.cat.path("postings"))
    before_blocks = _file_set(eng.cat.path("blocks"))
    n = delete_by_path(spark, ix, "src/dir2/")
    assert n > 0
    # no posting/block files rewritten or removed
    assert _file_set(eng.cat.path("postings")) == before_posts
    assert _file_set(eng.cat.path("blocks")) == before_blocks
    expected = c[~c["path"].str.startswith("src/dir2/")]
    _check_query(spark, ix, expected)
    _check_query(spark, ix, expected,
                 query=corpus.render_math(corpus.EXACT_AST))
    # blocks mode honors tombstones too
    eng2 = Engine(spark, ix)
    got = eng2.search("energy", k=10, mode="blocks", with_fields=False).hits
    oidx = oracle.build_index(expected.reset_index(drop=True))
    exp = oracle.search(oidx, "energy", k=10)
    assert np.allclose(got["score"].astype(float),
                       exp["score"].astype(float), atol=1e-6)
    # optimize: purge + compact; tombstones gone, results identical
    out = optimize(spark, ix)
    assert out["purged_docs"] == n
    eng3 = Engine(spark, ix)
    assert eng3.cat.tombstones() is None
    store_ids = {r["doc_id"] for r in
                 eng3.cat.read("doc_store").select("doc_id").collect()}
    post_ids = {r["doc_id"] for r in
                eng3.cat.read("postings").select("doc_id")
                .distinct().collect()}
    assert post_ids <= store_ids
    _check_query(spark, ix, expected)


def test_upsert_appends_segments(spark, tmp_path):
    """Upsert never rewrites existing posting segments — it appends."""
    c = corpus.make_corpus(60)
    ix = str(tmp_path / "ixapp")
    build_index(spark, spark.createDataFrame(c), ix, n_buckets=2)
    eng = Engine(spark, ix)
    before = _file_set(eng.cat.path("postings"))
    extra = corpus.make_corpus(70).iloc[60:70]
    upsert(spark, ix, spark.createDataFrame(extra))
    after = _file_set(eng.cat.path("postings"))
    assert before <= after and len(after) > len(before)
    expected = pd.concat([c, extra], ignore_index=True)
    _check_query(spark, ix, expected)


def test_auto_compaction_trigger(spark, tmp_path):
    """Merge-policy: a delete pushing tombstones past the ratio starts
    a BOUNDED compaction epoch — every step rewrites at most a bucket
    slice (never the whole postings table), repeated triggers converge
    to one clean segment per bucket with tombstones retired, and
    results stay oracle-identical throughout. Small deletes stay
    metadata-only."""
    from mias_spark.ops import compact_step, delete_by_path
    c = corpus.make_corpus(60)
    ix = str(tmp_path / "ixauto")
    build_index(spark, spark.createDataFrame(c), ix, n_buckets=2)
    eng = Engine(spark, ix)
    # src/dir0..dir10 each hold ~5-6 of 60 docs (~9%) -> no compaction
    n1 = delete_by_path(spark, ix, "src/dir5/")
    assert n1 > 0
    assert Engine(spark, ix).cat.tombstones() is not None
    # delete several more prefixes to cross the 25% ratio
    for p in ("src/dir1/", "src/dir2/", "src/dir3/"):
        delete_by_path(spark, ix, p)
    cat2 = Engine(spark, ix).cat
    steps = [x for x in cat2.manifest()["metrics"]
             if x["stage"] == "compact_step"]
    # bounded steps fired; the full synchronous optimize never did
    assert steps
    assert not any(x["stage"] == "optimize"
                   for x in cat2.manifest()["metrics"])
    n_buckets = cat2.props()["n_buckets"]
    assert all(len(x["buckets"]) <= max(1, n_buckets // 4)
               for x in steps)
    # drive the epoch to convergence out-of-band (the maintenance-job
    # API a deployment schedules off the write path)
    from mias_spark.ops import compact_until_clean
    assert compact_until_clean(spark, ix)["state"] == "clean"
    cat3 = Engine(spark, ix).cat
    assert cat3.tombstones() is None           # converged: floor re-armed
    assert not cat3.props().get("compact_pending")
    # one clean segment per bucket: (term, salt, block_ord) unique and
    # no dead doc left anywhere
    from pyspark.sql import functions as F
    dup = (cat3.read("blocks")
           .groupBy("term_id", "salt", "block_ord")
           .count().where(F.col("count") > 1).count())
    assert dup == 0
    expected = c[~c["path"].str.contains("src/dir[1235]/", regex=True)]
    store_ids = {r[0] for r in
                 cat3.read("doc_store").select("doc_id").collect()}
    post_ids = {r[0] for r in cat3.read("postings")
                .select("doc_id").distinct().collect()}
    assert post_ids <= store_ids and len(store_ids) == len(expected)
    _check_query(spark, ix, expected)
    # blocks plan agrees and theta pruning is active again
    eng3 = Engine(spark, ix)
    # k=1: theta needs a term with >= topn blocks, and the compacted
    # 40-doc index packs one block per term
    got = eng3.search("energy", k=1, mode="blocks", with_fields=False)
    ref = eng3.search("energy", k=1, mode="df", with_fields=False)
    assert [int(d) for d in got.hits["doc_id"]] == \
        [int(d) for d in ref.hits["doc_id"]]
    assert got.blocks_stats["theta"] > 0


def test_upsert_is_delta_only(spark, tmp_path):
    """Incremental maintenance: upsert/delete append dictionary delta
    segments and never rewrite the base (wall time scales with the
    delta, not the index) — and field stats update arithmetically."""
    c = corpus.make_corpus(60)
    ix = str(tmp_path / "ixdelta")
    cat = build_index(spark, spark.createDataFrame(c), ix, n_buckets=2)
    eng0 = Engine(spark, ix)
    dict_files = _file_set(eng0.cat.path("dictionary"))
    norms_files = _file_set(eng0.cat.path("doc_norms"))
    tok_files = _file_set(eng0.cat.path("tokens"))
    # replace one doc + add two new ones
    changed = c.iloc[[3]].copy()
    changed["content"] = ["<html><body><p>quantum data novelterm</p>"
                          "</body></html>"]
    extra = corpus.make_corpus(62).iloc[60:62]
    import pandas as pd
    upsert(spark, ix, spark.createDataFrame(
        pd.concat([changed, extra], ignore_index=True)))
    eng = Engine(spark, ix)
    # base files untouched; only NEW files appended
    assert dict_files <= _file_set(eng.cat.path("dictionary"))
    assert len(_file_set(eng.cat.path("dictionary"))) > len(dict_files)
    assert norms_files <= _file_set(eng.cat.path("doc_norms"))
    assert tok_files <= _file_set(eng.cat.path("tokens"))
    # merged df view + arithmetic stats agree with a full recount
    from mias_spark.ops import live_tokens
    from pyspark.sql import functions as F
    truth = {(r["field"], r["term"]): r["n"] for r in
             live_tokens(eng.cat).groupBy("field", "term")
             .agg(F.count("*").alias("n")).collect()}
    merged = {(r["field"], r["term"]): r["df"] for r in
              eng.cat.read_dictionary().where(F.col("df") != 0).collect()}
    assert merged == truth
    st = live_tokens(eng.cat).groupBy("doc_id", "field").agg(
        F.first("dl").alias("dl")).groupBy("field").agg(
        F.count("*").alias("n"), F.avg("dl").alias("a")).collect()
    for r in st:
        fs = eng.field_stats[r["field"]]
        assert fs["n_docs"] == r["n"]
        assert abs(fs["avgdl"] - r["a"]) < 1e-9
    # new term got a fresh id above the high-water mark
    nt = eng.cat.read_dictionary().where(F.col("term") == "novelterm")
    assert nt.count() == 1
    # search correctness after the delta (oracle over equivalent corpus)
    expected = pd.concat([c.drop(index=3), changed, extra],
                         ignore_index=True)
    _check_query(spark, ix, expected, query="quantum")


def test_dictionary_fold_policy(spark, tmp_path, monkeypatch):
    """After DICT_FOLD_SEGMENTS delta appends the dictionary folds into
    one clean base (term_ids preserved, signed df summed, dead terms
    dropped) without touching postings/blocks; queries stay correct."""
    import mias_spark.ops as OPS
    monkeypatch.setattr(OPS, "DICT_FOLD_SEGMENTS", 2)
    c = corpus.make_corpus(40)
    ix = str(tmp_path / "ixfold")
    cat = build_index(spark, spark.createDataFrame(c), ix, n_buckets=2)
    ids_before = {(r["field"], r["term"]): r["term_id"]
                  for r in cat.read_dictionary().collect()}
    blocks_before = _file_set(cat.path("blocks"))
    b1 = corpus.make_corpus(44).iloc[40:44]
    b2 = corpus.make_corpus(48).iloc[44:48]
    upsert(spark, ix, spark.createDataFrame(b1))   # segment 1
    upsert(spark, ix, spark.createDataFrame(b2))   # segment 2 -> fold
    eng = Engine(spark, ix)
    assert eng.cat.props()["dict_segments"] == 0
    # folded: every (field, term) appears exactly once, old ids kept
    import pandas as pd
    rows = eng.cat.read("dictionary").toPandas()
    assert not rows.duplicated(["field", "term"]).any()
    after = {(r.field, r.term): r.term_id for r in rows.itertuples()}
    for k, v in ids_before.items():
        assert after[k] == v
    assert (rows["df"] > 0).all()
    # postings/blocks untouched by the fold (delta appends only)
    assert blocks_before <= _file_set(eng.cat.path("blocks"))
    expected = pd.concat([c, b1, b2], ignore_index=True)
    _check_query(spark, ix, expected)


def test_duplicate_upsert_batch_rejected_before_mutation(spark, tmp_path):
    """MERGE validation must fire BEFORE the first index mutation: a
    rejected duplicate batch leaves no tombstones and no appended
    segments behind."""
    import pandas as pd
    c = corpus.make_corpus(30)
    ix = str(tmp_path / "ixdupup")
    cat = build_index(spark, spark.createDataFrame(c), ix, n_buckets=2)
    n_store = cat.read("doc_store").count()
    dup = pd.concat([c.iloc[[0]], c.iloc[[0]]], ignore_index=True)
    with pytest.raises(Exception, match="duplicate key"):
        upsert(spark, ix, spark.createDataFrame(dup))
    from mias_spark.search import Engine
    eng = Engine(spark, ix)
    assert eng.cat.tombstones() is None          # nothing tombstoned
    assert eng.cat.read("doc_store").count() == n_store
    # the replaced doc is still searchable
    _check_query(spark, ix, c)


def test_phrase_snippets_highlight(spark, tiny_build):
    """Phrase-query snippets wrap the CONTIGUOUS phrase occurrence as
    one span (NiceSnippetExtractor highlights the span, not each
    constituent)."""
    import re
    from mias_spark.search import Engine
    c, cat, oidx, ix = tiny_build
    eng = Engine(spark, ix)
    res = eng.search('"items total"', k=3, snippets=True)
    assert len(res.hits) > 0
    one_span = re.compile(r"<b>items\W+total</b>", re.IGNORECASE)
    assert any(one_span.search(s) for s in res.hits["snippet"])
    # constituents are NOT separately bolded when only the phrase
    # mentions them
    assert not any("<b>items</b>" in s for s in res.hits["snippet"])


def test_delete_all_compact_no_resurrection(spark, tmp_path):
    """Round-3 review (severe): a bucket whose every posting belongs
    to snapshot-dead docs has NO rows in the compacted slice, so the
    dynamic partition overwrite left its stale files in place — once
    the epoch retired the tombstones the deleted docs came back from
    the dead. Partitions emptied by compaction must be dropped, and a
    fully-emptied index must stay readable and re-usable."""
    import shutil as _sh
    from mias_spec import corpus as C

    from mias_spark.build import build_index
    from mias_spark.catalog import Catalog
    from mias_spark.ops import compact_until_clean, delete_by_path, upsert
    from mias_spark.search import Engine
    ix = str(tmp_path / "ixall")
    _sh.rmtree(ix, ignore_errors=True)
    build_index(spark, spark.createDataFrame(C.make_corpus(40)), ix,
                n_buckets=2)
    assert delete_by_path(spark, ix, "") == 40     # tombstone all
    out = compact_until_clean(spark, ix)
    assert out["state"] == "clean"
    cat = Catalog(spark, ix)
    assert cat.read("postings").count() == 0
    assert cat.read("blocks").count() == 0
    assert cat.read("doc_store").count() == 0
    assert cat.tombstones() is None
    eng = Engine(spark, ix)
    for mode in ("df", "blocks"):
        r = eng.search("energy", k=5, mode=mode, with_fields=False)
        assert len(r.hits) == 0 and r.total_hits == 0, mode
    # staging slice reclaimed
    import os
    assert not os.path.exists(os.path.join(ix, "_staging_compact_posts"))
    # the emptied index accepts new docs and serves them
    res = upsert(spark, ix, spark.createDataFrame(C.make_corpus(20)))
    assert res == {"added": 20, "replaced": 0}
    eng2 = Engine(spark, ix)
    r = eng2.search("relativity", k=5, mode="df", with_fields=False)
    assert len(r.hits) > 0


def test_catalog_read_masks_only_truly_empty_tables(spark, tmp_path):
    """ADVICE r4 (medium): the remembered-schema empty-frame fallback
    must serve ONLY the one legal empty state (all partitions dropped).
    A genuine read failure over a table that still has data files —
    e.g. a corrupt footer — must propagate, or compaction's anti-joins
    would see an empty frame and the following overwrite would wipe
    the table."""
    import os

    from mias_spark.catalog import Catalog
    cat = Catalog(spark, str(tmp_path / "cx"))
    df = spark.range(5).withColumnRenamed("id", "doc_id")
    cat.write(df, "t")
    # legal empty state: files gone, schema remembered -> empty frame
    for d, _s, files in os.walk(cat.path("t")):
        for f in files:
            os.remove(os.path.join(d, f))
    assert cat.read("t").count() == 0
    assert cat.read("t").schema == df.schema
    # corrupt footer with data files present -> must raise, never an
    # empty frame
    cat.write(df, "u")
    for d, _s, files in os.walk(cat.path("u")):
        for f in files:
            if f.endswith(".parquet"):
                with open(os.path.join(d, f), "wb") as fh:
                    fh.write(b"not parquet at all")
    import pytest as _pt
    with _pt.raises(Exception):
        cat.read("u").count()


def test_doc_store_dseg_pruning_and_doc_id_high_water(spark, tmp_path):
    """Round-3 VERDICT #6/#7: the display fetch prunes doc_store to the
    doc-range partitions holding the k ids (plan-level assertion via
    the files actually read), and upsert takes fresh doc ids from the
    manifest next_doc_id high-water mark instead of a max() scan."""
    from mias_spec import corpus as C

    from mias_spark.build import build_index
    from mias_spark.catalog import Catalog
    from mias_spark.ops import upsert
    from mias_spark.search import Engine
    ix = str(tmp_path / "ixdseg")
    c = C.make_corpus(40)
    build_index(spark, spark.createDataFrame(c), ix, n_buckets=2,
                doc_seg_shift=3)                  # 8 docs per segment
    cat = Catalog(spark, ix)
    assert cat.props()["next_doc_id"] == 40
    assert cat.props()["doc_seg_shift"] == 3
    eng = Engine(spark, ix)
    from pyspark.sql import functions as F
    disp = eng._display_frame([1, 2, 35])
    # files ACTUALLY read (input_file_name reflects partition pruning;
    # DataFrame.inputFiles() lists the relation pre-pruning)
    files = [r[0] for r in
             disp.select(F.input_file_name()).distinct().collect()]
    assert files
    segs = {f.split("dseg=")[1].split("/")[0] for f in files}
    assert segs == {"0", "4"}                     # 1,2 -> seg0; 35 -> seg4
    plan = disp._jdf.queryExecution().executedPlan().toString()
    assert "dseg" in plan.split("PartitionFilters")[1][:160]
    got = {int(r["doc_id"]) for r in disp.select("doc_id").collect()}
    assert got == {1, 2, 35}
    # search round-trip with display fields still works on the
    # partitioned store
    r = eng.search("energy", k=3, with_fields=True)
    assert r.hits["path"].notna().all()
    # upsert: ids continue from the high-water mark, mark advances
    res = upsert(spark, ix, spark.createDataFrame(C.make_corpus(45)))
    assert res["added"] == 45 and res["replaced"] == 40
    cat2 = Catalog(spark, ix)
    assert cat2.props()["next_doc_id"] == 85
    ids = sorted(int(r[0]) for r in
                 cat2.read("doc_store").select("doc_id").collect())
    assert len(ids) == len(set(ids)) == 85        # no id collisions


def test_cached_engine_detects_new_snapshot(spark, tmp_path):
    """ADVICE r4: prepared-plan memos must not resurrect deleted docs.
    A cached Engine that already memoized a query's plan detects the
    index's new snapshot after a delete and drops its caches — the
    deleted doc disappears from BOTH physical plans without building a
    new Engine."""
    from mias_spec import corpus as C

    from mias_spark.build import build_index
    from mias_spark.ops import delete_by_path
    from mias_spark.search import Engine
    ix = str(tmp_path / "ixsnap")
    build_index(spark, spark.createDataFrame(C.make_corpus(60)), ix,
                n_buckets=2)
    eng = Engine(spark, ix, cache=True)
    try:
        victims = {}
        for mode in ("df", "blocks"):
            r = eng.search("energy", k=5, mode=mode)
            assert len(r.hits)
            victims[mode] = r.hits.iloc[0]
            eng.search("energy", k=5, mode=mode)   # memoize the plan
        path = victims["df"]["path"]
        assert delete_by_path(spark, ix, path) >= 1
        for mode in ("df", "blocks"):
            r2 = eng.search("energy", k=5, mode=mode)
            assert path not in set(r2.hits.get("path", [])), mode
    finally:
        eng.close()


def test_upsert_into_pre_pos_bytes_blocks_stays_consistent(spark, tmp_path):
    """Review r4: appending pos_bytes-bearing blocks beside an old
    (position-free) blocks table would make the inferred schema depend
    on which footer Spark samples — upsert must keep the table
    schema-consistent (drop pos_bytes) and phrase queries must fall
    back to the row surface, correct as ever."""
    from mias_spec import corpus as C

    from mias_spark.build import build_index
    from mias_spark.catalog import Catalog
    from mias_spark.ops import upsert
    from mias_spark.search import Engine
    ix = str(tmp_path / "ixold")
    build_index(spark, spark.createDataFrame(C.make_corpus(40)), ix,
                n_buckets=2)
    cat = Catalog(spark, ix)
    # simulate a pre-round-4 index: rewrite blocks without pos_bytes
    old = cat.read("blocks").drop("pos_bytes")
    cat.overwrite(old, "blocks", ["bucket"])
    assert "pos_bytes" not in cat.read("blocks").columns
    upsert(spark, ix, spark.createDataFrame(C.make_corpus(60).iloc[40:]))
    # still uniform: the delta segment was aligned to the old schema
    assert "pos_bytes" not in cat.read("blocks").columns
    eng = Engine(spark, ix)
    assert not eng._blocks_pos
    # phrase + term queries still answer correctly in blocks mode
    # (phrases via the row-surface fallback), rank-identical to df
    for q in ('"items total"', "energy", 'partition "items total"'):
        ref = eng.search(q, k=10, mode="df", with_fields=False)
        got = eng.search(q, k=10, mode="blocks", with_fields=False)
        assert len(ref.hits), q
        assert [int(d) for d in got.hits["doc_id"]] == \
            [int(d) for d in ref.hits["doc_id"]], q


def test_staging_reclaimed_and_overwrite_mode_restored(spark, tmp_path):
    """Review r4: upsert/delete drop their staging segments when done,
    and dynamic partition overwrite stays SCOPED to the catalog write
    (a session-global leftover would turn later whole-table overwrites
    into partial ones)."""
    import os

    from mias_spec import corpus as C

    from mias_spark.build import build_index
    from mias_spark.ops import delete_by_path, upsert
    key = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.set(key, "static")
    ix = str(tmp_path / "ixstage")
    build_index(spark, spark.createDataFrame(C.make_corpus(30)), ix,
                n_buckets=2)
    upsert(spark, ix, spark.createDataFrame(C.make_corpus(40).iloc[30:]))
    delete_by_path(spark, ix, "src/dir1/")
    for t in ("_staging_replaced", "_staging_delta_store",
              "_staging_delta_toks", "_staging_dead_toks",
              "_staging_doomed"):
        assert not os.path.exists(os.path.join(ix, t)), t
    # the chunked blocks build + compaction both use dynamic partition
    # overwrite internally; the session conf must come back unchanged
    assert spark.conf.get(key) == "static"


def test_upsert_pruned_dictionary_join(spark, tmp_path, monkeypatch):
    """At scale, the delta posting-row build prunes the dictionary
    merge to the delta's own terms (dbucket partitions + broadcast
    semi-join BEFORE the segment-merge agg). Force the size gate to 0
    so the pruned plan executes on a toy index, and pin that the
    upserted index answers identically to the plain-path twin."""
    import mias_spark.ops as OPS
    from mias_spec.corpus import make_corpus

    c = make_corpus(50)
    changed = c.iloc[[2]].copy()
    changed["content"] = ["<html><body><p>energy pruned dictionary "
                          "joins</p></body></html>"]
    extra = make_corpus(52).iloc[50:52]
    delta = pd.concat([changed, extra], ignore_index=True)

    hits = {}
    for tag, thresh in (("pruned", 0), ("plain", 10**12)):
        ix = str(tmp_path / f"ix_{tag}")
        build_index(spark, spark.createDataFrame(c), ix, n_buckets=2)
        monkeypatch.setattr(OPS, "_DICT_PRUNE_MIN_TERMS", thresh)
        upsert(spark, ix, spark.createDataFrame(delta))
        eng = Engine(spark, ix)
        r = eng.search("energy", k=20, with_fields=True)
        hits[tag] = r.hits[["path", "score"]].reset_index(drop=True)
        # posting parity: both paths emit the same number of rows
        hits[tag + "_n"] = eng.cat.read("postings").count()
    assert hits["pruned_n"] == hits["plain_n"]
    assert list(hits["pruned"]["path"]) == list(hits["plain"]["path"])
    assert np.allclose(hits["pruned"]["score"].astype(float),
                       hits["plain"]["score"].astype(float), atol=1e-9)
