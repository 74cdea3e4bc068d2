"""Index maintenance verbs — the reference CLI surface
(-add/-overwrite/-delete/-optimize/-stats/-indocprocess,
/root/reference/src/main/java/cz/muni/fi/mias/MIaS.java:32-60).

Segment architecture (the Lucene delete-and-add model, Indexing.java:145,
re-expressed for append-only tables):

  upsert   = tombstone replaced doc_ids + APPEND new rows to doc_store /
             tokens / postings / blocks (delta segments; cost scales
             with the DELTA, never the index) + refresh the narrow
             global-stats tables (norms, field stats, dictionary df)
  delete   = tombstone + stats refresh ONLY — no posting data moves
             (Lucene liveDocs-bitset semantics)
  optimize = compaction / force-merge: purge tombstoned rows, clear
             tombstones, full sorted rebuild of postings + blocks

Correctness with stale segments: query-time scoring takes idf / avgdl /
n_docs from the CLAUSE table (always fresh), dl rides on each posting
row (changes only with its own doc), and packed blocks carry pack-time
``idf0`` so block-max pruning rescales bounds exactly (score is linear
in idf; search._topk_blocks). Tombstoned docs are filtered in both
physical plans.

Doc ids are append-monotone: replaced docs are tombstoned and new
versions get fresh ids — the updateDocument delete-then-add semantic
keyed by doc_key.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mias_spark.catalog import Catalog
from mias_spark.ids import assign_ids_hashed, assign_ids_hex
from mias_spark.tokenize import tokenize_docs, with_meta


# ---------------------------------------------------------------- live views

def live_tokens(cat: Catalog) -> DataFrame:
    toks = cat.read("tokens")
    tomb = cat.tombstones()
    return toks if tomb is None else toks.join(tomb, "doc_id", "leftanti")


def live_store(cat: Catalog) -> DataFrame:
    store = cat.read("doc_store")
    tomb = cat.tombstones()
    return store if tomb is None else store.join(tomb, "doc_id", "leftanti")


# ------------------------------------------------------------ stats refresh

def refresh_stats(spark: SparkSession, cat: Catalog) -> None:
    """Rebuild the NARROW global-statistics tables from live tokens:
    doc_norms, per-field stats, dictionary df (term_ids preserved, new
    terms appended). This is the only non-delta work an upsert/delete
    does — queries read these fresh, so stale per-row stats columns in
    old posting segments never affect results."""
    toks = live_tokens(cat)

    norms = toks.groupBy("doc_id", "field").agg(F.first("dl").alias("dl"))
    cat.write(norms, "doc_norms")
    stats = (cat.read("doc_norms").groupBy("field")
             .agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
             .collect())
    cat.set_props(field_stats={
        r["field"]: {"n_docs": r["n_docs"], "avgdl": r["avgdl"]}
        for r in stats})
    cat.commit_table("doc_norms")

    fresh_df = toks.groupBy("field", "term").agg(F.count("*").alias("df"))
    old = cat.read("dictionary").select("field", "term", "term_id")
    joined = fresh_df.join(old, ["field", "term"], "left")
    kept = joined.where(F.col("term_id").isNotNull())
    new_terms = joined.where(F.col("term_id").isNull()).drop("term_id")
    next_id = (old.agg(F.max("term_id")).collect()[0][0] or -1) + 1
    if new_terms.limit(1).count():
        new_ids, _n = assign_ids_hashed(new_terms, ["field", "term"],
                                        "term_id")
        new_ids = new_ids.withColumn("term_id", F.col("term_id") + next_id)
        dic = kept.unionByName(new_ids)
    else:
        dic = kept
    from mias_spark.build import _dbucket
    (dic.withColumn("dbucket", _dbucket())
        .write.mode("overwrite").partitionBy("dbucket")
        .parquet(cat.path("_dictionary_new")))
    import shutil
    shutil.rmtree(cat.path("dictionary"), ignore_errors=True)
    shutil.move(cat.path("_dictionary_new"), cat.path("dictionary"))
    n_terms = cat.read("dictionary").count()
    cat.commit_table("dictionary", rows=n_terms)


def _posting_rows(spark: SparkSession, cat: Catalog, toks: DataFrame,
                  n_buckets: int) -> DataFrame:
    """Token rows -> bucketed posting rows with inlined stats (the same
    shape build_index writes)."""
    fs = cat.props()["field_stats"]
    stats_df = spark.createDataFrame(
        [(f, int(v["n_docs"]), float(v["avgdl"])) for f, v in fs.items()],
        "field string, n_docs long, avgdl double")
    return (
        toks.join(cat.read("dictionary"), ["field", "term"])
        .join(F.broadcast(stats_df), "field")
        .withColumn("idf", F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)))
        .select("term_id", "field", "doc_id", "tf", "wsum", "dl", "df",
                "idf", "avgdl", "positions",
                F.pmod("term_id", F.lit(n_buckets)).cast("int").alias("bucket"))
    )


def rebuild_postings_blocks(spark: SparkSession, cat: Catalog) -> None:
    """Full sorted rebuild of postings + blocks from live tokens (the
    compaction path; incremental paths append delta segments instead)."""
    n_buckets = cat.props()["n_buckets"]
    posts = _posting_rows(spark, cat, live_tokens(cat), n_buckets)
    n_out = max(n_buckets, 2 * spark.sparkContext.defaultParallelism)
    (posts.repartitionByRange(n_out, "bucket", "term_id", "doc_id")
          .sortWithinPartitions("term_id", "doc_id")
          .write.mode("overwrite").partitionBy("bucket")
          .parquet(cat.path("_postings_new")))
    import shutil
    shutil.rmtree(cat.path("postings"), ignore_errors=True)
    shutil.move(cat.path("_postings_new"), cat.path("postings"))
    cat.commit_table("postings", rows=cat.read("postings").count())

    from mias_spark.build import build_blocks
    m = cat.manifest()
    m["checkpoints"] = {k: v for k, v in m["checkpoints"].items()
                        if not k.startswith("blocks/")}
    cat._save(m)
    import shutil as _sh
    _sh.rmtree(cat.path("blocks"), ignore_errors=True)
    build_blocks(spark, cat, n_buckets)
    cat.commit_table("blocks")
    cat.flush_meta()


# -------------------------------------------------------------------- upsert

def upsert(spark: SparkSession, index_dir: str, new_corpus: DataFrame) -> dict:
    """MERGE INTO semantics on doc_key: replace matching docs, add the
    rest (B6). Pure delta work: replaced docs are TOMBSTONED, new docs
    are tokenized and APPENDED as fresh segments to doc_store, tokens,
    postings and blocks; only the narrow stats tables are recomputed."""
    cat = Catalog(spark, index_dir)
    keyed = new_corpus.withColumn(
        "doc_key", F.sha2(F.concat_ws("|", "repo", "path", "commit"), 256))
    store = cat.read("doc_store")
    (live_store(cat).join(keyed.select("doc_key"), "doc_key", "leftsemi")
     .select("doc_id", "doc_key")
     .write.mode("overwrite").parquet(cat.path("_staging_replaced")))
    replaced = spark.read.parquet(cat.path("_staging_replaced"))
    n_replaced = replaced.count()
    next_doc = (store.agg(F.max("doc_id")).collect()[0][0] or -1) + 1
    cat.add_tombstones(replaced)

    new_docs, _n = assign_ids_hex(keyed, "doc_key", "doc_id")
    new_docs = new_docs.withColumn("doc_id", F.col("doc_id") + next_doc)
    new_store = with_meta(new_docs).withColumn(
        "id", F.coalesce("arxiv_id", "doc_key"))
    # stage the delta once; everything below appends from this segment
    new_store.select(*store.columns).write.mode("overwrite") \
        .parquet(cat.path("_staging_delta_store"))
    delta_store = spark.read.parquet(cat.path("_staging_delta_store"))
    delta_store.write.mode("append").parquet(cat.path("doc_store"))
    cat.commit_table("doc_store")

    new_toks = tokenize_docs(delta_store.select("doc_id", "content", "lang"))
    new_toks.write.mode("overwrite").parquet(cat.path("_staging_delta_toks"))
    delta_toks = spark.read.parquet(cat.path("_staging_delta_toks"))
    delta_toks.write.mode("append").parquet(cat.path("tokens"))
    cat.commit_table("tokens")

    refresh_stats(spark, cat)     # norms, field stats, dictionary df

    # delta posting + block segments (new docs only — the appended block
    # segments carry CURRENT idf0; old segments rescale at query time)
    n_buckets = cat.props()["n_buckets"]
    posts = _posting_rows(spark, cat, delta_toks, n_buckets)
    n_out = max(n_buckets, spark.sparkContext.defaultParallelism)
    sorted_posts = (
        posts.repartitionByRange(n_out, "bucket", "term_id", "doc_id")
        .sortWithinPartitions("term_id", "doc_id"))
    sorted_posts.write.mode("append").partitionBy("bucket") \
        .parquet(cat.path("postings"))
    cat.commit_table("postings")
    from mias_spark import blocks as blk
    from mias_spark.build import _salted
    packed = (_salted(posts)
              .repartition(n_out, "term_id", "salt")
              .sortWithinPartitions("term_id", "salt", "doc_id")
              .mapInPandas(blk.pack_sorted_partition, blk.BLOCKS_SCHEMA)
              .withColumn("bucket",
                          F.pmod("term_id", F.lit(n_buckets)).cast("int")))
    packed.write.mode("append").partitionBy("bucket") \
        .parquet(cat.path("blocks"))
    cat.commit_table("blocks")
    cat.flush_meta()

    n_new = new_corpus.count()
    cat.metric("upsert", added=n_new, replaced=n_replaced)
    maybe_compact(spark, index_dir)
    return {"added": n_new, "replaced": n_replaced}


# -------------------------------------------------------------------- delete

def delete_by_path(spark: SparkSession, index_dir: str,
                   path_prefix: str) -> int:
    """Recursive delete by path (S6, Indexing.java:211-241). Metadata
    only — tombstones + stats refresh; no posting data moves (Lucene
    liveDocs semantics; `optimize` reclaims the space)."""
    cat = Catalog(spark, index_dir)
    (live_store(cat).where(F.col("path").startswith(path_prefix))
     .select("doc_id")
     .write.mode("overwrite").parquet(cat.path("_staging_doomed")))
    doomed = spark.read.parquet(cat.path("_staging_doomed"))
    n = doomed.count()
    if n == 0:
        return 0
    cat.add_tombstones(doomed)
    refresh_stats(spark, cat)
    cat.flush_meta()
    cat.metric("delete", removed=n, path_prefix=path_prefix)
    maybe_compact(spark, index_dir)
    return n


def _swap_write(cat: Catalog, df: DataFrame, table: str) -> None:
    """Overwrite a table we are also reading from: stage + atomic move
    (Iceberg snapshot-swap analog)."""
    import shutil
    tmp = cat.path(f"_{table}_new")
    df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(cat.path(table), ignore_errors=True)
    shutil.move(tmp, cat.path(table))


# ------------------------------------------------------------------ optimize

TOMBSTONE_COMPACT_RATIO = 0.25


def maybe_compact(spark: SparkSession, index_dir: str,
                  ratio: float = TOMBSTONE_COMPACT_RATIO) -> bool:
    """Merge-policy analog: compact when tombstoned docs exceed
    ``ratio`` of the live set (reclaims space and re-arms the block-max
    pruning floor, which is disabled while tombstones exist)."""
    cat = Catalog(spark, index_dir)
    tomb = cat.tombstones()
    if tomb is None:
        return False
    n_dead = tomb.count()
    if n_dead == 0:
        return False
    n_live = live_store(cat).count()
    if n_dead <= ratio * max(n_live, 1):
        return False
    optimize(spark, index_dir)
    return True

def optimize(spark: SparkSession, index_dir: str) -> dict:
    """S8 optimize / force-merge analog (Indexing.java:167-179; Iceberg
    rewrite_data_files analog): purge tombstoned rows from doc_store and
    tokens, clear the tombstones, and rebuild postings + blocks into one
    globally doc-sorted segment per bucket."""
    cat = Catalog(spark, index_dir)
    tomb = cat.tombstones()
    n_dead = tomb.count() if tomb is not None else 0
    if n_dead:
        _swap_write(cat, live_store(cat), "doc_store")
        cat.commit_table("doc_store")
        _swap_write(cat, live_tokens(cat), "tokens")
        cat.commit_table("tokens")
        cat.clear_tombstones()
        refresh_stats(spark, cat)
    rebuild_postings_blocks(spark, cat)
    out = {"purged_docs": n_dead,
           "n_buckets": cat.props()["n_buckets"]}
    cat.metric("optimize", **out)
    return out


# -------------------------------------------------------- formula documents

def explode_formula_docs(corpus: DataFrame) -> DataFrame:
    """P7 FORMULA_DOCUMENTS granularity (Settings.java:168-175,
    MIasDocumentFactory.java:28-31, FormulaDocument.java:46-84): one
    corpus row per <math> element. The id becomes ``path#fN``
    (fileId#formulaId), the title is the id, and the content is a
    minimal XHTML wrapper holding that single formula — the result is
    corpus-shaped, so ``build_index`` consumes it unchanged (a
    formula-granularity index is just a different corpus view)."""
    import xml.etree.ElementTree as ET

    from mias_spec.document import _is_markup
    from mias_spec.mathml import extract_math_elements

    schema = ("repo string, path string, commit string, lang string, "
              "content string")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for repo, path, commit, lang, content in zip(
                    pdf["repo"], pdf["path"], pdf["commit"],
                    pdf["lang"], pdf["content"]):
                if not content or not _is_markup(content, lang):
                    continue
                for i, el in enumerate(extract_math_elements(content)):
                    fid = f"{path}#f{i + 1}"   # setFormulaPosition(i+1)
                    xml = ET.tostring(el, encoding="unicode")
                    doc = ('<?xml version="1.0"?>'
                           '<html xmlns="http://www.w3.org/1999/xhtml">'
                           f"<head><title>{fid}</title></head>"
                           f"<body>{xml}</body></html>")
                    rows.append((repo, fid, commit, "xhtml", doc))
            yield pd.DataFrame(rows, columns=[
                "repo", "path", "commit", "lang", "content"])

    return corpus.select(
        "repo", "path", "commit", "lang", "content").mapInPandas(fn, schema)


# ------------------------------------------------------------------ annotate

ANNOT_SCHEMA = ("doc_id long, math_idx int, mterm string, weight double")


def annotate_mterms(docs: DataFrame) -> DataFrame:
    """S10 -indocprocess analog (InDocProcessing.java:76-225): per
    <math> element, the weighted M-terms that would be indexed — written
    as a docs_annotated side table instead of mutated XHTML files."""
    from mias_spec import mathml
    from mias_spec.document import _is_markup

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content, lang in zip(
                    pdf["doc_id"], pdf["content"], pdf["lang"]):
                if not content or not _is_markup(content, lang):
                    continue
                for mi, el in enumerate(mathml.extract_math_elements(content)):
                    for variant in ("P", "C"):
                        branch = mathml.select_branch(el, variant)
                        if branch is None:
                            continue
                        for term, w, _pos in mathml.formula_mterms(branch):
                            rows.append((doc_id, mi, term, w))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "math_idx", "mterm", "weight"])

    return docs.select("doc_id", "content", "lang").mapInPandas(
        fn, ANNOT_SCHEMA)
