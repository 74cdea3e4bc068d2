"""Distributed index build — the IndexWriter analog (SURVEY.md §2.3,
reference lifecycle at indexing/Indexing.java:66-162).

Stages (each checkpointed in the catalog manifest; a killed build
resumes by skipping completed stages / buckets — the analog of the
reference's commit-every-10k-docs + KeepOnlyLastCommitDeletionPolicy,
Indexing.java:82,139-145):

  doc_store   ingest: dense doc_id by sorted sha256 doc_key; stored
              fields + content sha256 ingest invariant (input_hint)
  tokens      Arrow tokenize, pre-aggregated per (doc, field, term) (B1)
  doc_norms   per (doc, field) length counting every unified variant (B5)
  dictionary  dense term_id over (field, term) + document frequency (B2)
  postings    exploded posting rows with inlined dl/df/idf/avgdl,
              hash-bucketed by term_id, doc-sorted (B3) — also the
              SQL-auditable surface for the DuckDB oracle gate
  blocks      per-bucket driver loop: salt skewed terms (B4), local sort,
              numpy pack into delta-gap varint blocks with block-max
              scores; one checkpoint per bucket (B7 / north rule)

Shuffle budget per build: 1 range-partition (doc ids) + 1 hash agg
(dictionary) + 1 range-partition (term ids) + 2 joins (dictionary,
norms — both shuffle-free when broadcastable, AQE decides) + 1
repartition per bucket for packing. Everything else is mapInPandas.
"""

from __future__ import annotations

import math
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mias_spark import blocks as blk
from mias_spark.catalog import Catalog
from mias_spark.ids import assign_dense_ids
from mias_spark.tokenize import extract_meta, tokenize_docs
from mias_spec.constants import SALT_DF_THRESHOLD, SALT_DOC_RANGE


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    n_buckets: int = 16,
    doc_limit: int | None = None,
    resume: bool = True,
) -> Catalog:
    """Build a full index from a corpus(repo, path, commit, lang,
    content) DataFrame. Idempotent and resumable when ``resume``."""
    cat = Catalog(spark, index_dir)
    if not resume:
        m = cat.manifest()
        m["tables"], m["checkpoints"] = {}, {}
        cat._save(m)
    t0 = time.time()

    # ------------------------------------------------------------ doc_store
    if not cat.table_done("doc_store"):
        ts = time.time()
        src = corpus
        if doc_limit and doc_limit > 0:   # DOCLIMIT analog (Settings.java:158)
            src = src.limit(doc_limit)
        keyed = src.withColumn(
            "doc_key", F.sha2(F.concat_ws("|", "repo", "path", "commit"), 256))
        docs = assign_dense_ids(
            keyed, ["doc_key"], "doc_id", cat.path("_staging_docs"))
        meta = extract_meta(docs)
        store = docs.join(meta, "doc_id")
        # arXiv id override (HtmlDocument.java:31-36): stored id field
        store = store.withColumn(
            "id", F.coalesce("arxiv_id", "doc_key"))
        cat.write(store, "doc_store")
        n = cat.read("doc_store").count()
        cat.commit_table("doc_store", rows=n)
        cat.metric("doc_store", rows=n, secs=time.time() - ts)

    # -------------------------------------------------------------- tokens
    if not cat.table_done("tokens"):
        ts = time.time()
        docs = cat.read("doc_store").select("doc_id", "content", "lang")
        toks = tokenize_docs(docs)
        cat.write(toks, "tokens")
        n = cat.read("tokens").count()
        cat.commit_table("tokens", rows=n)
        cat.metric("tokens", rows=n, secs=time.time() - ts)

    # ----------------------------------------------------------- doc_norms
    if not cat.table_done("doc_norms"):
        ts = time.time()
        norms = (cat.read("tokens")
                 .groupBy("doc_id", "field")
                 .agg(F.sum("tf").alias("dl")))
        cat.write(norms, "doc_norms")
        stats = (cat.read("doc_norms").groupBy("field")
                 .agg(F.count("*").alias("n_docs"),
                      F.avg("dl").alias("avgdl")).collect())
        cat.set_props(field_stats={
            r["field"]: {"n_docs": r["n_docs"], "avgdl": r["avgdl"]}
            for r in stats})
        cat.commit_table("doc_norms")
        cat.metric("doc_norms", secs=time.time() - ts)

    # ---------------------------------------------------------- dictionary
    if not cat.table_done("dictionary"):
        ts = time.time()
        dic = (cat.read("tokens")
               .groupBy("field", "term")
               .agg(F.count("*").alias("df")))  # one token row per doc
        dic = assign_dense_ids(
            dic, ["field", "term"], "term_id", cat.path("_staging_terms"))
        cat.write(dic, "dictionary")
        n = cat.read("dictionary").count()
        cat.commit_table("dictionary", rows=n)
        cat.metric("dictionary", rows=n, secs=time.time() - ts)

    # ------------------------------------------------------------ postings
    if not cat.table_done("postings"):
        ts = time.time()
        toks = cat.read("tokens")
        dic = cat.read("dictionary")
        norms = cat.read("doc_norms")
        fs = cat.props()["field_stats"]
        stats_df = spark.createDataFrame(
            [(f, int(v["n_docs"]), float(v["avgdl"])) for f, v in fs.items()],
            "field string, n_docs long, avgdl double")
        posts = (
            toks.join(dic, ["field", "term"])
            .join(norms, ["doc_id", "field"])
            .join(F.broadcast(stats_df), "field")
            .withColumn("idf", F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)))
            .select(
                "term_id", "field", "doc_id", "tf", "wsum", "dl", "df",
                "idf", "avgdl", "positions",
                F.pmod("term_id", F.lit(n_buckets)).cast("int").alias("bucket"))
        )
        (posts.repartition(max(n_buckets, 1), "bucket")
              .sortWithinPartitions("term_id", "doc_id")
              .write.mode("overwrite").partitionBy("bucket")
              .parquet(cat.path("postings")))
        n = cat.read("postings").count()
        cat.commit_table("postings", rows=n)
        cat.set_props(n_buckets=n_buckets)
        cat.metric("postings", rows=n, secs=time.time() - ts)

    # -------------------------------------------------------------- blocks
    # driver-side per-bucket loop = per-partition commits + resume points
    posts = cat.read("postings")
    for b in range(n_buckets):
        part = f"bucket={b}"
        if cat.checkpoint_done("blocks", part):
            continue
        ts = time.time()
        sub = (
            posts.where(F.col("bucket") == b)
            .withColumn("salt", F.when(
                F.col("df") > SALT_DF_THRESHOLD,
                (F.col("doc_id") / SALT_DOC_RANGE).cast("int")).otherwise(0))
            .select("term_id", "salt", "doc_id", "tf", "dl", "wsum",
                    "idf", "avgdl")
        )
        packed = (
            sub.repartition(max(spark.sparkContext.defaultParallelism // 4, 1),
                            "term_id", "salt")
            .sortWithinPartitions("term_id", "salt", "doc_id")
            .mapInPandas(blk.pack_sorted_partition, blk.BLOCKS_SCHEMA)
        )
        packed.write.mode("overwrite").parquet(cat.path(f"blocks/{part}"))
        cat.checkpoint("blocks", part, rows=-1, t_start=ts, t_end=time.time())
    if not cat.table_done("blocks"):
        cat.commit_table("blocks")

    # -------------------------------------------------------------- metrics
    n_docs = cat.manifest()["tables"]["doc_store"]["rows"]
    wall = time.time() - t0
    cat.metric("build_total", docs=n_docs, secs=wall,
               docs_per_sec=(n_docs / wall if wall > 0 else None))
    return cat


def index_stats(cat: Catalog) -> dict:
    """S9 stats analog (Indexing.java:246-272)."""
    m = cat.manifest()
    store = cat.read("doc_store")
    agg = store.agg(
        F.count("*").alias("n_docs"),
        F.sum("filesize").alias("total_bytes"),
        F.sum("n_formulae").alias("n_formulae")).collect()[0]
    return {
        "n_docs": agg["n_docs"],
        "total_input_bytes": agg["total_bytes"],
        "n_formulae": agg["n_formulae"],
        "n_terms": m["tables"].get("dictionary", {}).get("rows"),
        "n_postings": m["tables"].get("postings", {}).get("rows"),
        "snapshot": m["snapshot"],
    }
