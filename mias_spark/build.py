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
from mias_spark.ids import assign_ids_hashed, assign_ids_hex
from mias_spark.parallel import ensure_udf_parallelism
from mias_spark.tokenize import tokenize_docs, with_meta
from mias_spec.constants import SALT_DF_THRESHOLD, SALT_DOC_RANGE


#: doc_store partition granularity: dseg = doc_id >> DOC_SEG_SHIFT.
#: Display fetches are k-row point lookups — partitioned by doc range
#: they prune to the <=k segments holding the ids instead of scanning
#: the whole store (at 10^12 docs an unpartitioned k-row lookup reads
#: every footer). Recorded in props so query side uses the same shift.
DOC_SEG_SHIFT = 20


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    n_buckets: int = 16,
    doc_limit: int | None = None,
    resume: bool = True,
    doc_seg_shift: int = DOC_SEG_SHIFT,
    pack_positions: bool = True,
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
        # rescue width on the scan side BEFORE the id join (.rdd on the
        # join plan would eagerly run its AQE stages)
        keyed = ensure_udf_parallelism(keyed)
        docs, n = assign_ids_hex(keyed, "doc_key", "doc_id")
        if n == 0:
            # empty partitioned parquet tables can't be re-read (no
            # footer to infer from); an index needs >= 1 doc — the
            # streaming path bootstraps from its first batch instead
            raise ValueError(
                "build_index: corpus is empty; index an initial batch "
                "(streaming.stream_upsert bootstraps automatically)")
        # meta computed inline in the same pass as the store write;
        # arXiv id override (HtmlDocument.java:31-36)
        store = with_meta(docs).withColumn(
            "id", F.coalesce("arxiv_id", "doc_key"))
        store = store.withColumn(
            "dseg", F.shiftright("doc_id", doc_seg_shift))
        cat.write(store, "doc_store", partition_by=["dseg"])
        # next_doc_id high-water mark: upsert assigns fresh ids from
        # here instead of running a max(doc_id) scan per call
        cat.set_props(next_doc_id=int(n), doc_seg_shift=int(doc_seg_shift))
        cat.commit_table("doc_store", rows=n)
        cat.metric("doc_store", rows=n, secs=time.time() - ts)

    # -------------------------------------------------------------- tokens
    if not cat.table_done("tokens"):
        ts = time.time()
        docs = cat.read("doc_store").select("doc_id", "content", "lang")
        # Arrow-UDF stage: byte-aware 4x oversubscription (parallel.py).
        # Partitioned by doc-range (tseg) so upsert/delete stats deltas
        # prune their dead-doc scans to the segments actually touched.
        from mias_spark.ops import _tseg
        toks = tokenize_docs(ensure_udf_parallelism(docs))
        cat.write(toks.withColumn("tseg", _tseg()), "tokens",
                  partition_by=["tseg"])
        cat.commit_table("tokens")
        cat.metric("tokens", secs=time.time() - ts)

    # ----------------------------------------------------------- doc_norms
    # dl (field length counting every unified variant, B5) is computed in
    # the tokenize pass and carried ON each token row, so postings never
    # join norms — this stage only materializes the narrow norms table
    # for stats/ops parity
    if not cat.table_done("doc_norms"):
        ts = time.time()
        norms = (cat.read("tokens")
                 .groupBy("doc_id", "field")
                 .agg(F.first("dl").alias("dl")))
        cat.write(norms, "doc_norms")
        stats = (cat.read("doc_norms").groupBy("field")
                 .agg(F.count("*").alias("n_docs"),
                      F.avg("dl").alias("avgdl"),
                      F.sum("dl").alias("sum_dl")).collect())
        cat.set_props(field_stats={
            r["field"]: {"n_docs": r["n_docs"], "avgdl": r["avgdl"],
                         "sum_dl": float(r["sum_dl"])}
            for r in stats})
        cat.commit_table("doc_norms")
        cat.metric("doc_norms", secs=time.time() - ts)

    # ---------------------------------------------------------- dictionary
    if not cat.table_done("dictionary"):
        ts = time.time()
        dic = (cat.read("tokens")
               .groupBy("field", "term")
               .agg(F.count("*").alias("df")))  # one token row per doc
        dic, n = assign_ids_hashed(dic, ["field", "term"], "term_id")
        # partition by term-hash bucket: query compile prunes its term
        # lookups to |query terms| buckets instead of scanning the whole
        # dictionary (10^9 terms at target scale)
        dic = dic.withColumn("dbucket", _dbucket())
        cat.write(dic, "dictionary", partition_by=["dbucket"])
        cat.set_props(next_term_id=int(n))   # delta-append high-water mark
        cat.commit_table("dictionary", rows=n)
        cat.metric("dictionary", rows=n, secs=time.time() - ts)

    # ------------------------------------------------------------ postings
    if not cat.table_done("postings"):
        ts = time.time()
        toks = cat.read("tokens")
        dic = cat.read("dictionary")
        fs = cat.props()["field_stats"]
        stats_df = spark.createDataFrame(
            [(f, int(v["n_docs"]), float(v["avgdl"])) for f, v in fs.items()],
            "field string, n_docs long, avgdl double")
        posts = (
            toks.join(dic, ["field", "term"])
            .join(F.broadcast(stats_df), "field")
            .withColumn("idf", F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)))
            .select(
                "term_id", "field", "doc_id", "tf", "wsum", "dl", "df",
                "idf", "avgdl", "positions",
                F.pmod("term_id", F.lit(n_buckets)).cast("int").alias("bucket"))
        )
        # range partition: full parallelism AND each task covers a
        # contiguous (bucket, term) slice, so the partitionBy writer
        # emits ~1 file per task instead of n_buckets small files each
        n_out = max(n_buckets, 2 * spark.sparkContext.defaultParallelism)
        cat.write(posts.repartitionByRange(n_out, "bucket", "term_id",
                                           "doc_id")
                  .sortWithinPartitions("term_id", "doc_id"),
                  "postings", partition_by=["bucket"])
        cat.commit_table("postings")
        cat.set_props(n_buckets=n_buckets)
        cat.metric("postings", secs=time.time() - ts)

    # -------------------------------------------------------------- blocks
    build_blocks(spark, cat, n_buckets, pack_positions=pack_positions)
    if not cat.table_done("blocks"):
        cat.commit_table("blocks")

    # -------------------------------------------------------------- metrics
    n_docs = cat.manifest()["tables"]["doc_store"]["rows"]
    wall = time.time() - t0
    cat.metric("build_total", docs=n_docs, secs=wall,
               docs_per_sec=(n_docs / wall if wall > 0 else None))
    cat.flush_meta()   # lineage/metrics/checkpoints as queryable tables
    return cat


N_DICT_BUCKETS = 64


def _salted(posts: DataFrame) -> DataFrame:
    """B4 skew handling: doc-range salt for terms above the df
    threshold (salt is monotone in doc_id, so (salt, block_ord) keeps
    global doc order per term)."""
    return (posts.withColumn("salt", F.when(
        F.col("df") > SALT_DF_THRESHOLD,
        (F.col("doc_id") / SALT_DOC_RANGE).cast("int")).otherwise(0))
        .select("term_id", "field", "salt", "doc_id", "tf", "dl",
                "wsum", "idf", "avgdl", "positions"))


def _dbucket():
    """Dictionary partition key — MUST match search.py's query-side
    computation exactly (same hash, same modulus)."""
    return F.pmod(F.xxhash64("field", "term"),
                  F.lit(N_DICT_BUCKETS)).cast("int")


def build_blocks(spark: SparkSession, cat: Catalog, n_buckets: int,
                 chunk: int | None = None,
                 pack_positions: bool = True) -> None:
    """Pack postings into compressed blocks, a chunk of term buckets per
    Spark job. Checkpoints stay PER BUCKET (the north-rule per-partition
    resume unit — a killed build redoes only unfinished buckets), but
    several buckets ride one job + one dynamic-partition-overwrite commit
    so driver job-scheduling latency doesn't serialize the stage."""
    posts = cat.read("postings")
    chunk = chunk or max(1, n_buckets // 2)
    n_chunks = -(-n_buckets // chunk)
    from mias_spark.parallel import BYTES_PER_TASK, plan_size_bytes
    par = spark.sparkContext.defaultParallelism
    psize = plan_size_bytes(posts) or 0
    pack_width = int(max(par, min(
        4 * par, psize // n_chunks // BYTES_PER_TASK + 1)))
    # dynamic partition overwrite is scoped inside
    # Catalog.overwrite_partitions (set + restore per write)
    for c0 in range(0, n_buckets, chunk):
        todo = [b for b in range(c0, min(c0 + chunk, n_buckets))
                if not cat.checkpoint_done("blocks", f"bucket={b}")]
        if not todo:
            continue
        ts = time.time()
        sub = _salted(posts.where(F.col("bucket").isin(todo)))
        pack_fn = (blk.pack_sorted_partition if pack_positions
                   else blk.pack_sorted_partition_nopos)
        schema = (blk.BLOCKS_SCHEMA if pack_positions
                  else blk.BLOCKS_SCHEMA_NOPOS)
        packed = (
            sub.repartition(pack_width, "term_id", "salt")
            .sortWithinPartitions("term_id", "salt", "doc_id")
            .mapInPandas(pack_fn, schema)
            .withColumn("bucket",
                        F.pmod("term_id", F.lit(n_buckets)).cast("int"))
        )
        cat.overwrite_partitions(packed, "blocks", ["bucket"])
        for b in todo:
            cat.checkpoint("blocks", f"bucket={b}", rows=-1,
                           t_start=ts, t_end=time.time())


def index_stats(cat: Catalog) -> dict:
    """S9 stats analog (Indexing.java:246-272) — live docs only."""
    m = cat.manifest()
    store = cat.read("doc_store")
    tomb = cat.tombstones()
    if tomb is not None:
        store = store.join(tomb, "doc_id", "leftanti")
    agg = store.agg(
        F.count("*").alias("n_docs"),
        F.sum("filesize").alias("total_bytes"),
        F.sum("n_formulae").alias("n_formulae")).collect()[0]
    return {
        "n_docs": agg["n_docs"],
        "total_input_bytes": agg["total_bytes"],
        "n_formulae": agg["n_formulae"],
        "n_terms": m["tables"].get("dictionary", {}).get("rows"),
        # postings rows are not counted during the build (saves a job);
        # stats computes the footer-only count on demand
        "n_postings": (m["tables"].get("postings", {}).get("rows")
                       or cat.read("postings").count()),
        "snapshot": m["snapshot"],
    }
