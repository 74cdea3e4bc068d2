"""Structured Streaming ingest — micro-batch index maintenance.

The reference is batch-only (Indexing.java drives a thread pool over a
directory walk); this module is the Spark-native extension: a
``readStream`` over a corpus directory feeds each micro-batch through
the SAME delta-only ``ops.upsert`` path (MERGE on doc_key, appended
doc/token/posting/block segments, signed-df dictionary deltas) via
``foreachBatch``. Because upsert cost scales with the delta — never
the index — sustained micro-batches keep a bounded per-batch cost, and
the auto-compaction policy (ops.maybe_compact) bounds tombstone debt.

Exactly-once-ish semantics: the file-source checkpoint tracks consumed
files; upsert itself is idempotent per doc_key (a replayed batch
re-replaces the same docs), so a crash between batch and checkpoint
re-applies harmlessly.

Late data (the watermark story): source rows MAY carry a
``commit_ts timestamp`` column (files without it read as null = always
on-time). The stream keeps an append-only ``_stream_versions`` table of
ingested (repo, path, ts) rows — max-at-read, the same delta shape as
the dictionary segments, so recording a batch costs one small append,
never a rewrite. A row whose commit_ts is older than the newest
already-ingested version of its (repo, path) by more than
``allowed_lateness_s`` is routed to the ``_stream_dead_letter`` table
(full row + batch_id + reason, replayable) instead of being merged —
a stale commit must not resurface beside the newer version it lost to.
Two commits arriving in ONE batch both merge (they are distinct docs,
exactly as in batch upsert); the watermark guards cross-batch arrival
order only.

Use ``trigger_available_now=True`` for a drain-and-stop run (batch
catch-up), or False for a continuously-running micro-batch ingester.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

CORPUS_SCHEMA = ("repo string, path string, commit string, lang string, "
                 "content string")
STREAM_SCHEMA = CORPUS_SCHEMA + ", commit_ts timestamp"


def _split_late(cat, batch, allowed_lateness_s: float):
    """(late_rows | None, ontime_rows): late = commit_ts older than the
    newest ingested version of the same (repo, path) minus the allowed
    lateness. Null commit_ts rows are always on-time."""
    from pyspark.sql import functions as F
    if not cat.has_table("_stream_versions"):
        return None, batch
    ver = (cat.read("_stream_versions")
           .groupBy("repo", "path").agg(F.max("ts").alias("_maxts")))
    j = batch.join(ver, ["repo", "path"], "left")
    is_late = (F.col("commit_ts").isNotNull()
               & F.col("_maxts").isNotNull()
               & (F.col("commit_ts")
                  < F.col("_maxts") - F.expr(
                      f"INTERVAL {float(allowed_lateness_s)} SECONDS")))
    return (j.where(is_late).drop("_maxts"),
            j.where(~is_late).drop("_maxts"))


#: fold _stream_versions after this many delta appends — bounds the
#: table (and _split_late's per-batch scan) to ~the tracked key set
#: plus one fold-window of deltas, never the full ingest history
_VERSIONS_FOLD = 16


def _record_versions(cat, rows) -> None:
    from pyspark.sql import functions as F
    seen = (rows.where(F.col("commit_ts").isNotNull())
            .select("repo", "path", F.col("commit_ts").alias("ts")))
    if not seen.take(1):
        return
    cat.append(seen, "_stream_versions")
    # bounded history: same policy as the dictionary's segment fold.
    # A checkpoint replay may append the same rows twice — harmless,
    # the semantics are max-at-read and the fold dedupes.
    n = int(cat.props().get("stream_version_appends", 0)) + 1
    if n >= _VERSIONS_FOLD:
        folded = (cat.read("_stream_versions")
                  .groupBy("repo", "path").agg(F.max("ts").alias("ts")))
        cat.overwrite(folded, "_stream_versions")
        n = 0
    cat.set_props(stream_version_appends=n)


def stream_upsert(spark: SparkSession, index_dir: str, source_dir: str,
                  checkpoint_dir: str | None = None,
                  trigger_available_now: bool = True,
                  max_files_per_trigger: int | None = None,
                  n_buckets: int = 16,
                  allowed_lateness_s: float = 0.0):
    """Ingest corpus parquet files appearing under ``source_dir`` into
    the index as micro-batch upserts. Returns the StreamingQuery
    (awaitTermination happens inside when draining with availableNow).

    If the index does not exist yet, the FIRST non-empty micro-batch
    bootstraps it via build_index (``n_buckets`` applies then); every
    later batch is one MERGE delta. Rows later than the watermark (see
    module docstring) land in ``_stream_dead_letter``.
    """
    from mias_spark.ops import upsert

    checkpoint_dir = checkpoint_dir or os.path.join(
        index_dir, "_stream_checkpoint")
    reader = (spark.readStream.schema(STREAM_SCHEMA)
              .format("parquet"))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    src = reader.load(source_dir)

    def apply_batch(batch, batch_id: int) -> None:
        # dedupe within the batch on the FULL MERGE key (repo, path,
        # commit) — distinct commits of one path are distinct docs,
        # exactly as in batch build_index/upsert, so the final index
        # never depends on micro-batch boundaries; only true key
        # duplicates (same commit twice) collapse, deterministically
        from pyspark.sql import Window
        from pyspark.sql import functions as F
        if not batch.take(1):
            return
        w = Window.partitionBy("repo", "path", "commit").orderBy(
            F.desc("content"))
        # persist the deduped batch: everything downstream (late
        # split, dead-letter append, upsert's internal actions,
        # version recording) re-executes its lineage per action — one
        # persist evaluates the source read + dedup shuffle once
        batch = (batch.withColumn("_rn", F.row_number().over(w))
                 .where(F.col("_rn") == 1).drop("_rn")).persist()
        try:
            # route on build COMPLETENESS, not manifest existence: a
            # crash mid-bootstrap leaves a partial manifest, and
            # build_index is resumable — the checkpointed replay of
            # the same batch then finishes the build instead of
            # wedging every retry in upsert()
            from mias_spark.build import build_index
            from mias_spark.catalog import Catalog
            cat = Catalog(batch.sparkSession, index_dir)
            if not cat.table_done("blocks"):
                # bootstrap: nothing indexed yet, nothing can be late
                build_index(batch.sparkSession, batch.drop("commit_ts"),
                            index_dir, n_buckets=n_buckets)
                _record_versions(cat, batch)
                return
            late, ontime = _split_late(cat, batch, allowed_lateness_s)
            if late is not None and late.take(1):
                # replay-idempotent WITHOUT losing rows across stream
                # runs: Spark replays a failed micro-batch under the
                # SAME batch_id, so anti-join the late rows against
                # rows already dead-lettered under this batch_id — a
                # replay appends nothing, while a batch_id collision
                # from a RESTARTED stream (checkpoint reset restarts
                # ids at 0) still records its genuinely new rows
                fresh = late.withColumn("batch_id",
                                        F.lit(int(batch_id)))
                if cat.has_table("_stream_dead_letter"):
                    prior = (cat.read("_stream_dead_letter")
                             .where(F.col("batch_id") == int(batch_id))
                             .select("repo", "path", "commit",
                                     "batch_id"))
                    fresh = fresh.join(
                        prior, ["repo", "path", "commit", "batch_id"],
                        "leftanti")
                if fresh.take(1):
                    cat.append(
                        fresh.withColumn("reason",
                                         F.lit("late_commit_ts"))
                             .withColumn("dead_ts",
                                         F.current_timestamp()),
                        "_stream_dead_letter")
            if ontime.take(1):
                upsert(batch.sparkSession, index_dir,
                       ontime.drop("commit_ts"))
                _record_versions(cat, ontime)
        finally:
            batch.unpersist()

    writer = src.writeStream.foreachBatch(apply_batch) \
        .option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def dead_letters(spark: SparkSession, index_dir: str):
    """The dead-letter table (None when nothing was ever late)."""
    from mias_spark.catalog import Catalog
    cat = Catalog(spark, index_dir)
    if not cat.has_table("_stream_dead_letter"):
        return None
    return cat.read("_stream_dead_letter")
