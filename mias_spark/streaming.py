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

Use ``trigger_available_now=True`` for a drain-and-stop run (batch
catch-up), or False for a continuously-running micro-batch ingester.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

CORPUS_SCHEMA = ("repo string, path string, commit string, lang string, "
                 "content string")


def stream_upsert(spark: SparkSession, index_dir: str, source_dir: str,
                  checkpoint_dir: str | None = None,
                  trigger_available_now: bool = True,
                  max_files_per_trigger: int | None = None,
                  n_buckets: int = 16):
    """Ingest corpus parquet files appearing under ``source_dir`` into
    the index as micro-batch upserts. Returns the StreamingQuery
    (awaitTermination happens inside when draining with availableNow).

    If the index does not exist yet, the FIRST non-empty micro-batch
    bootstraps it via build_index (``n_buckets`` applies then); every
    later batch is one MERGE delta.
    """
    from mias_spark.ops import upsert

    checkpoint_dir = checkpoint_dir or os.path.join(
        index_dir, "_stream_checkpoint")
    reader = (spark.readStream.schema(CORPUS_SCHEMA)
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
        batch = (batch.withColumn("_rn", F.row_number().over(w))
                 .where(F.col("_rn") == 1).drop("_rn"))
        # route on build COMPLETENESS, not manifest existence: a crash
        # mid-bootstrap leaves a partial manifest, and build_index is
        # resumable — the checkpointed replay of the same batch then
        # finishes the build instead of wedging every retry in upsert()
        from mias_spark.build import build_index
        from mias_spark.catalog import Catalog
        cat = Catalog(batch.sparkSession, index_dir)
        if not cat.table_done("blocks"):
            build_index(batch.sparkSession, batch, index_dir,
                        n_buckets=n_buckets)
        else:
            upsert(batch.sparkSession, index_dir, batch)

    writer = src.writeStream.foreachBatch(apply_batch) \
        .option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
