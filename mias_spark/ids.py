"""Scalable, deterministic dense-id assignment.

Assigns ``0..n-1`` ids in global ``order_cols`` order without a global
single-partition sort:

1. range-repartition on the order columns and CHECKPOINT to parquet
   (range boundaries are sampled -> nondeterministic across recomputes;
   the checkpoint freezes them),
2. per-partition row counts -> driver-side prefix sums (one tiny row per
   partition),
3. id = offset[pid] + (row_number within pid ordered by order_cols) - 1.

Step 3 is a window partitioned by pid — Spark sorts each partition
independently (no single-reducer global sort), so the pattern scales to
the 10^12-row regime as long as partitions are sized sanely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str,
    staging_path: str,
    num_partitions: int | None = None,
) -> DataFrame:
    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n_part, *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
    )
    ranged.write.mode("overwrite").parquet(staging_path)
    staged = spark.read.parquet(staging_path)

    counts = {
        r["_pid"]: r["cnt"]
        for r in staged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _off long")

    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        staged.join(F.broadcast(off_df), "_pid")
        .withColumn(id_col, F.col("_off") + F.row_number().over(w) - 1)
        .drop("_pid", "_off")
    )
