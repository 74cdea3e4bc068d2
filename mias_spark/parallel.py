"""Partition sizing for Arrow-UDF (Python-compute) stages.

A JVM-only stage is happy with one 128 MB split per core; an Arrow-UDF
stage measured ~55% core duty at 1 task/core (the JVM<->Python pipeline
stalls), so it wants ~4x oversubscription — but only when there is
enough data to amortize task overhead. Size by bytes, not by the scan's
file-packing: clamp(input_bytes / BYTES_PER_TASK, cores, 4*cores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

BYTES_PER_TASK = 8 << 20


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for the plan (parquet: sum of file
    sizes). None when unavailable."""
    try:
        jstat = df._jdf.queryExecution().optimizedPlan().stats()
        return int(str(jstat.sizeInBytes()))
    except Exception:
        return None


def udf_partitions(df: DataFrame,
                   bytes_per_task: int = BYTES_PER_TASK) -> int:
    par = df.sparkSession.sparkContext.defaultParallelism
    size = plan_size_bytes(df)
    if size is None:
        return max(par, df.rdd.getNumPartitions())
    want = size // bytes_per_task + 1
    return int(max(par, min(4 * par, want)))


def ensure_udf_parallelism(df: DataFrame) -> DataFrame:
    """Repartition an Arrow-UDF stage's input up to the byte-derived
    width; no-op when the scan is already wide enough (the normal case
    at real scale, where this never shuffles)."""
    want = udf_partitions(df)
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df
