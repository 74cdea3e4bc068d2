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
    """Rescue an Arrow-UDF stage whose SCAN is narrower than the core
    count (tiny corpora); wide inputs pass through untouched — at real
    scale the 32 MiB split size already yields >= 4x-cores width with no
    shuffle. Only call on scan-rooted plans: ``.rdd`` on an AQE join
    plan executes its stages eagerly (and the subtree again at action
    time)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
