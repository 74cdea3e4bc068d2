"""Scalable, deterministic dense-id assignment — no sampling, no
staging copy.

``assign_ids_hex``: for keys that are uniform hex digests (doc_key =
sha256). Range boundaries are analytic — partition p of P covers the
key prefix range [p/P, (p+1)/P) of the 60-bit hex space — so ids come
out in GLOBAL sorted key order with zero sampling and zero staging
write (the classic repartitionByRange needs a sample job AND a
checkpoint to freeze its nondeterministic boundaries; a hash digest key
needs neither). One narrow agg (key column only, pruned scan) computes
per-partition offsets; one wide shuffle moves the rows once.

``assign_ids_hashed``: for arbitrary key tuples (dictionary terms).
Partition = pmod(xxhash64(keys), P), order within partition by the key
tuple — ids are dense and DETERMINISTIC but not globally key-sorted
(nothing downstream needs term_ids sorted; bucketing and block layout
only need stability).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _hex_pid(key_col: str, n_part: int):
    # 32-bit key prefix; (val * P) >> 32 stays in long range for any
    # realistic P and is monotone in the key — partition boundaries are
    # exact fractions of the digest space, no sampling
    val = F.conv(F.substring(key_col, 1, 8), 16, 10).cast("long")
    return F.shiftright(val * n_part, 32).cast("int").alias("_pid")


def _with_dense_ids(df: DataFrame, pid_col, order_cols: list[str],
                    id_col: str, n_part: int) -> tuple[DataFrame, int]:
    spark = df.sparkSession
    withpid = df.withColumn("_pid", pid_col)
    # duplicate keys would make the (key, id) mapping many-to-many and
    # multiply rows on the join-back — fail fast with MERGE semantics
    # (the Delta/Iceberg "multiple source rows matched" contract). The
    # check rides the offsets agg: _pid is a pure function of the key,
    # so per-partition distinct counts sum to the global distinct count.
    crows = (withpid.groupBy("_pid")
             .agg(F.count("*").alias("cnt"),
                  F.countDistinct(*order_cols).alias("dcnt"))
             .collect())
    n_dup = sum(r["cnt"] - r["dcnt"] for r in crows)
    if n_dup:
        raise ValueError(
            f"{n_dup} duplicate key rows in id-assignment input "
            f"(key={order_cols}); dedupe the corpus/delta batch first")
    counts = {r["_pid"]: r["cnt"] for r in crows}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    out = (
        withpid.repartition(n_part, "_pid")
        .join(F.broadcast(off_df), "_pid")
        .withColumn(id_col, F.col("_off") + F.row_number().over(w) - 1)
        .drop("_pid", "_off")
    )
    return out, acc


def assign_ids_hex(df: DataFrame, key_col: str, id_col: str,
                   num_partitions: int | None = None) -> tuple[DataFrame, int]:
    """Dense ids 0..n-1 in global ``key_col`` order; key must be a hex
    digest string (uniform). Returns (df, total_rows).

    The heavy payload NEVER shuffles: the dense rank is computed on a
    keys-only projection (narrow — a few bytes/row even when the row
    carries megabytes of content), then joined back on the key. AQE
    broadcasts the (key, id) map when it fits (always, in-sandbox) and
    falls back to a co-partitioned hash join at 10^12-row scale — either
    way the full rows move at most once instead of twice."""
    # ranking runs on keys only (tiny rows): 1 task/core is plenty, and
    # probing the plan's width here would eagerly execute AQE stages
    n_part = num_partitions or \
        df.sparkSession.sparkContext.defaultParallelism
    keys = df.select(key_col)
    mapping, total = _with_dense_ids(
        keys, _hex_pid(key_col, n_part), [key_col], id_col, n_part)
    return df.join(mapping, key_col), total


def assign_ids_hashed(df: DataFrame, key_cols: list[str], id_col: str,
                      num_partitions: int | None = None
                      ) -> tuple[DataFrame, int]:
    """Dense deterministic ids for arbitrary unique key tuples (order =
    (hash-partition, key tuple), stable across runs/retries)."""
    n_part = num_partitions or \
        df.sparkSession.sparkContext.defaultParallelism
    pid = F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]),
                 F.lit(n_part)).cast("int")
    return _with_dense_ids(df, pid, key_cols, id_col, n_part)
