"""Attribute the positional-packing cost of the index build (VERDICT
r4 #3): build the SAME corpus twice on the same session — once packing
``pos_bytes`` into every block (round-4+ format) and once without
(round-3 format) — min-of-N each, and print one JSON line with both
wall times and the measured feature cost.

Usage: python tools/build_split.py [--sf-dir DIR] [--cpus N]
                                   [--repeats N]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get(
        "SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mias_spark.build import build_index
    from mias_spark.session import get_spark
    from mias_spec.corpus import make_corpus

    spark = get_spark("mias_build_split", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # the EXACT corpus bench.py builds (documents + 10% MathML docs)
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    text = docs.select(
        F.concat(F.lit("corpus/"), "source").alias("repo"),
        F.concat(F.lit("docs/doc_"), F.col("doc_id").cast("string"),
                 F.lit(".txt")).alias("path"),
        F.lit("0" * 40).alias("commit"),
        F.lit("text").alias("lang"),
        F.col("text").alias("content"))
    n_text = text.count()
    math = spark.createDataFrame(make_corpus(max(int(n_text * 0.1), 50)))
    corpus = text.unionByName(math.select(*text.columns))
    n_docs = n_text + max(int(n_text * 0.1), 50)

    ix = os.path.join(tempfile.gettempdir(), "mias_build_split_ix")

    def timed(pack_positions: bool) -> float:
        best = None
        for _ in range(args.repeats):
            shutil.rmtree(ix, ignore_errors=True)
            t = time.time()
            build_index(spark, corpus, ix, n_buckets=8, resume=False,
                        pack_positions=pack_positions)
            dt = time.time() - t
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    # alternate orders would be fairer under drifting host clocks, but
    # JIT warmup argues for a fixed order with min-of-N: the FIRST
    # timed config absorbs C2 compilation in its first repeat, which
    # min-of-N then discards
    with_pos = timed(True)
    without_pos = timed(False)
    shutil.rmtree(ix, ignore_errors=True)
    cost = with_pos - without_pos
    print(json.dumps({
        "metric": "build_split_seconds",
        "build_with_positions": with_pos,
        "build_without_positions": without_pos,
        "positions_cost_s": round(cost, 3),
        "positions_cost_pct": round(100.0 * cost / without_pos, 1)
        if without_pos else None,
        "n_docs": n_docs,
        "repeats": args.repeats,
        "cpus": int(args.cpus),
        "sf_dir": args.sf_dir,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
