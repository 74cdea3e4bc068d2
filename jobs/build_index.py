"""spark-submit entry: distributed index build.

Cluster launch (north rule — multi-executor, --py-files packaging):

    cd /root/repo && zip -r /tmp/mias.zip mias_spark mias_spec
    spark-submit --py-files /tmp/mias.zip jobs/build_index.py \
        --corpus <iceberg-table-or-parquet-path> --out <index-root> \
        [--buckets 256] [--doc-limit N] [--no-resume]

Sandbox / local smoke (synthesized corpus):

    python jobs/build_index.py --rows 1000 --out /tmp/ix

The corpus must have columns (repo, path, commit, lang, content) per
BASELINE.json input_hint. Builds are resumable: a killed run re-launched
with the same --out skips completed stages and block buckets (per-
partition checkpoints in the catalog manifest — the analog of the
reference's commit-every-10k-docs, Indexing.java:139-145).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# direct `python jobs/build_index.py` runs: put the repo root on the path
# (spark-submit --py-files ships the packages instead)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", help="parquet path (or Iceberg table via "
                    "spark.read.table when a catalog is configured)")
    ap.add_argument("--rows", type=int, default=0,
                    help="synthesize a deterministic MathML corpus of N "
                    "rows instead of reading --corpus")
    ap.add_argument("--out", required=True, help="index root directory")
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--doc-limit", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--cpus", default=None,
                    help="local[N] override (ignored under spark-submit "
                    "with a master already set)")
    args = ap.parse_args()

    from mias_spark.build import build_index, index_stats
    from mias_spark.session import get_spark

    spark = get_spark("mias_build_index", cpus=args.cpus)
    if args.rows:
        from mias_spec.corpus import make_corpus
        corpus = spark.createDataFrame(make_corpus(args.rows))
    elif args.corpus:
        corpus = spark.read.parquet(args.corpus)
    else:
        ap.error("one of --corpus / --rows is required")

    t0 = time.time()
    cat = build_index(spark, corpus, args.out, n_buckets=args.buckets,
                      doc_limit=args.doc_limit, resume=not args.no_resume)
    stats = index_stats(cat)
    stats["wall_s"] = round(time.time() - t0, 2)
    stats["docs_per_sec"] = (
        round(stats["n_docs"] / stats["wall_s"], 2) if stats["wall_s"] else None)
    print(json.dumps(stats, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
