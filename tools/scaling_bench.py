"""Scaling-efficiency evidence (BASELINE.json north_rule).

The rule requires >=0.8 throughput scaling efficiency between N and 4N
executors; this sandbox has one machine, so the stand-in is the same
index build at local[8] vs local[32] over the SAME parquet corpus
(TESTDATA.md driver guidance). Each run is a fresh subprocess (fresh
JVM, fresh index dir) of jobs/build_index.py.

    python tools/scaling_bench.py [--rows 100000] [--buckets 16]

Prints one JSON line and rewrites the measured section of BENCH_SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def gen_corpus(rows: int, density: int, path: str) -> None:
    sys.path.insert(0, REPO)
    from mias_spark.session import get_spark
    from mias_spec.corpus import make_corpus
    spark = get_spark("gen_corpus", cpus="32")
    spark.createDataFrame(make_corpus(rows, density)).repartition(64) \
        .write.mode("overwrite").parquet(path)
    spark.stop()


def build_at(cpus: int, corpus: str, out: str, buckets: int,
             repeats: int = 1) -> dict:
    """Fresh-JVM build; with repeats > 1 the best run is kept (controls
    for this VM's host-noise swings of +-30% wall clock)."""
    best = None
    for _ in range(repeats):
        shutil.rmtree(out, ignore_errors=True)
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "jobs", "build_index.py"),
             "--corpus", corpus, "--out", out, "--cpus", str(cpus),
             "--buckets", str(buckets)],
            capture_output=True, text=True, check=True)
        r = json.loads(proc.stdout.strip().splitlines()[-1])
        if best is None or r["wall_s"] < best["wall_s"]:
            best = r
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=50_000)
    ap.add_argument("--density", type=int, default=16,
                    help="formulae-per-doc multiplier (arXiv-like "
                    "math-dense corpus; reference README.md:111-115)")
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--n", type=int, default=8, help="small parallelism")
    ap.add_argument("--n4", type=int, default=32, help="4x parallelism")
    ap.add_argument("--repeats", type=int, default=1,
                    help="runs per config; best wall kept")
    args = ap.parse_args()

    corpus = f"/tmp/mias_scaling_corpus_{args.rows}_d{args.density}"
    if not os.path.exists(corpus):
        gen_corpus(args.rows, args.density, corpus)

    r_small = build_at(args.n, corpus, f"/tmp/mias_scale_ix{args.n}",
                       args.buckets, args.repeats)
    r_big = build_at(args.n4, corpus, f"/tmp/mias_scale_ix{args.n4}",
                     args.buckets, args.repeats)
    speedup = r_big["docs_per_sec"] / r_small["docs_per_sec"]
    eff = speedup / (args.n4 / args.n)
    out = {
        "metric": "index_build_scaling_efficiency",
        "rows": args.rows,
        f"docs_per_sec_local[{args.n}]": r_small["docs_per_sec"],
        f"docs_per_sec_local[{args.n4}]": r_big["docs_per_sec"],
        f"wall_s_local[{args.n}]": r_small["wall_s"],
        f"wall_s_local[{args.n4}]": r_big["wall_s"],
        "speedup": round(speedup, 3),
        "efficiency": round(eff, 3),
        "target": 0.8,
    }
    print(json.dumps(out))
    md = os.path.join(REPO, "BENCH_SCALING.md")
    with open(md, "w") as f:
        f.write(
            "# Index-build scaling evidence (N vs 4N parallelism)\n\n"
            "Sandbox stand-in for the north rule's two-cluster-size "
            "criterion: the same\nbuild over the same parquet corpus at "
            f"`local[{args.n}]` vs `local[{args.n4}]`, fresh JVM each.\n\n"
            f"| rows | local[{args.n}] docs/s | local[{args.n4}] docs/s | "
            "speedup | efficiency (target >=0.8) |\n"
            "|---|---|---|---|---|\n"
            f"| {args.rows} | {r_small['docs_per_sec']} | "
            f"{r_big['docs_per_sec']} | {speedup:.2f}x | {eff:.3f} |\n\n"
            f"Reproduce: `python tools/scaling_bench.py --rows {args.rows}`\n")


if __name__ == "__main__":
    main()
