"""CLI — the MIaS.java verb surface on Spark (MIaS.java:32-60,
Settings.java:35-74).

    python jobs/mias.py -conf mias.properties -add <corpus.parquet>
    python jobs/mias.py -conf mias.properties -overwrite <corpus.parquet>
    python jobs/mias.py -conf mias.properties -delete <path-prefix>
    python jobs/mias.py -conf mias.properties -deleteindex
    python jobs/mias.py -conf mias.properties -optimize
    python jobs/mias.py -conf mias.properties -compact
    python jobs/mias.py -conf mias.properties -stats
    python jobs/mias.py -conf mias.properties -indocprocess <corpus.parquet> <out.parquet>
    python jobs/mias.py -conf mias.properties -mtermreport <corpus.parquet> [top_n]
    python jobs/mias.py -conf mias.properties -search "<query>" [-page]

Under spark-submit, ship the packages with --py-files (see
jobs/build_index.py header).
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    from mias_spark.config import MiasConfig

    conf = MiasConfig()
    args = list(argv)
    if "-conf" in args:
        i = args.index("-conf")
        conf = MiasConfig.load(args[i + 1])
        del args[i:i + 2]
    if not args:
        print(__doc__)
        return 2
    verb, rest = args[0], args[1:]

    if verb == "-deleteindex":     # S7, Indexing.java:184-204 (no Spark)
        shutil.rmtree(conf.index_dir, ignore_errors=True)
        print(json.dumps({"deleted": conf.index_dir}))
        return 0

    from mias_spark.session import get_spark
    spark = get_spark("mias_cli", cpus=conf.spark_cpus())

    if verb in ("-add", "-overwrite"):
        from mias_spark.build import build_index, index_stats
        from mias_spark.ops import explode_formula_docs, upsert
        corpus = spark.read.parquet(rest[0])
        if conf.formula_docs:
            corpus = explode_formula_docs(corpus)
        manifest = os.path.join(conf.index_dir, "manifest.json")
        if (verb == "-add" and conf.update and os.path.exists(manifest)):
            out = upsert(spark, conf.index_dir, corpus)   # B6
        else:
            if verb == "-overwrite":
                shutil.rmtree(conf.index_dir, ignore_errors=True)
            cat = build_index(spark, corpus, conf.index_dir,
                              n_buckets=conf.n_buckets,
                              doc_limit=conf.doc_limit)
            out = index_stats(cat)
        print(json.dumps(out, default=str))
    elif verb == "-delete":        # S6
        from mias_spark.ops import delete_by_path
        print(json.dumps(
            {"removed": delete_by_path(spark, conf.index_dir, rest[0])}))
    elif verb == "-optimize":      # S8
        from mias_spark.ops import optimize
        print(json.dumps(optimize(spark, conf.index_dir)))
    elif verb == "-compact":       # S8 bounded (our merge-policy mode)
        from mias_spark.ops import compact_until_clean
        print(json.dumps(compact_until_clean(spark, conf.index_dir)))
    elif verb == "-stats":         # S9
        from mias_spark.build import index_stats
        from mias_spark.catalog import Catalog
        print(json.dumps(index_stats(Catalog(spark, conf.index_dir)),
                         default=str))
    elif verb == "-indocprocess":  # S10
        from pyspark.sql import functions as F

        from mias_spark.ops import annotate_mterms
        docs = (spark.read.parquet(rest[0])
                .withColumn("doc_id", F.monotonically_increasing_id()))
        annotate_mterms(docs).write.mode("overwrite").parquet(rest[1])
        print(json.dumps({"annotated_to": rest[1]}))
    elif verb == "-mtermreport":   # P8 ranked formula report
        from pyspark.sql import functions as F

        from mias_spark.ops import mterm_report
        docs = (spark.read.parquet(rest[0])
                .withColumn("doc_id", F.monotonically_increasing_id()))
        top_n = int(rest[1]) if len(rest) > 1 else 50
        rows = mterm_report(docs, top_n=top_n).collect()
        print(json.dumps([r.asDict() for r in rows], default=str))
    elif verb == "-search":
        from mias_spark.search import Engine
        eng = Engine(spark, conf.index_dir)
        # KNOWN flags are stripped before taking the query: `-search
        # -page "q"` must page on q, never search for '-page' — while
        # a query legitimately starting with a MUST_NOT term
        # ("-momentum energy") must still pass through untouched
        known_flags = {"-page"}
        flags = [a for a in rest if a in known_flags]
        qargs = [a for a in rest if a not in known_flags]
        if not qargs:
            print("usage: -search \"<query>\" [-page]")
            return 2
        query = qargs[0]
        if "-page" in flags:
            # Q13 interactive pager (Searching.java:413-459): fetch up
            # to MAXRESULTS once, print 30 hits/page, prompt y/n
            res = eng.search(query, k=conf.max_results, snippets=True)
            print(f"Total hits: {res.total_hits}"
                  + ("+" if res.total_hits_relation == "gte" else ""))
            if not len(res.hits):
                print("-------------\nNothing found\n-------------")
            hits = res.hits.to_dict(orient="records")
            hits_pp, start = 30, 0
            while start < len(hits):
                end = min(start + hits_pp, len(hits))
                for h in hits[start:end]:
                    title = h.get("title") or ""
                    if len(title) > 60:
                        title = title[:60] + " ..."
                    if title:
                        print(title)
                    print(f"id: {h.get('id')}")
                    print(f"Path: {h.get('path')}")
                    print(f"Snippet: {h.get('snippet')}")
                    print("-" * 52)
                print(f"Showing results {start + 1}-{end}")
                if end == len(hits):
                    break
                print("Show next page?(y/n)")
                s = sys.stdin.readline()
                if not s or not s.strip() or s.strip()[0] == "n":
                    break
                start += hits_pp
        else:
            res = eng.search(query, k=min(conf.max_results, 30),
                             snippets=True)
            print(json.dumps({
                "processed_query": res.processed_query,
                "total_hits": res.total_hits,
                "total_hits_relation": res.total_hits_relation,
                "hits": res.hits.to_dict(orient="records"),
            }, default=str))
    else:
        print(__doc__)
        return 2
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
