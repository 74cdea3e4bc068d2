"""Query execution — the Searching.java analog (SURVEY.md §2.4, §3.2).

Driver-side query compile (pure Python, the SAME mias_spec tokenizer as
index time) -> tiny broadcast clause table -> bucket- and term-pruned
scan of postings (or packed blocks) -> BM25 scoring in native Catalyst
expressions (or a vectorized numpy block kernel) -> MUST-group
conjunction -> TakeOrderedAndProject top-k -> doc_store join for display
fields.

Two physical plans, rank-identical by construction:

  mode="df"     : exploded postings + Catalyst; whole-stage codegen,
                  zero Python in the hot path. Baseline + oracle surface.
  mode="blocks" : packed delta-gap varint blocks decoded by a numpy
                  mapInPandas kernel; block-max metadata skips blocks
                  that cannot reach the running top-k floor (block-max
                  pruning; conservative OR-upper-bound threshold).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mias_spark import blocks as blk
from mias_spark.catalog import Catalog
from mias_spec.constants import BM25_B, BM25_K1
from mias_spec.queries import compile_query
from mias_spec.scoring import idf as idf_fn

CLAUSE_SCHEMA = ("term_id long, grp int, boost double, idf double, "
                 "avgdl double, bucket int")


@dataclass
class SearchResult:
    """Searching.java SearchResult analog: hits + totals + timing."""
    hits: pd.DataFrame        # rank, doc_id, score (+ display fields)
    total_groups: int
    query_terms: int
    processed_query: str


class Engine:
    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.cat = Catalog(spark, index_dir)
        props = self.cat.props()
        self.field_stats = props["field_stats"]
        self.n_buckets = props["n_buckets"]

    # ------------------------------------------------------------- compile
    def compile(self, query_text: str, variant: str = "BOTH",
                extract_subformulae: bool = True,
                reduce_weighting: bool = True):
        """Clause table joined with dictionary: one row per query clause
        present in the index. Returns (clauses_df, n_groups,
        processed_query_string, compiled_query)."""
        q = compile_query(query_text, variant, extract_subformulae,
                          reduce_weighting)
        if not q.clauses:
            return pd.DataFrame(columns=[
                "term_id", "grp", "boost", "idf", "avgdl", "bucket"]), 0, "", q
        pairs = sorted({(c.fld, c.term) for c in q.clauses})
        # partition-pruned dictionary lookup: compute each pair's
        # dbucket (tiny local job, no table scan) and read only those
        # partitions — |query terms| buckets instead of the full
        # dictionary (build.py _dbucket; 10^9 terms at target scale)
        from mias_spark.build import N_DICT_BUCKETS
        from mias_spark.hashing import dbucket_py
        dic = self.cat.read("dictionary")
        if "dbucket" in dic.columns:
            # pure-Python xxh64 == F.xxhash64 bit-for-bit: the bucket
            # keys cost zero Spark jobs
            dbuckets = sorted({dbucket_py(f, t, N_DICT_BUCKETS)
                               for f, t in pairs})
            dic = dic.where(F.col("dbucket").isin(dbuckets))
        cond = F.concat_ws("\x00", "field", "term").isin(
            ["\x00".join(p) for p in pairs])
        found = {(r["field"], r["term"]): (r["term_id"], r["df"])
                 for r in dic.where(cond).collect()}
        rows = []
        for c in sorted(q.clauses, key=lambda c: (c.fld, c.term, c.group)):
            hit = found.get((c.fld, c.term))
            if hit is None:
                continue
            tid, df = hit
            st = self.field_stats[c.fld]
            rows.append((int(tid), c.group, float(c.boost),
                         idf_fn(int(st["n_docs"]), int(df)),
                         float(st["avgdl"]), int(tid % self.n_buckets)))
        clauses = pd.DataFrame(rows, columns=[
            "term_id", "grp", "boost", "idf", "avgdl", "bucket"])
        processed = " ".join(
            f"g{c.group}:{c.fld}:{c.term}^{c.boost:.3g}" for c in q.clauses)
        return clauses, q.n_groups, processed, q

    # -------------------------------------------------------------- search
    def search(self, query_text: str, k: int = 10, offset: int = 0,
               variant: str = "BOTH", extract_subformulae: bool = True,
               reduce_weighting: bool = True, mode: str = "df",
               with_fields: bool = True, snippets: bool = False,
               debug: bool = False,
               timeout_s: float | None = None) -> SearchResult:
        """``timeout_s``: Q9 time-limited search (the reference's 30 s
        TimeLimitingCollector, Searching.java:169-200) — cancels the
        Spark job group at the deadline and returns empty partial
        results (the reference returns whatever the collector gathered;
        cancellation granularity here is the whole job)."""
        if timeout_s is not None:
            import threading
            sc = self.spark.sparkContext
            group = f"mias-search-{id(self)}-{threading.get_ident()}"
            sc.setJobGroup(group, query_text[:80], interruptOnCancel=True)
            timer = threading.Timer(
                timeout_s, lambda: sc.cancelJobGroup(group))
            timer.start()
            try:
                return self._search_body(
                    query_text, k, offset, variant, extract_subformulae,
                    reduce_weighting, mode, with_fields, snippets, debug)
            except Exception:
                return SearchResult(
                    pd.DataFrame(columns=["rank", "doc_id", "score"]),
                    0, 0, "(timed out)")
            finally:
                timer.cancel()
                sc.setJobGroup("", "")
        return self._search_body(
            query_text, k, offset, variant, extract_subformulae,
            reduce_weighting, mode, with_fields, snippets, debug)

    def _search_body(self, query_text, k, offset, variant,
                     extract_subformulae, reduce_weighting, mode,
                     with_fields, snippets, debug) -> SearchResult:
        clauses, n_groups, processed, q = self.compile(
            query_text, variant, extract_subformulae, reduce_weighting)
        empty = pd.DataFrame(columns=["rank", "doc_id", "score"])
        if clauses.empty:
            return SearchResult(empty, n_groups, 0, processed)
        if mode == "df":
            scored = self._score_dataframe(clauses)
            top = (
                scored.groupBy("doc_id")
                .agg(F.sum("score").alias("score"),
                     F.countDistinct("grp").alias("_ng"))
                .where(F.col("_ng") == n_groups).drop("_ng")
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(offset + k)
            )
        else:
            top = self._topk_blocks(clauses, k + offset, n_groups)
        hits = top.toPandas().iloc[offset:offset + k].reset_index(drop=True)
        hits.insert(0, "rank", np.arange(offset + 1, offset + 1 + len(hits)))
        if (with_fields or snippets) and len(hits):
            ids = [int(d) for d in hits["doc_id"]]
            cols = ["doc_id", "id", "repo", "path", "title"]
            if snippets:
                cols += ["content", "lang"]
            disp = (self.cat.read("doc_store")
                    .where(F.col("doc_id").isin(ids))
                    .select(*cols)
                    .toPandas())
            hits = hits.merge(disp, on="doc_id", how="left")
            if snippets:
                # Q11: driver-side post-processing over the k result
                # docs only (the reference's snippet thread pool analog,
                # Searching.java:314-399)
                from mias_spec.snippets import make_snippet
                text_terms = sorted({c.term for c in q.clauses
                                     if c.fld in ("content", "title")})
                mterms = {c.term for c in q.clauses
                          if c.fld in ("pmath", "cmath")}
                hits["snippet"] = [
                    make_snippet(ct, lg, text_terms, mterms)
                    for ct, lg in zip(hits["content"], hits["lang"])]
                hits = hits.drop(columns=["content", "lang"])
        if debug and len(hits):
            hits["explain"] = self._explain(clauses, hits, n_groups)
        return SearchResult(hits, n_groups, len(clauses), processed)

    # -------------------------------------------------------------- explain
    def _explain(self, clauses: pd.DataFrame, hits: pd.DataFrame,
                 n_groups: int) -> list[str]:
        """Q12 per-hit score breakdown (Searching.java:328-330): one
        line per matched clause with the BM25 components, recomputed
        from postings for the k hit docs only."""
        ids = [int(d) for d in hits["doc_id"]]
        posts = (
            self.cat.read("postings")
            .where(F.col("bucket").isin([int(b) for b in
                                         set(clauses["bucket"])]))
            .where(F.col("term_id").isin([int(t) for t in
                                          set(clauses["term_id"])]))
            .where(F.col("doc_id").isin(ids))
            .select("term_id", "doc_id", "tf", "wsum", "dl")
            .toPandas())
        dic = {int(r["term_id"]): (r["field"], r["term"]) for r in
               self.cat.read("dictionary")
               .where(F.col("term_id").isin([int(t) for t in
                                             set(clauses["term_id"])]))
               .collect()}
        out = []
        for d in ids:
            sub = posts[posts["doc_id"] == d]
            lines = []
            for c in clauses.itertuples():
                p = sub[sub["term_id"] == c.term_id]
                if p.empty:
                    continue
                tf, wsum, dl = (float(p["tf"].iloc[0]),
                                float(p["wsum"].iloc[0]),
                                float(p["dl"].iloc[0]))
                fld, term = dic[int(c.term_id)]
                s = (c.boost * (wsum / tf) * c.idf * tf * (BM25_K1 + 1.0)
                     / (tf + BM25_K1 * (1.0 - BM25_B
                                        + BM25_B * dl / c.avgdl)))
                lines.append(
                    f"g{c.grp}:{fld}:{term} boost={c.boost:.4g} "
                    f"idf={c.idf:.4g} tf={tf:.0f} dl={dl:.0f} "
                    f"avg_w={wsum / tf:.4g} score={s:.6g}")
            out.append("; ".join(lines))
        return out

    # ---------------------------------------------------- DataFrame scorer
    def _score_dataframe(self, clauses: pd.DataFrame) -> DataFrame:
        cdf = self.spark.createDataFrame(clauses, CLAUSE_SCHEMA)
        posts = (
            self.cat.read("postings")
            .where(F.col("bucket").isin([int(b) for b in
                                         set(clauses["bucket"])]))
            .where(F.col("term_id").isin([int(t) for t in
                                          set(clauses["term_id"])]))
            .select("term_id", "doc_id", "tf", "wsum", "dl")
        )
        tomb = self.cat.tombstones()
        if tomb is not None:
            posts = posts.join(F.broadcast(tomb), "doc_id", "leftanti")
        j = posts.join(F.broadcast(cdf.drop("bucket")), "term_id")
        tfd = F.col("tf").cast("double")
        score = (
            F.col("boost") * (F.col("wsum") / tfd) * F.col("idf")
            * tfd * (BM25_K1 + 1.0)
            / (tfd + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl")
                                / F.col("avgdl")))
        )
        return j.select("doc_id", "grp", score.alias("score"))

    # ---------------------------------------------- block-max top-k scorer
    def _topk_blocks(self, clauses: pd.DataFrame, topn: int,
                     n_groups: int) -> DataFrame:
        """Doc-sharded block-max top-k over the packed posting blocks.

        Physical plan (the WAND-style scale path, SURVEY.md §2.4 Q8):

        1. partition-pruned scan of the query terms' blocks (bucket
           predicate + term_id min/max skipping on parquet),
        2. driver-side pruning metadata from one TINY window query over
           block stats (<= n_terms * topn rows): a safe score floor
           ``theta`` — the topn-th largest block-max of a single term is
           achieved by topn distinct docs (blocks of one term are
           doc-disjoint), so the topn-th best total is at least it —
           and per-term upper bounds; a block of term t is skipped when
           ``boost_t*max_score + sum_{u!=t} UB_u < theta`` (pushed down
           as a Catalyst filter on block metadata, so skipped blocks'
           binary columns are never even read),
        3. blocks exploded to the doc-range shards they overlap and
           hash-repartitioned by shard — every doc's complete postings
           land in exactly one task (ONE narrow shuffle of compressed
           blocks; no exploded-posting shuffle, no global groupBy),
        4. a vectorized numpy kernel per partition: decode, mask to own
           shard, accumulate (doc, grp) partial sums in sorted term
           order (deterministic float accumulation), enforce the
           MUST-group conjunction, emit the partition-local top-n only,
        5. driver merge of <= n_shards * topn rows.

        theta > 0 only for single-group queries: a block-max achieving
        doc may fail a multi-group conjunction, so its score is not a
        valid floor there (documented divergence; conjunction still
        benefits from steps 3-5).
        """
        terms = [int(t) for t in set(clauses["term_id"])]
        buckets = [int(b) for b in set(clauses["bucket"])]
        bdf = (self.cat.read("blocks")
               .where(F.col("bucket").isin(buckets))
               .where(F.col("term_id").isin(terms)))
        cmap: dict[int, list[tuple[int, float]]] = {}
        for r in clauses.itertuples():
            cmap.setdefault(int(r.term_id), []).append(
                (int(r.grp), float(r.boost)))
        max_boost = {t: max(b for _, b in es) for t, es in cmap.items()}

        # ---- driver metadata: ONE tiny agg job over block stats columns
        # (per-term top-n block maxes + doc extent; <= n_terms rows back).
        # collect_list is over block-LEVEL stats (df/BLOCK_SIZE values per
        # term); if a term's block count itself becomes driver-hostile
        # (df >> 10^9), swap this agg for a bounded two-level top-n merge.
        # pack-time bounds rescaled to CURRENT stats PER BLOCK: score is
        # linear in idf, so max_score * idf_fresh/idf0 is an exact bound
        # even for stale segments (delta appends moved global df/N)
        fresh_df = self.spark.createDataFrame(
            clauses[["term_id", "idf"]].drop_duplicates("term_id"),
            "term_id long, fidf double")
        if "idf0" not in bdf.columns:     # pre-idf0 index: scale = 1
            bdf = bdf.withColumn("idf0", F.lit(None).cast("double"))
        adj = (F.col("max_score") * F.col("fidf")
               / F.greatest(F.coalesce("idf0", "fidf"), F.lit(1e-12)))
        mrows = (bdf.join(F.broadcast(fresh_df), "term_id")
                 .groupBy("term_id").agg(
            F.slice(F.sort_array(F.collect_list(adj), False),
                    1, topn).alias("tops"),
            F.count("*").alias("nb"),
            F.min("first_doc").alias("blo"),
            F.max("last_doc").alias("bhi"))).collect()
        if not mrows:
            return self.spark.createDataFrame(
                [], "doc_id long, score double")
        lo = min(int(r["blo"]) for r in mrows)
        hi = max(int(r["bhi"]) for r in mrows)
        tomb = self.cat.tombstones()
        dead = (np.sort(np.array(
            [r["doc_id"] for r in tomb.collect()], dtype=np.int64))
            if tomb is not None else None)
        theta = 0.0
        # a tombstoned doc may be the block-max achiever, so the floor
        # is only a valid lower bound on a CLEAN index; `optimize`
        # restores pruning after deletes
        if n_groups == 1 and (dead is None or len(dead) == 0):
            for r in mrows:
                if int(r["nb"]) >= topn:
                    theta = max(theta, r["tops"][topn - 1]
                                * max_boost[int(r["term_id"])])
        ub = {int(r["term_id"]): r["tops"][0] * max_boost[int(r["term_id"])]
              for r in mrows}
        sum_ub = sum(ub.values())

        # ---- block-skip filter pushed into the scan (metadata columns)
        if theta > 0.0:
            rest = {t: sum_ub - u for t, u in ub.items()}
            rest_df = self.spark.createDataFrame(
                [(t, float(rest[t]), float(max_boost[t])) for t in rest],
                "term_id long, rest double, mboost double")
            bdf = (bdf.join(F.broadcast(rest_df), "term_id")
                   .join(F.broadcast(fresh_df), "term_id")
                   .where(F.col("mboost") * adj + F.col("rest") >= theta)
                   .drop("rest", "mboost", "fidf"))

        # ---- doc-range sharding: each block joins every shard it spans
        span = max(hi - lo + 1, 1)
        n_shards = max(self.spark.sparkContext.defaultParallelism, 1)
        # integer DIV on both sides (Catalyst + numpy) — double floor()
        # drifts at 10^12-doc scale
        s_of = lambda c: F.expr(  # noqa: E731
            f"({c} - {lo}L) * {n_shards}L div {span}L")
        sharded = (bdf.withColumn("shard", F.explode(F.sequence(
            s_of("first_doc"),
            F.least(s_of("last_doc"), F.lit(n_shards - 1)))))
            .repartition(n_shards, "shard"))

        cdf = self.spark.createDataFrame(
            clauses[["term_id", "idf", "avgdl"]].drop_duplicates("term_id"),
            "term_id long, idf double, avgdl double")
        withmeta = sharded.join(F.broadcast(cdf), "term_id")
        gmult = 1 << max(int(n_groups).bit_length(), 1)
        bc = self.spark.sparkContext.broadcast(
            (cmap, n_groups, topn, lo, span, n_shards, gmult, dead))

        def kernel(batches):
            cmap_l, ngroups, n_top, lo_l, span_l, ns, gm, dead_l = bc.value
            acc_docs, acc_grps, acc_scores, order = [], [], [], []
            for pdf in batches:
                for row in pdf.itertuples():
                    entries = cmap_l.get(int(row.term_id))
                    if not entries:
                        continue
                    docs, tfs, dls, ws = blk.unpack_block(row)
                    mask = ((docs - lo_l) * ns // span_l) == row.shard
                    if dead_l is not None and len(dead_l):
                        # liveDocs filter: drop tombstoned docs
                        idx = np.searchsorted(dead_l, docs)
                        idx[idx == len(dead_l)] = 0
                        mask &= dead_l[idx] != docs
                    if not mask.any():
                        continue
                    docs, tfs, dls, ws = (docs[mask], tfs[mask],
                                          dls[mask], ws[mask])
                    tf = tfs.astype(np.float64)
                    base = (ws / tf) * row.idf * tf * (BM25_K1 + 1.0) / (
                        tf + BM25_K1 * (1.0 - BM25_B
                                        + BM25_B * dls / row.avgdl))
                    for grp, boost in entries:
                        acc_docs.append(docs)
                        acc_grps.append(np.full(len(docs), grp, np.int64))
                        acc_scores.append(boost * base)
                        order.append((int(row.term_id), int(row.salt),
                                      int(row.block_ord), grp))
            if not acc_docs:
                return
            # deterministic accumulation: concatenate in (term, salt,
            # block, grp) order so float sums match across plans/runs
            perm = sorted(range(len(order)), key=lambda i: order[i])
            docs = np.concatenate([acc_docs[i] for i in perm])
            grps = np.concatenate([acc_grps[i] for i in perm])
            scores = np.concatenate([acc_scores[i] for i in perm])
            key = docs * gm + grps
            uk, inv = np.unique(key, return_inverse=True)
            gsum = np.zeros(len(uk))
            np.add.at(gsum, inv, scores)
            udoc = uk // gm
            ddocs, dinv = np.unique(udoc, return_inverse=True)
            tot = np.zeros(len(ddocs))
            np.add.at(tot, dinv, gsum)
            gcnt = np.zeros(len(ddocs), np.int64)
            np.add.at(gcnt, dinv, 1)
            ok = gcnt == ngroups
            ddocs, tot = ddocs[ok], tot[ok]
            if len(ddocs) > n_top:
                part = np.lexsort((ddocs, -tot))[:n_top]
                ddocs, tot = ddocs[part], tot[part]
            yield pd.DataFrame({"doc_id": ddocs.astype(np.int64),
                                "score": tot})

        local = withmeta.mapInPandas(kernel, "doc_id long, score double")
        return (local.orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(topn))
