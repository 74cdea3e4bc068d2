"""Oracle-checked query suite — every entry is (spark_fn, duckdb_sql).

Each ``spark_fn(spark, sf_dir) -> DataFrame`` is idiomatic DataFrame API
(native functions only — the hot path never enters Python); the paired
SQL string is the ANSI equivalent DuckDB runs on the same parquet for
the driver's CORRECTNESS gate. Column names/types are aligned on both
sides; floats are rounded BEFORE ranking so rank tie-breaks agree.

Contents:
  ir_*          the SQL-expressible core of the index engine (token tf,
                dictionary df, norms, BM25 top-k incl. conjunctive AND)
                over the driver-provided `documents` table
  dedup_*       exact (md5), MinHash-band candidates, SimHash-16,
                n-gram Jaccard — training-data dedup family
  ann_* / lsh_* embedding similarity: brute-force cosine top-k + sign-LSH
  lang_/quality_/token_/fingerprint_  text-analysis family
  tpch_* / events_*  relational + windowed coverage (joins, agg, windows)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mias_spec.analyzer import stopword_sql_list
from mias_spec.constants import STOPWORDS

STOP_SQL = stopword_sql_list()
TOKEN_SPLIT = "[^a-z0-9_]+"

# ---------------------------------------------------------------- helpers


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exploded analyzed tokens of `documents.text` — mirrors
    mias_spec.analyzer with native functions (SQL-portable)."""
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(
            F.split(F.lower("text"), TOKEN_SPLIT)).alias("term"))
        .where((F.col("term") != "") & ~F.col("term").isin(
            *sorted(STOPWORDS)))
    )


_TOKENS_SQL = f"""
    SELECT doc_id, t.term AS term
    FROM documents, unnest(string_split_regex(lower(text), '{TOKEN_SPLIT}')) AS t(term)
    WHERE t.term <> '' AND t.term NOT IN ({STOP_SQL})
"""

# BM25 over documents.text: one field, spec constants
_BM25_CTES = f"""
    WITH toks AS ({_TOKENS_SQL}),
    tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
           FROM toks GROUP BY doc_id, term),
    norms AS (SELECT doc_id, count(*)::BIGINT AS dl
              FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM norms),
    dict AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term)
"""


def _bm25_scored(spark: SparkSession, sf_dir: str, terms: list[str],
                 conjunctive: bool) -> DataFrame:
    toks = _tokens(spark, sf_dir)
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    norms = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    st = norms.agg(F.count("*").alias("n_docs"),
                   F.avg("dl").alias("avgdl")).collect()[0]
    n_docs, avgdl = int(st["n_docs"]), float(st["avgdl"])
    dic = tf.groupBy("term").agg(F.count("*").alias("df"))
    q = tf.where(F.col("term").isin(terms)).join(F.broadcast(
        dic.where(F.col("term").isin(terms))), "term").join(norms, "doc_id")
    tfd = F.col("tf").cast("double")
    idf = F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    score = idf * tfd * 2.2 / (tfd + 1.2 * (0.25 + 0.75 * F.col("dl") / avgdl))
    per_term = q.select("doc_id", "term", score.alias("s"))
    agg = per_term.groupBy("doc_id").agg(
        F.round(F.sum("s"), 4).alias("score"),
        F.countDistinct("term").alias("nt"))
    if conjunctive:
        agg = agg.where(F.col("nt") == len(terms))
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (agg.select("doc_id", "score", F.row_number().over(w).alias("rank"))
            .where(F.col("rank") <= 20))


def _bm25_sql(terms: list[str], conjunctive: bool) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    having = f"HAVING count(DISTINCT term) = {len(terms)}" if conjunctive else ""
    return f"""
    {_BM25_CTES},
    scored AS (
      SELECT tf.doc_id,
             ln(1.0 + (stats.n_docs - dict.df + 0.5) / (dict.df + 0.5))
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (0.25 + 0.75 * norms.dl / stats.avgdl)) AS s,
             tf.term
      FROM tf JOIN dict ON tf.term = dict.term
              JOIN norms ON tf.doc_id = norms.doc_id
              CROSS JOIN stats
      WHERE tf.term IN ({tlist})
    ),
    agg AS (
      SELECT doc_id, round(sum(s), 4) AS score
      FROM scored GROUP BY doc_id {having}
    )
    SELECT doc_id, score, rank FROM (
      SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM agg) WHERE rank <= 20
    """


# ------------------------------------------------------------------ IR core

def ir_doc_stats(spark, sf_dir):
    """S9 stats analog (Indexing.java:246-272) over the documents table."""
    return (_docs(spark, sf_dir).groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars")))


IR_DOC_STATS_SQL = """
    SELECT lang, count(*)::BIGINT AS n_docs,
           sum(n_chars)::BIGINT AS total_chars,
           round(avg(n_chars), 4) AS avg_chars
    FROM documents GROUP BY lang
"""


def ir_term_tf(spark, sf_dir):
    """B1 token->posting aggregation: per-(doc, term) tf."""
    return _tokens(spark, sf_dir).groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"))


IR_TERM_TF_SQL = f"""
    {_BM25_CTES} SELECT doc_id, term, tf FROM tf
"""


def ir_dictionary_df(spark, sf_dir):
    """B2 dictionary: term -> document frequency."""
    t = _tokens(spark, sf_dir).groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"))
    return t.groupBy("term").agg(F.count("*").alias("df"))


IR_DICTIONARY_DF_SQL = f"{_BM25_CTES} SELECT term, df FROM dict"


def ir_doc_norms(spark, sf_dir):
    """B5 length norms per doc."""
    return _tokens(spark, sf_dir).groupBy("doc_id").agg(
        F.count("*").alias("dl"))


IR_DOC_NORMS_SQL = f"{_BM25_CTES} SELECT doc_id, dl FROM norms"


def ir_bm25_topk(spark, sf_dir):
    """Q6/Q8: single-term BM25 top-20 (DataFrame fallback scorer)."""
    return _bm25_scored(spark, sf_dir, ["spark"], False)


IR_BM25_TOPK_SQL = _bm25_sql(["spark"], False)


def ir_bm25_multiterm(spark, sf_dir):
    """Q5 disjunction: OR-union, scores summed."""
    return _bm25_scored(spark, sf_dir, ["spark", "join", "merge"], False)


IR_BM25_MULTITERM_SQL = _bm25_sql(["spark", "join", "merge"], False)


def ir_bm25_conjunctive(spark, sf_dir):
    """Q4 conjunction (MUST ∧ MUST): docs matching every term."""
    return _bm25_scored(spark, sf_dir, ["spark", "join"], True)


IR_BM25_CONJUNCTIVE_SQL = _bm25_sql(["spark", "join"], True)


def ir_phrase(spark, sf_dir):
    """Q3 phrase query over the documents table: docs where 'table'
    is immediately followed by 'part' at consecutive analyzer positions
    (positions assigned AFTER stopword removal — the engine's
    PhraseClause spec); BM25 with tf = phrase occurrences and idf =
    sum of the constituent idfs (Lucene PhraseQuery convention)."""
    import math
    t1, t2 = "table", "part"
    stop = sorted(STOPWORDS)
    raw = (_docs(spark, sf_dir)
           .select("doc_id", F.posexplode(
               F.split(F.lower("text"), TOKEN_SPLIT)).alias("p", "term"))
           .where((F.col("term") != "") & ~F.col("term").isin(stop)))
    w = Window.partitionBy("doc_id").orderBy("p")
    post = raw.withColumn("pos", F.row_number().over(w))
    a = post.where(F.col("term") == t1).select("doc_id", "pos")
    b = post.where(F.col("term") == t2).select(
        "doc_id", F.col("pos").alias("pos2"))
    ptf = (a.join(b, ["doc_id"])
           .where(F.col("pos2") == F.col("pos") + 1)
           .groupBy("doc_id").agg(F.count("*").alias("ptf")))
    toks = _tokens(spark, sf_dir)
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    norms = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    st = norms.agg(F.count("*").alias("n_docs"),
                   F.avg("dl").alias("avgdl")).collect()[0]
    n_docs, avgdl = int(st["n_docs"]), float(st["avgdl"])
    dfs = {r["term"]: int(r["df"]) for r in
           tf.where(F.col("term").isin([t1, t2])).groupBy("term")
           .agg(F.count("*").alias("df")).collect()}
    idf_p = sum(math.log(1.0 + (n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5))
                for t in (t1, t2))
    ptfd = F.col("ptf").cast("double")
    score = (F.lit(idf_p) * ptfd * 2.2
             / (ptfd + 1.2 * (0.25 + 0.75 * F.col("dl") / avgdl)))
    scored = (ptf.join(norms, "doc_id")
              .select("doc_id", F.round(score, 4).alias("score")))
    wr = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(wr))
            .where(F.col("rank") <= 20))


IR_PHRASE_SQL = f"""
    {_BM25_CTES},
    lst AS (SELECT doc_id, string_split_regex(lower(text), '{TOKEN_SPLIT}') AS l
            FROM documents),
    raw AS (SELECT doc_id, l[i] AS term, i AS ord
            FROM lst, unnest(range(1, len(l) + 1)) AS g(i)
            WHERE l[i] <> '' AND l[i] NOT IN ({STOP_SQL})),
    post AS (SELECT doc_id, term,
                    row_number() OVER (PARTITION BY doc_id ORDER BY ord) AS pos
             FROM raw),
    ptf AS (SELECT a.doc_id, count(*)::BIGINT AS ptf
            FROM post a JOIN post b
              ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
             AND a.term = 'table' AND b.term = 'part'
            GROUP BY a.doc_id),
    idfs AS (SELECT sum(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))) AS idf_p
             FROM dict d CROSS JOIN stats s WHERE d.term IN ('table', 'part')),
    scored AS (SELECT ptf.doc_id,
                      round(idfs.idf_p * ptf.ptf * 2.2
                            / (ptf.ptf + 1.2 * (0.25 + 0.75 * norms.dl / stats.avgdl)),
                            4) AS score
               FROM ptf JOIN norms ON ptf.doc_id = norms.doc_id
               CROSS JOIN stats CROSS JOIN idfs)
    SELECT doc_id, score, rank FROM (
      SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM scored) WHERE rank <= 20
"""


def ir_delete_semantics(spark, sf_dir):
    """S6 delete-by-predicate: surviving doc counts per lang after
    DELETE WHERE source='src0'."""
    return (_docs(spark, sf_dir).where(F.col("source") != "src0")
            .groupBy("lang").agg(F.count("*").alias("n_docs")))


IR_DELETE_SEMANTICS_SQL = """
    SELECT lang, count(*)::BIGINT AS n_docs FROM documents
    WHERE source <> 'src0' GROUP BY lang
"""


# --------------------------------------------------- engine end-to-end
# The rows above restate the scoring pipeline in plain DataFrame ops;
# these two entries put the PRODUCT PATH itself behind the independent
# DuckDB gate (VERDICT r4 #1; reference analog: CI runs the real `mias`
# binary, script/github-test:5-9): a real build_index over the
# documents table, then Engine.search through each physical plan. The
# engine's dense doc_ids are mapped back to source ids via the path
# column, and ranking is recomputed on (rounded score, source doc_id)
# so tie order is independent of the engine's internal id assignment.

#: sf_dir -> built index dir (one build per process, shared by both
#: engine entries and any repeat invocation)
_ENGINE_IX: dict[str, str] = {}


def _engine_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> corpus(repo, path, commit, lang, content); the
    source doc_id is recoverable from the path."""
    return _docs(spark, sf_dir).select(
        F.concat(F.lit("corpus/"), "source").alias("repo"),
        F.concat(F.lit("docs/doc_"), F.col("doc_id").cast("string"),
                 F.lit(".txt")).alias("path"),
        F.lit("0" * 40).alias("commit"),
        F.lit("text").alias("lang"),
        F.col("text").alias("content"))


def _engine_index(spark: SparkSession, sf_dir: str) -> str:
    import hashlib
    import os
    import shutil
    import tempfile

    from mias_spark.build import build_index
    key = sf_dir.rstrip("/")
    ix = _ENGINE_IX.get(key)
    if ix is None:
        h = hashlib.sha256(key.encode()).hexdigest()[:12]
        ix = os.path.join(tempfile.gettempdir(), f"mias_oracle_ix_{h}")
        # a leftover dir from a prior process may not match the data
        shutil.rmtree(ix, ignore_errors=True)
        build_index(spark, _engine_corpus(spark, sf_dir), ix, n_buckets=4)
        _ENGINE_IX[key] = ix
    return ix


def _engine_search_topk(spark: SparkSession, sf_dir: str, query: str,
                        mode: str) -> DataFrame:
    from mias_spark.search import Engine
    ix = _engine_index(spark, sf_dir)
    eng = Engine(spark, ix)
    # k >> corpus so the hit SET is complete (tie order at a top-k
    # boundary would otherwise depend on internal ids); text docs have
    # an empty title, so a bare term scores exactly its content clause
    res = eng.search(query, k=1_000_000, mode=mode, with_fields=True)
    hits = res.hits
    if not len(hits):
        return spark.createDataFrame(
            [], "doc_id long, score double, rank int")
    sdf = spark.createDataFrame(hits[["path", "score"]])
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (sdf.select(
        F.regexp_extract("path", r"doc_(\d+)\.txt", 1)
        .cast("long").alias("doc_id"),
        F.round("score", 4).alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 20))


def ir_engine_topk(spark, sf_dir):
    """Real Engine.search, df plan (Catalyst scorer): single-term BM25
    top-20 over an index built from the documents table."""
    return _engine_search_topk(spark, sf_dir, "spark", "df")


IR_ENGINE_TOPK_SQL = _bm25_sql(["spark"], False)


def ir_engine_topk_blocks(spark, sf_dir):
    """Real Engine.search, blocks plan (packed delta-gap varint blocks
    + numpy kernel): the query compiler makes every bare term a MUST
    group, so 'spark join merge' is a 3-way conjunction with summed
    scores."""
    return _engine_search_topk(spark, sf_dir, "spark join merge",
                               "blocks")


IR_ENGINE_TOPK_BLOCKS_SQL = _bm25_sql(["spark", "join", "merge"], True)


def ir_engine_phrase(spark, sf_dir):
    """Real Engine.search, FUSED blocks plan (round 5): the phrase
    '"table part"' decodes positions from pos_bytes, verifies
    adjacency and scores INSIDE the sharded block kernel
    (`_phrase_prepass`) — the newest query path, behind the same
    independent DuckDB gate as the term scorers. The oracle restates
    the PhraseClause spec (positions after stopword removal, tf =
    phrase occurrences, idf = sum of constituent idfs) directly over
    the documents table — IR_PHRASE_SQL, unchanged."""
    return _engine_search_topk(spark, sf_dir, '"table part"', "blocks")


IR_ENGINE_PHRASE_SQL = IR_PHRASE_SQL


# ------------------------------------------------------------------- dedup

def dedup_exact(spark, sf_dir):
    """Exact dedup: md5(text) buckets with >1 member; keeper = min id."""
    return (_docs(spark, sf_dir)
            .groupBy(F.md5("text").alias("content_hash"))
            .agg(F.count("*").alias("n_dups"),
                 F.min("doc_id").alias("keeper"))
            .where(F.col("n_dups") > 1))


DEDUP_EXACT_SQL = """
    SELECT md5(text) AS content_hash, count(*)::BIGINT AS n_dups,
           min(doc_id)::BIGINT AS keeper
    FROM documents GROUP BY md5(text) HAVING count(*) > 1
"""

_N_HASH = 8          # minhash signature length
_SHINGLE_K = 12      # char-shingle width


def _shingles(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id", "text")
    return d.select(
        "doc_id",
        F.explode(F.expr(
            f"transform(sequence(1, greatest(length(text)-{_SHINGLE_K - 1}, 1)),"
            f" i -> substring(text, i, {_SHINGLE_K}))")).alias("sh"))


_SHINGLES_SQL = f"""
    SELECT doc_id, substring(text, i, {_SHINGLE_K}) AS sh
    FROM documents,
         unnest(range(1, greatest(length(text)-{_SHINGLE_K - 1}, 1) + 1)) AS g(i)
"""


#: max members per (band, key) bucket that enter the all-pairs join.
#: Boilerplate-heavy corpora produce degenerate bands whose m members
#: would emit m^2 candidate pairs; members beyond the cap (doc_id order,
#: deterministic) are dropped and counted, bounding any bucket's output
#: at cap^2 — the B4 skew-salting idea applied to LSH banding. The cap
#: sits far above the test fixtures' max bucket, so oracled results are
#: unaffected there.
_BAND_CAP = 1024


def dedup_minhash(spark, sf_dir):
    """MinHash + LSH banding: ONE md5 per shingle, its 32-hex digest
    sliced into 8 independent 4-hex lanes (one-permutation-hashing
    style — 8x less hashing than seed-prefixed md5s); per-doc signature
    = per-lane min; 4 bands of 2 -> candidate pairs sharing >=1 band.
    Band buckets larger than _BAND_CAP are truncated (dropped members
    surface in the named observation below)."""
    sh = (_shingles(spark, sf_dir)
          .withColumn("h", F.concat(F.md5("sh"),
                                    F.md5(F.concat(F.lit("x"), "sh")))))
    aggs = [F.min(F.substring("h", 8 * j + 1, 8)).alias(f"h{j}")
            for j in range(_N_HASH)]
    sig = sh.groupBy("doc_id").agg(*aggs)
    bands = sig.select("doc_id", F.explode(F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.md5(F.concat(F.col(f"h{2*b}"), F.col(f"h{2*b+1}")))
                 .alias("key"))
        for b in range(_N_HASH // 2)])).alias("bk")) \
        .select("doc_id", "bk.band", "bk.key")
    w = Window.partitionBy("band", "key").orderBy("doc_id")
    ranked = (bands.withColumn("rnk", F.row_number().over(w))
              # truncation is VISIBLE: the named metric records how
              # many bucket members were dropped (0 on healthy data)
              .observe("minhash_band_cap",
                       F.sum(F.when(F.col("rnk") > _BAND_CAP, 1)
                             .otherwise(0)).alias("dropped_members")))
    capped = ranked.where(F.col("rnk") <= _BAND_CAP).drop("rnk")
    # pair generation WITHOUT a self-join: same measured cost as the
    # join shape at sf0.1 (the signature pipeline dominates either
    # way), but this does not depend on ReuseExchange recognizing the
    # two join sides as identical — AQE re-optimization can break that
    # and silently double the heavy signature computation. Bucket
    # members collect into a sorted array — bounded by the cap applied
    # ABOVE, so no degenerate-bucket OOM — and pairs expand with array
    # transforms; the groupBy reuses the window's (band, key) hash
    # partitioning (no extra shuffle).
    grouped = (capped.groupBy("band", "key")
               .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
               .where(F.size("ids") >= 2))
    pairs = grouped.select(F.explode(F.expr(
        "flatten(transform(ids, (x, i) -> transform("
        "slice(ids, i + 2, size(ids)), "
        "y -> struct(x AS doc_a, y AS doc_b))))")).alias("p"))
    return (pairs.groupBy(F.col("p.doc_a").alias("doc_a"),
                          F.col("p.doc_b").alias("doc_b"))
            .agg(F.count("*").alias("n_bands")))


_SIG_COLS = ", ".join(
    f"min(substring(h, {8 * j + 1}, 8)) AS h{j}" for j in range(_N_HASH))
_BAND_SELECTS = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, md5(h{2*b} || h{2*b+1}) AS key FROM sig"
    for b in range(_N_HASH // 2))
DEDUP_MINHASH_SQL = f"""
    WITH shingles AS (SELECT doc_id, md5(sh) || md5('x' || sh) AS h
                      FROM ({_SHINGLES_SQL})),
    sig AS (SELECT doc_id, {_SIG_COLS} FROM shingles GROUP BY doc_id),
    bands AS ({_BAND_SELECTS})
    SELECT a.doc_id::BIGINT AS doc_a, b.doc_id::BIGINT AS doc_b,
           count(*)::BIGINT AS n_bands
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
"""


def dedup_simhash(spark, sf_dir):
    """SimHash-16: bit j votes +1/-1 by the j-th hex digit of md5(term);
    near-dups share a fingerprint."""
    t = _tokens(spark, sf_dir).withColumn("h", F.md5("term"))
    bits = [F.sum(F.when(F.substring("h", j + 1, 1) >= "8", 1)
                  .otherwise(-1)).alias(f"b{j}") for j in range(16)]
    per_doc = t.groupBy("doc_id").agg(*bits)
    sim = None
    for j in range(16):
        term = F.when(F.col(f"b{j}") > 0, 2 ** j).otherwise(0)
        sim = term if sim is None else sim + term
    return per_doc.select("doc_id", sim.cast("long").alias("simhash"))


_SIM_BITS = " + ".join(
    f"(CASE WHEN sum(CASE WHEN substring(h, {j + 1}, 1) >= '8' "
    f"THEN 1 ELSE -1 END) > 0 THEN {2 ** j} ELSE 0 END)"
    for j in range(16))
DEDUP_SIMHASH_SQL = f"""
    WITH toks AS ({_TOKENS_SQL}),
    h AS (SELECT doc_id, md5(term) AS h FROM toks)
    SELECT doc_id, ({_SIM_BITS})::BIGINT AS simhash FROM h GROUP BY doc_id
"""


def ngram_jaccard(spark, sf_dir):
    """Token-3-gram Jaccard of consecutive doc pairs (doc_id < 500) —
    the verification step of near-dup candidates."""
    sh = (_shingles(spark, sf_dir)
          .where(F.col("doc_id") < 500).distinct())
    a, b = sh.alias("a"), sh.alias("b")
    inter = (a.join(b, (F.col("a.sh") == F.col("b.sh"))
                    & (F.col("b.doc_id") == F.col("a.doc_id") + 1))
             .groupBy(F.col("a.doc_id").alias("doc_a"))
             .agg(F.count("*").alias("inter")))
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    return (inter
            .join(counts.withColumnRenamed("doc_id", "doc_a"), "doc_a")
            .withColumnRenamed("n", "na")
            .join(counts.withColumn("doc_a", F.col("doc_id") - 1)
                  .select("doc_a", F.col("n").alias("nb")), "doc_a")
            .select("doc_a",
                    F.round(F.col("inter")
                            / (F.col("na") + F.col("nb") - F.col("inter")),
                            4).alias("jaccard")))


NGRAM_JACCARD_SQL = f"""
    WITH shingles AS (
      SELECT DISTINCT doc_id, sh FROM ({_SHINGLES_SQL}) WHERE doc_id < 500),
    counts AS (SELECT doc_id, count(*)::BIGINT AS n FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, count(*)::BIGINT AS inter
      FROM shingles a JOIN shingles b
        ON a.sh = b.sh AND b.doc_id = a.doc_id + 1
      GROUP BY a.doc_id)
    SELECT i.doc_a::BIGINT AS doc_a,
           round(i.inter / (ca.n + cb.n - i.inter), 4) AS jaccard
    FROM inter i JOIN counts ca ON ca.doc_id = i.doc_a
                 JOIN counts cb ON cb.doc_id = i.doc_a + 1
"""


# -------------------------------------------------------------- similarity

_DIM = 64
_NQ = 5   # first _NQ vec_ids are the query set


def ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 per query vector (the ANN baseline;
    scale path = lsh_cosine_buckets)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    dot = F.expr("aggregate(zip_with(qe, embedding, (x, y) -> "
                 "cast(x AS double) * cast(y AS double)), 0D, "
                 "(acc, v) -> acc + v)")
    nq = F.expr("sqrt(aggregate(qe, 0D, (acc, v) -> "
                "acc + cast(v AS double) * cast(v AS double)))")
    ne = F.expr("sqrt(aggregate(embedding, 0D, (acc, v) -> "
                "acc + cast(v AS double) * cast(v AS double)))")
    scored = (emb.crossJoin(F.broadcast(q))
              .where(F.col("vec_id") != F.col("qid"))
              .select("qid", "vec_id",
                      F.round(dot / (nq * ne), 4).alias("cosine")))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 10))


ANN_COSINE_TOPK_SQL = f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
               WHERE vec_id < {_NQ}),
    pairs AS (
      SELECT q.qid, e.vec_id,
             round(
               (SELECT sum(CAST(q.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
                FROM generate_series(1, {_DIM}) AS g(i))
               / (sqrt((SELECT sum(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))
                        FROM generate_series(1, {_DIM}) AS g(i)))
                  * sqrt((SELECT sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
                          FROM generate_series(1, {_DIM}) AS g(i)))), 4) AS cosine
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid)
    SELECT qid::BIGINT AS qid, vec_id::BIGINT AS vec_id, cosine, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY cosine DESC, vec_id) AS rank
      FROM pairs) WHERE rank <= 10
"""


def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup candidates: vector pairs above a
    cosine threshold (the verification step after LSH bucketing)."""
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .where(F.col("vec_id") < 200))
    a = emb.select(F.col("vec_id").alias("vec_a"),
                   F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"),
                   F.col("embedding").alias("eb"))
    dot = F.expr("aggregate(zip_with(ea, eb, (x, y) -> "
                 "cast(x AS double) * cast(y AS double)), 0D, "
                 "(acc, v) -> acc + v)")
    na = F.expr("sqrt(aggregate(ea, 0D, (acc, v) -> "
                "acc + cast(v AS double) * cast(v AS double)))")
    nb = F.expr("sqrt(aggregate(eb, 0D, (acc, v) -> "
                "acc + cast(v AS double) * cast(v AS double)))")
    return (a.join(b, F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b",
                    F.round(dot / (na * nb), 4).alias("cosine"))
            .where(F.col("cosine") > 0.25))


DEDUP_EMBEDDING_COSINE_SQL = f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             round(
               (SELECT sum(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))
                FROM generate_series(1, {_DIM}) AS g(i))
               / (sqrt((SELECT sum(CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))
                        FROM generate_series(1, {_DIM}) AS g(i)))
                  * sqrt((SELECT sum(CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))
                          FROM generate_series(1, {_DIM}) AS g(i)))), 4) AS cosine
      FROM q a JOIN q b ON a.vec_id < b.vec_id)
    SELECT vec_a::BIGINT AS vec_a, vec_b::BIGINT AS vec_b, cosine
    FROM pairs WHERE cosine > 0.25
"""


def lsh_cosine_buckets(spark, sf_dir):
    """Sign-LSH over 8 fixed coordinates: bucket histogram (the bucketed
    candidate-generation path for ANN at scale)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bucket = None
    for i in range(8):
        bit = F.when(F.element_at("embedding", i + 1) > 0, 2 ** i).otherwise(0)
        bucket = bit if bucket is None else bucket + bit
    return (emb.select(bucket.cast("long").alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("n_vecs")))


_LSH_BITS = " + ".join(
    f"(CASE WHEN embedding[{i + 1}] > 0 THEN {2 ** i} ELSE 0 END)"
    for i in range(8))
LSH_COSINE_BUCKETS_SQL = f"""
    SELECT ({_LSH_BITS})::BIGINT AS bucket, count(*)::BIGINT AS n_vecs
    FROM embeddings GROUP BY 1
"""

# ---- assembled bucketed ANN: multi-table sign-LSH -> candidate pairs
# -> exact cosine verify -> top-k. THE scale path replacing the
# ann_cosine_topk crossJoin at 10^9 vectors: candidate generation is a
# (table, bucket) equi-join, verification touches candidates only.
# 24 tables x 4 hash-chosen coordinate signs -> measured recall@10 >=
# 0.9 vs the brute-force oracle on both fixture sets (tests/
# test_suite_ann.py). The fixture embeddings are near-random (worst
# case for LSH — candidate reduction is ~33%); clustered real
# embeddings concentrate buckets and prune far harder, and the
# verify stage cost is |candidates|, never |corpus|^2.
_ANN_TABLES = 24
_ANN_BITS = 4


def _ann_coord(t: int, i: int) -> int:
    """Deterministic hash-chosen coordinate for table t, bit i —
    IDENTICAL in the Spark plan and the DuckDB oracle."""
    import hashlib
    return int.from_bytes(
        hashlib.md5(f"lsh:{t}:{i}".encode()).digest()[:4], "big") % _DIM


def ann_bucketed_topk(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def bkt(t):
        out = None
        for i in range(_ANN_BITS):
            bit = F.when(F.element_at("embedding", _ann_coord(t, i) + 1) > 0,
                         2 ** i).otherwise(0)
            out = bit if out is None else out + bit
        return out.cast("long")

    # ALL tables in one scan + one explode (not a T-way union of scans)
    tabs = (emb.select("vec_id", F.explode(F.array(*[
        F.struct(F.lit(t).alias("tbl"), bkt(t).alias("bkt"))
        for t in range(_ANN_TABLES)])).alias("tb"))
        .select("vec_id", F.col("tb.tbl").alias("tbl"),
                F.col("tb.bkt").alias("bkt")))
    qt = (tabs.where(F.col("vec_id") < _NQ)
          .select(F.col("vec_id").alias("qid"), "tbl", "bkt"))
    cand = (tabs.join(F.broadcast(qt), ["tbl", "bkt"])
            .where(F.col("vec_id") != F.col("qid"))
            .select("qid", "vec_id").distinct())
    q = emb.where(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    dot = F.expr("aggregate(zip_with(qe, embedding, (x, y) -> "
                 "cast(x AS double) * cast(y AS double)), 0D, "
                 "(acc, v) -> acc + v)")
    nq = F.expr("sqrt(aggregate(qe, 0D, (acc, v) -> "
                "acc + cast(v AS double) * cast(v AS double)))")
    ne = F.expr("sqrt(aggregate(embedding, 0D, (acc, v) -> "
                "acc + cast(v AS double) * cast(v AS double)))")
    scored = (cand.join(emb, "vec_id").join(F.broadcast(q), "qid")
              .select("qid", "vec_id",
                      F.round(dot / (nq * ne), 4).alias("cosine")))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 10))


def _ann_tabs_sql() -> str:
    sels = []
    for t in range(_ANN_TABLES):
        bits = " + ".join(
            f"(CASE WHEN embedding[{_ann_coord(t, i) + 1}] > 0 "
            f"THEN {2 ** i} ELSE 0 END)" for i in range(_ANN_BITS))
        sels.append(f"SELECT vec_id, {t} AS tbl, ({bits})::BIGINT AS bkt "
                    "FROM embeddings")
    return " UNION ALL ".join(sels)


ANN_BUCKETED_TOPK_SQL = f"""
    WITH tabs AS ({_ann_tabs_sql()}),
    qt AS (SELECT vec_id AS qid, tbl, bkt FROM tabs WHERE vec_id < {_NQ}),
    cand AS (SELECT DISTINCT qt.qid, t.vec_id
             FROM tabs t JOIN qt ON t.tbl = qt.tbl AND t.bkt = qt.bkt
             WHERE t.vec_id <> qt.qid),
    q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
          WHERE vec_id < {_NQ}),
    scored AS (
      SELECT c.qid, c.vec_id,
             round(
               (SELECT sum(CAST(q.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
                FROM generate_series(1, {_DIM}) AS g(i))
               / (sqrt((SELECT sum(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))
                        FROM generate_series(1, {_DIM}) AS g(i)))
                  * sqrt((SELECT sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
                          FROM generate_series(1, {_DIM}) AS g(i)))), 4) AS cosine
      FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id
                  JOIN q ON q.qid = c.qid)
    SELECT qid::BIGINT AS qid, vec_id::BIGINT AS vec_id, cosine, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY cosine DESC, vec_id) AS rank
      FROM scored) WHERE rank <= 10
"""


# ---- IVF-flat ANN variant: deterministic SAMPLED centroids (pivot
# vectors chosen by hash over vec_id — the FAISS-style sample-and-assign
# coarse quantizer, no Lloyd iterations so the DuckDB oracle can
# replicate it exactly), cell assignment = argmax cosine to pivots
# (broadcast join), probe the query's top cells, exact verify on cell
# members only. On the near-random fixtures measured recall@10 = 0.74
# at ~37% candidates (uniform vectors have no cluster structure — the
# IVF worst case; the LSH path above is the stronger variant here,
# clustered real embeddings invert that). Architecture point: candidate
# generation is a cell equi-join and assignment is a broadcast of
# n_pivots rows — nothing quadratic anywhere.
_IVF_PIVOTS = 16
_IVF_PROBE = 6


def _ivf_pivots(emb):
    """The _IVF_PIVOTS vectors with the smallest md5('ivf:'||vec_id) —
    a deterministic hash-sample BOTH engines express natively (hex
    strings compare identically), derived from the vectors actually
    present: the Spark fn and the DuckDB oracle agree at ANY fixture
    size (the old modulus rule embedded pivot ids computed for one
    pinned row count into the static SQL, silently diverging on any
    other fixture — round-3 review finding)."""
    h = F.md5(F.concat(F.lit("ivf:"), F.col("vec_id").cast("string")))
    return (emb.select(F.col("vec_id").alias("pid"),
                       F.col("embedding").alias("pe"),
                       h.alias("_h"))
            .orderBy("_h", "pid").limit(_IVF_PIVOTS).drop("_h"))


def ann_ivf_topk(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    piv = _ivf_pivots(emb)
    dotp = F.expr("aggregate(zip_with(embedding, pe, (x, y) -> "
                  "cast(x AS double) * cast(y AS double)), 0D, "
                  "(acc, v) -> acc + v)")
    npe = F.expr("sqrt(aggregate(pe, 0D, (acc, v) -> "
                 "acc + cast(v AS double) * cast(v AS double)))")
    aff = F.round(dotp / npe, 4)
    wp = Window.partitionBy("vec_id").orderBy(F.desc("aff"), F.asc("pid"))
    ranked = (emb.crossJoin(F.broadcast(piv))
              .select("vec_id", "embedding", "pid", aff.alias("aff"))
              .withColumn("pr", F.row_number().over(wp)))
    asg = ranked.where(F.col("pr") == 1).select(
        "vec_id", F.col("pid").alias("cell"))
    qprobe = (ranked.where(F.col("vec_id") < _NQ)
              .where(F.col("pr") <= _IVF_PROBE)
              .select(F.col("vec_id").alias("qid"),
                      F.col("pid").alias("cell")))
    cand = (asg.join(qprobe, "cell")
            .where(F.col("vec_id") != F.col("qid"))
            .select("qid", "vec_id").distinct())
    q = emb.where(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    dot = F.expr("aggregate(zip_with(qe, embedding, (x, y) -> "
                 "cast(x AS double) * cast(y AS double)), 0D, "
                 "(acc, v) -> acc + v)")
    nq = F.expr("sqrt(aggregate(qe, 0D, (acc, v) -> "
                "acc + cast(v AS double) * cast(v AS double)))")
    ne = F.expr("sqrt(aggregate(embedding, 0D, (acc, v) -> "
                "acc + cast(v AS double) * cast(v AS double)))")
    scored = (cand.join(emb, "vec_id").join(F.broadcast(q), "qid")
              .select("qid", "vec_id",
                      F.round(dot / (nq * ne), 4).alias("cosine")))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 10))


def _ivf_sql() -> str:
    cos_qp = (f"(SELECT sum(CAST(e.embedding[i] AS DOUBLE) * CAST(p.pe[i] AS DOUBLE)) "
              f"FROM generate_series(1, {_DIM}) AS g(i)) "
              f"/ sqrt((SELECT sum(CAST(p.pe[i] AS DOUBLE) * CAST(p.pe[i] AS DOUBLE)) "
              f"FROM generate_series(1, {_DIM}) AS g(i)))")
    return f"""
    WITH piv AS (SELECT vec_id AS pid, embedding AS pe FROM embeddings
                 ORDER BY md5('ivf:' || vec_id), vec_id
                 LIMIT {_IVF_PIVOTS}),
    ranked AS (
      SELECT e.vec_id, p.pid,
             row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY round({cos_qp}, 4) DESC, p.pid) AS pr
      FROM embeddings e CROSS JOIN piv p),
    asg AS (SELECT vec_id, pid AS cell FROM ranked WHERE pr = 1),
    qprobe AS (SELECT vec_id AS qid, pid AS cell FROM ranked
               WHERE vec_id < {_NQ} AND pr <= {_IVF_PROBE}),
    cand AS (SELECT DISTINCT qp.qid, a.vec_id
             FROM asg a JOIN qprobe qp ON a.cell = qp.cell
             WHERE a.vec_id <> qp.qid),
    q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
          WHERE vec_id < {_NQ}),
    scored AS (
      SELECT c.qid, c.vec_id,
             round(
               (SELECT sum(CAST(q.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
                FROM generate_series(1, {_DIM}) AS g(i))
               / (sqrt((SELECT sum(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))
                        FROM generate_series(1, {_DIM}) AS g(i)))
                  * sqrt((SELECT sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
                          FROM generate_series(1, {_DIM}) AS g(i)))), 4) AS cosine
      FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id
                  JOIN q ON q.qid = c.qid)
    SELECT qid::BIGINT AS qid, vec_id::BIGINT AS vec_id, cosine, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY cosine DESC, vec_id) AS rank
      FROM scored) WHERE rank <= 10
"""


ANN_IVF_TOPK_SQL = _ivf_sql()


def _ivf_lloyd_sql(iters: int = 2) -> str:
    """DuckDB oracle for ann_ivf_lloyd: the same ``iters`` Lloyd rounds
    inlined as CTE pairs (assignment rank -> per-(cell, dim) rounded
    mean rebuilt into a list) — both engines round affinities to 4
    decimals and centroid means to 6, so assignments agree exactly."""
    def cos(pv):
        return (f"round((SELECT sum(CAST(e.embedding[i] AS DOUBLE) "
                f"* CAST({pv}.pe[i] AS DOUBLE)) "
                f"FROM generate_series(1, {_DIM}) AS g(i)) "
                f"/ sqrt((SELECT sum(CAST({pv}.pe[i] AS DOUBLE) "
                f"* CAST({pv}.pe[i] AS DOUBLE)) "
                f"FROM generate_series(1, {_DIM}) AS g(i))), 4)")
    ctes = [f"piv0 AS (SELECT vec_id AS pid, embedding AS pe "
            f"FROM embeddings ORDER BY md5('ivf:' || vec_id), vec_id "
            f"LIMIT {_IVF_PIVOTS})"]
    for it in range(iters):
        ctes.append(
            f"asg{it} AS (SELECT vec_id, pid AS cell FROM ("
            f"  SELECT e.vec_id, p.pid, row_number() OVER ("
            f"    PARTITION BY e.vec_id ORDER BY {cos('p')} DESC, p.pid"
            f"  ) AS pr FROM embeddings e CROSS JOIN piv{it} p"
            f") WHERE pr = 1)")
        ctes.append(
            f"piv{it + 1} AS (SELECT cell AS pid, "
            f"list(m ORDER BY i) AS pe FROM ("
            f"  SELECT a.cell, g.i, "
            f"    round(avg(CAST(e.embedding[g.i] AS DOUBLE)), 6) AS m"
            f"  FROM asg{it} a JOIN embeddings e USING (vec_id)"
            f"  CROSS JOIN generate_series(1, {_DIM}) AS g(i)"
            f"  GROUP BY a.cell, g.i) GROUP BY cell)")
    ctes.append(
        f"ranked AS (SELECT e.vec_id, p.pid, row_number() OVER ("
        f"  PARTITION BY e.vec_id ORDER BY {cos('p')} DESC, p.pid"
        f") AS pr FROM embeddings e CROSS JOIN piv{iters} p)")
    ctes.append("asg AS (SELECT vec_id, pid AS cell FROM ranked "
                "WHERE pr = 1)")
    ctes.append(f"qprobe AS (SELECT vec_id AS qid, pid AS cell "
                f"FROM ranked WHERE vec_id < {_NQ} "
                f"AND pr <= {_IVF_PROBE})")
    ctes.append("cand AS (SELECT DISTINCT qp.qid, a.vec_id "
                "FROM asg a JOIN qprobe qp ON a.cell = qp.cell "
                "WHERE a.vec_id <> qp.qid)")
    ctes.append(f"q AS (SELECT vec_id AS qid, embedding AS qe "
                f"FROM embeddings WHERE vec_id < {_NQ})")
    ctes.append(f"""scored AS (
      SELECT c.qid, c.vec_id,
             round(
               (SELECT sum(CAST(q.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
                FROM generate_series(1, {_DIM}) AS g(i))
               / (sqrt((SELECT sum(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))
                        FROM generate_series(1, {_DIM}) AS g(i)))
                  * sqrt((SELECT sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
                          FROM generate_series(1, {_DIM}) AS g(i)))), 4) AS cosine
      FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id
                  JOIN q ON q.qid = c.qid)""")
    return ("WITH " + ",\n".join(ctes) + """
    SELECT qid::BIGINT AS qid, vec_id::BIGINT AS vec_id, cosine, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY cosine DESC, vec_id) AS rank
      FROM scored) WHERE rank <= 10
""")


ANN_IVF_LLOYD_SQL = _ivf_lloyd_sql()


def ann_ivf_lloyd(spark, sf_dir, iters: int = 2):
    """IVF with Lloyd-refined centroids — the clustered-data scale path
    (recall is additionally pytest-gated on a clustered fixture,
    tests/test_suite_ann.py). Starts from the deterministic sampled
    pivots and runs ``iters`` Lloyd rounds entirely in DataFrame ops:
    assignment is a broadcast argmax over n_pivots rows, the centroid
    update is a per-(cell, dim) mean via posexplode with the vector
    rebuilt by array_sort(collect_list(struct(i, m))) — nothing
    quadratic, nothing driver-side. Probe + exact verify are the same
    shape as ann_ivf_topk. Affinities round to 4 decimals and centroid
    means to 6 so the DuckDB oracle (two inlined Lloyd CTE rounds,
    ANN_IVF_LLOYD_SQL) reproduces every assignment bit-for-bit —
    engine-order float-sum noise sits ~1e-13, far inside the quantum."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    piv = _ivf_pivots(emb).withColumn(
        "pe", F.col("pe").cast("array<double>"))
    dotp = F.expr("aggregate(zip_with(embedding, pe, (x, y) -> "
                  "cast(x AS double) * cast(y AS double)), 0D, "
                  "(acc, v) -> acc + v)")
    npe = F.expr("sqrt(aggregate(pe, 0D, (acc, v) -> "
                 "acc + cast(v AS double) * cast(v AS double)))")
    aff = F.round(dotp / npe, 4)
    wp = Window.partitionBy("vec_id").orderBy(F.desc("aff"), F.asc("pid"))

    def rank_to(piv_df):
        return (emb.crossJoin(F.broadcast(piv_df))
                .select("vec_id", "embedding", "pid", aff.alias("aff"))
                .withColumn("pr", F.row_number().over(wp)))

    for _ in range(iters):
        asg_i = (rank_to(piv).where(F.col("pr") == 1)
                 .select("vec_id", F.col("pid").alias("cell")))
        piv = (asg_i.join(emb, "vec_id")
               .select("cell", F.posexplode("embedding").alias("i", "v"))
               .groupBy("cell", "i")
               .agg(F.round(F.avg("v"), 6).alias("m"))
               .groupBy("cell")
               .agg(F.expr("transform(array_sort(collect_list("
                           "struct(i, m))), x -> x.m)").alias("pe"))
               .select(F.col("cell").alias("pid"), "pe"))
    ranked = rank_to(piv)
    asg = ranked.where(F.col("pr") == 1).select(
        "vec_id", F.col("pid").alias("cell"))
    qprobe = (ranked.where(F.col("vec_id") < _NQ)
              .where(F.col("pr") <= _IVF_PROBE)
              .select(F.col("vec_id").alias("qid"),
                      F.col("pid").alias("cell")))
    cand = (asg.join(qprobe, "cell")
            .where(F.col("vec_id") != F.col("qid"))
            .select("qid", "vec_id").distinct())
    q = emb.where(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    dot = F.expr("aggregate(zip_with(qe, embedding, (x, y) -> "
                 "cast(x AS double) * cast(y AS double)), 0D, "
                 "(acc, v) -> acc + v)")
    nq = F.expr("sqrt(aggregate(qe, 0D, (acc, v) -> "
                "acc + cast(v AS double) * cast(v AS double)))")
    ne = F.expr("sqrt(aggregate(embedding, 0D, (acc, v) -> "
                "acc + cast(v AS double) * cast(v AS double)))")
    scored = (cand.join(emb, "vec_id").join(F.broadcast(q), "qid")
              .select("qid", "vec_id",
                      F.round(dot / (nq * ne), 4).alias("cosine")))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 10))


# ------------------------------------------------------------ text analysis

_LANG_STOPS = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "for", "on", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "los"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"],
    "fr": ["le", "la", "de", "et", "un", "est", "pour", "que", "dans", "les"],
}


def lang_id(spark, sf_dir):
    """Stopword-profile language ID; confusion counts vs labeled lang."""
    toks = (_docs(spark, sf_dir).select("doc_id", "lang", F.explode(
        F.split(F.lower("text"), TOKEN_SPLIT)).alias("term"))
        .where(F.col("term") != ""))
    aggs = [F.sum(F.when(F.col("term").isin(ws), 1).otherwise(0))
            .alias(f"hits_{lg}") for lg, ws in _LANG_STOPS.items()]
    per = toks.groupBy("doc_id", "lang").agg(*aggs)
    pred = (F.when((F.col("hits_en") >= F.col("hits_es"))
                   & (F.col("hits_en") >= F.col("hits_de"))
                   & (F.col("hits_en") >= F.col("hits_fr")), "en")
            .when((F.col("hits_es") >= F.col("hits_de"))
                  & (F.col("hits_es") >= F.col("hits_fr")), "es")
            .when(F.col("hits_de") >= F.col("hits_fr"), "de")
            .otherwise("fr"))
    return (per.select("lang", pred.alias("pred_lang"))
            .groupBy("lang", "pred_lang").agg(F.count("*").alias("n")))


_LANG_HITS = ", ".join(
    "sum(CASE WHEN term IN ({}) THEN 1 ELSE 0 END) AS hits_{}".format(
        ", ".join(f"'{w}'" for w in ws), lg)
    for lg, ws in _LANG_STOPS.items())
LANG_ID_SQL = f"""
    WITH toks AS (
      SELECT doc_id, lang, t.term AS term
      FROM documents, unnest(string_split_regex(lower(text), '{TOKEN_SPLIT}')) AS t(term)
      WHERE t.term <> ''),
    per AS (SELECT doc_id, lang, {_LANG_HITS} FROM toks GROUP BY doc_id, lang),
    pred AS (SELECT lang,
      CASE WHEN hits_en >= hits_es AND hits_en >= hits_de AND hits_en >= hits_fr THEN 'en'
           WHEN hits_es >= hits_de AND hits_es >= hits_fr THEN 'es'
           WHEN hits_de >= hits_fr THEN 'de' ELSE 'fr' END AS pred_lang
      FROM per)
    SELECT lang, pred_lang, count(*)::BIGINT AS n FROM pred
    GROUP BY lang, pred_lang
"""


def text_quality(spark, sf_dir):
    """Quality features: token count, stopword ratio, mean token length."""
    toks = (_docs(spark, sf_dir).select("doc_id", F.explode(
        F.split(F.lower("text"), TOKEN_SPLIT)).alias("term"))
        .where(F.col("term") != ""))
    stop = sorted(STOPWORDS)
    return (toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg(F.length("term")), 4).alias("avg_token_len"),
        F.round(F.sum(F.when(F.col("term").isin(stop), 1).otherwise(0))
                / F.count("*"), 4).alias("stop_ratio")))


TEXT_QUALITY_SQL = f"""
    WITH toks AS (
      SELECT doc_id, t.term AS term
      FROM documents, unnest(string_split_regex(lower(text), '{TOKEN_SPLIT}')) AS t(term)
      WHERE t.term <> '')
    SELECT doc_id, count(*)::BIGINT AS n_tokens,
           round(avg(length(term)), 4) AS avg_token_len,
           round(sum(CASE WHEN term IN ({STOP_SQL}) THEN 1 ELSE 0 END)
                 / count(*), 4) AS stop_ratio
    FROM toks GROUP BY doc_id
"""


def token_stats(spark, sf_dir):
    """Corpus-level token statistics (whitespace + analyzer counts)."""
    d = _docs(spark, sf_dir)
    ws = d.select(F.size(F.split("text", " ")).alias("n_ws"))
    t = _tokens(spark, sf_dir)
    a = ws.agg(F.sum("n_ws").alias("ws_tokens")).collect()[0]["ws_tokens"]
    b = t.agg(F.count("*").alias("c"),
              F.countDistinct("term").alias("d")).collect()[0]
    return spark.createDataFrame(
        [(int(a), int(b["c"]), int(b["d"]))],
        "ws_tokens long, analyzer_tokens long, distinct_terms long")


TOKEN_STATS_SQL = f"""
    WITH toks AS ({_TOKENS_SQL})
    SELECT
      (SELECT sum(len(string_split(text, ' ')))::BIGINT FROM documents) AS ws_tokens,
      (SELECT count(*)::BIGINT FROM toks) AS analyzer_tokens,
      (SELECT count(DISTINCT term)::BIGINT FROM toks) AS distinct_terms
"""


def doc_fingerprint(spark, sf_dir):
    """Rolling-hash document fingerprint: min md5 over char 12-grams."""
    return _shingles(spark, sf_dir).groupBy("doc_id").agg(
        F.min(F.md5("sh")).alias("fingerprint"))


DOC_FINGERPRINT_SQL = f"""
    WITH shingles AS ({_SHINGLES_SQL})
    SELECT doc_id, min(md5(sh)) AS fingerprint FROM shingles GROUP BY doc_id
"""


# --------------------------------------------------------------- multimodal

def mm_metadata(spark, sf_dir):
    """Binary media columns: build a typed-header blob per document
    (BinaryType end to end) and parse the metadata back with native
    functions — the oracle runs the IDENTICAL construction+parse in
    DuckDB (mias_spark/pipelines/multimodal.py holds the Arrow-UDF
    decode/feature path, which is rows-only checked)."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    blob = F.expr(
        "cast(concat('FMED', "
        " substring('imauvi', (cast(doc_id % 3 as int)) * 2 + 1, 2), "
        " lpad(cast(16 * (1 + doc_id % 40) as string), 6, '0'), "
        " lpad(cast(9 * (1 + doc_id % 40) as string), 6, '0'), "
        " lpad(cast(1 + doc_id % 250 as string), 4, '0'), "
        " text) as binary)")
    b = d.select("doc_id", blob.alias("blob"))
    field = lambda s, n: F.expr(  # noqa: E731
        f"cast(cast(substring(blob, {s}, {n}) as string) as long)")
    return b.select(
        "doc_id",
        F.length("blob").alias("n_bytes"),
        F.expr("cast(substring(blob, 1, 4) as string)").alias("magic"),
        F.expr("cast(substring(blob, 5, 2) as string)").alias("kind"),
        field(7, 6).alias("width"),
        field(13, 6).alias("height"),
        field(19, 4).alias("n_frames"))


MM_METADATA_SQL = """
    WITH b AS (
      SELECT doc_id, encode('FMED'
        || substring('imauvi', (CAST(doc_id % 3 AS INT)) * 2 + 1, 2)
        || lpad(CAST(16 * (1 + doc_id % 40) AS VARCHAR), 6, '0')
        || lpad(CAST(9 * (1 + doc_id % 40) AS VARCHAR), 6, '0')
        || lpad(CAST(1 + doc_id % 250 AS VARCHAR), 4, '0')
        || text) AS blob
      FROM documents)
    SELECT doc_id, octet_length(blob)::BIGINT AS n_bytes,
           substring(CAST(blob AS VARCHAR), 1, 4) AS magic,
           substring(CAST(blob AS VARCHAR), 5, 2) AS kind,
           CAST(substring(CAST(blob AS VARCHAR), 7, 6) AS BIGINT) AS width,
           CAST(substring(CAST(blob AS VARCHAR), 13, 6) AS BIGINT) AS height,
           CAST(substring(CAST(blob AS VARCHAR), 19, 4) AS BIGINT) AS n_frames
    FROM b
"""


_MEDIA_BLOB = (
    "cast(concat('FMED', "
    " substring('imauvi', (cast(doc_id % 3 as int)) * 2 + 1, 2), "
    " lpad(cast(16 * (1 + doc_id % 40) as string), 6, '0'), "
    " lpad(cast(9 * (1 + doc_id % 40) as string), 6, '0'), "
    " lpad(cast(1 + doc_id % 250 as string), 4, '0'), "
    " text) as binary)")


def _media_from_docs(spark, sf_dir):
    """documents -> (media_id, blob): the same typed-header binary blob
    mm_metadata builds, consumed by the REAL Arrow media kernels."""
    return (_docs(spark, sf_dir).select("doc_id", "text")
            .select(F.col("doc_id").alias("media_id"),
                    F.expr(_MEDIA_BLOB).alias("blob")))


def mm_features(spark, sf_dir):
    """Arrow mapInPandas feature extraction over binary media blobs
    (pipelines/multimodal.py media_features — the decode step is the
    deterministic md5-stream fake, reproduced arithmetically by the
    DuckDB oracle: digest bytes of md5(payload) tiled to 64 samples,
    8 chunk means)."""
    from mias_spark.pipelines.multimodal import media_features
    return media_features(_media_from_docs(spark, sf_dir))


def _hexbyte_sql(col: str, i: int) -> str:
    """SQL for byte i (0-based) of an md5 hex digest column."""
    return (f"((strpos('0123456789abcdef', substring({col}, {2*i+1}, 1))-1)*16"
            f" + (strpos('0123456789abcdef', substring({col}, {2*i+2}, 1))-1))")


# the 16 digest bytes tiled x4 to 64 samples, split into 8 chunks of 8:
# chunk j = digest bytes 0..7 (j even) or 8..15 (j odd)
_FA = "(" + " + ".join(_hexbyte_sql("hx", i) for i in range(8)) + ") / 8.0"
_FB = "(" + " + ".join(_hexbyte_sql("hx", i) for i in range(8, 16)) + ") / 8.0"
MM_FEATURES_SQL = f"""
    WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
    f AS (SELECT doc_id, {_FA} AS fa, {_FB} AS fb FROM h)
    SELECT doc_id::BIGINT AS media_id,
           round(fa, 4) AS f0, round(fb, 4) AS f1,
           round(fa, 4) AS f2, round(fb, 4) AS f3,
           round(fa, 4) AS f4, round(fb, 4) AS f5,
           round(fa, 4) AS f6, round(fb, 4) AS f7,
           round(sqrt(4*fa*fa + 4*fb*fb), 4) AS feat_norm
    FROM f
"""


def mm_frame_sample(spark, sf_dir):
    """Video frame sampling (explode over typed metadata parsed from the
    binary header by native functions; multimodal.frame_sample)."""
    from mias_spark.pipelines.multimodal import frame_sample
    return frame_sample(_media_from_docs(spark, sf_dir), every=25)


MM_FRAME_SAMPLE_SQL = """
    SELECT doc_id::BIGINT AS media_id,
           (1 + doc_id % 250)::BIGINT AS n_frames,
           g.frame_idx::BIGINT AS frame_idx
    FROM documents, unnest(range(0, (1 + doc_id % 250), 25)) AS g(frame_idx)
    WHERE doc_id % 3 = 2
"""


# ---------------------------------------------------------------- relational

def tpch_q1(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (li.where(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                 F.count("*").alias("count_order")))


TPCH_Q1_SQL = """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           count(*)::BIGINT AS count_order
    FROM lineitem WHERE l_shipdate <= '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
"""


def tpch_q3ish(spark, sf_dir):
    """customer ⋈ orders ⋈ lineitem revenue top-10 (broadcast dims)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    j = (li.join(o, li.l_orderkey == o.o_orderkey)
         .join(F.broadcast(c.where(F.col("c_mktsegment") == "BUILDING")),
               o.o_custkey == F.col("c_custkey")))
    agg = (j.groupBy("l_orderkey")
           .agg(F.round(F.sum(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))), 2)
                .alias("revenue")))
    w = Window.orderBy(F.desc("revenue"), F.asc("l_orderkey"))
    return (agg.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 10))


TPCH_Q3ISH_SQL = """
    WITH agg AS (
      SELECT l_orderkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
      GROUP BY l_orderkey)
    SELECT l_orderkey::BIGINT AS l_orderkey, revenue, rank FROM (
      SELECT *, row_number() OVER (ORDER BY revenue DESC, l_orderkey) AS rank
      FROM agg) WHERE rank <= 10
"""


def events_hourly(spark, sf_dir):
    """Streaming-analog batch rollup: hourly windowed agg per type."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (e.groupBy(
        F.date_format(F.date_trunc("hour", "ts"),
                      "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("total_value")))


EVENTS_HOURLY_SQL = """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type, count(*)::BIGINT AS n,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2
"""


def events_top_per_user(spark, sf_dir):
    """Window ranking: each user's highest-value event."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("value"), F.asc("event_id"))
    return (e.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id", "event_id",
                    F.round("value", 2).alias("value")))


EVENTS_TOP_PER_USER_SQL = """
    SELECT user_id::BIGINT AS user_id, event_id::BIGINT AS event_id,
           round(value, 2) AS value
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY value DESC, event_id) AS rn
          FROM events) WHERE rn = 1
"""


# -------------------------------------------------------------- registry

#: name -> (spark_fn, duckdb_sql | None)
REGISTRY: dict[str, tuple] = {
    "ir_doc_stats": (ir_doc_stats, IR_DOC_STATS_SQL),
    "ir_term_tf": (ir_term_tf, IR_TERM_TF_SQL),
    "ir_dictionary_df": (ir_dictionary_df, IR_DICTIONARY_DF_SQL),
    "ir_doc_norms": (ir_doc_norms, IR_DOC_NORMS_SQL),
    "ir_bm25_topk": (ir_bm25_topk, IR_BM25_TOPK_SQL),
    "ir_bm25_multiterm": (ir_bm25_multiterm, IR_BM25_MULTITERM_SQL),
    "ir_bm25_conjunctive": (ir_bm25_conjunctive, IR_BM25_CONJUNCTIVE_SQL),
    "ir_phrase": (ir_phrase, IR_PHRASE_SQL),
    "ir_delete_semantics": (ir_delete_semantics, IR_DELETE_SEMANTICS_SQL),
    "ir_engine_topk": (ir_engine_topk, IR_ENGINE_TOPK_SQL),
    "ir_engine_topk_blocks": (ir_engine_topk_blocks,
                              IR_ENGINE_TOPK_BLOCKS_SQL),
    "ir_engine_phrase": (ir_engine_phrase, IR_ENGINE_PHRASE_SQL),
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "dedup_minhash": (dedup_minhash, DEDUP_MINHASH_SQL),
    "dedup_simhash": (dedup_simhash, DEDUP_SIMHASH_SQL),
    "ngram_jaccard": (ngram_jaccard, NGRAM_JACCARD_SQL),
    "ann_cosine_topk": (ann_cosine_topk, ANN_COSINE_TOPK_SQL),
    "dedup_embedding_cosine": (dedup_embedding_cosine,
                               DEDUP_EMBEDDING_COSINE_SQL),
    "lsh_cosine_buckets": (lsh_cosine_buckets, LSH_COSINE_BUCKETS_SQL),
    "ann_bucketed_topk": (ann_bucketed_topk, ANN_BUCKETED_TOPK_SQL),
    "ann_ivf_topk": (ann_ivf_topk, ANN_IVF_TOPK_SQL),
    "ann_ivf_lloyd": (ann_ivf_lloyd, ANN_IVF_LLOYD_SQL),
    "mm_metadata": (mm_metadata, MM_METADATA_SQL),
    "mm_features": (mm_features, MM_FEATURES_SQL),
    "mm_frame_sample": (mm_frame_sample, MM_FRAME_SAMPLE_SQL),
    "lang_id": (lang_id, LANG_ID_SQL),
    "text_quality": (text_quality, TEXT_QUALITY_SQL),
    "token_stats": (token_stats, TOKEN_STATS_SQL),
    "doc_fingerprint": (doc_fingerprint, DOC_FINGERPRINT_SQL),
    "tpch_q1": (tpch_q1, TPCH_Q1_SQL),
    "tpch_q3ish": (tpch_q3ish, TPCH_Q3ISH_SQL),
    "events_hourly": (events_hourly, EVENTS_HOURLY_SQL),
    "events_top_per_user": (events_top_per_user, EVENTS_TOP_PER_USER_SQL),
}
