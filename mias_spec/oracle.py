"""Single-process pandas oracle: index build + BM25 top-k ground truth.

Implements exactly the spec (document.tokenize_document -> postings /
norms / df stats -> scoring.term_score) so the distributed engine can be
checked for RANK-IDENTICAL top-k (score tolerance 1e-6, tie-break
(score desc, doc_id asc)). FIXTURES.md §3.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from mias_spec.document import doc_key, tokenize_document
from mias_spec.queries import CompiledQuery, compile_query
from mias_spec.scoring import term_score


@dataclass
class OracleIndex:
    docs: pd.DataFrame       # doc_id, doc_key, repo, path, commit, title
    postings: pd.DataFrame   # doc_id, field, term, tf, avg_w, dl, positions
    dictionary: pd.DataFrame  # field, term, df
    norms: pd.DataFrame      # doc_id, field, dl
    field_stats: dict        # field -> {"n_docs": int, "avgdl": float}


def build_index(corpus: pd.DataFrame) -> OracleIndex:
    corpus = corpus.copy()
    corpus["doc_key"] = [
        doc_key(r, p, c)
        for r, p, c in zip(corpus["repo"], corpus["path"], corpus["commit"])
    ]
    corpus = corpus.sort_values("doc_key").reset_index(drop=True)
    corpus["doc_id"] = np.arange(len(corpus), dtype=np.int64)

    tok_rows = []
    titles = []
    for row in corpus.itertuples():
        d = tokenize_document(row.content, row.lang)
        titles.append(d.title)
        for fld, term, pos, w in d.tokens:
            tok_rows.append((row.doc_id, fld, term, w, pos))
    corpus["title"] = titles
    toks = pd.DataFrame(tok_rows,
                        columns=["doc_id", "field", "term", "w", "pos"])

    postings = (toks.groupby(["doc_id", "field", "term"], sort=True)
                .agg(tf=("w", "size"), avg_w=("w", "mean"),
                     positions=("pos", list))
                .reset_index())
    norms = (toks.groupby(["doc_id", "field"], sort=True)
             .size().rename("dl").reset_index())
    postings = postings.merge(norms, on=["doc_id", "field"])
    dictionary = (postings.groupby(["field", "term"], sort=True)
                  .size().rename("df").reset_index())
    field_stats = {
        f: {"n_docs": int(g["doc_id"].nunique()),
            "avgdl": float(g["dl"].mean())}
        for f, g in norms.groupby("field")
    }
    docs = corpus[["doc_id", "doc_key", "repo", "path", "commit", "title"]]
    return OracleIndex(docs, postings, dictionary, norms, field_stats)


def search(
    index: OracleIndex,
    query_text: str,
    variant: str = "BOTH",
    k: int = 10,
    offset: int = 0,
    extract_subformulae: bool = True,
    reduce_weighting: bool = True,
) -> pd.DataFrame:
    """Top-k: columns (rank, doc_id, score). Deterministic float64
    accumulation in (field, term) clause order."""
    q = compile_query(query_text, variant, extract_subformulae, reduce_weighting)
    return execute(index, q, k, offset)


def _phrase_hits(index: OracleIndex, ph,
                 dfmap: dict | None = None) -> dict[int, float]:
    """doc_id -> phrase score for one PhraseClause (spec: tf = number
    of adjacent runs, idf = sum of constituent idfs, payload = the
    field weight carried on the posting rows)."""
    from mias_spec.constants import BM25_B, BM25_K1
    from mias_spec.scoring import idf as idf_fn

    post = index.postings
    if dfmap is None:
        dfmap = {(r.field, r.term): int(r.df)
                 for r in index.dictionary.itertuples()}
    if any((ph.fld, t) not in dfmap for t in ph.terms):
        return {}
    st = index.field_stats[ph.fld]
    idf_p = sum(idf_fn(st["n_docs"], dfmap[(ph.fld, t)]) for t in ph.terms)
    sub = post[(post["field"] == ph.fld) & (post["term"].isin(ph.terms))]
    out: dict[int, float] = {}
    for doc_id, g in sub.groupby("doc_id"):
        rows = {r.term: r for r in g.itertuples()}
        if len(rows) < len(set(ph.terms)):
            continue
        cur = set(rows[ph.terms[0]].positions)
        for t in ph.terms[1:]:
            cur = {p + 1 for p in cur} & set(rows[t].positions)
            if not cur:
                break
        if not cur:
            continue
        ptf = float(len(cur))
        r0 = rows[ph.terms[0]]
        dl = float(r0.dl)
        w = float(r0.avg_w)       # field weight (constant per text field)
        s = (ph.boost * w * idf_p * ptf * (BM25_K1 + 1.0)
             / (ptf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / st["avgdl"])))
        out[int(doc_id)] = s
    return out


def execute(index: OracleIndex, q: CompiledQuery, k: int, offset: int) -> pd.DataFrame:
    if not q.clauses and not q.phrases:
        return pd.DataFrame(columns=["rank", "doc_id", "score"])
    # score per clause, accumulate per doc; track matched groups
    scores: dict[int, float] = {}
    groups: dict[int, set] = {}
    dfmap = {(r.field, r.term): int(r.df)
             for r in index.dictionary.itertuples()}
    post = index.postings.set_index(["field", "term"], drop=False).sort_index()
    for cl in sorted(q.clauses, key=lambda c: (c.fld, c.term, c.group)):
        key = (cl.fld, cl.term)
        if key not in dfmap:
            continue
        st = index.field_stats[cl.fld]
        df = dfmap[key]
        try:
            rows = post.loc[[key]]
        except KeyError:
            continue
        for r in rows.itertuples():
            s = term_score(float(r.tf), df, float(r.dl), st["n_docs"],
                           st["avgdl"], float(r.avg_w), cl.boost)
            scores[r.doc_id] = scores.get(r.doc_id, 0.0) + s
            groups.setdefault(r.doc_id, set()).add(cl.group)
    # phrase groups (content + title variants sum like term groups)
    for ph in sorted(q.phrases, key=lambda p: (p.fld, p.terms, p.group)):
        if ph.must_not:
            continue
        for d, s in _phrase_hits(index, ph, dfmap).items():
            scores[d] = scores.get(d, 0.0) + s
            groups.setdefault(d, set()).add(ph.group)
    # MUST_NOT: prohibited terms and phrases
    banned: set[int] = set()
    for cl in q.prohibited:
        key = (cl.fld, cl.term)
        try:
            banned.update(int(r.doc_id) for r in post.loc[[key]].itertuples())
        except KeyError:
            pass
    for ph in q.phrases:
        if ph.must_not:
            banned.update(_phrase_hits(index, ph, dfmap))
    hits = [(d, s) for d, s in scores.items()
            if len(groups[d]) == q.n_groups and d not in banned]
    hits.sort(key=lambda t: (-t[1], t[0]))
    page = hits[offset:offset + k]
    return pd.DataFrame(
        [(i + 1 + offset, d, s) for i, (d, s) in enumerate(page)],
        columns=["rank", "doc_id", "score"],
    ).astype({"rank": "int64", "doc_id": "int64", "score": "float64"})
