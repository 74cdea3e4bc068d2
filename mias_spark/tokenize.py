"""Arrow-batched tokenization UDFs — the MathTokenizer / StandardAnalyzer
stage on Spark (reference call sites: HtmlDocument.java:53-61).

Both UDFs are ``mapInPandas`` (Arrow batches, no per-row Python). The
token UDF pre-aggregates per (doc, field, term) INSIDE the batch — a doc
lives in exactly one batch, so the per-doc aggregation is complete and
the B1 ``groupBy`` shuffle of raw tokens is eliminated entirely
(map-side combine taken to its logical end; SURVEY.md §2.3 B1).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from mias_spec.document import content_sha256, tokenize_document

TOKENS_SCHEMA = (
    "doc_id long, field string, term string, tf int, "
    "positions array<int>, wsum double, wmax double"
)

META_SCHEMA = (
    "doc_id long, title string, arxiv_id string, authors string, "
    "n_formulae int, content_sha256 string, filesize long"
)


def tokenize_docs(docs: DataFrame) -> DataFrame:
    """docs(doc_id, content, lang) -> per-(doc, field, term) token rows."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "field": [], "term": [], "tf": [],
                "positions": [], "wsum": [], "wmax": [],
            }
            for doc_id, content, lang in zip(
                    pdf["doc_id"], pdf["content"], pdf["lang"]):
                d = tokenize_document(content, lang)
                agg: dict[tuple, list] = {}
                for fld, term, pos, w in d.tokens:
                    a = agg.get((fld, term))
                    if a is None:
                        agg[(fld, term)] = [1, [pos], w, w]
                    else:
                        a[0] += 1
                        a[1].append(pos)
                        a[2] += w
                        a[3] = max(a[3], w)
                for (fld, term), (tf, poss, ws, wm) in agg.items():
                    out["doc_id"].append(doc_id)
                    out["field"].append(fld)
                    out["term"].append(term)
                    out["tf"].append(tf)
                    out["positions"].append(poss)
                    out["wsum"].append(ws)
                    out["wmax"].append(wm)
            yield pd.DataFrame(out)

    return docs.select("doc_id", "content", "lang").mapInPandas(fn, TOKENS_SCHEMA)


def extract_meta(docs: DataFrame) -> DataFrame:
    """docs(doc_id, content, lang) -> stored display/invariant fields
    (title chain, arXiv id override, authors — HtmlDocumentExtractor
    .java:60-132 — plus the content sha256 ingest invariant)."""
    from mias_spec.document import _extract_html_fields, _is_markup

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content, lang in zip(
                    pdf["doc_id"], pdf["content"], pdf["lang"]):
                content = content or ""
                if _is_markup(content, lang):
                    title, _body, arxiv, authors, maths = \
                        _extract_html_fields(content)
                    nf = len(maths)
                else:
                    title, arxiv, authors, nf = "", None, None, 0
                rows.append((doc_id, title, arxiv, authors, nf,
                             content_sha256(content), len(content.encode())))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "title", "arxiv_id", "authors", "n_formulae",
                "content_sha256", "filesize"])

    return docs.select("doc_id", "content", "lang").mapInPandas(fn, META_SCHEMA)
