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
    "positions array<int>, wsum double, wmax double, dl long"
)

META_FIELDS = (
    "title string, arxiv_id string, authors string, "
    "n_formulae int, content_sha256 string, filesize long"
)


def tokenize_docs(docs: DataFrame) -> DataFrame:
    """docs(doc_id, content, lang) -> per-(doc, field, term) token rows."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "field": [], "term": [], "tf": [],
                "positions": [], "wsum": [], "wmax": [], "dl": [],
            }
            for doc_id, content, lang in zip(
                    pdf["doc_id"], pdf["content"], pdf["lang"]):
                d = tokenize_document(content, lang)
                agg: dict[tuple, list] = {}
                dls: dict[str, int] = {}
                for fld, term, pos, w in d.tokens:
                    dls[fld] = dls.get(fld, 0) + 1  # B5: count EVERY variant
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
                    out["dl"].append(dls[fld])
            yield pd.DataFrame(out)

    return docs.select("doc_id", "content", "lang").mapInPandas(fn, TOKENS_SCHEMA)


def with_meta(docs: DataFrame) -> DataFrame:
    """Append stored display/invariant columns (title chain, arXiv id
    override, authors — HtmlDocumentExtractor.java:60-132 — plus the
    content sha256 ingest invariant) in ONE passthrough mapInPandas:
    no meta join, so ingest never shuffles full document content."""
    from mias_spec.document import _extract_html_fields, _is_markup

    in_cols = docs.columns
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in docs.schema.fields) + ", " + META_FIELDS

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for content, lang in zip(pdf["content"], pdf["lang"]):
                content = content or ""
                if _is_markup(content, lang):
                    title, _body, arxiv, authors, maths = \
                        _extract_html_fields(content)
                    nf = len(maths)
                else:
                    title, arxiv, authors, nf = "", None, None, 0
                metas.append((title, arxiv, authors, nf,
                              content_sha256(content), len(content.encode())))
            mdf = pd.DataFrame(metas, columns=[
                "title", "arxiv_id", "authors", "n_formulae",
                "content_sha256", "filesize"])
            yield pd.concat(
                [pdf[in_cols].reset_index(drop=True), mdf], axis=1)

    return docs.mapInPandas(fn, schema)
