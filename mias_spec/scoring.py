"""BM25 scoring composition — frozen spec.

Per BASELINE.json.north_rule the engine scores with BM25 (k1=1.2,
b=0.75), replacing the reference's Lucene TF-IDF; MIaS's payload-average
and query-boost factors compose multiplicatively on top exactly as in
the reference scorer (PayloadTermQuery × AveragePayloadFunction × boost,
/root/reference/src/main/java/cz/muni/fi/mias/search/Searching.java:
288-291 with similarity at Indexing.java:79-81):

    score(d, q) = Σ_{t in q, (field_t, t) matches d}
        boost_t * avg_payload(t, d, field_t) * BM25(tf, df, dl, N, avgdl)

    BM25  = idf(N, df) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    idf   = ln(1 + (N - df + 0.5)/(df + 0.5))        # Lucene BM25 idf

Per-field statistics: df, dl and avgdl are computed within each field
(content / title / pmath / cmath). dl counts EVERY emitted token
including overlapping unification variants (``setDiscountOverlaps
(false)``, Indexing.java:80). There is no query norm (BM25 has none;
documented divergence from Searching.java:185, SURVEY.md §2.4 Q7).

Determinism: accumulation in float64 over clauses sorted by
(field, term); ties broken by (score desc, doc_id asc).
"""

from __future__ import annotations

import math

from mias_spec.constants import BM25_B, BM25_K1


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25(tf: float, df: int, dl: float, n_docs: int, avgdl: float,
         k1: float = BM25_K1, b: float = BM25_B) -> float:
    if avgdl <= 0:
        avgdl = 1.0
    return idf(n_docs, df) * tf * (k1 + 1.0) / (
        tf + k1 * (1.0 - b + b * dl / avgdl))


def term_score(tf: float, df: int, dl: float, n_docs: int, avgdl: float,
               avg_weight: float, boost: float) -> float:
    return boost * avg_weight * bm25(tf, df, dl, n_docs, avgdl)
