"""Text analysis — the engine's StandardAnalyzer analog.

Must be bit-identical between index time and query time and between the
Spark UDFs and the pandas oracle (reference uses the same Lucene
StandardAnalyzer on both sides: Indexing.java:78, Searching.java:254).

Spec: Unicode word tokens (``\\w+``, underscores kept — the corpus is
source code), lowercased, frozen English stopwords dropped, tokens longer
than MAX_TOKEN_LEN dropped.
"""

from __future__ import annotations

import re

from mias_spec.constants import MAX_TOKEN_LEN, STOPWORDS

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


def tokenize(text: str) -> list[str]:
    """Analyze ``text`` into index/query terms."""
    if not text:
        return []
    out = []
    for m in _TOKEN_RE.finditer(text):
        tok = m.group(0).lower()
        if tok in STOPWORDS or len(tok) > MAX_TOKEN_LEN:
            continue
        out.append(tok)
    return out


# SQL-mirrorable variant: the exact same tokenization is expressible as
#   unnest(regexp_split(lower(text), '\\W+')) ... WHERE tok NOT IN stopwords
# in both Spark SQL and DuckDB — __spark_entry__ oracle queries rely on
# this equivalence for the correctness gate.
SQL_SPLIT_PATTERN = r"[^a-zA-Z0-9_]+"


def stopword_sql_list() -> str:
    """Render the stopword set as a SQL IN-list (sorted, deterministic)."""
    return ", ".join(f"'{w}'" for w in sorted(STOPWORDS))
