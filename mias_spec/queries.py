"""Frozen reference query set + the query compiler (FIXTURES.md §2).

The compiler is the MathSeparator + MultiFieldQueryParser +
addMathQueries analog (/root/reference/src/main/java/cz/muni/fi/mias/
search/Searching.java:230-294): split the raw query into a text part and
MathML parts; every text term becomes a MUST group of per-field clauses
over (content, title); all math M-terms form one MUST group of SHOULD
clauses whose boosts are the query-side tokenizer weights.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from mias_spec import mathml
from mias_spec.analyzer import tokenize
from mias_spec.constants import FIELD_CMATH, FIELD_CONTENT, FIELD_PMATH, FIELD_TITLE
from mias_spec.corpus import EXACT_AST, render_math

_MATH_SPAN_RE = re.compile(r"<math\b.*?</math\s*>", re.DOTALL)

#: fuzzy query formula — same shape as EXACT_AST, identifiers that occur
#: in no document, so it is reachable only through unified variants
FUZZY_QUERY_AST = ("=", ("var", "k"),
                   ("*", ("var", "v"), ("^", ("var", "s"), ("const", "2"))))


@dataclass(frozen=True)
class Clause:
    group: int       # MUST group id; doc must match >=1 clause per group
    fld: str
    term: str
    boost: float


@dataclass(frozen=True)
class PhraseClause:
    """Quoted-phrase clause (the MultiFieldQueryParser phrase surface,
    Searching.java:254-257). A doc matches when the terms occur at
    consecutive analyzer positions in ``fld``; positions are assigned
    AFTER stopword removal (documented divergence from Lucene's
    position-increment gaps: stopwords inside a phrase are simply
    elided). Scoring spec: tf = number of phrase occurrences, idf = sum
    of the constituent terms' idfs (the Lucene PhraseQuery convention),
    payload = the field weight."""
    group: int
    fld: str
    terms: tuple[str, ...]
    boost: float
    must_not: bool = False


@dataclass
class CompiledQuery:
    clauses: list[Clause] = field(default_factory=list)
    phrases: list[PhraseClause] = field(default_factory=list)
    #: MUST_NOT single terms (`-term` syntax); not counted in n_groups
    prohibited: list[Clause] = field(default_factory=list)
    n_groups: int = 0
    text_part: str = ""
    math_parts: list[str] = field(default_factory=list)


def separate(query_text: str) -> tuple[str, list[str]]:
    """MathSeparator.separate analog (Searching.java:234-237)."""
    maths = _MATH_SPAN_RE.findall(query_text)
    text = _MATH_SPAN_RE.sub(" ", query_text).strip()
    return text, maths


#: query-syntax token: optional +/- sign, optional content:/title:
#: field scope, then "quoted" or bare chunk — the field scope applies
#: to phrases too (title:"a b")
_QTOK_RE = re.compile(r'([+-]?)(?:(content|title):)?(?:"([^"]*)"|(\S+))')
_TEXT_FIELDS = (FIELD_CONTENT, FIELD_TITLE)


def _parse_text_part(q: CompiledQuery, text: str, g: int) -> int:
    """MultiFieldQueryParser-style surface over (content, title):
    bare terms = MUST groups, ``"quoted phrases"`` = MUST phrase
    groups, ``-term``/``-"phrase"`` = MUST_NOT, ``+term`` = MUST
    (the default), ``content:``/``title:`` prefixes scope a term OR a
    quoted phrase to one field. Returns the next group id."""
    for m in _QTOK_RE.finditer(text):
        sign, fpre, quoted, bare = (m.group(1), m.group(2),
                                    m.group(3), m.group(4))
        chunk = quoted if quoted is not None else bare
        fields = (fpre,) if fpre else _TEXT_FIELDS
        terms = tokenize(chunk)
        if not terms:
            continue
        is_phrase = quoted is not None and len(terms) > 1
        if sign == "-":
            if is_phrase:
                for fld in fields:
                    q.phrases.append(PhraseClause(
                        -1, fld, tuple(terms), 1.0, must_not=True))
            else:
                for t in terms:
                    for fld in fields:
                        q.prohibited.append(Clause(-1, fld, t, 1.0))
            continue
        if is_phrase:
            for fld in fields:
                q.phrases.append(PhraseClause(g, fld, tuple(terms), 1.0))
            g += 1
        else:
            for t in terms:
                for fld in fields:
                    q.clauses.append(Clause(g, fld, t, 1.0))
                g += 1
    return g


def compile_query(
    query_text: str,
    variant: str = "BOTH",
    extract_subformulae: bool = True,
    reduce_weighting: bool = True,
) -> CompiledQuery:
    q = CompiledQuery()
    text, maths = separate(query_text)
    q.text_part, q.math_parts = text, maths
    g = _parse_text_part(q, text, 0)
    if maths:
        els = []
        for m in maths:
            els.extend(mathml.extract_math_elements(m))
        fields = {"P": [FIELD_PMATH], "C": [FIELD_CMATH],
                  "BOTH": [FIELD_PMATH, FIELD_CMATH]}[variant]
        seen: dict[tuple[str, str], float] = {}
        for fld in fields:
            v = "P" if fld == FIELD_PMATH else "C"
            for term, _pos, w in mathml.math_field_tokens(
                    els, v, extract_subformulae, reduce_weighting):
                key = (fld, term)
                seen[key] = max(seen.get(key, 0.0), w)  # dedupe, keep max
        if seen:
            for (fld, term), w in sorted(seen.items()):
                q.clauses.append(Clause(g, fld, term, w))
            g += 1
    q.n_groups = g
    return q


@dataclass(frozen=True)
class RefQuery:
    query_id: int
    query_text: str
    variant: str = "BOTH"
    k: int = 10
    offset: int = 0


def reference_queries() -> list[RefQuery]:
    """The frozen query set (>=10 queries, FIXTURES.md §2)."""
    exact = render_math(EXACT_AST)
    fuzzy = render_math(FUZZY_QUERY_AST)
    return [
        RefQuery(1, "energy"),                                # single term
        RefQuery(2, "electron quantum"),                      # multi MUST
        RefQuery(3, "relativity"),                            # title boost
        RefQuery(4, exact),                                   # math exact
        RefQuery(5, fuzzy),                                   # math fuzzy
        RefQuery(6, f"einstein {exact}"),                     # mixed
        RefQuery(7, "zzznothing"),                            # no hits
        RefQuery(8, "data"),                                  # every xhtml doc
        RefQuery(9, exact, variant="C"),                      # content-only
        RefQuery(10, exact, variant="P"),                     # pres-only
        RefQuery(11, "energy", offset=10),                    # paging
        RefQuery(12, "momentum conservation"),                # multi-term 2
        RefQuery(13, '"items total"'),                        # phrase
        RefQuery(14, 'partition "items total"'),              # term+phrase
        RefQuery(15, "energy -momentum"),                     # MUST_NOT term
        RefQuery(16, '"items total" -"partition weight"'),    # NOT phrase
        RefQuery(17, "title:relativity"),                     # field prefix
        RefQuery(18, '"weight return total"'),                # 3-term phrase
    ]
