"""Snippet extraction — the NiceSnippetExtractor analog.

Reference behavior (search/snippets/NiceSnippetExtractor.java:49-305,
Searching.java:314-399): for each result document locate the best math
spans ranked by payload weight (Span.compareTo orders by payload desc,
Span.java:70-74; 2 spans kept), highlight the `<math>…</math>` fragment,
plus up to ~4 text-term fragments with sentence-bounded context and
overlap dedupe.

Pure spec functions — the engine calls them driver-side over the k
result documents only (snippets are a post-processing stage in the
reference too: a thread pool over the result page).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from mias_spec import mathml
from mias_spec.document import _extract_html_fields, _is_markup

MAX_TEXT_FRAGMENTS = 4
MAX_MATH_FRAGMENTS = 2
CONTEXT_CHARS = 90          # half-window around a hit, sentence-bounded
MAX_MATH_CHARS = 400        # truncation of a highlighted math fragment
_SENT_BOUND = re.compile(r"[.!?]")


def _sentence_window(text: str, lo: int, hi: int) -> tuple[int, int]:
    """Expand [lo, hi) to sentence bounds, capped at CONTEXT_CHARS on
    each side (sentence-bounded surround, NiceSnippetExtractor
    .java:275-305)."""
    start = max(0, lo - CONTEXT_CHARS)
    m = list(_SENT_BOUND.finditer(text, start, lo))
    if m:
        start = m[-1].end()
    end = min(len(text), hi + CONTEXT_CHARS)
    m2 = _SENT_BOUND.search(text, hi, end)
    if m2:
        end = m2.end()
    return start, end


def text_fragments(body: str, terms: list[str],
                   max_fragments: int = MAX_TEXT_FRAGMENTS) -> list[str]:
    """First occurrence of each distinct query term, sentence-bounded,
    all query terms highlighted with <b>, overlapping windows merged."""
    spans: list[tuple[int, int]] = []
    for t in dict.fromkeys(x.lower() for x in terms if x):
        m = re.search(rf"\b{re.escape(t)}\b", body, re.IGNORECASE)
        if not m:
            continue
        spans.append(_sentence_window(body, m.start(), m.end()))
        if len(spans) >= max_fragments:
            break
    spans.sort()
    merged: list[list[int]] = []
    for lo, hi in spans:
        if merged and lo <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    hi_re = re.compile(
        r"\b(" + "|".join(re.escape(t) for t in
                          dict.fromkeys(x.lower() for x in terms if x))
        + r")\b", re.IGNORECASE) if terms else None
    out = []
    for lo, hi in merged:
        frag = body[lo:hi].strip()
        if hi_re is not None:
            frag = hi_re.sub(r"<b>\1</b>", frag)
        if frag:
            out.append(frag)
    return out


def _phrase_regex(terms: tuple[str, ...]) -> re.Pattern:
    """Contiguous occurrence of a phrase in RAW text: constituents
    separated by non-word chars, tolerating up to 3 intervening words
    (the analyzer dropped stopwords before adjacency was indexed, so
    'state of the art' matches the phrase query "state art")."""
    gap = r"(?:\W+\w+){0,3}?\W+"
    return re.compile(
        r"\b" + gap.join(re.escape(t) for t in terms) + r"\b",
        re.IGNORECASE)


def phrase_fragments(body: str, phrases: list[tuple[str, ...]],
                     max_fragments: int = MAX_TEXT_FRAGMENTS) -> list[str]:
    """One sentence-bounded fragment per distinct phrase, the whole
    contiguous occurrence wrapped as ONE <b> span (the PhraseQuery
    highlighting shape, NiceSnippetExtractor.java:195-257 — the
    reference highlights the span, not each constituent)."""
    out = []
    for terms in dict.fromkeys(tuple(t.lower() for t in p if t)
                               for p in phrases):
        if not terms:
            continue
        pat = _phrase_regex(terms)
        m = pat.search(body)
        if not m:
            continue
        lo, hi = _sentence_window(body, m.start(), m.end())
        frag = pat.sub(lambda mm: f"<b>{mm.group(0)}</b>",
                       body[lo:hi].strip())
        if frag:
            out.append(frag)
        if len(out) >= max_fragments:
            break
    return out


def math_fragments(maths: list[ET.Element], query_mterms: set[str],
                   max_fragments: int = MAX_MATH_FRAGMENTS) -> list[str]:
    """Best math spans: each <math> element scored by the MAX weight of
    one of its M-terms matching the query (the payload-desc span order);
    top elements serialized back as highlighted fragments."""
    scored: list[tuple[float, int, str]] = []
    for i, el in enumerate(maths):
        best = 0.0
        for variant in ("P", "C"):
            branch = mathml.select_branch(el, variant)
            if branch is None:
                continue
            for term, w, _pos in mathml.formula_mterms(branch):
                if term in query_mterms and w > best:
                    best = w
        if best > 0.0:
            xml = ET.tostring(el, encoding="unicode")
            scored.append((-best, i, xml[:MAX_MATH_CHARS]))
    scored.sort()
    return [f'<span class="math-hit">{x}</span>'
            for _w, _i, x in scored[:max_fragments]]


#: per-document snippet work budget: fragment extraction scans at most
#: this many chars of content. The reference bounds snippets by WALL
#: CLOCK (0.5 s/doc, Searching.java:73-77) which is nondeterministic;
#: a deterministic scan cap bounds the same cost (parse + regex are
#: linear in scanned chars) without making snippets host-dependent.
#: One pathological multi-megabyte doc can no longer stall its page.
SNIPPET_SCAN_CHARS = 200_000


def make_snippet(content: str, lang: str | None, text_terms: list[str],
                 query_mterms: set[str],
                 phrases: list[tuple[str, ...]] = ()) -> str:
    """Assembled snippet for one result document: math fragments first
    (highest payload), then whole-span phrase fragments, then text
    fragments, " … "-joined. Work per doc is bounded by
    SNIPPET_SCAN_CHARS (the 0.5 s/doc reference budget, made
    deterministic)."""
    content = content or ""
    if len(content) > SNIPPET_SCAN_CHARS:
        # markup clip lands mid-tag; the extractor's regex fallback
        # handles truncated documents
        content = content[:SNIPPET_SCAN_CHARS]
    if _is_markup(content, lang):
        _title, body, _ax, _au, maths = _extract_html_fields(content)
    else:
        body, maths = content, []
    frags = math_fragments(maths, query_mterms)
    frags += phrase_fragments(body, list(phrases))
    frags += text_fragments(body, text_terms)
    return " … ".join(frags)
