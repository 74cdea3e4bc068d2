"""Per-document field extraction + tokenization — the HtmlDocument /
FileDocument analog (reference: indexing/doc/HtmlDocument.java:26-64,
HtmlDocumentExtractor.java:60-169).

``tokenize_document(content, lang)`` is THE per-document pipeline, used
verbatim by the Spark ``mapInPandas`` UDF and by the pandas oracle.
"""

from __future__ import annotations

import hashlib
import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

from mias_spec import mathml
from mias_spec.analyzer import tokenize
from mias_spec.codec import quantize_weight
from mias_spec.constants import (
    FIELD_CMATH,
    FIELD_CONTENT,
    FIELD_PMATH,
    FIELD_TITLE,
    TEXT_WEIGHT,
    TITLE_BOOST,
)

_TAG_STRIP_RE = re.compile(r"<[^>]+>")
_MATH_SPAN_RE = re.compile(r"<math\b.*?</math\s*>", re.DOTALL)


@dataclass
class DocTokens:
    """Extracted fields + the flat token stream of one document."""
    title: str = ""
    arxiv_id: str | None = None
    authors: str | None = None
    n_formulae: int = 0
    # (field, term, position, quantized_weight)
    tokens: list[tuple[str, str, int, float]] = field(default_factory=list)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1] if "}" in tag else tag


def _collect_text(el: ET.Element, out: list[str]) -> None:
    """Recursive text of an element, skipping any *math* elements
    (HtmlDocumentExtractor.java:151-169 skips math in body text)."""
    if _local(el.tag) == "math":
        if el.tail:
            out.append(el.tail)
        return
    if el.text:
        out.append(el.text)
    for c in el:
        _collect_text(c, out)
    if el.tail:
        out.append(el.tail)


def _extract_html_fields(content: str) -> tuple[str, str, str | None, str | None, list[ET.Element]]:
    """(title, body_text, arxiv_id, authors, math_elements)."""
    try:
        root = ET.fromstring(content)
    except ET.ParseError:
        # fallback: regex strip (robust path for malformed docs)
        maths = mathml.extract_math_elements(content)
        text = _TAG_STRIP_RE.sub(" ", _MATH_SPAN_RE.sub(" ", content))
        m = re.search(r"<title[^>]*>(.*?)</title>", content, re.DOTALL)
        return (m.group(1).strip() if m else "", text, None, None, maths)

    title = ""
    arxiv_id = None
    authors = None
    body_text_parts: list[str] = []
    maths: list[ET.Element] = []
    first_h1 = None
    citation_title = None
    for el in root.iter():
        tag = _local(el.tag)
        if tag == "title" and not title:
            title = "".join(el.itertext()).strip()
        elif tag == "meta":
            name = el.get("name", "")
            if name == "citation_title":
                citation_title = el.get("content", "")
            elif name == "citation_arxiv_id":
                arxiv_id = el.get("content") or None
            elif name == "citation_authors":
                authors = el.get("content") or None
        elif tag == "h1" and first_h1 is None:
            first_h1 = "".join(el.itertext()).strip()
        elif tag == "math":
            maths.append(el)
        elif tag == "body":
            _collect_text(el, body_text_parts)
    # title fallback chain (HtmlDocumentExtractor.java:60-96)
    if not title:
        title = citation_title or first_h1 or ""
    return title, "".join(body_text_parts), arxiv_id, authors, maths


def _is_markup(content: str, lang: str | None) -> bool:
    if lang and lang.lower() in ("xhtml", "html", "xml"):
        return True
    head = content.lstrip()[:200].lower()
    return head.startswith("<?xml") or head.startswith("<!doctype") or head.startswith("<html")


def tokenize_document(content: str, lang: str | None = None) -> DocTokens:
    """Full per-document pipeline: field extraction + analyzed text
    tokens (content weight 1.0, title weight 10.0) + weighted M-terms
    for pmath/cmath. Weights are 16-bit-quantized at emission."""
    doc = DocTokens()
    if content is None:
        return doc
    if _is_markup(content, lang):
        title, body, arxiv_id, authors, maths = _extract_html_fields(content)
        doc.title, doc.arxiv_id, doc.authors = title, arxiv_id, authors
        doc.n_formulae = len(maths)
        w_text = quantize_weight(TEXT_WEIGHT)
        w_title = quantize_weight(TITLE_BOOST)
        for pos, term in enumerate(tokenize(body)):
            doc.tokens.append((FIELD_CONTENT, term, pos, w_text))
        for pos, term in enumerate(tokenize(title)):
            doc.tokens.append((FIELD_TITLE, term, pos, w_title))
        for fld, variant in ((FIELD_PMATH, "P"), (FIELD_CMATH, "C")):
            for term, pos, w in mathml.math_field_tokens(maths, variant):
                doc.tokens.append((fld, term, pos, quantize_weight(w)))
    else:
        w_text = quantize_weight(TEXT_WEIGHT)
        for pos, term in enumerate(tokenize(content)):
            doc.tokens.append((FIELD_CONTENT, term, pos, w_text))
    return doc


def doc_key(repo: str, path: str, commit: str) -> str:
    """Stable document key — sha256 over the corpus primary key columns
    (BASELINE.json.input_hint). Dense doc_ids are assigned by sorted
    doc_key order (identical in engine and oracle)."""
    return hashlib.sha256(f"{repo}|{path}|{commit}".encode()).hexdigest()


def content_sha256(content: str) -> str:
    """Per-row ingest invariant (input_hint: content sha256 equality)."""
    return hashlib.sha256((content or "").encode()).hexdigest()
