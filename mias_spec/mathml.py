"""MathML canonicalization, subformula extraction, unification and
M-term serialization — the engine's MathTokenizer analog.

Reference semantics surveyed in SURVEY.md §0.2 (MIaSMath MathTokenizer as
used at /root/reference/src/main/java/cz/muni/fi/mias/indexing/doc/
HtmlDocument.java:58-61 and search/Searching.java:266-294):

1. branch select (PRESENTATION / CONTENT) from ``<semantics>``
2. canonicalize: drop attributes + ignorable nodes, unwrap single-child
   ``<mrow>``, normalize text
3. canonical ordering of commutative-operator operands
4. every subtree is a subformula; weight = W_INITIAL * W_LEVEL^depth
5. unification variants: vars->§v (×W_VAR_UNIFIED), consts->§c
   (×W_CONST_UNIFIED), both (×product); query side optionally discounts
   unified variants by W_QUERY_REDUCE (``reduceWeighting``)
6. serialize via the compact TAG_DICT; variants share the base
   subformula's token position (overlaps -> norms count every variant,
   Indexing.java:80 ``setDiscountOverlaps(false)``)

A formula node is an immutable tuple ``(tag, text, children)`` where
``tag`` is the MathML localname, ``text`` is leaf text (None for inner
nodes) and ``children`` is a tuple of nodes.

Pure Python (stdlib xml.etree + re) — imported by both the Spark Arrow
UDFs and the pandas oracle.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from mias_spec.constants import (
    COMMUTATIVE_CONTENT,
    COMMUTATIVE_MO,
    CONST_TAGS,
    IGNORE_TAGS,
    TAG_DICT,
    UNIFIED_CONST,
    UNIFIED_VAR,
    VAR_TAGS,
    W_CONST_UNIFIED,
    W_INITIAL,
    W_LEVEL,
    W_QUERY_REDUCE,
    W_VAR_UNIFIED,
)

Node = tuple  # (tag: str, text: str | None, children: tuple[Node, ...])

MATHML_NS = "http://www.w3.org/1998/Math/MathML"
# serialize extracted fragments as default-namespace <math>, not ns0:
ET.register_namespace("", MATHML_NS)

_MATH_RE = re.compile(r"<math\b.*?</math\s*>", re.DOTALL)
_WS_RE = re.compile(r"\s+")


def _local(tag: str) -> str:
    """Strip XML namespace: '{uri}mi' -> 'mi'."""
    return tag.rsplit("}", 1)[-1] if "}" in tag else tag


def element_to_node(el: ET.Element) -> Node | None:
    """Convert an ElementTree element into a spec node, dropping
    attributes and ignorable elements."""
    tag = _local(el.tag)
    if tag in IGNORE_TAGS:
        return None
    if tag == "annotation-xml":
        # handled explicitly during branch selection; ignore elsewhere
        return None
    children = []
    for c in el:
        n = element_to_node(c)
        if n is not None:
            children.append(n)
    if children:
        return (tag, None, tuple(children))
    text = _WS_RE.sub(" ", (el.text or "")).strip()
    return (tag, text if text else None, ())


# --------------------------------------------------------------- branch select

def select_branch(math_el: ET.Element, variant: str) -> Node | None:
    """Pick the Presentation ('P') or Content ('C') branch of a <math>
    element (fixture evidence: parallel branches inside <semantics>,
    /root/reference/test/exact-match.xhtml:189)."""
    sem = None
    for c in math_el:
        if _local(c.tag) == "semantics":
            sem = c
            break
    if variant == "C":
        scope = sem if sem is not None else math_el
        for c in scope.iter():
            if (_local(c.tag) == "annotation-xml"
                    and c.get("encoding") == "MathML-Content"):
                kids = [element_to_node(k) for k in c]
                kids = [k for k in kids if k is not None]
                if not kids:
                    return None
                return kids[0] if len(kids) == 1 else ("mrow", None, tuple(kids))
        return None
    # PRESENTATION: children of <semantics> before any annotation(-xml),
    # else the <math> children directly
    scope = sem if sem is not None else math_el
    kids = []
    for c in scope:
        if _local(c.tag) in ("annotation", "annotation-xml", "semantics"):
            continue
        n = element_to_node(c)
        if n is not None:
            kids.append(n)
    if not kids:
        return None
    return kids[0] if len(kids) == 1 else ("mrow", None, tuple(kids))


# -------------------------------------------------------------- canonicalize

def canonicalize(node: Node) -> Node:
    """Unwrap single-child <mrow>s, order commutative operands, normalize."""
    tag, text, children = node
    children = tuple(canonicalize(c) for c in children)
    # unwrap redundant mrow
    if tag == "mrow" and len(children) == 1:
        return children[0]
    if children:
        children = _order_commutative(tag, children)
        return (tag, None, children)
    return (tag, text, ())


def _order_commutative(tag: str, children: tuple) -> tuple:
    # Presentation: mrow of [a, op, b, op, c ...] with one commutative op
    if tag == "mrow" and len(children) >= 3 and len(children) % 2 == 1:
        ops = children[1::2]
        operands = children[0::2]
        if all(o[0] == "mo" and o[1] in COMMUTATIVE_MO for o in ops):
            op_texts = {o[1] for o in ops}
            if len(op_texts) == 1:
                ordered = tuple(sorted(operands, key=serialize))
                out = []
                for i, operand in enumerate(ordered):
                    if i:
                        out.append(ops[0])
                    out.append(operand)
                return tuple(out)
    # Content: apply(op, args...) with commutative op
    if tag == "apply" and len(children) >= 3:
        head = children[0]
        if head[0] in COMMUTATIVE_CONTENT and not head[2]:
            args = tuple(sorted(children[1:], key=serialize))
            return (head,) + args
    return children


# --------------------------------------------------------------- serialize

def serialize(node: Node) -> str:
    """Compact M-term string via TAG_DICT (analog of
    Formula.nodeToString + element dictionary, InDocProcessing.java:174)."""
    tag, text, children = node
    code = TAG_DICT.get(tag, tag)
    if children:
        return code + "(" + ",".join(serialize(c) for c in children) + ")"
    if text is not None:
        return code + ":" + text
    return code


# ------------------------------------------------------------- subformulae

def subformulae(node: Node) -> list[tuple[Node, int]]:
    """All subtrees with their depth below the formula root. Operator
    leaves (mo / content operator symbols) are not subformulae on their
    own."""
    out: list[tuple[Node, int]] = []

    def walk(n: Node, depth: int) -> None:
        tag, text, children = n
        if _is_substantive(n):
            out.append((n, depth))
        for c in children:
            walk(c, depth + 1)

    walk(node, 0)
    return out


def _is_substantive(n: Node) -> bool:
    tag, text, children = n
    if children:
        return True
    if tag == "mo":
        return False
    if tag in COMMUTATIVE_CONTENT or tag in ("csymbol",):
        return False
    return text is not None


# -------------------------------------------------------------- unification

def unify_vars(node: Node) -> Node:
    tag, text, children = node
    if children:
        return (tag, None, tuple(unify_vars(c) for c in children))
    if tag in VAR_TAGS and text is not None:
        return (tag, UNIFIED_VAR, ())
    return node


def unify_consts(node: Node) -> Node:
    tag, text, children = node
    if children:
        return (tag, None, tuple(unify_consts(c) for c in children))
    if tag in CONST_TAGS and text is not None:
        return (tag, UNIFIED_CONST, ())
    return node


# ----------------------------------------------------------------- tokenize

def formula_mterms(
    root: Node,
    extract_subformulae: bool = True,
    reduce_weighting: bool = False,
) -> list[tuple[str, float, int]]:
    """Produce the weighted M-term variants of one formula.

    Returns ``[(mterm, weight, local_pos)]`` — ``local_pos`` is the
    0-based subformula ordinal within this formula; all unification
    variants of a subformula share its position (overlapping tokens).
    """
    root = canonicalize(root)
    subs = subformulae(root) if extract_subformulae else [(root, 0)]
    reduce_f = W_QUERY_REDUCE if reduce_weighting else 1.0
    out: list[tuple[str, float, int]] = []
    for pos, (sub, depth) in enumerate(subs):
        w = W_INITIAL * (W_LEVEL ** depth)
        base = serialize(sub)
        out.append((base, w, pos))
        uv = unify_vars(sub)
        uc = unify_consts(sub)
        ub = unify_consts(uv)
        s_uv, s_uc, s_ub = serialize(uv), serialize(uc), serialize(ub)
        if s_uv != base:
            out.append((s_uv, w * W_VAR_UNIFIED * reduce_f, pos))
        if s_uc != base:
            out.append((s_uc, w * W_CONST_UNIFIED * reduce_f, pos))
        if s_ub not in (base, s_uv, s_uc):
            out.append((s_ub, w * W_VAR_UNIFIED * W_CONST_UNIFIED * reduce_f, pos))
    return out


def extract_math_elements(content: str) -> list[ET.Element]:
    """Find all <math> elements in a document string. Tries a full XML
    parse first; falls back to regex extraction of <math>…</math> spans
    for non-well-formed inputs."""
    els: list[ET.Element] = []
    try:
        root = ET.fromstring(content)
        for el in root.iter():
            if _local(el.tag) == "math":
                els.append(el)
        return els
    except ET.ParseError:
        pass
    for m in _MATH_RE.finditer(content):
        try:
            els.append(ET.fromstring(m.group(0)))
        except ET.ParseError:
            continue
    return els


def math_field_tokens(
    math_elements: list[ET.Element],
    variant: str,
    extract_subs: bool = True,
    reduce_weighting: bool = False,
) -> list[tuple[str, int, float]]:
    """Tokens ``(term, position, weight)`` for one math field ('P'->pmath
    or 'C'->cmath) over a document's <math> elements. Positions are
    contiguous subformula ordinals across the whole field; variants of a
    subformula share its position."""
    out: list[tuple[str, int, float]] = []
    pos_base = 0
    for el in math_elements:
        branch = select_branch(el, variant)
        if branch is None:
            continue
        mterms = formula_mterms(branch, extract_subs, reduce_weighting)
        max_pos = -1
        for term, w, lpos in mterms:
            out.append((term, pos_base + lpos, w))
            max_pos = max(max_pos, lpos)
        pos_base += max_pos + 1
    return out
