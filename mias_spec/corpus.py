"""Deterministic synthetic corpus — FIXTURES.md §1.

Shape per BASELINE.json.input_hint: (repo, path, commit, lang, content).
Row index ``i`` is the only source of variation (seed folded into md5);
an identical call yields a byte-identical table.

Three planted formula families mirror the reference fixture ranking
contract (/root/reference/test/{exact,fuzzy,no}-match.xhtml):
  i % 37 == 0  ->  E = m·c^2 (exact family)
  i % 37 == 1  ->  same shape, different identifiers (fuzzy family —
                   reachable only through variable-unified M-terms)
  otherwise    ->  unrelated background formulae
"""

from __future__ import annotations

import hashlib

import pandas as pd

SEED = 42

VARS = ["x", "y", "z", "t", "E", "m", "c", "P"]
FUZZY_VARS = ["F", "g", "a", "b", "d", "w", "u", "q"]
CONSTS = ["1", "2", "9", "42"]
BIN_OPS = ["+", "-", "*", "="]

# 200-word body vocabulary: a themed pool + filler terms
_THEME = """energy mass equivalence relativity electron quantum spacetime
physics theory abstraction observer velocity momentum field particle wave
function operator matrix tensor lorentz einstein minkowski feynman charge
inertia light speed frame reference transformation invariant symmetry
conservation""".split()
VOCAB = _THEME + [f"term{j:03d}" for j in range(200 - len(_THEME))]

_IDENTS = ["compute", "index", "merge", "tokenize", "posting", "shard",
           "query", "weight", "score", "bucket", "partition", "batch"]


def _h(*parts) -> int:
    """Deterministic 64-bit hash stream."""
    s = ":".join(str(p) for p in (SEED,) + parts)
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


# ------------------------------------------------------ MathML rendering

def render_presentation(ast) -> str:
    kind = ast[0]
    if kind == "var":
        return f"<mi>{ast[1]}</mi>"
    if kind == "const":
        return f"<mn>{ast[1]}</mn>"
    op, a, b = ast
    pa, pb = render_presentation(a), render_presentation(b)
    if op == "^":
        return f"<msup>{pa}{pb}</msup>"
    mo = {"+": "+", "-": "−", "*": "⁢", "=": "="}[op]
    return f"<mrow>{pa}<mo>{mo}</mo>{pb}</mrow>"


def render_content(ast) -> str:
    kind = ast[0]
    if kind == "var":
        return f"<ci>{ast[1]}</ci>"
    if kind == "const":
        return f'<cn type="integer">{ast[1]}</cn>'
    op, a, b = ast
    ca, cb = render_content(a), render_content(b)
    if op == "^":
        return ('<apply><csymbol cd="ambiguous">superscript</csymbol>'
                f"{ca}{cb}</apply>")
    tag = {"+": "plus", "-": "minus", "*": "times", "=": "eq"}[op]
    return f"<apply><{tag}/>{ca}{cb}</apply>"


def render_math(ast) -> str:
    """Parallel Presentation + Content MathML, the arXMLiv shape of the
    reference fixtures (exact-match.xhtml:189)."""
    return ('<math xmlns="http://www.w3.org/1998/Math/MathML">'
            "<semantics>"
            + render_presentation(ast)
            + '<annotation-xml encoding="MathML-Content">'
            + render_content(ast)
            + "</annotation-xml></semantics></math>")


EXACT_AST = ("=", ("var", "E"),
             ("*", ("var", "m"), ("^", ("var", "c"), ("const", "2"))))


def fuzzy_ast(i: int):
    """Same tree shape as EXACT_AST, different identifiers."""
    v = [FUZZY_VARS[_h(i, "fz", j) % len(FUZZY_VARS)] for j in range(3)]
    return ("=", ("var", v[0]),
            ("*", ("var", v[1]), ("^", ("var", v[2]), ("const", "2"))))


def random_ast(i: int, slot: int, depth: int = 0):
    r = _h(i, "ast", slot, depth)
    if depth >= 2 or r % 3 == 0:
        if r % 2:
            return ("var", VARS[r % len(VARS)])
        return ("const", CONSTS[r % len(CONSTS)])
    op = (BIN_OPS + ["^"])[r % 5]
    return (op, random_ast(i, slot * 7 + 1, depth + 1),
            random_ast(i, slot * 7 + 2, depth + 1))


# ------------------------------------------------------------- documents

def _sentences(i: int) -> str:
    n_sent = 2 + _h(i, "ns") % 5
    parts = []
    for s in range(n_sent):
        n_w = 6 + _h(i, "nw", s) % 7
        words = [VOCAB[_h(i, "w", s, j) % len(VOCAB)] for j in range(n_w)]
        if s == 0:
            words[-1] = "data"  # planted in every xhtml doc (skew query)
        parts.append(" ".join(words) + ".")
    return " ".join(parts)


def _xhtml(i: int, density: int = 1) -> str:
    fam = i % 37
    title_words = [VOCAB[_h(i, "tw", j) % len(VOCAB)] for j in range(3)]
    if i % 13 == 0:
        title_words.append("relativity")  # title-boost query target
    body = _sentences(i)
    if fam == 0:
        body = "einstein " + body  # mixed text+math query target
    maths = []
    if fam == 0:
        maths.append(render_math(EXACT_AST))
    elif fam == 1:
        maths.append(render_math(fuzzy_ast(i)))
    n_extra = (1 + _h(i, "nm") % 4) * density
    for s in range(n_extra):
        maths.append(render_math(random_ast(i, s + 1)))
    meta = ""
    if i % 5 == 0:
        meta = (f'<meta name="citation_arxiv_id" content="2401.{i:05d}"/>'
                f'<meta name="citation_authors" content="Author {i % 17}"/>')
    segs = body.split(". ")
    body_html = "".join(
        f"<p>{seg} {m}</p>" for seg, m in zip(segs, maths + [""] * 8))
    if density > 1 and len(maths) > len(segs):
        # math-dense mode (arXiv-like: reference README.md:111-115 is
        # ~400 formulae/doc) — keep the formulae the zip would drop
        body_html += "".join(f"<p>{m}</p>" for m in maths[len(segs):])
    return ('<?xml version="1.0"?>'
            '<html xmlns="http://www.w3.org/1999/xhtml">'
            f"<head><title>{' '.join(title_words)}</title>{meta}</head>"
            f"<body><h1>{title_words[0]}</h1>{body_html}</body></html>")


def _markdown(i: int) -> str:
    words = [VOCAB[_h(i, "md", j) % len(VOCAB)] for j in range(20)]
    return (f"# {words[0]} {words[1]}\n\n"
            + " ".join(words[2:12]) + "\n\n- "
            + "\n- ".join(words[12:]))


def _python(i: int) -> str:
    a, b, c = (_IDENTS[_h(i, "py", j) % len(_IDENTS)] for j in range(3))
    return (f"def {a}_{b}(items):\n"
            f"    total = 0\n"
            f"    for {c} in items:\n"
            f"        total += {c}.weight\n"
            f"    return total\n")


def make_corpus(n_rows: int, density: int = 1) -> pd.DataFrame:
    """The deterministic corpus table (FIXTURES.md §1). ``density``
    multiplies the per-document formula count (benchmark knob; the
    default is byte-identical to the golden-file corpus)."""
    rows = []
    for i in range(n_rows):
        sel = i % 10
        if sel < 5:
            ext, lang, content = "xhtml", "xhtml", _xhtml(i, density)
        elif sel < 8:
            ext, lang, content = "md", "markdown", _markdown(i)
        else:
            ext, lang, content = "py", "python", _python(i)
        rows.append({
            "repo": f"org{i % 7}/repo{i % 23}",
            "path": f"src/dir{i % 11}/doc_{i:06d}.{ext}",
            "commit": hashlib.sha256(f"commit-{i // 100}".encode()).hexdigest()[:40],
            "lang": lang,
            "content": content,
        })
    return pd.DataFrame(rows)
