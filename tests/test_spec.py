"""Unit tests of the pure-Python spec (SURVEY.md §5.2 item 1) — no Spark."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mias_spec import codec, constants, corpus, mathml, oracle, queries, scoring
from mias_spec.analyzer import tokenize
from mias_spec.document import content_sha256, doc_key, tokenize_document


# ------------------------------------------------------------------ analyzer

def test_analyzer_basic():
    assert tokenize("The Quick, brown_fox! 42") == ["quick", "brown_fox", "42"]


def test_analyzer_stopwords_and_len():
    assert tokenize("a an and the it") == []
    assert tokenize("x" * 100) == []


# -------------------------------------------------------------------- mathml

EXACT = corpus.render_math(corpus.EXACT_AST)


def _root(xml):
    els = mathml.extract_math_elements(xml)
    assert els
    return els[0]


def test_branch_select_both():
    el = _root(EXACT)
    p = mathml.select_branch(el, "P")
    c = mathml.select_branch(el, "C")
    assert p is not None and c is not None
    assert mathml.serialize(mathml.canonicalize(p)) == \
        "r(i:E,o:=,r(i:m,o:\u2062,sup(i:c,n:2)))"
    assert mathml.serialize(mathml.canonicalize(c)).startswith("a(eq,")


def test_canonicalize_idempotent():
    el = _root(EXACT)
    n = mathml.select_branch(el, "P")
    c1 = mathml.canonicalize(n)
    assert mathml.canonicalize(c1) == c1


def test_commutative_ordering():
    ab = corpus.render_math(("+", ("var", "a"), ("var", "b")))
    ba = corpus.render_math(("+", ("var", "b"), ("var", "a")))
    ta = mathml.serialize(mathml.canonicalize(mathml.select_branch(_root(ab), "P")))
    tb = mathml.serialize(mathml.canonicalize(mathml.select_branch(_root(ba), "P")))
    assert ta == tb
    # non-commutative must NOT be reordered
    amb = corpus.render_math(("-", ("var", "a"), ("var", "b")))
    bma = corpus.render_math(("-", ("var", "b"), ("var", "a")))
    sa = mathml.serialize(mathml.canonicalize(mathml.select_branch(_root(amb), "P")))
    sb = mathml.serialize(mathml.canonicalize(mathml.select_branch(_root(bma), "P")))
    assert sa != sb


def test_subformula_weights_and_unification():
    el = _root(EXACT)
    terms = mathml.formula_mterms(mathml.select_branch(el, "P"))
    by_term = {t: w for t, w, _ in terms}
    # whole formula weight 1.0; var-unified variant 0.8
    assert by_term["r(i:E,o:=,r(i:m,o:\u2062,sup(i:c,n:2)))"] == pytest.approx(1.0)
    assert by_term["r(i:§v,o:=,r(i:§v,o:\u2062,sup(i:§v,n:2)))"] == pytest.approx(
        constants.W_VAR_UNIFIED)
    # depth-1 subformula (m·c^2) weight 0.7
    assert by_term["r(i:m,o:\u2062,sup(i:c,n:2))"] == pytest.approx(constants.W_LEVEL)
    # depth-2 leaf E... E is depth 1: weight 0.7; c^2 depth 2: 0.49
    assert by_term["sup(i:c,n:2)"] == pytest.approx(constants.W_LEVEL ** 2)
    # const-unified of whole formula: 0.5
    assert by_term["r(i:E,o:=,r(i:m,o:\u2062,sup(i:c,n:§c)))"] == pytest.approx(
        constants.W_CONST_UNIFIED)
    # variants share base position
    pos = {p for t, w, p in terms if "sup(i:c" in t and t.startswith("sup")}
    assert len(pos) == 1


def test_query_reduce_weighting():
    el = _root(EXACT)
    plain = dict((t, w) for t, w, _ in mathml.formula_mterms(
        mathml.select_branch(el, "P"), reduce_weighting=False))
    red = dict((t, w) for t, w, _ in mathml.formula_mterms(
        mathml.select_branch(el, "P"), reduce_weighting=True))
    uni = "r(i:§v,o:=,r(i:§v,o:\u2062,sup(i:§v,n:2)))"
    base = "r(i:E,o:=,r(i:m,o:\u2062,sup(i:c,n:2)))"
    assert red[uni] == pytest.approx(plain[uni] * constants.W_QUERY_REDUCE)
    assert red[base] == plain[base]


# --------------------------------------------------------------------- codec

@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=300))
@settings(max_examples=50, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert (codec.decode_varints(codec.encode_varints(arr), len(arr)) == arr).all()


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1,
                max_size=200, unique=True))
@settings(max_examples=50, deadline=None)
def test_docid_roundtrip(vals):
    arr = np.array(sorted(vals), dtype=np.int64)
    assert (codec.decode_doc_ids(codec.encode_doc_ids(arr), len(arr)) == arr).all()


def test_weight_quantization():
    assert codec.quantize_weight(1.0) == 1.0
    w = codec.quantize_weight(0.7)
    assert abs(w - 0.7) < 1e-3
    arr = np.array([0.7, 0.49, 10.0], dtype=np.float64)
    q = codec.quantize_weights(arr)
    assert (codec.decode_f16(codec.encode_f16(q)) == q.astype(np.float32)).all()


# -------------------------------------------------------------------- corpus

def test_corpus_deterministic():
    a = corpus.make_corpus(100)
    b = corpus.make_corpus(100)
    pd.testing.assert_frame_equal(a, b)
    assert set(a.lang) == {"xhtml", "markdown", "python"}


def test_doc_tokenize_fields():
    c = corpus.make_corpus(10)
    row = c[c.lang == "xhtml"].iloc[0]
    d = tokenize_document(row.content, row.lang)
    fields = {f for f, *_ in d.tokens}
    assert fields == {"content", "title", "pmath", "cmath"}
    tw = {w for f, t, p, w in d.tokens if f == "title"}
    assert tw == {10.0}
    py = c[c.lang == "python"].iloc[0]
    dpy = tokenize_document(py.content, py.lang)
    assert {f for f, *_ in dpy.tokens} == {"content"}


def test_doc_key_stable():
    assert doc_key("r", "p", "c") == doc_key("r", "p", "c")
    assert content_sha256("x") != content_sha256("y")


# -------------------------------------------------------------------- oracle

@pytest.fixture(scope="module")
def tiny_index():
    c = corpus.make_corpus(300)
    return c, oracle.build_index(c)


def test_ranking_contract(tiny_index):
    """exact > fuzzy > background — the reference fixture contract
    (/root/reference/test/{exact,fuzzy,no}-match.xhtml)."""
    import re
    c, idx = tiny_index
    d2i = {r.doc_id: int(re.search(r"doc_(\d+)", r.path).group(1))
           for r in idx.docs.itertuples()}
    exact_docs = {i for i in range(300) if i % 37 == 0 and i % 10 < 5}
    fuzzy_docs = {i for i in range(300) if i % 37 == 1 and i % 10 < 5}
    r = oracle.search(idx, corpus.render_math(corpus.EXACT_AST), "BOTH", 20)
    fam = ["E" if d2i[d] in exact_docs else "F" if d2i[d] in fuzzy_docs
           else "." for d in r.doc_id]
    n_e, n_f = len(exact_docs), len(fuzzy_docs)
    assert fam[:n_e] == ["E"] * n_e          # all exact docs first
    assert fam[n_e:n_e + n_f] == ["F"] * n_f  # then all fuzzy docs


def test_fuzzy_query_only_unified(tiny_index):
    c, idx = tiny_index
    from mias_spec.queries import FUZZY_QUERY_AST
    r = oracle.search(idx, corpus.render_math(FUZZY_QUERY_AST), "BOTH", 8)
    assert len(r) == 8  # unification reaches same-shape docs


def test_empty_and_paging(tiny_index):
    c, idx = tiny_index
    assert len(oracle.search(idx, "zzznothing")) == 0
    full = oracle.search(idx, "energy", k=20)
    page = oracle.search(idx, "energy", k=10, offset=10)
    pd.testing.assert_frame_equal(
        full.iloc[10:20].reset_index(drop=True), page.reset_index(drop=True))


def test_must_semantics(tiny_index):
    c, idx = tiny_index
    both = oracle.search(idx, "electron quantum", k=1000)
    e = oracle.search(idx, "electron", k=1000)
    q = oracle.search(idx, "quantum", k=1000)
    assert set(both.doc_id) == set(e.doc_id) & set(q.doc_id)


def test_norms_count_overlapping_variants(tiny_index):
    """dl counts every emitted unified variant (Indexing.java:80)."""
    c, idx = tiny_index
    row = c[c.lang == "xhtml"].iloc[0]
    d = tokenize_document(row.content, row.lang)
    n_pmath = sum(1 for f, *_ in d.tokens if f == "pmath")
    n_pos = len({p for f, t, p, w in d.tokens if f == "pmath"})
    assert n_pmath > n_pos  # variants overlap positions but all count


def test_bm25_reference_value():
    # frozen spot value so the formula can never silently change
    assert scoring.bm25(tf=2, df=5, dl=20, n_docs=100, avgdl=25) == \
        pytest.approx(scoring.idf(100, 5) * 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 0.8)))


def test_snippets_pure():
    """Snippet spec: sentence-bounded text fragments with highlighting;
    math fragments ranked by matched M-term weight."""
    from mias_spec import mathml
    from mias_spec.corpus import EXACT_AST, render_math
    from mias_spec.snippets import make_snippet, text_fragments
    body = ("Alpha beta gamma. The energy of the system rises. "
            "Unrelated tail sentence here.")
    frags = text_fragments(body, ["energy"])
    assert len(frags) == 1
    assert "<b>energy</b>" in frags[0]
    assert "Alpha" not in frags[0]          # sentence-bounded
    # full snippet over an xhtml doc with the exact formula
    doc = ('<?xml version="1.0"?><html xmlns="http://www.w3.org/1999/xhtml">'
           "<head><title>t</title></head><body><p>energy rises "
           + render_math(EXACT_AST) + "</p></body></html>")
    el = mathml.extract_math_elements(doc)[0]
    branch = mathml.select_branch(el, "P")
    mterms = {t for t, _w, _p in mathml.formula_mterms(branch)}
    s = make_snippet(doc, "xhtml", ["energy"], mterms)
    assert "math-hit" in s and "<b>energy</b>" in s


def test_corpus_density_default_unchanged():
    """density=1 must stay byte-identical (golden-file contract)."""
    from mias_spec.corpus import make_corpus
    a = make_corpus(50)
    b = make_corpus(50, density=1)
    assert (a["content"] == b["content"]).all()
    dense = make_corpus(50, density=8)
    assert dense["content"].str.len().sum() > a["content"].str.len().sum() * 3


def test_properties_config_load(tmp_path):
    """mias.properties parsing (Settings.java:96-175 surface)."""
    from mias_spark.config import MiasConfig
    p = tmp_path / "mias.properties"
    p.write_text(
        "# comment\nINDEXDIR=/tmp/myix\nUPDATE=false\nMAXRESULTS=500\n"
        "DOCLIMIT=100\nTHREADS=4\nFORMULA_DOCUMENTS=true\n")
    c = MiasConfig.load(str(p))
    assert c.index_dir == "/tmp/myix"
    assert c.update is False
    assert c.max_results == 500
    assert c.doc_limit == 100
    assert c.threads == 4 and c.spark_cpus() == "4"
    assert c.formula_docs is True
    d = MiasConfig()
    assert d.max_results == 1000 and d.doc_limit is None


def test_varint_split_matches_per_block():
    """encode_varints_split(vals, starts) must equal per-slice encodes."""
    import numpy as np
    from mias_spec.codec import encode_varints, encode_varints_split
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 2**40, size=1000, dtype=np.uint64)
    starts = np.array(sorted(rng.choice(np.arange(1, 1000), 7,
                                        replace=False).tolist() + [0]))
    parts = encode_varints_split(vals, starts)
    bounds = list(starts) + [len(vals)]
    for i, p in enumerate(parts):
        assert p == encode_varints(vals[bounds[i]:bounds[i + 1]])
    assert encode_varints_split(np.array([], dtype=np.uint64),
                                np.array([], dtype=np.int64)) == []


def test_query_parser_syntax():
    """Phrase / MUST_NOT / field-prefix surface of compile_query
    (the MultiFieldQueryParser analog, Searching.java:254-257)."""
    from mias_spec.queries import compile_query
    q = compile_query('energy "items total" -momentum title:light '
                      '-"return total"')
    # bare term -> one group over both fields
    eg = [c for c in q.clauses if c.term == "energy"]
    assert {c.fld for c in eg} == {"content", "title"}
    assert len({c.group for c in eg}) == 1
    # field prefix -> single-field clause, own group
    lg = [c for c in q.clauses if c.term == "light"]
    assert [(c.fld,) for c in lg] == [("title",)]
    # phrase -> PhraseClause per field, shared group
    must = [p for p in q.phrases if not p.must_not]
    assert {p.terms for p in must} == {("items", "total")}
    assert {p.fld for p in must} == {"content", "title"}
    assert len({p.group for p in must}) == 1
    # MUST_NOT term + phrase
    assert {c.term for c in q.prohibited} == {"momentum"}
    notp = [p for p in q.phrases if p.must_not]
    assert {p.terms for p in notp} == {("return", "total")}
    # groups: energy, phrase, title:light = 3 (negatives don't count)
    assert q.n_groups == 3
    # stopwords inside a phrase are elided, 1-term phrases degrade
    q2 = compile_query('"the energy"')
    assert not q2.phrases and q2.n_groups == 1
    # quoting-only query with all stopwords matches nothing, parses fine
    q3 = compile_query('"the a"')
    assert q3.n_groups == 0 and not q3.clauses


def test_oracle_phrase_semantics():
    """Phrase tf counts occurrences; adjacency is post-stopword."""
    import pandas as pd
    from mias_spec import oracle as O
    c = pd.DataFrame([
        {"repo": "r", "path": "a.txt", "commit": "0", "lang": "text",
         "content": "alpha beta gamma alpha beta the beta"},
        {"repo": "r", "path": "b.txt", "commit": "0", "lang": "text",
         "content": "alpha the beta gamma"},  # stopword elided: adjacent
        {"repo": "r", "path": "c.txt", "commit": "0", "lang": "text",
         "content": "alpha gamma beta"},      # not adjacent
    ])
    idx = O.build_index(c)
    hits = O.search(idx, '"alpha beta"', k=10)
    keys = idx.docs.set_index("doc_id").loc[hits["doc_id"], "doc_key"]
    import hashlib
    def dk(p):
        return hashlib.sha256(f"r|{p}|0".encode()).hexdigest()
    assert set(keys) == {dk("a.txt"), dk("b.txt")}


def test_query_parser_fuzz_never_crashes():
    """Property: compile_query accepts ANY string (queries come from
    users) and its group-id invariants always hold."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mias_spec.queries import compile_query

    @given(st.text(max_size=200))
    @settings(max_examples=300, deadline=None)
    def check(s):
        q = compile_query(s)
        gids = {c.group for c in q.clauses} | \
            {p.group for p in q.phrases if not p.must_not}
        assert gids <= set(range(q.n_groups))
        assert all(c.group == -1 for c in q.prohibited)
        assert all(p.group == -1 for p in q.phrases if p.must_not)
        assert all(len(p.terms) >= 2 for p in q.phrases)

    check()


def test_field_scoped_phrase_parse():
    """title:"a b" must parse as a single-field PHRASE (review fix),
    not a fielded term plus a stray bare term."""
    from mias_spec.queries import compile_query
    q = compile_query('title:"items total" -content:"return total"')
    must = [p for p in q.phrases if not p.must_not]
    assert [(p.fld, p.terms) for p in must] == \
        [("title", ("items", "total"))]
    notp = [p for p in q.phrases if p.must_not]
    assert [(p.fld, p.terms) for p in notp] == \
        [("content", ("return", "total"))]
    assert not q.clauses and q.n_groups == 1


def test_snippet_budget_pathological_doc():
    """Round-3 VERDICT #9: one pathological multi-megabyte document
    must not stall a display page — make_snippet's work is bounded by
    SNIPPET_SCAN_CHARS (the reference's 0.5 s/doc budget,
    Searching.java:73-77, made deterministic), and a match inside the
    scanned window still highlights."""
    import time

    from mias_spec.snippets import SNIPPET_SCAN_CHARS, make_snippet
    head = "energy equivalence holds. "
    body = head + ("filler words without matches here. " * 400_000)
    assert len(body) > 10 * SNIPPET_SCAN_CHARS
    t0 = time.monotonic()
    s = make_snippet(body, "text", ["energy"], set())
    dt = time.monotonic() - t0
    assert "<b>energy</b>" in s
    assert dt < 5.0, f"snippet took {dt:.1f}s on a pathological doc"
