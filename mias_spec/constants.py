"""Frozen constants of the engine spec.

The math-weighting coefficients mirror the published MIaS/MIaSMath
semantics (the library itself is an external dependency of the reference,
/root/reference/pom.xml:24-28; defaults below follow the DocEng 2011 paper
cited at /root/reference/README.md:84-117). Changing any value here
invalidates every golden file — treat as frozen.
"""

# ---------------------------------------------------------------- math weights
W_INITIAL = 1.0          # weight of a whole <math> formula
W_LEVEL = 0.7            # per-depth-level coefficient for subformulae
W_VAR_UNIFIED = 0.8      # variant with all variables unified
W_CONST_UNIFIED = 0.5    # variant with all constants unified
W_QUERY_REDUCE = 0.5     # query-side extra discount for unified variants
                         # (MIaS `reduceWeighting`, Searching.java:267)

UNIFIED_VAR = "§v"    # §v — the unified-variable symbol
UNIFIED_CONST = "§c"  # §c — the unified-constant symbol

# ------------------------------------------------------------------- fields
FIELD_CONTENT = "content"
FIELD_TITLE = "title"
FIELD_PMATH = "pmath"    # Presentation MathML M-terms
FIELD_CMATH = "cmath"    # Content MathML M-terms
ALL_FIELDS = (FIELD_CONTENT, FIELD_TITLE, FIELD_PMATH, FIELD_CMATH)

# index-time field boost, carried as the token payload weight
# (reference: HtmlDocument.java:38-44 boosts title by 10.0)
TITLE_BOOST = 10.0
TEXT_WEIGHT = 1.0

# ---------------------------------------------------------------------- BM25
BM25_K1 = 1.2
BM25_B = 0.75

# ------------------------------------------------------------------ analyzer
# Lucene StandardAnalyzer's frozen English stopword set
# (reference: Indexing.java:44,78 / Searching.java:254)
STOPWORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or
    such that the their then there these they this to was will with""".split()
)
MAX_TOKEN_LEN = 64

# ------------------------------------------------------------------- codecs
BLOCK_SIZE = 128         # postings per compressed block (block-max WAND)
SALT_DOC_RANGE = 1 << 20  # hot-term posting lists split every 2^20 doc ids
SALT_DF_THRESHOLD = 100_000  # df above which a term is treated as skewed

# MathML element dictionary — compact codes for M-term serialization
# (analog of MIaSMath MathMLConf.getElementDictionary(),
#  used at /root/reference/src/main/java/cz/muni/fi/mias/InDocProcessing.java:174)
TAG_DICT = {
    "math": "m", "mrow": "r", "mi": "i", "mo": "o", "mn": "n",
    "msup": "sup", "msub": "sub", "msubsup": "subsup", "mfrac": "f",
    "msqrt": "sq", "mroot": "rt", "mfenced": "fen", "mtable": "tbl",
    "mtr": "tr", "mtd": "td", "mover": "ov", "munder": "un",
    "munderover": "unov", "mtext": "t", "mstyle": "st", "mspace": "sp",
    "mpadded": "pad", "merror": "err", "mphantom": "ph",
    # content MathML
    "apply": "a", "ci": "ci", "cn": "cn", "csymbol": "cs",
    "eq": "eq", "plus": "pl", "minus": "mi-", "times": "ti",
    "divide": "dv", "power": "pw", "root": "ro", "list": "ls",
    "interval": "iv", "lambda": "lm", "bvar": "bv",
}

# elements dropped entirely during canonicalization
# (analog of MathMLConf.getIgnoreNode())
IGNORE_TAGS = frozenset({
    "annotation", "maligngroup", "malignmark", "mglyph", "none",
    "mprescripts", "maction",
})

# commutative operators — operand order canonicalized
COMMUTATIVE_MO = frozenset({"+", "=", "⋅", "⁢", "*", "·"})
COMMUTATIVE_CONTENT = frozenset({"plus", "times", "eq", "and", "or",
                                 "union", "intersect"})

# presentation leaves whose text is a "variable" vs a "constant"
VAR_TAGS = frozenset({"mi", "ci"})
CONST_TAGS = frozenset({"mn", "cn"})
OP_TAGS = frozenset({"mo"})
