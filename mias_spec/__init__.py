"""mias_spec — the frozen, pure-Python specification of the engine.

This package is the single source of truth for every piece of semantics
that must be *bit-identical* between the distributed Spark engine
(`mias_spark`) and the single-process test oracle:

- text analysis (tokenizer + stopwords)        -> analyzer.py
- MathML canonicalization / subformula extraction / unification /
  weighting / M-term serialization             -> mathml.py
- posting-list codecs (varint, delta-gap, 16-bit weight quantization)
                                               -> codec.py
- BM25 scoring composition                     -> scoring.py
- the deterministic synthetic corpus + frozen reference query set
                                               -> corpus.py, queries.py
- the pandas oracle (index build + top-k)      -> oracle.py

It has NO Spark dependency (numpy/pandas only) so it can be shipped to
executors via ``spark-submit --py-files`` and imported inside Arrow UDFs.

Reference behavior surveyed from MIR-MU/MIaS (see SURVEY.md); coefficients
follow the published MIaS papers (Sojka & Liska, DocEng 2011), frozen in
constants.py.
"""

from mias_spec import constants  # noqa: F401
