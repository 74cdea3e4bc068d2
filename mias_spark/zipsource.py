"""S2 zip-archive expansion — FileExtDocumentHandler.java:44-63 +
ZipEntryDocument.java, re-expressed for a binary-blob corpus table.

The reference walks a directory tree and, for ``.zip`` files, emits one
logical document per non-directory archive entry, re-deriving the
extension per entry with a ``#``-suffix rule (an entry named
``doc.xhtml#frag`` has extension ``xhtml``: the fragment marker only
truncates when it FOLLOWS the last dot). Here archives arrive as rows
``(repo, path, commit, blob)`` of a DataFrame and expand in the
EXECUTORS via an Arrow ``mapInPandas`` — the driver never touches
archive bytes, and the output is ordinary corpus rows ready for
``build_index`` / ``upsert``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

CORPUS_SCHEMA = ("repo string, path string, commit string, lang string, "
                 "content string")

#: extension -> analyzer lang (mirrors the corpus generator's mapping;
#: unknown extensions pass through so the extension dispatch in
#: mias_spec.document decides)
EXT_LANG = {"xhtml": "xhtml", "html": "xhtml", "md": "markdown",
            "py": "python", "txt": "text"}


def entry_ext(name: str) -> str:
    """Extension of a zip entry name under the reference's '#' rule
    (FileExtDocumentHandler.java:54-57): chars after the last '.' up to
    the last '#' — unless that '#' precedes the dot, in which case to
    the end of the name."""
    dot = name.rfind(".")
    if dot < 0:
        return ""
    hashp = name.rfind("#")
    end = hashp if hashp > dot else len(name)
    return name[dot + 1:end]


def expand_zip_corpus(zips: DataFrame,
                      include_errors: bool = False) -> DataFrame:
    """``(repo, path, commit, blob)`` archive rows -> corpus rows, one
    per non-directory entry; entry docs inherit (repo, commit) and get
    ``<zip path>#<entry name>`` as their path (a stable unique doc
    key, like the reference's zip-entry document naming).

    Corrupt/truncated archives are SKIPPED, not fatal: one bad blob in
    a million-archive corpus must not abort the whole build on every
    task retry (the reference's directory walker likewise skips
    unreadable files). Error rows (``lang='_zip_error'``, content =
    the error string) are FILTERED OUT of the default output so a
    pipeline feeding this straight into build_index can never index
    the error strings as documents (ADVICE r3); pass
    ``include_errors=True`` for the raw surface, or use
    ``zip_errors`` for the dead-letter side alone."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import zipfile
        for pdf in batches:
            rows = []
            for repo, path, commit, blob in zip(
                    pdf["repo"], pdf["path"], pdf["commit"], pdf["blob"]):
                try:
                    with zipfile.ZipFile(io.BytesIO(bytes(blob))) as zf:
                        for info in zf.infolist():
                            if info.is_dir():
                                continue
                            name = info.filename
                            # case-normalized: DOC.XHTML must route to
                            # the markup analyzer like doc.xhtml
                            ext = entry_ext(name).lower()
                            content = zf.read(info).decode(
                                "utf-8", "replace")
                            rows.append((repo, f"{path}#{name}", commit,
                                         EXT_LANG.get(ext, ext), content))
                except (zipfile.BadZipFile, zipfile.LargeZipFile,
                        OSError, ValueError) as e:
                    rows.append((repo, path, commit, "_zip_error",
                                 f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows, columns=[
                "repo", "path", "commit", "lang", "content"])

    out = zips.mapInPandas(fn, CORPUS_SCHEMA)
    if include_errors:
        return out
    from pyspark.sql import functions as F
    return out.where(F.col("lang") != "_zip_error")


def zip_errors(zips: DataFrame) -> DataFrame:
    """Dead-letter surface: one row per unreadable archive with the
    error string in ``content`` — count it, write it to a quarantine
    table, or alert on it; these rows never reach the corpus."""
    from pyspark.sql import functions as F
    return (expand_zip_corpus(zips, include_errors=True)
            .where(F.col("lang") == "_zip_error"))
