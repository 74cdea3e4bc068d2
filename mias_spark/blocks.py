"""Packed posting-block format + numpy pack/unpack kernels.

Posting lists are doc-ordered and chunked into blocks of
``constants.BLOCK_SIZE`` postings (north_rule: delta-gap + varint
compression; block-max metadata for WAND-style pruning):

    term_id    : long
    salt       : int      doc-range shard for skewed terms (B4) —
                          salt = doc_id // SALT_DOC_RANGE for terms with
                          df > SALT_DF_THRESHOLD, else 0; (salt,
                          block_ord) preserves global doc order because
                          salt is monotone in doc_id
    block_ord  : int      block ordinal within (term_id, salt)
    n_docs     : int
    first_doc  : long     min doc id (data-skipping lower bound)
    last_doc   : long     max doc id
    max_score  : double   block-max BM25 upper bound (pruning metadata)
    doc_bytes  : binary   delta-gap + LEB128 varint doc ids
    tf_bytes   : binary   varint term frequencies
    dl_bytes   : binary   varint field lengths (norms inlined for scoring)
    w_bytes    : binary   float64 LE payload-weight SUMS (wsum; avg =
                          wsum/tf at score time, bit-identical to the
                          DataFrame scorer and the oracle)

Weights themselves were 16-bit-quantized at token emission (codec.py);
wsum is their exact float64 sum, so no further precision is lost.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from mias_spec import codec
from mias_spec.constants import BLOCK_SIZE, BM25_B, BM25_K1

BLOCKS_SCHEMA = (
    "term_id long, salt int, block_ord int, n_docs int, first_doc long, "
    "last_doc long, max_score double, doc_bytes binary, tf_bytes binary, "
    "dl_bytes binary, w_bytes binary"
)


def _bm25_vec(tf: np.ndarray, dl: np.ndarray, idf: float, avgdl: float) -> np.ndarray:
    return idf * tf * (BM25_K1 + 1.0) / (
        tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / max(avgdl, 1e-9)))


def pack_sorted_partition(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: input rows sorted by (term_id, salt, doc_id)
    within the partition, carrying precomputed ``idf`` and ``avgdl``
    columns (joined from dictionary + field stats — keeps the kernel
    stateless and the stage fully distributed; no driver-side term dicts
    at 10^12 scale). Emits packed blocks. Arrow batches may split a
    term's run, so runs are carried across batch boundaries."""
    carry: pd.DataFrame | None = None

    def pack_group(g: pd.DataFrame) -> list[tuple]:
        tid = int(g["term_id"].iloc[0])
        salt = int(g["salt"].iloc[0])
        docs = g["doc_id"].to_numpy(np.int64)
        tfs = g["tf"].to_numpy(np.int64)
        dls = g["dl"].to_numpy(np.int64)
        ws = g["wsum"].to_numpy(np.float64)
        idf = float(g["idf"].iloc[0])
        avgdl = float(g["avgdl"].iloc[0])
        rows = []
        for b, lo in enumerate(range(0, len(docs), BLOCK_SIZE)):
            hi = min(lo + BLOCK_SIZE, len(docs))
            d, t, n, w = docs[lo:hi], tfs[lo:hi], dls[lo:hi], ws[lo:hi]
            scores = _bm25_vec(t.astype(np.float64), n.astype(np.float64),
                               idf, avgdl) * (w / t)
            rows.append((
                tid, salt, b, hi - lo, int(d[0]), int(d[-1]),
                float(scores.max()) if len(scores) else 0.0,
                codec.encode_doc_ids(d),
                codec.encode_varints(t.astype(np.uint64)),
                codec.encode_varints(n.astype(np.uint64)),
                w.astype("<f8").tobytes(),
            ))
        return rows

    cols = ["term_id", "salt", "block_ord", "n_docs", "first_doc",
            "last_doc", "max_score", "doc_bytes", "tf_bytes", "dl_bytes",
            "w_bytes"]
    for pdf in batches:
        if carry is not None:
            pdf = pd.concat([carry, pdf], ignore_index=True)
        if pdf.empty:
            carry = None
            continue
        last_tid = pdf["term_id"].iloc[-1]
        last_salt = pdf["salt"].iloc[-1]
        tail = (pdf["term_id"] == last_tid) & (pdf["salt"] == last_salt)
        carry = pdf[tail]
        head = pdf[~tail]
        out = []
        for _, g in head.groupby(["term_id", "salt"], sort=True):
            out.extend(pack_group(g))
        if out:
            yield pd.DataFrame(out, columns=cols)
    if carry is not None and not carry.empty:
        out = []
        for _, g in carry.groupby(["term_id", "salt"], sort=True):
            out.extend(pack_group(g))
        yield pd.DataFrame(out, columns=cols)


def unpack_block(row) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(doc_ids, tfs, dls, wsums) from one packed block row."""
    n = int(row.n_docs)
    docs = codec.decode_doc_ids(row.doc_bytes, n)
    tfs = codec.decode_varints(row.tf_bytes, n).astype(np.int64)
    dls = codec.decode_varints(row.dl_bytes, n).astype(np.int64)
    ws = np.frombuffer(row.w_bytes, dtype="<f8")
    return docs, tfs, dls, ws
