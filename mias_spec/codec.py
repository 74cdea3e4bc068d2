"""Posting-list codecs: LEB128 varint, delta-gap doc ids, 16-bit weight
quantization. numpy-vectorized encode/decode — these kernels run inside
the Spark pack/scan UDFs and in the oracle.

Weight payloads are floats quantized to 16 bits (IEEE half), mirroring
the reference's 2-byte payload encoding
(/root/reference/src/main/java/cz/muni/fi/mias/search/snippets/
NiceSnippetExtractor.java:71 ``decodeFloatFromShortBytes``). The oracle
and the index quantize at the same point (token emission), so scores
never drift between the two.
"""

from __future__ import annotations

import numpy as np


def quantize_weight(w: float) -> float:
    """float -> 16-bit -> float round trip (single value)."""
    return float(np.float16(w))


def quantize_weights(w: np.ndarray) -> np.ndarray:
    return w.astype(np.float16).astype(np.float32)


# ------------------------------------------------------------------ varint

def _encode_varints_raw(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(byte_buffer, per_value_byte_lengths) for a uint64 array.
    Vectorized: one numpy pass per byte position, <=10 passes total."""
    nbytes = np.ones(vals.shape, dtype=np.int64)
    tmp = vals >> np.uint64(7)
    while tmp.any():
        nbytes += tmp != 0
        tmp >>= np.uint64(7)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for k in range(int(nbytes.max())):
        mask = nbytes > k
        idx = starts[mask] + k
        byte = ((vals[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)) \
            .astype(np.uint8)
        cont = (nbytes[mask] - 1 > k).astype(np.uint8)
        out[idx] = byte | (cont << 7)
    return out, nbytes


def encode_varints(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized, no per-value loop)."""
    vals = np.asarray(values, dtype=np.uint64)
    if vals.size == 0:
        return b""
    out, _nbytes = _encode_varints_raw(vals)
    return out.tobytes()


def encode_varints_split(values: np.ndarray,
                         starts: np.ndarray) -> list[bytes]:
    """Encode ONE array, sliced back into per-block byte strings at the
    value indices ``starts`` (block boundaries). One vectorized encode
    for a whole partition instead of one Python call per block."""
    vals = np.asarray(values, dtype=np.uint64)
    if vals.size == 0:
        return []
    out, nbytes = _encode_varints_raw(vals)
    offs = np.concatenate([[0], np.cumsum(nbytes)])
    cuts = offs[np.asarray(starts, dtype=np.int64)]
    bounds = np.append(cuts, offs[-1])
    buf = out.tobytes()
    return [buf[bounds[i]:bounds[i + 1]] for i in range(len(starts))]


def decode_varints(buf: bytes, n: int) -> np.ndarray:
    """Decode ``n`` LEB128 varints from ``buf`` (vectorized)."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    is_cont = (raw & 0x80) != 0
    # each varint ends at a byte with the high bit clear
    ends = np.flatnonzero(~is_cont)
    assert len(ends) >= n, "truncated varint buffer"
    ends = ends[:n]
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    payload = (raw & 0x7F).astype(np.uint64)
    out = np.zeros(n, dtype=np.uint64)
    # max 10 bytes per varint; accumulate shifted payloads per position
    maxlen = int((ends - starts).max()) + 1
    for k in range(maxlen):
        idx = starts + k
        mask = idx <= ends
        out[mask] |= payload[idx[mask]] << np.uint64(7 * k)
    return out


# --------------------------------------------------------------- delta-gap

def encode_doc_ids(doc_ids: np.ndarray) -> bytes:
    """Delta-gap + varint encode a strictly increasing doc id array."""
    d = np.asarray(doc_ids, dtype=np.int64)
    if len(d) == 0:
        return b""
    gaps = np.empty(len(d), dtype=np.uint64)
    gaps[0] = np.uint64(d[0])
    if len(d) > 1:
        deltas = np.diff(d)
        assert (deltas > 0).all(), "doc ids must be strictly increasing"
        gaps[1:] = deltas.astype(np.uint64)
    return encode_varints(gaps)


def decode_doc_ids(buf: bytes, n: int) -> np.ndarray:
    gaps = decode_varints(buf, n)
    return np.cumsum(gaps.astype(np.int64))


def encode_u16(values: np.ndarray) -> bytes:
    return np.asarray(values, dtype="<u2").tobytes()


def decode_u16(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, dtype="<u2")


def encode_f16(values: np.ndarray) -> bytes:
    return np.asarray(values, dtype="<f2").tobytes()


def decode_f16(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, dtype="<f2").astype(np.float32)
