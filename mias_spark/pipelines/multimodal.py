"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata — the training-data-pipeline surface of the engine.

Media payloads are opaque ``BinaryType`` columns with a 22-byte typed
header (magic(4) + kind(2) + width(6) + height(6) + frames(4), ASCII so
the DuckDB oracle can check the very same parse); decode / feature
extraction / resize / frame-sample run as Arrow ``mapInPandas`` kernels
over the blobs. The codec step dispatches to Pillow/soundfile/PyAV when
installed and otherwise to a stdlib-only builtin decoder (uncompressed
WAV via ``wave``, binary PGM/PPM) — so the real decode path executes
in this container; other formats raise NotImplementedError until a
codec lib is installed. A deterministic fake stream remains the
default so the Spark-side plumbing — schema, batch shape,
partitioning, UDF signatures — is testable independently of codecs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAGIC = "FMED"
KINDS = ["im", "au", "vi"]          # image / audio / video
HEADER_LEN = 22
N_FEATURES = 8


# ------------------------------------------------------------- synthesis

def make_media(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic synthetic media table
    (media_id long, kind string, mime string, blob binary).
    Header fields derive from media_id; payload is a deterministic
    md5-stream rendered as hex ASCII (stands in for codec bytes)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                kind = KINDS[mid % 3]
                w, h = 16 * (1 + mid % 40), 9 * (1 + mid % 40)
                frames = 1 if kind == "im" else 1 + mid % 250
                payload = hashlib.md5(f"media:{mid}".encode()).hexdigest() \
                    * (1 + mid % 4)
                blob = (f"{MAGIC}{kind}{w:06d}{h:06d}{frames:04d}"
                        f"{payload}").encode("ascii")
                mime = {"im": "image/fake", "au": "audio/fake",
                        "vi": "video/fake"}[kind]
                rows.append((mid, kind, mime, blob))
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "mime", "blob"])

    return spark.range(n).mapInPandas(
        fn, "media_id long, kind string, mime string, blob binary")


# ------------------------------------------------------- metadata (JVM)

def media_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata parsed from the binary header with NATIVE column
    functions only — stays in whole-stage codegen, no Python. Everything
    (incl. kind) comes from the blob itself, so any (media_id, blob)
    frame works."""
    def field(start: int, length: int):
        return F.expr(
            f"cast(cast(substring(blob, {start}, {length}) as string) "
            "as long)")

    return media.select(
        "media_id",
        F.length("blob").alias("n_bytes"),
        F.expr("cast(substring(blob, 1, 4) as string)").alias("magic"),
        F.expr("cast(substring(blob, 5, 2) as string)").alias("kind"),
        field(7, 6).alias("width"),
        field(13, 6).alias("height"),
        field(19, 4).alias("n_frames"),
    )


# ------------------------------------------------- decode stub + features

def _codec_module():
    """Optional-import seam for a REAL codec: first available of
    Pillow / soundfile / PyAV, falling back to the stdlib-only
    ``builtin`` decoder (uncompressed WAV via the ``wave`` module and
    binary PGM/PPM) — so the real decode path executes in CI with no
    external libraries. Installing any codec lib upgrades the dispatch
    with no code change."""
    import importlib
    for name in ("PIL.Image", "soundfile", "av"):
        try:
            return name, importlib.import_module(name)
        except ImportError:
            continue
    return "builtin", None


def _decode_builtin(payload: bytes) -> np.ndarray:
    """Pure-stdlib decode of the two honest formats: RIFF/WAVE PCM
    (any sample width the ``wave`` module accepts) and binary
    PGM (P5) / PPM (P6) — P6 pixels are reduced to luma by channel
    mean, the builtin analog of Pillow's convert('L')."""
    import io
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        import wave
        with wave.open(io.BytesIO(payload)) as wf:
            raw = wf.readframes(wf.getnframes())
            width = wf.getsampwidth()
        dt = {1: np.uint8, 2: "<i2", 4: "<i4"}.get(width)
        if dt is None:
            raise NotImplementedError(
                f"builtin codec: unsupported WAV sample width {width}")
        return np.frombuffer(raw, dtype=dt).astype(np.float32)
    if payload[:2] in (b"P5", b"P6"):
        # header: magic, width, height, maxval — whitespace-separated
        # with '#' comments; pixel data follows the single whitespace
        # after maxval
        vals, i, n = [], 2, len(payload)
        while len(vals) < 3 and i < n:
            while i < n and payload[i:i + 1].isspace():
                i += 1
            if payload[i:i + 1] == b"#":
                while i < n and payload[i:i + 1] != b"\n":
                    i += 1
                continue
            j = i
            while j < n and not payload[j:j + 1].isspace():
                j += 1
            vals.append(int(payload[i:j]))
            i = j
        i += 1                        # the single whitespace after maxval
        w, h, maxval = vals
        ch = 3 if payload[:2] == b"P6" else 1
        dt = np.uint8 if maxval < 256 else ">u2"
        px = np.frombuffer(payload, dtype=dt, count=w * h * ch, offset=i)
        if ch == 3:
            px = px.reshape(-1, 3).astype(np.float32).mean(axis=1)
        return px.astype(np.float32).ravel()
    raise NotImplementedError(
        "builtin codec decodes uncompressed WAV and binary PGM/PPM "
        "only; install an image/audio codec library (Pillow/soundfile/"
        "PyAV) for other formats — decode_media dispatches to it "
        "automatically")


def _decode_real(name: str, mod, payload: bytes) -> np.ndarray:
    """Dispatch one payload through the available codec, normalized to
    the same flat float32 sample array the fake produces."""
    import io
    if name == "builtin":
        return _decode_builtin(payload)
    if name == "PIL.Image":
        img = mod.open(io.BytesIO(payload)).convert("L")
        return np.asarray(img, dtype=np.float32).ravel()
    if name == "soundfile":
        data, _sr = mod.read(io.BytesIO(payload))
        return np.asarray(data, dtype=np.float32).ravel()
    with mod.open(io.BytesIO(payload)) as container:   # av
        for frame in container.decode(video=0):
            return frame.to_ndarray().astype(np.float32).ravel()
    raise ValueError("no decodable frame in payload")


def decode_media(blob: bytes, real: bool = False) -> np.ndarray:
    """Decode a media payload to a sample array.

    ``real=True`` routes through the first codec library found by
    ``_codec_module`` (Pillow / soundfile / PyAV), falling back to the
    stdlib-only builtin decoder (uncompressed WAV, binary PGM/PPM) —
    the real path genuinely executes in this container; formats beyond
    those raise NotImplementedError until a codec lib is installed.
    The default is a deterministic fake: the md5 stream of the payload
    as uint8 samples — stable across engines/runs, enough to exercise
    every downstream kernel."""
    if real:
        name, mod = _codec_module()
        return _decode_real(name, mod, blob[HEADER_LEN:])
    digest = hashlib.md5(blob[HEADER_LEN:]).digest()
    return np.frombuffer(digest * 4, dtype=np.uint8).astype(np.float32)


def media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction: blob -> fixed-size float vector
    (the embedding-extraction stage of a training pipeline; decode step
    stubbed per module docstring). Features come back as SCALAR columns
    f0..f7 (not array<double>) so downstream frames stay
    sortable/hashable — and so the DuckDB oracle can reproduce the
    md5-stream fake column by column."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf["blob"]:
                samples = decode_media(bytes(blob))
                chunks = np.array_split(samples, N_FEATURES)
                feats.append([float(c.mean()) for c in chunks])
            fa = np.asarray(feats, dtype=np.float64) if feats else \
                np.empty((0, N_FEATURES))
            out = {"media_id": pdf["media_id"]}
            for j in range(N_FEATURES):
                out[f"f{j}"] = np.round(fa[:, j], 4)
            out["feat_norm"] = np.round(
                np.sqrt((fa * fa).sum(axis=1)), 4)
            yield pd.DataFrame(out)

    fcols = ", ".join(f"f{j} double" for j in range(N_FEATURES))
    return media.select("media_id", "blob").mapInPandas(
        fn, f"media_id long, {fcols}, feat_norm double")


def frame_sample(media: DataFrame, every: int = 10) -> DataFrame:
    """Video frame sampling: one output row per sampled frame index
    (frame payload decode stubbed; the explode/partition shape is the
    real part)."""
    meta = media_metadata(media).where(F.col("kind") == "vi")
    return (meta.select(
        "media_id", "n_frames",
        F.explode(F.sequence(
            F.lit(0), F.col("n_frames") - 1, F.lit(every))).alias("frame_idx"))
    )
