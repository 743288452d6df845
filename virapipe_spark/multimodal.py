"""Multimodal columns: opaque binary media + typed metadata (north-star
component; no reference counterpart — stock Spark patterns).

Design: image/audio/video payloads are opaque ``binary`` columns rowed
with typed metadata (kind, dims, sample rate, duration). All transforms
are Arrow-batched ``mapInPandas`` stages so payload bytes cross the
Python boundary once per batch, never per row.

The actual codec work (JPEG decode, resampling, H.264 frame extraction)
needs image/audio libraries that are NOT in this environment — the
``decode_*`` internals are therefore STUBBED: a deterministic fake
container format (:func:`pack_media` / :func:`_unpack`) stands in for
real codecs, and :func:`require_codecs` raises ``NotImplementedError``
showing where PIL/ffmpeg would slot in. Everything Spark-side — schemas,
batch shapes, UDF signatures, explode layout, partitioning — is real and
tested.

Scale: payloads dominate bytes, so the rules are (1) filter/select on
METADATA before any mapInPandas touches payloads (metadata predicates
push into the parquet scan; payload columns prune away when untouched),
(2) partition by content size so Arrow batches stay memory-bounded
(``spark.sql.files.maxPartitionBytes`` already caps scan-side), and
(3) frame sampling explodes rows ×(duration/interval) — aggregate or
filter immediately after, same rule as the k-mer explode (SURVEY §4.3).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Media table schema: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),          # image | audio | video
        T.StructField("data", T.BinaryType()),           # opaque payload
        T.StructField("width", T.IntegerType()),         # image/video
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),   # audio
        T.StructField("duration_ms", T.IntegerType()),   # audio/video
    ]
)

_MAGIC = b"VPMM"  # fake container magic: VPMM | kind(1) | w | h | rate | dur


def pack_media(kind: str, payload: bytes, width: int = 0, height: int = 0,
               sample_rate: int = 0, duration_ms: int = 0) -> bytes:
    """Deterministic fake container: fixed header + raw payload. Stands
    in for JPEG/WAV/MP4 so the decode path has real bytes to parse."""
    return (
        _MAGIC
        + kind[:1].encode()
        + struct.pack(">iiii", width, height, sample_rate, duration_ms)
        + payload
    )


def _unpack(data: bytes) -> tuple[str, int, int, int, int, bytes]:
    if data[:4] != _MAGIC:
        raise ValueError("not a VPMM container")
    kind = {"i": "image", "a": "audio", "v": "video"}[data[4:5].decode()]
    w, h, rate, dur = struct.unpack(">iiii", data[5:21])
    return kind, w, h, rate, dur, data[21:]


def require_codecs() -> None:
    """Where real decoders would load. The container image has no
    PIL/libsndfile/ffmpeg — real-codec paths raise until they exist."""
    raise NotImplementedError(
        "real media codecs (PIL / soundfile / ffmpeg) are not available in "
        "this environment; the deterministic VPMM container is used instead"
    )


#: decode_image output: one row per image with channel statistics.
IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("std_intensity", T.DoubleType()),
    ]
)


def decode_image_features(media: DataFrame) -> DataFrame:
    """Decode images and emit per-image intensity features.

    Payload bytes are treated as a flat 8-bit intensity buffer (the
    stub); a real build swaps the two marked lines for PIL. Metadata
    filter first: non-image rows never reach Python."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                kind, w, h, _, _, payload = _unpack(bytes(data))
                # real impl: img = PIL.Image.open(io.BytesIO(payload))
                # real impl: arr = np.asarray(img, dtype=np.uint8)
                arr = np.frombuffer(payload, dtype=np.uint8)
                rows.append(
                    (
                        mid,
                        w,
                        h,
                        len(payload),
                        float(arr.mean()) if arr.size else 0.0,
                        float(arr.std()) if arr.size else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return media.filter(F.col("kind") == "image").select(
        "media_id", "data"
    ).mapInPandas(gen, IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("data", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub: nearest-neighbor subsample of the flat intensity
    buffer to width*height bytes (real build: PIL ``Image.resize``).
    Output payload size is exactly width*height — the property training
    pipelines rely on for fixed-shape batching."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                _, w, h, _, _, payload = _unpack(bytes(data))
                src = np.frombuffer(payload, dtype=np.uint8)
                n = width * height
                if src.size == 0:
                    out = np.zeros(n, dtype=np.uint8)
                else:
                    idx = (np.arange(n) * src.size // n).clip(0, src.size - 1)
                    out = src[idx]
                rows.append((mid, width, height, out.tobytes()))
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return media.filter(F.col("kind") == "image").select(
        "media_id", "data"
    ).mapInPandas(gen, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("t_ms", T.IntegerType()),
        T.StructField("frame_hash", T.StringType()),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling stub: one row per sampled timestamp, frame
    payload summarized as a hash slice of the buffer (real build: ffmpeg
    ``-vf fps=...``). Row explosion ×(duration/every_ms) — follow with an
    aggregate or per-frame filter, never a bare materialize."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                _, _, _, _, dur, payload = _unpack(bytes(data))
                n_frames = max(dur // every_ms, 0)
                for i in range(n_frames):
                    t = i * every_ms
                    chunk_at = (t * max(len(payload) - 16, 1)) // max(dur, 1)
                    chunk = payload[chunk_at : chunk_at + 16]
                    rows.append(
                        (mid, i, t, hashlib.md5(bytes([i]) + chunk).hexdigest()[:12])
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.filter(F.col("kind") == "video").select(
        "media_id", "data"
    ).mapInPandas(gen, FRAME_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_windows", T.IntegerType()),
        T.StructField("rms_energy", T.ArrayType(T.DoubleType())),
    ]
)


def audio_features(media: DataFrame, window: int = 256) -> DataFrame:
    """Audio feature stub: per-window RMS energy over the raw byte
    buffer as int8 samples (real build: soundfile decode + librosa).
    Output is a bounded array column (n_windows entries), ready for the
    embedding/ANN operators downstream."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                _, _, _, rate, _, payload = _unpack(bytes(data))
                arr = np.frombuffer(payload, dtype=np.int8).astype(np.float64)
                n_win = arr.size // window
                if n_win:
                    chunks = arr[: n_win * window].reshape(n_win, window)
                    rms = np.sqrt((chunks**2).mean(axis=1)).round(4).tolist()
                else:
                    rms = []
                rows.append((mid, rate, n_win, rms))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return media.filter(F.col("kind") == "audio").select(
        "media_id", "data"
    ).mapInPandas(gen, AUDIO_FEATURES_SCHEMA)
