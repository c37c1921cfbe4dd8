"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, plus decode / feature-extract / frame-sample operators
(north-star surface).

The container has no image/audio libraries, so the *codec* step is stubbed:
``decode_media`` tries real decoders behind an import guard and otherwise
produces a deterministic fake decode derived from the payload bytes. The
Spark-side plumbing — binary schema, Arrow batch transfer through
``mapInPandas``, partition behavior, output schema — is real and tested; a
deployment swaps ``_fake_decode`` for PIL/ffmpeg and nothing else changes.

Scale notes: payloads travel to Python in Arrow record batches
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory for
fat binaries); metadata-only operators (``media_metadata``) never leave the
JVM, so filters on kind/size prune before any byte hits Python.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_KINDS = ("image", "audio", "video")


def media_from_documents(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic media fixture: payload = utf-8 bytes of the doc text,
    kind assigned round-robin by id. Stands in for real blob ingestion
    (S3/parquet binary columns) with identical schema."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(*[F.lit(k) for k in MEDIA_KINDS]),
            (F.col(id_col) % len(MEDIA_KINDS) + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def media_metadata(df: DataFrame) -> DataFrame:
    """JVM-only metadata projection over binary payloads: size, magic prefix.
    This is the cheap pre-filter stage — no Python, fully codegen'd."""
    return df.select(
        "media_id",
        "kind",
        F.octet_length("payload").alias("n_bytes"),
        F.substring(F.hex(F.col("payload")), 1, 8).alias("magic_hex"),
    )


DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)


def _fake_decode(kind: str, payload: bytes) -> dict:
    """STUB decode — deterministic pseudo-metadata from the payload digest.
    Replace with PIL / soundfile / pyav in deployment; the operator contract
    (one metadata row per media row) is what's under test."""
    h = hashlib.sha256(payload).digest()
    w = 160 + h[0] % 8 * 80
    if kind == "image":
        return {"width": w, "height": 120 + h[1] % 8 * 60, "n_frames": 1,
                "sample_rate": None, "duration_ms": None}
    if kind == "audio":
        return {"width": None, "height": None, "n_frames": None,
                "sample_rate": 8000 * (1 + h[1] % 6), "duration_ms": 500 + h[2] * 37}
    return {"width": w, "height": 120 + h[1] % 8 * 60,
            "n_frames": 24 + h[2] % 240, "sample_rate": None,
            "duration_ms": 1000 + h[3] * 91}


def _pil_image_loader():
    """Resolve the real image decoder at WORKER runtime: a callable
    payload-bytes -> metadata dict when PIL is importable there, else None.
    Resolution must happen inside the mapInPandas closure — workers are
    separate Python processes, so driver-side imports (or monkeypatches)
    never reach them."""
    try:
        import io

        from PIL import Image
    except ImportError:
        return None

    def load(payload: bytes) -> dict:
        im = Image.open(io.BytesIO(payload))
        return {
            "width": int(im.width),
            "height": int(im.height),
            "n_frames": int(getattr(im, "n_frames", 1)),
            "sample_rate": None,
            "duration_ms": None,
        }

    return load


def decode_media(df: DataFrame, *, image_loader=None) -> DataFrame:
    """mapInPandas decode: Arrow-batched bytes -> typed metadata rows.

    Image rows go through the real decoder when one is available (PIL,
    resolved per worker), DEGRADING per row to the deterministic stub when
    the payload doesn't decode — never failing the operator. The container
    ships no codecs, so CI and the DuckDB oracle exercise the stub;
    ``image_loader`` injects a decoder explicitly (tests ship a fake one
    inside the serialized closure, the worker-safe equivalent of
    monkeypatching PIL)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        load_image = image_loader if image_loader is not None else _pil_image_loader()
        for pdf in batches:
            out = []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if payload is None:
                    meta = {"width": None, "height": None, "n_frames": None,
                            "sample_rate": None, "duration_ms": None}
                elif load_image is not None and kind == "image":
                    try:
                        meta = load_image(bytes(payload))
                    except Exception:  # undecodable bytes -> stub, not failure
                        meta = _fake_decode(kind, bytes(payload))
                else:
                    meta = _fake_decode(kind, bytes(payload))
                out.append({"media_id": media_id, "kind": kind, **meta})
            yield pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.mapInPandas(_decode, schema=DECODED_SCHEMA)


FEATURE_DIM = 32


def _stub_features(payload: bytes, dim: int) -> list[float]:
    """STUB embedder: digest-byte unit vector, ``raw[j] = byte[j % 32]/128 - 1``
    then L2-normalized in float64. Chosen over an RNG-seeded stub so the exact
    same vector is computable in ANSI SQL (``sha256`` + hex slicing) — giving
    the feature pipeline a bit-exact DuckDB oracle. A deployment swaps this for
    a real image/audio encoder; the mapInPandas plumbing is unchanged."""
    h = hashlib.sha256(payload).digest()
    reps = (dim + len(h) - 1) // len(h)
    raw = np.frombuffer((h * reps)[:dim], dtype=np.uint8).astype(np.float64)
    raw = raw / 128.0 - 1.0
    n = float(np.sqrt(np.dot(raw, raw)))
    return [float(x) for x in (raw / n if n else raw)]


def features_schema(dtype: str = "float") -> StructType:
    elem = FloatType() if dtype == "float" else DoubleType()
    return StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("features", ArrayType(elem), True),
        ]
    )


FEATURES_SCHEMA = features_schema("float")


def extract_features(df: DataFrame, *, dim: int = FEATURE_DIM, dtype: str = "float") -> DataFrame:
    """mapInPandas feature extraction: payload bytes -> unit vector.
    STUB embedder (sha256-byte derived, see ``_stub_features``) with the real
    batch plumbing; the output feeds straight into topk_cosine /
    embedding_neardup_pairs. ``dtype="double"`` keeps full float64 precision
    for oracle-parity checks; the default float mirrors the embeddings table."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                None if payload is None else _stub_features(bytes(payload), dim)
                for payload in pdf["payload"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return df.mapInPandas(_features, schema=features_schema(dtype))


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), True),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("payload", BinaryType(), True),
    ]
)


def _stub_resize(payload: bytes, width: int, height: int) -> bytes:
    """STUB resize — deterministic 32-byte "thumbnail" derived from the
    payload and target geometry (sha256(payload || '|WxH')). Replace with
    PIL ``Image.resize`` / ffmpeg scale in deployment; chosen so the exact
    bytes are recomputable in DuckDB SQL for the oracle."""
    return hashlib.sha256(payload + f"|{width}x{height}".encode()).digest()


def _pil_image_resizer(width: int, height: int):
    """Resolve the real resizer at WORKER runtime (see _pil_image_loader):
    payload-bytes -> resized PNG bytes, or None when PIL is absent."""
    try:
        import io

        from PIL import Image
    except ImportError:
        return None

    def resize(payload: bytes) -> bytes:
        im = Image.open(io.BytesIO(payload)).resize((width, height))
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        return buf.getvalue()

    return resize


def resize_media(
    df: DataFrame, *, width: int = 64, height: int = 64, image_resizer=None
) -> DataFrame:
    """mapInPandas resize for visual media (image/video): binary in, binary
    out, same Arrow batch plumbing as decode. Non-visual rows (audio) pass
    through with a null payload — resize is undefined for them, and emitting
    the row keeps the operator a 1:1 map (no silent drops). Image rows use
    the real resizer when available (PIL, resolved per worker), degrading
    per row to the deterministic stub on undecodable bytes;
    ``image_resizer`` injects one explicitly (worker-safe test hook)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        resize_image = (
            image_resizer if image_resizer is not None
            else _pil_image_resizer(width, height)
        )
        for pdf in batches:
            out = []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if payload is None or kind not in ("image", "video"):
                    resized = None
                elif resize_image is not None and kind == "image":
                    try:
                        resized = resize_image(bytes(payload))
                    except Exception:  # undecodable bytes -> stub, not failure
                        resized = _stub_resize(bytes(payload), width, height)
                else:
                    resized = _stub_resize(bytes(payload), width, height)
                out.append(
                    {"media_id": media_id, "kind": kind, "width": width,
                     "height": height, "payload": resized}
                )
            yield pd.DataFrame(out, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.mapInPandas(_resize, schema=RESIZED_SCHEMA)


def sample_frames(decoded: DataFrame, *, stride: int = 24) -> DataFrame:
    """Explode videos into sampled frame rows (every ``stride``-th frame) —
    pure native sequence/explode, no Python. Non-videos pass through with a
    single frame 0."""
    frames = F.when(
        (F.col("kind") == "video") & F.col("n_frames").isNotNull(),
        F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(stride)),
    ).otherwise(F.array(F.lit(0)))
    return decoded.select(
        "media_id", "kind", F.explode(frames).alias("frame_index")
    )
