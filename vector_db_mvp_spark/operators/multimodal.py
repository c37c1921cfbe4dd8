"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, plus decode / feature-extract / frame-sample operators
(north-star surface).

Codec resolution per row kind (r14 — the real-codec leg now EXECUTES;
pip/PIL remains uninstallable in this sandbox, `.claude/probe_r14_pip.json`):

- **image**: PIL when a deployment has it (resolved per WORKER, import
  guard) → else the dependency-free spec-conformant PNG codec
  (``functions/png.py``, stdlib zlib: CRC-checked chunks, filters 0-4,
  color types 0/2/4/6) → else per-row degrade to the deterministic stub
  for non-PNG/undecodable bytes. Decode parses + CRC-checks the header
  (what PIL's lazy ``open`` does); resize does the full
  decode → nearest-neighbor → re-encode pass.
- **audio**: stdlib ``wave`` (real RIFF/WAVE parse: sample rate, frame
  count, exact integer duration) → per-row stub for non-WAV bytes.
- **video**: real GIF container parse (``functions/gif.py`` — block-
  structure walk: frame count from image descriptors, duration from
  summed Graphic Control delays) → per-row stub for non-GIF bytes. GIF
  is the one multi-frame animated container parseable from the stdlib;
  other containers (mp4/webm) still stub.

The Spark-side plumbing — binary schema, Arrow batch transfer through
``mapInPandas``, partition behavior, output schema — is identical on every
path, so CI exercises the real codecs and the stubs in the same plans.

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


MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType(), False),
    ]
)


def media_real_from_documents(df: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """REAL-codec media fixture, id % 3 split: actual PNG images (built by
    ``functions/png.encode_png`` over a deterministic integer gradient),
    actual 16-bit mono WAV audio (canonical 44-byte PCM header, byte-identical
    to stdlib ``wave`` output), and actual multi-frame
    GIF89a video (``functions/gif.encode_gif``). Every decoded-metadata
    value is an integer function of the id:

        image (id%3=0): width = 8 + id % 24, height = 6 + (id*7) % 20,
                        pixel(x, y, c) = (x*3 + y*5 + c*7 + id) % 256
        audio (id%3=1): rate = 8000 * (1 + id % 4),
                        frames = 400 + (id*13) % 1000
        video (id%3=2): width = 4 + id % 8, height = 3 + id % 6,
                        n_frames = 2 + id % 7, per-frame delay
                        (3 + id % 5) cs, frame f pixel i =
                        (i*37 + f*11 + id) % 256

    so a SQL oracle predicts every value arithmetically while the Spark
    side must actually PARSE the container bytes — a fake decode cannot
    match. Built worker-side in Arrow batches (numpy fills the sample
    buffers; zlib does the DEFLATE) — no driver loop.

    The id frame is explicitly repartitioned to the session's default
    parallelism before the build: the upstream parquet split count (2
    files at sf1) would otherwise cap the CPU-heavy codec stage at 2
    tasks, and the shuffle being spread is just a column of longs —
    effectively free. Explicit COUNT, not repartition(col): a keyed
    repartition without a count is AQE-coalescible back to one partition
    on small byte sizes (the _spread_tokens lesson, operators/dedup.py)."""

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids: list[int] = []
            kinds: list[str] = []
            payloads: list[bytes] = []
            for media_id in pdf["media_id"]:
                mid = int(media_id)
                kind, payload = _real_payload(mid)
                mids.append(mid)
                kinds.append(kind)
                payloads.append(payload)
            yield pd.DataFrame(
                {"media_id": mids, "kind": kinds, "payload": payloads},
                columns=[f.name for f in MEDIA_SCHEMA.fields],
            )

    ids = df.select(F.col(id_col).alias("media_id")).repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    return ids.mapInPandas(_build, schema=MEDIA_SCHEMA)


def _real_payload(mid: int) -> tuple[str, bytes]:
    """One (kind, container bytes) fixture row of the id % 3 split — the
    per-row body of :func:`media_real_from_documents`, extracted so the
    fused build+consume operators (:func:`media_real_resized`) reuse the
    identical codec path byte-for-byte. Worker-side only; the imports
    resolve on first call inside the task."""
    import struct

    from ..functions.gif import encode_gif
    from ..functions.png import encode_png

    if mid % 3 == 0:
        w = 8 + mid % 24
        h = 6 + (mid * 7) % 20
        idx = np.arange(w * h * 3, dtype=np.int64)
        x, c = (idx // 3) % w, idx % 3
        y = idx // (3 * w)
        pix = ((x * 3 + y * 5 + c * 7 + mid) % 256).astype(np.uint8)
        return "image", encode_png(w, h, pix.tobytes())
    if mid % 3 == 1:
        rate = 8000 * (1 + mid % 4)
        n = 400 + (mid * 13) % 1000
        data = (
            (np.arange(n, dtype=np.int64) * 31 + mid) % 65536 - 32768
        ).astype("<i2").tobytes()
        # Canonical 44-byte PCM header — byte-identical to what stdlib
        # wave.open(...).writeframes emits for 16-bit mono (pinned by
        # tests), without per-row Wave_write / BytesIO object churn.
        return "audio", (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data
        )
    w, h = 4 + mid % 8, 3 + mid % 6
    idx = np.arange(w * h, dtype=np.int64)
    frames = [
        ((idx * 37 + f * 11 + mid) % 256).astype(np.uint8).tobytes()
        for f in range(2 + mid % 7)
    ]
    return "video", encode_gif(w, h, frames, delay_cs=3 + mid % 5)


def media_real_resized(
    df: DataFrame, *, width: int, height: int, id_col: str = "doc_id"
) -> DataFrame:
    """Fused build+resize for the ``_real`` query compositions (guide §4 —
    minimize serialization boundary crossings): ids in, RESIZED_SCHEMA out,
    ONE mapInPandas instead of the media_real_from_documents → resize_media
    chain, so the corpus-sized source payloads never cross the Arrow
    boundary (r14 left media_resize_real with three Arrow crossings of
    payload bytes; after this only the resized thumbnails — ~100 bytes/row
    at 5x4 — cross). Row-for-row identical to the unfused chain by
    construction: the same :func:`_real_payload` builder feeds the same
    per-kind resize dispatch as :func:`resize_media` (image → real resizer
    with per-row stub degrade, video → stub resize, audio → null payload),
    pinned by tests/test_multimodal.py::test_fused_real_resize_matches_chain.
    The standalone operators remain for every other consumer — this is a
    composition seam, not a replacement."""

    def _build_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        resize_image = _real_image_resizer(width, height)
        for pdf in batches:
            mids: list[int] = []
            kinds: list[str] = []
            payloads: list[bytes | None] = []
            for media_id in pdf["media_id"]:
                mid = int(media_id)
                kind, payload = _real_payload(mid)
                if kind == "image":
                    try:
                        resized = resize_image(payload)
                    except Exception:  # undecodable bytes -> stub, not failure
                        resized = _stub_resize(payload, width, height)
                elif kind == "video":
                    resized = _stub_resize(payload, width, height)
                else:
                    resized = None
                mids.append(mid)
                kinds.append(kind)
                payloads.append(resized)
            yield pd.DataFrame(
                {"media_id": mids, "kind": kinds,
                 "width": width, "height": height, "payload": payloads},
                columns=[f.name for f in RESIZED_SCHEMA.fields],
            )

    ids = df.select(F.col(id_col).alias("media_id")).repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    return ids.mapInPandas(_build_resize, schema=RESIZED_SCHEMA)


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


def _real_image_loader():
    """Resolve the real image decoder at WORKER runtime: PIL when importable
    there, else the dependency-free PNG codec (functions/png.py) — so the
    returned callable is never None; it RAISES on bytes it can't decode and
    the caller degrades that row to the stub. Resolution must happen inside
    the mapInPandas closure — workers are separate Python processes, so
    driver-side imports (or monkeypatches) never reach them."""
    try:
        import io

        from PIL import Image

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
    except ImportError:
        pass

    from ..functions.png import png_size

    def load(payload: bytes) -> dict:
        # Header-only parse with CRC check — the same laziness as
        # PIL.Image.open (pixels inflate only on resize/feature paths).
        w, h = png_size(payload)  # raises PngError on non-PNG
        return {"width": w, "height": h, "n_frames": 1,
                "sample_rate": None, "duration_ms": None}

    return load


def _wave_audio_loader():
    """Real audio decode via the stdlib ``wave`` module (RIFF/WAVE is the
    one audio container Python parses natively — no pip needed). Raises on
    non-WAV bytes; the caller degrades that row to the stub. duration_ms is
    exact integer math (frames * 1000 // rate) so oracles can reproduce it."""
    import io
    import wave

    def load(payload: bytes) -> dict:
        with wave.open(io.BytesIO(payload)) as wf:
            rate = int(wf.getframerate())
            n = int(wf.getnframes())
        return {
            "width": None,
            "height": None,
            "n_frames": n,
            "sample_rate": rate,
            "duration_ms": (n * 1000 // rate) if rate else None,
        }

    return load


def _gif_video_loader():
    """Real video-container decode via the built-in GIF parser
    (functions/gif.py): frame count from image descriptors, duration from
    summed Graphic Control delays. Raises on non-GIF bytes; the caller
    degrades that row to the stub."""
    from ..functions.gif import gif_info

    def load(payload: bytes) -> dict:
        w, h, n_frames, duration_ms = gif_info(payload)
        return {"width": w, "height": h, "n_frames": n_frames,
                "sample_rate": None, "duration_ms": duration_ms}

    return load


def decode_media(
    df: DataFrame, *, image_loader=None, audio_loader=None, video_loader=None
) -> DataFrame:
    """mapInPandas decode: Arrow-batched bytes -> typed metadata rows.

    Image rows go through the real decoder (PIL when a worker has it, else
    the built-in PNG codec), audio rows through the stdlib ``wave`` parser,
    and video rows through the built-in GIF container parser, DEGRADING per
    row to the deterministic stub when the payload doesn't decode — never
    failing the operator. The ``*_loader`` kwargs inject decoders
    explicitly (tests ship fakes inside the serialized closure, the
    worker-safe equivalent of monkeypatching)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        loaders = {
            "image": image_loader if image_loader is not None else _real_image_loader(),
            "audio": audio_loader if audio_loader is not None else _wave_audio_loader(),
            "video": video_loader if video_loader is not None else _gif_video_loader(),
        }
        meta_keys = ("width", "height", "n_frames", "sample_rate", "duration_ms")
        for pdf in batches:
            # column-wise accumulation: one dict of lists per batch, not one
            # dict per row (pandas builds the frame without a records pass)
            cols: dict[str, list] = {"media_id": [], "kind": []}
            for k in meta_keys:
                cols[k] = []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if payload is None:
                    meta = {"width": None, "height": None, "n_frames": None,
                            "sample_rate": None, "duration_ms": None}
                else:
                    load = loaders.get(kind)
                    if load is not None:
                        try:
                            meta = load(bytes(payload))
                        except Exception:  # undecodable bytes -> stub, not failure
                            meta = _fake_decode(kind, bytes(payload))
                    else:
                        meta = _fake_decode(kind, bytes(payload))
                cols["media_id"].append(media_id)
                cols["kind"].append(kind)
                for k in meta_keys:
                    cols[k].append(meta[k])
            yield pd.DataFrame(cols, columns=[f.name for f in DECODED_SCHEMA.fields])

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


def _real_image_resizer(width: int, height: int):
    """Resolve the real resizer at WORKER runtime (see _real_image_loader):
    PIL when importable, else the built-in PNG codec's full
    decode -> nearest-neighbor -> re-encode pass. Never None; raises on
    bytes it can't decode (caller stub-degrades that row)."""
    try:
        import io

        from PIL import Image

        def resize(payload: bytes) -> bytes:
            im = Image.open(io.BytesIO(payload)).resize((width, height))
            buf = io.BytesIO()
            im.save(buf, format="PNG")
            return buf.getvalue()

        return resize
    except ImportError:
        pass

    from ..functions.png import resize_png

    def resize(payload: bytes) -> bytes:
        return resize_png(payload, width, height)  # raises PngError on non-PNG

    return resize


def resize_media(
    df: DataFrame, *, width: int = 64, height: int = 64, image_resizer=None
) -> DataFrame:
    """mapInPandas resize for visual media (image/video): binary in, binary
    out, same Arrow batch plumbing as decode. Non-visual rows (audio) pass
    through with a null payload — resize is undefined for them, and emitting
    the row keeps the operator a 1:1 map (no silent drops). Image rows use
    the real resizer (PIL when a worker has it, else the built-in PNG
    codec), degrading per row to the deterministic stub on undecodable
    bytes; ``image_resizer`` injects one explicitly (worker-safe test hook)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        resize_image = (
            image_resizer if image_resizer is not None
            else _real_image_resizer(width, height)
        )
        for pdf in batches:
            mids, kinds, payloads = [], [], []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if payload is None or kind not in ("image", "video"):
                    resized = None
                elif kind == "image":
                    try:
                        resized = resize_image(bytes(payload))
                    except Exception:  # undecodable bytes -> stub, not failure
                        resized = _stub_resize(bytes(payload), width, height)
                else:
                    resized = _stub_resize(bytes(payload), width, height)
                mids.append(media_id)
                kinds.append(kind)
                payloads.append(resized)
            yield pd.DataFrame(
                {"media_id": mids, "kind": kinds,
                 "width": width, "height": height, "payload": payloads},
                columns=[f.name for f in RESIZED_SCHEMA.fields],
            )

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
