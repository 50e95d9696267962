"""Multimodal columns: opaque binary payloads + typed metadata.

Beyond-reference operator family for training-data pipelines: image/audio/
video payloads travel as ``binary`` columns with a metadata struct; decode
/ feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs
over ``mapInPandas``. Decode is resolved by payload magic bytes: PNG, BMP,
PGM/PPM, and baseline JPEG decode for REAL via the stdlib+numpy codecs in
``sources/imaging`` / ``sources/jpeg`` (PIL is used for JPEG when
importable — it is faster); 16-bit WAV decodes via stdlib ``wave``.
Video containers keep the ffmpeg seam for pixel decode, with MP4
structure parsing handled natively (`sources/mp4.py`); ``raw`` synthetic
payloads keep the deterministic fake so plumbing tests run anywhere.

At 100 TB the payload column dominates I/O: keep metadata in separate
(pruned) columns so planning queries never read bytes, and size
``spark.sql.files.maxPartitionBytes`` so a task's batch of payloads fits
executor memory.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # optional: real image decode
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),      # image | audio | video
        StructField("format", StringType()),    # png | wav | mp4 | ...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def synthesize_media_table(
    spark: SparkSession, n: int = 64, seed: int = 42
) -> DataFrame:
    """Deterministic fake media corpus for tests: payload bytes are a
    seeded byte pattern; metadata is consistent with the payload."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        w, h = int(8 + (i % 5) * 4), int(8 + (i % 3) * 4)
        payload = bytes(rng.integers(0, 256, size=w * h, dtype=np.uint8))
        rows.append((i, kind, "raw", w, h, len(payload), bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_to_array(payload: bytes, width: int, height: int) -> np.ndarray:
    """Decode a payload into an (h, w) uint8 array (grayscale luma for
    color images), dispatching on magic bytes:

    - PNG / BMP / PGM / PPM → real stdlib-only decode (`sources/imaging`);
    - other container formats (JPEG, ...) → PIL seam;
    - bare ``raw`` payloads → the pixel buffer as-is (synthetic corpus).
    """
    from pm25ml_spark.sources import imaging

    if payload[:8] == imaging.PNG_SIGNATURE:
        return imaging.to_grayscale(imaging.decode_png(payload))
    if payload[:2] == b"BM":
        return imaging.to_grayscale(imaging.decode_bmp(payload))
    if payload[:2] in (b"P5", b"P6"):
        return imaging.to_grayscale(imaging.decode_pnm(payload))
    if payload[:3] == b"\xff\xd8\xff":  # any JPEG variant (SOI marker)
        if HAS_PIL:  # pragma: no cover - fast path, not in this container
            import io

            from PIL import Image

            return imaging.to_grayscale(
                np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
            )
        from pm25ml_spark.sources.jpeg import decode_jpeg

        return imaging.to_grayscale(decode_jpeg(payload))
    arr = np.frombuffer(payload, dtype=np.uint8)
    return arr[: width * height].reshape(height, width)


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("mean_intensity", DoubleType()),
        StructField("std_intensity", DoubleType()),
        StructField("p_low", DoubleType()),   # share of pixels < 64
        StructField("aspect_ratio", DoubleType()),
    ]
)


def extract_features(media: DataFrame) -> DataFrame:
    """Per-payload feature extraction in Arrow batches (mapInPandas)."""

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                arr = decode_to_array(bytes(row.payload), row.width, row.height)
                out.append(
                    (
                        row.media_id,
                        row.kind,
                        float(arr.mean()),
                        float(arr.std()),
                        float((arr < 64).mean()),
                        float(row.width) / float(row.height),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "kind",
                    "mean_intensity",
                    "std_intensity",
                    "p_low",
                    "aspect_ratio",
                ],
            )

    return media.mapInPandas(fn, schema=FEATURE_SCHEMA)


def resize_payloads(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbour resize of every payload (numpy index sampling) —
    the shape of a real thumbnailing pass; output schema == input schema
    with updated dims/payload."""

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                arr = decode_to_array(bytes(row.payload), row.width, row.height)
                yi = (np.arange(out_h) * row.height // out_h).astype(np.int64)
                xi = (np.arange(out_w) * row.width // out_w).astype(np.int64)
                small = arr[np.ix_(yi, xi)]
                payload = small.tobytes()
                rows.append(
                    (
                        row.media_id,
                        row.kind,
                        row.format,
                        out_w,
                        out_h,
                        len(payload),
                        bytearray(payload),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return media.mapInPandas(fn, schema=MEDIA_SCHEMA)


def metadata_only_profile(media: DataFrame) -> DataFrame:
    """Planning query that must NEVER read payload bytes: column pruning
    keeps the scan to the metadata columns (verify via .explain
    ReadSchema)."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_bytes").alias("total_bytes"),
        F.avg(F.col("width") * F.col("height")).alias("avg_pixels"),
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("time_s", DoubleType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame, n_frames: int = 4, every_n: int | None = None
) -> DataFrame:
    """Frame sampling for video payloads — one output row per sampled
    frame (1 → N row explosion inside ``mapInPandas``, the shape a real
    ffmpeg keyframe pass has).

    MP4 payloads sample for REAL: the ISO BMFF sample tables
    (`sources/mp4.py`) locate each frame's compressed byte range,
    timestamp, and keyframe flag, and the sampled frames' actual bytes
    are emitted — no pixel decode needed to sample, which is exactly
    what makes this shape viable on a 100 TB corpus (bytes read per
    video ≈ sampled frames only, not the whole stream, when the source
    supports range reads). Pixel decode of the sampled frames stays
    behind the ffmpeg seam. ``raw`` payloads keep the deterministic
    fake (``height`` stacked rows of ``width`` bytes).

    At scale the explosion multiplies rows, not bytes-per-row — each
    output frame is a single frame's payload, so downstream per-frame
    feature extraction parallelizes beyond the per-video grain.
    """

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pm25ml_spark.sources.mp4 import extract_frames

        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                if row.kind != "video":
                    continue
                payload = bytes(row.payload)
                if payload[4:8] == b"ftyp":  # real MP4 container
                    for fi, ts, frame in extract_frames(
                        payload, every_n=every_n, n_frames=n_frames
                    ):
                        rows.append(
                            (row.media_id, int(fi), float(ts),
                             int(row.width), int(row.height), bytearray(frame))
                        )
                    continue
                arr = decode_to_array(payload, row.width, row.height)
                total = arr.shape[0]
                if every_n is not None:
                    idxs = list(range(0, total, every_n))
                else:
                    step = max(total // max(n_frames, 1), 1)
                    idxs = list(range(0, total, step))[:n_frames]
                for fi in idxs:
                    frame = arr[fi].tobytes()
                    rows.append(
                        (row.media_id, int(fi), float(fi),
                         int(row.width), 1, bytearray(frame))
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return media.mapInPandas(fn, schema=FRAME_SCHEMA)
