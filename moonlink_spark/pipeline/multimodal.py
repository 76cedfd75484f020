"""Multimodal column operators: decode / resize / feature-extract over
binary image payloads (and stubs for audio/video, which this container
cannot decode).

The binary column flows Arrow-batched through mapInPandas — never collected,
never row-at-a-time. Batch sizes are bounded by
spark.sql.execution.arrow.maxRecordsPerBatch (session.py sets 2048) so an
executor python worker holds ≤ ~tens of MB of pixels at once even with
64×64 RGB payloads; at 100 TB the job is map-only (zero shuffle) and scales
with input splits.

The codec is the deterministic self-contained stand-in from
functions/image.py (the sandbox has no PIL/libjpeg); the Spark plumbing —
schema, batch shape, vectorized numpy kernel — is exactly what a real codec
drop-in would use.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
import pyspark.sql.types as T

from moonlink_spark.functions.image import decode_image, encode_image, phash64

DECODE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("dec_w", T.IntegerType(), True),
        T.StructField("dec_h", T.IntegerType(), True),
        T.StructField("mean_px", T.DoubleType(), True),
        T.StructField("dec_phash", T.LongType(), True),
    ]
)


def decode_stats(df: DataFrame, id_col: str = "image_id", bytes_col: str = "bytes") -> DataFrame:
    """Decode each image and emit (id, decoded w/h, mean pixel, re-derived
    phash) — the feature-extraction archetype. Column pruning keeps the
    scan to (id, bytes) only."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "dec_w": [], "dec_h": [], "mean_px": [], "dec_phash": []}
            for iid, raw in zip(pdf[id_col], pdf[bytes_col]):
                px = decode_image(bytes(raw))
                out["image_id"].append(iid)
                out["dec_h"].append(px.shape[0])
                out["dec_w"].append(px.shape[1])
                out["mean_px"].append(round(float(px.mean()), 4))
                out["dec_phash"].append(phash64(px))
            yield pd.DataFrame(out)

    return df.select(id_col, bytes_col).mapInPandas(_decode, schema=DECODE_STATS_SCHEMA)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
) -> DataFrame:
    """Nearest-neighbor resize, re-encoded in the row's own format.
    Output schema: (image_id, bytes, w, h, fmt) — droppable straight back
    into the images table via MERGE."""
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), True),
            T.StructField("w", T.IntegerType(), True),
            T.StructField("h", T.IntegerType(), True),
            T.StructField("fmt", T.StringType(), True),
        ]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, raw, fmt in zip(pdf[id_col], pdf[bytes_col], pdf[fmt_col]):
                px = decode_image(bytes(raw))
                h, w = px.shape[0], px.shape[1]
                yi = (np.arange(target_h) * h // target_h).clip(0, h - 1)
                xi = (np.arange(target_w) * w // target_w).clip(0, w - 1)
                resized = px[yi][:, xi]
                rows.append(
                    {
                        "image_id": iid,
                        "bytes": encode_image(resized, fmt),
                        "w": target_w,
                        "h": target_h,
                        "fmt": fmt,
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, bytes_col, fmt_col).mapInPandas(_resize, schema=schema)


def sample_video_frames(df: DataFrame, every_n: int = 30, **_kwargs) -> DataFrame:
    """STUB — video decode needs ffmpeg/pyav, absent from this container.
    The production shape: mapInPandas over (video_id, bytes) yielding one
    row per sampled frame (video_id, frame_idx, frame_bytes), identical
    plumbing to decode_stats."""
    raise NotImplementedError(
        "video frame sampling requires a video codec (pyav/ffmpeg) not present "
        "in this environment; plumbing mirrors decode_stats/mapInPandas"
    )


def extract_audio_features(df: DataFrame, **_kwargs) -> DataFrame:
    """STUB — audio decode needs soundfile/librosa, absent from this
    container. Production shape: mapInPandas over (audio_id, bytes) yielding
    (audio_id, duration_s, rms, mfcc: array<float>)."""
    raise NotImplementedError(
        "audio feature extraction requires an audio codec not present in this "
        "environment; plumbing mirrors decode_stats/mapInPandas"
    )
