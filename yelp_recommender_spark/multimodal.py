"""Multimodal column plumbing (LLM-data-pipeline surface, greenfield —
no counterpart in the reference).

Images/audio/video are opaque ``binary`` payload columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` transforms. The real media codecs are NOT
in this container, so the byte-level decode is a clearly-marked
deterministic fake (:func:`_fake_decode_image` — seeded by the payload
bytes themselves); everything around it — schema, batch shape, UDF
signatures, partitioning behavior — is production-real: swapping in
PIL/ffmpeg is a one-function change inside the batch loop.

Scale notes:

- payloads dominate row size: project them out before any shuffle, and
  tune ``spark.sql.execution.arrow.maxRecordsPerBatch`` down (the
  default 10k rows × MB-scale payloads would make multi-GB Arrow
  batches). All transforms here are map-only — no payload ever crosses
  an exchange.
- feature outputs are small arrays → shuffle/join freely downstream
  (e.g. feed :mod:`~yelp_recommender_spark.operators.ann`).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", META_SCHEMA),
    ]
)


# --------------------------------------------------------------------------
# deterministic fake codec (container has no PIL/ffmpeg — see module doc)
# --------------------------------------------------------------------------
def _payload_bytes(media_id: int, nbytes: int) -> bytes:
    """Deterministic pseudo-random payload: sha256 counter stream."""
    out = bytearray()
    counter = 0
    while len(out) < nbytes:
        out.extend(hashlib.sha256(f"{media_id}:{counter}".encode()).digest())
        counter += 1
    return bytes(out[:nbytes])


def _fake_decode_image(payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """FAKE DECODE — stands in for ``PIL.Image.open``: interprets the raw
    payload bytes as the pixel buffer (repeating if short). Deterministic
    in the payload alone, so tests pin exact feature values."""
    need = width * height * channels
    buf = np.frombuffer(payload, dtype=np.uint8)
    if buf.size < need:
        buf = np.tile(buf, need // max(buf.size, 1) + 1)
    return buf[:need].reshape(height, width, channels)


def _fake_decode_audio(payload: bytes, n_samples: int) -> np.ndarray:
    """FAKE DECODE — stands in for an audio codec: payload bytes as a
    little-endian int16 waveform."""
    buf = np.frombuffer(payload, dtype="<i2")
    if buf.size < n_samples:
        buf = np.tile(buf, n_samples // max(buf.size, 1) + 1)
    return buf[:n_samples].astype(np.float64) / 32768.0


def synthesize_media(
    spark: SparkSession, n: int = 32, kind: str = "image", seed_dims: bool = True
) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA (test input;
    a real pipeline reads payloads from object storage via
    ``spark.read.format('binaryFile')``, where
    ``spark.sql.files.maxPartitionBytes`` sizes partitions to the data).

    Partition count is sized to the row count (≥16 rows per partition)
    rather than ``defaultParallelism``: a 64-row fixture sliced 32 ways
    spawns 32 Python workers for 2 rows each — pure cold-start overhead
    (measured 17 s vs 3 s at first touch on local[32])."""
    rows = []
    for i in range(n):
        if kind == "image":
            w, h, c = 16 + (i % 4) * 8, 16 + (i % 3) * 8, 3
            meta = (w, h, c, None, None, "fake-rgb8")
            payload = _payload_bytes(i, w * h * c)
        elif kind == "audio":
            sr, samples = 16000, 16000
            meta = (None, None, None, sr, None, "fake-pcm16")
            payload = _payload_bytes(i, samples * 2)
        elif kind == "video":
            w, h, c, nf = 16, 16, 3, 8 + (i % 5)
            meta = (w, h, c, None, nf, "fake-rgb8-frames")
            payload = _payload_bytes(i, w * h * c * nf)
        else:
            raise ValueError(kind)
        rows.append((i, kind, bytearray(payload), meta))
    n_parts = max(1, min(n // 16, spark.sparkContext.defaultParallelism))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(n_parts)


# --------------------------------------------------------------------------
# transforms (map-only, Arrow-batched)
# --------------------------------------------------------------------------
IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def extract_image_features(media: DataFrame, n_bins: int = 8) -> DataFrame:
    """(media_id, features): per-channel means + an n_bins intensity
    histogram — the plumbing for a real embedding model (swap the feature
    fn for CLIP/ResNet inference inside the same batch loop).

    Histogram binning is the integer partition ``bin = v * n_bins // 256``:
    every bin covers exactly ``256 / n_bins`` byte values. This is an
    INTENTIONAL semantic change from the r2 ``np.histogram(range=(0,255))``
    implementation (bin width 255/n_bins with a right-inclusive last bin
    — uneven coverage of byte 255); features computed before r3 differ at
    bin boundaries. The integer form is exact, faster, and the one to
    keep — pinned by tests/test_multimodal.py."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # columnar zip, not iterrows: images are variable-size so the
        # decode is per-row, but per-row work is pure numpy (mean +
        # bincount); no pandas row objects are materialized.
        for pdf in batches:
            ids, feats = [], []
            for mid, payload, m in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                img = _fake_decode_image(
                    bytes(payload), m["width"], m["height"], m["channels"]
                )
                means = img.reshape(-1, img.shape[2]).mean(axis=0) / 255.0
                hist = np.bincount(
                    (img.ravel().astype(np.int64) * n_bins) // 256,
                    minlength=n_bins,
                ).astype(np.float64)
                hist = hist / hist.sum()
                ids.append(mid)
                feats.append(np.concatenate([means, hist]).tolist())
            yield pd.DataFrame({"media_id": ids, "features": feats})

    return media.filter(F.col("kind") == "image").mapInPandas(
        gen, IMAGE_FEATURE_SCHEMA
    )


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize, payload → payload (same MEDIA_SCHEMA out).
    Production swaps the index arithmetic for a real resampler; the
    schema/meta contract is the deliverable."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for mid, knd, payload, m in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                img = _fake_decode_image(
                    bytes(payload), m["width"], m["height"], m["channels"]
                )
                ys = (np.arange(out_h) * m["height"] // out_h).astype(int)
                xs = (np.arange(out_w) * m["width"] // out_w).astype(int)
                resized = img[np.ix_(ys, xs)]
                out_rows.append(
                    {
                        "media_id": mid,
                        "kind": knd,
                        "payload": bytearray(resized.tobytes()),
                        "meta": {
                            "width": out_w,
                            "height": out_h,
                            "channels": int(m["channels"]),
                            "sample_rate": None,
                            "n_frames": None,
                            "codec": m["codec"],
                        },
                    }
                )
            yield pd.DataFrame(out_rows)

    return media.filter(F.col("kind") == "image").mapInPandas(gen, MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video → one row per sampled frame (UDTF-shaped mapInPandas): frame
    k for k ≡ 0 (mod every_n). Output payload is the raw frame buffer."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for mid, payload, m in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                frame_bytes = m["width"] * m["height"] * m["channels"]
                raw = bytes(payload)
                for k in range(0, int(m["n_frames"]), every_n):
                    ids.append(mid)
                    idxs.append(k)
                    payloads.append(
                        bytearray(raw[k * frame_bytes : (k + 1) * frame_bytes])
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "payload": payloads}
            )

    return media.filter(F.col("kind") == "video").mapInPandas(gen, FRAME_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """(media_id, rms, zero_crossings, duration_s) from the fake PCM
    waveform — the signal-stats plumbing a real ASR/audio-embed stage
    would replace."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload, m in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                raw = bytes(payload)
                n = len(raw) // 2
                wave = _fake_decode_audio(raw, n)
                out.append(
                    {
                        "media_id": mid,
                        "rms": float(np.sqrt((wave**2).mean())),
                        "zero_crossings": int(
                            (np.diff(np.signbit(wave)) != 0).sum()
                        ),
                        "duration_s": n / m["sample_rate"],
                    }
                )
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").mapInPandas(
        gen, AUDIO_FEATURE_SCHEMA
    )
