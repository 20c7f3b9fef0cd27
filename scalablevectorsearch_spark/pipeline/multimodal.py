"""Multimodal column conventions — opaque binary payloads with typed
metadata, plus decode / feature-extract / resize / frame-sample
plumbing as Arrow-batched Pandas transforms.

Extension surface beyond the reference (BASELINE.json: multimodal
columns for training-data pipelines). Design contract:

 - A media table is ``(media_id BIGINT, kind STRING, payload BINARY,
   meta STRUCT<format, width, height, n_frames, sample_rate>)``. The
   payload is NEVER interpreted by Spark itself — all byte-level work
   happens in ``mapInPandas`` kernels over Arrow batches, so the 100 TB
   of blobs stream partition-by-partition without driver involvement,
   and Parquet stores them as plain binary columns.
 - REAL in this container: schemas, partitioning, the mapInPandas batch
   shape, byte-level stats and deterministic feature extraction.
 - STUBBED: actual image/audio codecs (PIL/libsndfile are not
   installed). ``decode_image`` raises NotImplementedError unless PIL is
   importable; the deterministic ``fake_decode`` stands in so the full
   pipeline (decode -> resize -> features) is exercised end-to-end in
   tests with reproducible outputs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<format:string, width:int, height:int, n_frames:int, sample_rate:int>"
)

FEATURES_SCHEMA = "media_id long, n_bytes long, features array<double>"
FRAMES_SCHEMA = "media_id long, frame_idx int, frame_bytes long"


def media_from_documents(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Synthesize a media table from the documents fixture (payload =
    UTF-8 bytes of the text) — the container ships no real blobs; the
    schema and byte paths are identical to real media."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("synthetic").alias("format"),
            F.lit(8).alias("width"),
            F.lit(8).alias("height"),
            F.lit(4).alias("n_frames"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Byte-level stats as pure Catalyst expressions:
    (media_id, kind, n_bytes, checksum)."""
    return df.select(
        "media_id",
        "kind",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("checksum"),
    )


# ------------------------------------------------------------ decoders


def decode_image(payload: bytes, fmt: str | None = None) -> "np.ndarray":
    """Real image decode — requires PIL, which is intentionally not in
    this container. The call-shape is the production one."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return np.asarray(Image.open(io.BytesIO(payload)))
    except ImportError as e:
        raise NotImplementedError(
            "image codecs unavailable in this environment; use fake_decode "
            "for plumbing tests"
        ) from e


def fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in decoder: tiles the payload bytes into a
    (height, width) uint8 'image'. Reproducible across runs/engines."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    need = width * height
    if len(buf) == 0:
        buf = np.zeros(1, dtype=np.uint8)
    reps = -(-need // len(buf))
    return np.tile(buf, reps)[:need].reshape(height, width)


def resize_image(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy — no codec needed)."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[yi][:, xi]


# ------------------------------------------------------------ operators


def extract_features(df: DataFrame, n_features: int = 8) -> DataFrame:
    """mapInPandas feature extraction: decode (fake), resize to
    (n_features x n_features), then per-row byte statistics ->
    (media_id, n_bytes, features ARRAY<DOUBLE>). The Arrow batch path,
    schema, and partition streaming are the production shape; only the
    decoder is a stand-in."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, nbytes, feats = [], [], []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                meta = row["meta"]
                img = fake_decode(payload, int(meta["width"]), int(meta["height"]))
                img = resize_image(img, n_features, n_features)
                ids.append(int(row["media_id"]))
                nbytes.append(len(payload))
                feats.append(img.mean(axis=1).astype(np.float64).tolist())
            yield pd.DataFrame({"media_id": ids, "n_bytes": nbytes, "features": feats})

    return df.mapInPandas(fn, FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling for video-kind payloads: split the payload into
    meta.n_frames equal chunks, keep every ``every``-th ->
    (media_id, frame_idx, frame_bytes). Chunking is real; codec-level
    frame extraction would replace the byte-split in production."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_id, out_idx, out_len = [], [], []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                n_frames = max(int(row["meta"]["n_frames"]), 1)
                step = max(len(payload) // n_frames, 1)
                for fi in range(0, n_frames, every):
                    chunk = payload[fi * step : (fi + 1) * step]
                    out_id.append(int(row["media_id"]))
                    out_idx.append(fi)
                    out_len.append(len(chunk))
            yield pd.DataFrame(
                {"media_id": out_id, "frame_idx": out_idx, "frame_bytes": out_len}
            )

    return df.mapInPandas(fn, FRAMES_SCHEMA)
