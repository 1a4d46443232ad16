"""Multimodal column plumbing (SURVEY §2.8: image/audio/video as opaque
binary + typed metadata).

The Spark-side architecture is real and tested: schema, partitioning,
Arrow batch shape, UDF signatures. The codec step itself is STUBBED —
this container has no image/audio libraries — behind
``_HAVE_CODECS``: with real libs installed, only ``_decode_image_real``
needs filling in; everything around it (mapInPandas batching, metadata
struct, feature schema) is the production path.

Design for 100 TB of media:
- binary payloads live in their own column; metadata predicates
  (media_type, width, duration) are separate columns so filter
  pushdown prunes row groups WITHOUT reading bytes;
- decode/feature-extract is mapInPandas with small
  ``maxRecordsPerBatch`` (payloads are MBs — batches must stay under
  Arrow's 2 GB limits);
- outputs are fixed-width embedding arrays, written columnar.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HAVE_CODECS = False  # no PIL/ffmpeg in this container — see module doc

MEDIA_SCHEMA = ("media_id long, media_type string, payload binary, "
                "width int, height int, duration_ms int")

FEATURE_DIM = 16


def synth_media_from_documents(documents: DataFrame) -> DataFrame:
    """Build a media-shaped table from the documents fixture (payload =
    utf8 bytes) so the plumbing is exercised with real binary data."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
         .when(F.col("doc_id") % 3 == 1, "audio")
         .otherwise("video").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        (F.col("n_chars") % 1920).cast("int").alias("width"),
        (F.col("n_chars") % 1080).cast("int").alias("height"),
        (F.col("n_chars") * 7).cast("int").alias("duration_ms"),
    )


def _fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for decode→feature-extract: features are
    a digest expansion of the bytes. Replaces the codec, preserves the
    data flow (bytes in → fixed-width float vector out)."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[:dim * 4],
                        dtype=np.uint32).astype(np.float64)
    return (raw / np.iinfo(np.uint32).max).astype(np.float32)


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Real codec hook. NotImplemented by design in this environment."""
    raise NotImplementedError(
        "image codecs not available in this container; "
        "install PIL/opencv and wire here — plumbing above is complete")


def extract_features(media: DataFrame, dim: int = FEATURE_DIM,
                     batch_rows: int | None = None) -> DataFrame:
    """payload → fixed-width feature vector, Arrow-batched.

    ``batch_rows``, when given, caps rows per Arrow batch by setting
    spark.sql.execution.arrow.maxRecordsPerBatch — REQUIRED for
    MB-scale payloads (batches must stay under Arrow's 2 GB limit).
    It is a SESSION-level conf, so it intentionally stays unset by
    default: setting it here unconditionally was observed to throttle
    every later Pandas-UDF stage in the session (64-row Arrow batches
    for the SVM trainers — ~15% on the bench) long after this operator
    finished.
    """
    if batch_rows is not None:
        media.sparkSession.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows))

    def run(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            feats = [
                _fake_decode_features(bytes(p), dim)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(len),
                "features": [f.tolist() for f in feats],
            })

    return media.mapInPandas(
        run, schema=("media_id long, media_type string, n_bytes long, "
                     f"features array<float>"))


def resize_images(media: DataFrame, target_w: int = 224,
                  target_h: int = 224) -> DataFrame:
    """Image resize plumbing: payload → resized payload + updated dims.

    The pixel work is the stubbed codec (deterministic digest-derived
    bytes sized like an uncompressed target_w×target_h×3 thumbnail ÷
    a JPEG-ish 20× factor, so byte volumes scale realistically); the
    Spark path — metadata-predicate pushdown on media_type, Arrow
    batching, schema with dims OUTSIDE the blob — is the production
    shape."""
    out_len = max(target_w * target_h * 3 // 20, 16)

    def run(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            payloads = [
                bytes(np.frombuffer(
                    (hashlib.sha256(bytes(p)).digest() * (out_len // 32 + 1))
                    [:out_len], dtype=np.uint8))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": payloads,
                "width": target_w, "height": target_h,
            })

    return (media.filter(F.col("media_type") == "image")
            .mapInPandas(run, schema=("media_id long, payload binary, "
                                      "width int, height int")))


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame to extract
    (media_id, frame_no, ts_ms). The plan is pure JVM (sequence +
    explode); executing it would call the codec hook per frame.
    Planning separately from decoding lets the scheduler balance
    frames — a 2 h video becomes 7200 independent rows, not one
    giant task (the skew story for video at scale)."""
    frames = F.explode(F.sequence(
        F.lit(0), F.greatest((F.col("duration_ms") / every_ms).cast("int") - 1,
                             F.lit(0))))
    return (media.filter(F.col("media_type") == "video")
            .select("media_id", frames.alias("frame_no"))
            .withColumn("ts_ms", F.col("frame_no") * every_ms))
