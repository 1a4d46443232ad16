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
from contextlib import contextmanager as _contextmanager

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # guarded codec import: activates the real decode path when the
    # image library exists; this container ships without it, so the
    # deterministic digest stand-in stays the default either way
    from PIL import Image as _PILImage  # type: ignore
    _HAVE_CODECS = True
except ImportError:  # pragma: no cover - exercised in this container
    _PILImage = None
    _HAVE_CODECS = False

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


def decode_image(payload: bytes) -> np.ndarray:
    """Real codec hook: bytes → HxWxC uint8 pixel array via PIL when
    the library is installed (``_HAVE_CODECS``); raises otherwise.
    The Spark plumbing around it (mapInPandas batching, schema,
    metadata-predicate pushdown) is identical on both paths."""
    if not _HAVE_CODECS:
        raise NotImplementedError(
            "image codecs not available in this container; "
            "install PIL and this hook activates — plumbing is complete")
    import io as _io
    return np.asarray(_PILImage.open(_io.BytesIO(payload)).convert("RGB"))


def _image_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Codec-backed feature extractor: per-channel mean/std + a gray
    histogram, padded to ``dim``. Deterministic for a given image."""
    px = decode_image(payload).astype(np.float64)
    chan = px.reshape(-1, px.shape[-1])
    stats = np.concatenate([chan.mean(0) / 255.0, chan.std(0) / 255.0])
    hist, _ = np.histogram(chan.mean(-1), bins=max(dim - len(stats), 1),
                           range=(0.0, 255.0))
    hist = hist / max(hist.sum(), 1)
    return np.concatenate([stats, hist])[:dim].astype(np.float32)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM,
                     batch_rows: int | None = None,
                     codec: str = "digest") -> DataFrame:
    """payload → fixed-width feature vector, Arrow-batched.

    ``codec='digest'`` (default): the deterministic sha256 stand-in —
    engine-independent, which is what lets the DuckDB oracle recompute
    it; stays the default even when PIL is installed so results never
    depend on the container. ``codec='image'``: the real decode path
    (requires ``_HAVE_CODECS``) — same batching, schema and plan, only
    the per-payload function changes.

    ``batch_rows``, when given, caps rows per Arrow batch via
    spark.sql.execution.arrow.maxRecordsPerBatch — REQUIRED for
    MB-scale payloads (batches must stay under Arrow's 2 GB limit).
    That is a SESSION-level conf read at execution time, so this path
    runs the extraction stage EAGERLY (localCheckpoint) inside a
    set/restore window and returns the materialized result: later
    Pandas-UDF stages in the session see the caller's original conf
    (an unconditional set here was observed to throttle the SVM
    trainers to 64-row Arrow batches — ~15% on the bench — long after
    this operator finished). The eager trade is sound exactly when
    batch_rows matters: the input payloads are huge but the output is
    fixed-width (dim floats/row), so checkpoint storage is small.
    Without ``batch_rows`` the result is lazy as usual.
    """
    if codec == "digest":
        feat_fn = _fake_decode_features
    elif codec == "image":
        if not _HAVE_CODECS:
            raise NotImplementedError(
                "codec='image' needs PIL — not present in this container")
        feat_fn = _image_features
    else:
        raise ValueError(f"unknown codec: {codec!r}")
    def run(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            feats = [
                feat_fn(bytes(p), dim)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(len),
                "features": [f.tolist() for f in feats],
            })

    out = media.mapInPandas(
        run, schema=("media_id long, media_type string, n_bytes long, "
                     f"features array<float>"))
    if batch_rows is not None:
        with _temp_conf(media.sparkSession,
                        "spark.sql.execution.arrow.maxRecordsPerBatch",
                        str(batch_rows)):
            out = out.localCheckpoint(eager=True)
    return out


@_contextmanager
def _temp_conf(spark, key: str, value: str):
    """Set a session conf for the duration of the block, restoring the
    caller's value (or unset state) on exit — success or error."""
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


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


def audio_window_plan(media: DataFrame, window_ms: int = 1000,
                      hop_ms: int = 500) -> DataFrame:
    """Audio analysis-window *plan*: one row per overlapping window to
    decode (media_id, win_no, start_ms, end_ms) — frame_sample_plan's
    audio twin (STFT/feature windows hop at ``hop_ms`` < ``window_ms``,
    unlike video's disjoint frames). Pure JVM sequence + explode;
    executing the plan calls the codec hook per window, so a 2 h track
    becomes ~14k independent rows the scheduler balances freely —
    same skew story as video. Windows start while ``start < duration``
    (the final partial window is kept: real features pad it); every
    track emits at least one window (degenerate zero-duration rows get
    win 0), matching the frame planner's at-least-one contract.
    """
    n_wins = F.greatest(
        F.ceil(F.col("duration_ms") / hop_ms).cast("int"), F.lit(1))
    wins = F.explode(F.sequence(F.lit(0), n_wins - 1))
    return (media.filter(F.col("media_type") == "audio")
            .select("media_id", "duration_ms", wins.alias("win_no"))
            .select("media_id", "win_no",
                    (F.col("win_no") * hop_ms).alias("start_ms"),
                    F.least(F.col("win_no") * hop_ms + window_ms,
                            F.col("duration_ms")).cast("int")
                    .alias("end_ms")))
