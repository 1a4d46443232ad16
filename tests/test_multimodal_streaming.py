"""Multimodal plumbing (stubbed codec, real Spark path) + Structured
Streaming twin of the tumbling window (SURVEY §2.8 / §7.9)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_svms_spark.io.sources import load_table
from parallel_svms_spark.operators import events as E
from parallel_svms_spark.operators import multimodal as MM
from parallel_svms_spark.streaming import windows as SW


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return MM.synth_media_from_documents(load_table(spark, sf_dir, "documents"))


def test_media_schema_and_binary_payload(media):
    dt = dict(media.dtypes)
    assert dt["payload"] == "binary"
    assert media.filter(F.length("payload") <= 0).count() == 0
    assert {r.media_type for r in media.select("media_type").distinct().collect()} \
        == {"image", "audio", "video"}


def test_extract_features_deterministic_fixed_width(media):
    f1 = MM.extract_features(media)
    rows = f1.orderBy("media_id").limit(10).collect()
    assert all(len(r.features) == MM.FEATURE_DIM for r in rows)
    rows2 = MM.extract_features(media).orderBy("media_id").limit(10).collect()
    assert [r.features for r in rows] == [r.features for r in rows2]
    # n_bytes round-trips the payload length
    joined = f1.join(media, "media_id") \
               .filter(F.col("n_bytes") != F.length("payload"))
    assert joined.count() == 0


@pytest.mark.skipif(MM._HAVE_CODECS, reason="PIL installed: stub inactive")
def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        MM.extract_features(None, codec="image")


@pytest.mark.skipif(not MM._HAVE_CODECS, reason="PIL not installed")
def test_extract_features_image_codec(spark):  # pragma: no cover - env
    import io
    from PIL import Image
    buf = io.BytesIO()
    Image.new("RGB", (4, 4), (255, 0, 0)).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, "image", bytearray(buf.getvalue()), 4, 4, 0)],
        MM.MEDIA_SCHEMA)
    row = MM.extract_features(media, codec="image").first()
    assert len(row.features) == MM.FEATURE_DIM
    assert abs(row.features[0] - 1.0) < 1e-6  # red channel mean


def test_extract_features_codec_digest_is_default(media):
    # default stays the digest stand-in regardless of PIL presence —
    # the multimodal_features oracle depends on it
    a = MM.extract_features(media).orderBy("media_id").first()
    b = MM.extract_features(media, codec="digest") \
          .orderBy("media_id").first()
    assert a.features == b.features


def test_frame_sample_plan(media):
    plan = MM.frame_sample_plan(media, every_ms=1000)
    assert plan.filter("frame_no < 0").count() == 0
    # only videos produce frames
    joined = plan.join(media.select("media_id", "media_type"), "media_id")
    assert joined.filter("media_type != 'video'").count() == 0


def test_streaming_tumbling_matches_batch(spark, sf_dir):
    batch = E.window_tumbling(load_table(spark, sf_dir, "events"))
    # stream the same parquet dir through the streaming twin.
    # NOTE: the fixture's ts is TIMESTAMP(NANOS) read as long under
    # nanosAsLong; readStream needs the same conversion — build a
    # micro-batch-compatible copy first.
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        load_table(spark, sf_dir, "events").write.mode("overwrite") \
            .parquet(f"{tmp}/events")
        stream = SW.stream_events_from_dir(spark, f"{tmp}/events",
                                           max_files_per_trigger=2)
        agg = SW.windowed_counts(stream, window="1 hour", watermark="2 hours")
        # complete mode: emit all windows regardless of watermark close
        name = "stream_windows_test"
        q = (agg.writeStream.outputMode("complete")
             .format("memory").queryName(name).start())
        q.processAllAvailable()
        q.stop()
        got = {(r.window_start, r.event_type): (r.n_events, r.value_sum)
               for r in spark.sql(f"SELECT * FROM {name}").collect()}
    want = {(r.window_start, r.event_type): (r.n_events, r.value_sum)
            for r in batch.collect()}
    assert got == want


def test_resize_images_only_images_fixed_dims(media):
    out = MM.resize_images(media, target_w=64, target_h=48)
    n_images = media.filter("media_type = 'image'").count()
    assert out.count() == n_images
    rows = out.limit(5).collect()
    assert all(r.width == 64 and r.height == 48 for r in rows)
    assert all(len(r.payload) == 64 * 48 * 3 // 20 for r in rows)
    # deterministic
    again = MM.resize_images(media, 64, 48).orderBy("media_id").limit(5).collect()
    assert [bytes(r.payload) for r in out.orderBy("media_id").limit(5).collect()] \
        == [bytes(r.payload) for r in again]


def test_extract_features_batch_rows_restores_arrow_conf(spark, media):
    """VERDICT r2 #6: the Arrow batch cap must not leak past the
    operator — a subsequent Pandas-UDF stage sees the prior conf."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    before = spark.conf.get(key)
    want = [(r.media_id, r.features) for r in
            MM.extract_features(media).orderBy("media_id").limit(20).collect()]
    capped = MM.extract_features(media, batch_rows=7)
    got = [(r.media_id, r.features) for r in
           capped.orderBy("media_id").limit(20).collect()]
    assert got == want                       # cap changes batching only
    assert spark.conf.get(key) == before     # conf restored eagerly
    # a later Arrow stage runs under the caller's conf, full batch size
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def bsize(s):
        return pd.Series([len(s)] * len(s))
    bsize.__annotations__ = {"s": pd.Series, "return": pd.Series}
    sizes = (media.limit(500)
             .repartition(1)
             .select(pandas_udf(bsize, "long")("media_id").alias("b"))
             .collect())
    assert max(r.b for r in sizes) > 7       # not throttled to 7


def test_audio_window_plan_hops_and_edges(spark, media):
    from pyspark.sql import Row

    out = MM.audio_window_plan(media, window_ms=1000, hop_ms=500)
    rows = out.collect()
    assert rows and all(r.start_ms == r.win_no * 500 for r in rows)
    # overlapping hops: consecutive windows share 500ms until the tail
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    for media_id, ws in by_id.items():
        ws.sort(key=lambda r: r.win_no)
        dur = max(r.end_ms for r in ws)
        # windows start strictly inside the track; the final one is
        # clamped to duration (partial window kept)
        assert all(r.start_ms < dur or (dur == 0 and r.start_ms == 0)
                   for r in ws), media_id
        assert all(r.end_ms <= dur for r in ws)
        assert ws[0].win_no == 0
        assert [r.win_no for r in ws] == list(range(len(ws)))
    # degenerate zero-duration track still yields exactly one window
    zero = spark.createDataFrame([Row(
        media_id=9_999, media_type="audio", payload=bytearray(b"x"),
        width=0, height=0, duration_ms=0)])
    z = MM.audio_window_plan(zero).collect()
    assert [(r.win_no, r.start_ms, r.end_ms) for r in z] == [(0, 0, 0)]
