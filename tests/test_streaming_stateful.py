"""applyInPandasWithState sessionization — custom stateful streaming
operator (no batch/SQL equivalent in streaming mode)."""

from __future__ import annotations

import os
import tempfile
from datetime import datetime, timedelta

from parallel_svms_spark.streaming import windows as SW


def test_stateful_sessionize_closes_on_gap(spark):
    t0 = datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    # user 1: burst of 3 events, 40-min silence, burst of 2 (closes #1)
    for mins in (0, 5, 10, 50, 55):
        rows.append((eid, t0 + timedelta(minutes=mins), 1, "click", 1.0, "{}"))
        eid += 1
    # user 2: single burst (stays open — never emitted)
    for mins in (0, 1):
        rows.append((eid, t0 + timedelta(minutes=mins), 2, "view", 2.0, "{}"))
        eid += 1
    df = spark.createDataFrame(rows, SW.EVENTS_SCHEMA)
    with tempfile.TemporaryDirectory() as tmp:
        df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/ev")
        stream = SW.stream_events_from_dir(spark, f"{tmp}/ev",
                                           max_files_per_trigger=1)
        sess = SW.sessionize_stateful(stream, gap_minutes=30)
        name = "stateful_sessions_test"
        q = (sess.writeStream.outputMode("append")
             .format("memory").queryName(name).start())
        q.processAllAvailable()
        q.stop()
        got = spark.sql(f"SELECT * FROM {name}").collect()
    assert len(got) == 1
    s = got[0]
    assert s.user_id == 1
    assert s.n_events == 3
    assert s.session_start == t0
    assert s.session_end == t0 + timedelta(minutes=10)
    assert abs(s.value_sum - 3.0) < 1e-9


def test_stateful_sessionize_event_time_timeout(spark):
    t0 = datetime(2026, 1, 1, 0, 0, 0)
    f1 = [(0, t0, 7, "click", 1.0, "{}"),
          (1, t0 + timedelta(minutes=2), 7, "click", 1.0, "{}")]
    # second file: far-future event for another user — advances the
    # watermark past user 7's last_ts + gap, firing its timeout
    f2 = [(2, t0 + timedelta(hours=3), 8, "view", 2.0, "{}")]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(f1, SW.EVENTS_SCHEMA).coalesce(1) \
            .write.parquet(f"{tmp}/ev/a")
        spark.createDataFrame(f2, SW.EVENTS_SCHEMA).coalesce(1) \
            .write.parquet(f"{tmp}/ev/b")
        # flat dir of both files, one per trigger → two ordered batches
        import shutil, glob, os
        dst = f"{tmp}/flat"; os.makedirs(dst)
        for i, p in enumerate(sorted(glob.glob(f"{tmp}/ev/*/part-*"))):
            shutil.copy(p, f"{dst}/{i:04d}.parquet")
            # file source orders batches by mtime — make it explicit
            os.utime(f"{dst}/{i:04d}.parquet", (1000 + i, 1000 + i))
        stream = SW.stream_events_from_dir(spark, dst,
                                           max_files_per_trigger=1)
        sess = SW.sessionize_stateful(stream, gap_minutes=30)
        name = "stateful_timeout_test"
        q = (sess.writeStream.outputMode("append")
             .format("memory").queryName(name).start())
        q.processAllAvailable()
        q.stop()
        got = {r.user_id: r for r in
               spark.sql(f"SELECT * FROM {name}").collect()}
    assert 7 in got  # closed by event-time timeout, not by a gap event
    assert got[7].n_events == 2
    assert got[7].session_end == t0 + timedelta(minutes=2)


def test_stateful_sessionize_matches_batch_on_fixture(spark, sf_dir):
    """VERDICT r3 #8: the streaming twin must agree with the batch
    ``operators.events.sessionize`` on the REAL fixture — same events,
    same sessions. The stream gets the fixture split into time-ordered
    chunks (so nothing is watermark-late) plus a far-future sentinel
    event that pushes the watermark past every real session's
    last_ts + gap, forcing all of them to close and emit."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators import events as E

    events = load_table(spark, sf_dir, "events")
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events): r.value_sum
        for r in E.sessionize(events, gap_minutes=30).collect()
    }

    tbl = pq.read_table(f"{sf_dir}/events.parquet").sort_by("ts")
    sentinel = pa.table({
        "event_id": pa.array([10**9], pa.int64()),
        "ts": pa.array([tbl["ts"][-1].as_py()
                        + timedelta(days=365)], pa.timestamp("us")),
        "user_id": pa.array([10**9], pa.int64()),
        "event_type": pa.array(["view"], pa.string()),
        "value": pa.array([0.0], pa.float64()),
        "props": pa.array(["{}"], pa.string()),
    })
    with tempfile.TemporaryDirectory() as tmp:
        n = tbl.num_rows
        chunks = [tbl.slice(0, n // 2), tbl.slice(n // 2), sentinel]
        for i, c in enumerate(chunks):
            p = f"{tmp}/{i:04d}.parquet"
            pq.write_table(c, p)
            os.utime(p, (1000 + i, 1000 + i))
        stream = SW.stream_events_from_dir(spark, tmp, max_files_per_trigger=1)
        sess = SW.sessionize_stateful(stream, gap_minutes=30)
        name = "stateful_fixture_eq"
        q = (sess.writeStream.outputMode("append")
             .format("memory").queryName(name).start())
        q.processAllAvailable()
        q.stop()
        got = {
            (r.user_id, r.session_start, r.session_end, r.n_events): r.value_sum
            for r in spark.sql(f"SELECT * FROM {name}").collect()
            if r.user_id != 10**9  # sentinel's own session never closes
        }
    assert set(got) == set(batch)
    for key, vsum in got.items():
        # accumulation order differs (ts-order vs partial-agg order) —
        # equal after the 6-dp round both sides apply, up to 1 ulp
        assert abs(vsum - batch[key]) < 2e-6, key


def test_streaming_exact_dedup_bounded_state(spark):
    import glob
    import os
    import shutil

    t0 = datetime(2026, 1, 1, 0, 0, 0)
    # batch 1: two distinct docs; batch 2: an exact dup of doc 0 within
    # the watermark horizon (dropped) + one new doc
    f1 = [(0, t0, "alpha beta gamma"),
          (1, t0 + timedelta(minutes=1), "delta epsilon zeta")]
    f2 = [(2, t0 + timedelta(minutes=5), "alpha beta gamma"),
          (3, t0 + timedelta(minutes=6), "eta theta iota")]
    with tempfile.TemporaryDirectory() as tmp:
        for i, rows in enumerate((f1, f2)):
            spark.createDataFrame(rows, SW.DOCS_SCHEMA).coalesce(1) \
                .write.parquet(f"{tmp}/d/{i}")
        dst = f"{tmp}/flat"
        os.makedirs(dst)
        for i, p in enumerate(sorted(glob.glob(f"{tmp}/d/*/part-*"))):
            shutil.copy(p, f"{dst}/{i:04d}.parquet")
            os.utime(f"{dst}/{i:04d}.parquet", (1000 + i, 1000 + i))
        stream = (spark.readStream.schema(SW.DOCS_SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(dst))
        dedup = SW.streaming_exact_dedup(stream, watermark="2 hours")
        name = "stream_dedup_test"
        q = (dedup.writeStream.outputMode("append")
             .format("memory").queryName(name).start())
        q.processAllAvailable()
        q.stop()
        got = sorted(r.doc_id for r in
                     spark.sql(f"SELECT * FROM {name}").collect())
    assert got == [0, 1, 3]  # doc 2 (cross-batch exact dup) dropped


def test_streaming_minhash_near_dups_stream_static(spark):
    import glob
    import os
    import shutil

    from parallel_svms_spark.operators import dedup as D
    from pyspark.sql import functions as F

    t0 = datetime(2026, 1, 1, 0, 0, 0)
    corpus_texts = {
        100: "the quick brown fox jumps over the lazy dog every single day",
        101: "completely different content about spark structured streaming",
        102: "another unrelated corpus document mentioning gaussian models",
    }
    corpus = spark.createDataFrame(
        [(i, t) for i, t in corpus_texts.items()], "doc_id long, text string")
    idx = SW.static_minhash_index(corpus)
    # batch 1: a near-dup of corpus doc 100 (first token dropped) + noise;
    # batch 2: an EXACT dup of 101 — collides in all 16 bands, must
    # still emit exactly once (the bounded-state dedup)
    f1 = [(1, t0, " ".join(corpus_texts[100].split()[1:])),
          (2, t0 + timedelta(minutes=1),
           "nothing similar here at all whatsoever to anything above")]
    f2 = [(3, t0 + timedelta(minutes=5), corpus_texts[101])]
    with tempfile.TemporaryDirectory() as tmp:
        for i, rows in enumerate((f1, f2)):
            spark.createDataFrame(rows, SW.DOCS_SCHEMA).coalesce(1) \
                .write.parquet(f"{tmp}/d/{i}")
        dst = f"{tmp}/flat"
        os.makedirs(dst)
        for i, p in enumerate(sorted(glob.glob(f"{tmp}/d/*/part-*"))):
            shutil.copy(p, f"{dst}/{i:04d}.parquet")
            os.utime(f"{dst}/{i:04d}.parquet", (1000 + i, 1000 + i))
        stream = (spark.readStream.schema(SW.DOCS_SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(dst))
        pairs = SW.streaming_minhash_near_dups(stream, idx, threshold=0.5)
        name = "stream_minhash_test"
        q = (pairs.writeStream.outputMode("append")
             .format("memory").queryName(name).start())
        q.processAllAvailable()
        q.stop()
        got = {(r.doc_a, r.doc_b): r.jaccard
               for r in spark.sql(f"SELECT * FROM {name}").collect()}
        n_rows = spark.sql(f"SELECT COUNT(*) c FROM {name}").first().c
    assert set(got) == {(1, 100), (3, 101)}
    assert n_rows == 2                      # band collisions collapsed
    assert got[(3, 101)] == 1.0             # exact dup
    # jaccard values match the BATCH operator bit-for-bit on the union
    union = corpus.unionByName(spark.createDataFrame(
        [(i, t) for i, _, t in f1 + f2], "doc_id long, text string"))
    batch = {(r.doc_a, r.doc_b): r.jaccard
             for r in D.ngram_jaccard_pairs(
                 union, threshold=0.5, max_doc_freq=None).collect()}
    assert got[(1, 100)] == batch[(1, 100)]
    assert got[(3, 101)] == batch[(3, 101)]


def test_streaming_decontaminate_matches_batch(spark):
    import glob
    import os
    import shutil

    from parallel_svms_spark.operators import contamination as C

    t0 = datetime(2026, 1, 1, 0, 0, 0)
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string")
    f1 = [(0, t0, "alpha beta gamma delta totally new suffix"),
          (1, t0 + timedelta(minutes=1), "nothing in common with that")]
    f2 = [(2, t0 + timedelta(minutes=5), "short doc"),  # <k fallback path
          (3, t0 + timedelta(minutes=6), "beta gamma delta epsilon trailing")]
    with tempfile.TemporaryDirectory() as tmp:
        for i, rows in enumerate((f1, f2)):
            spark.createDataFrame(rows, SW.DOCS_SCHEMA).coalesce(1) \
                .write.parquet(f"{tmp}/d/{i}")
        dst = f"{tmp}/flat"
        os.makedirs(dst)
        for i, p in enumerate(sorted(glob.glob(f"{tmp}/d/*/part-*"))):
            shutil.copy(p, f"{dst}/{i:04d}.parquet")
            os.utime(f"{dst}/{i:04d}.parquet", (1000 + i, 1000 + i))
        stream = (spark.readStream.schema(SW.DOCS_SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(dst))
        clean = SW.streaming_decontaminate(stream, bench, k=4)
        name = "stream_decontam_test"
        q = (clean.writeStream.outputMode("append")
             .format("memory").queryName(name).start())
        q.processAllAvailable()
        q.stop()
        got = sorted(r.doc_id for r in
                     spark.sql(f"SELECT doc_id FROM {name}").collect())
        # the stream twin must agree with the batch operator on the
        # same rows (docs 0 and 3 share 4-shingles with the benchmark)
        corpus = spark.createDataFrame(
            [(i, t) for i, _, t in f1 + f2], "doc_id long, text string")
        batch = sorted(r.doc_id for r in
                       C.decontaminate(corpus, bench, k=4).collect())
    assert got == [1, 2]
    assert got == batch


def test_streaming_quality_screen_matches_batch(spark, sf_dir):
    """The stateless quality screen must keep exactly the docs the
    batch quality_score marks >= threshold — scores shared by code,
    asserted on the REAL fixture streamed file-by-file."""
    import glob
    import os
    import shutil

    from parallel_svms_spark.io.sources import DOCUMENTS_SCHEMA, load_table
    from parallel_svms_spark.operators import text as TX

    from pyspark.sql import functions as F

    thr = 0.5
    docs = load_table(spark, sf_dir, "documents")
    batch = {(r.doc_id, r.quality)
             for r in TX.quality_score(docs)
             .filter(F.col("quality") >= thr)
             .select("doc_id", "quality").collect()}

    with tempfile.TemporaryDirectory() as tmp:
        # split the fixture into two stream files
        docs.filter("doc_id % 2 = 0").coalesce(1).write.parquet(f"{tmp}/d/0")
        docs.filter("doc_id % 2 = 1").coalesce(1).write.parquet(f"{tmp}/d/1")
        dst = f"{tmp}/flat"
        os.makedirs(dst)
        for i, p in enumerate(sorted(glob.glob(f"{tmp}/d/*/part-*"))):
            shutil.copy(p, f"{dst}/{i:04d}.parquet")
            os.utime(f"{dst}/{i:04d}.parquet", (1000 + i, 1000 + i))
        stream = (spark.readStream.schema(DOCUMENTS_SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(dst))
        kept = SW.streaming_quality_screen(stream, min_quality=thr)
        name = "stream_quality_test"
        q = (kept.writeStream.outputMode("append")
             .format("memory").queryName(name).start())
        q.processAllAvailable()
        q.stop()
        got = {(r.doc_id, r.quality) for r in
               spark.sql(f"SELECT doc_id, quality FROM {name}").collect()}
    assert got == batch
    assert got  # fixture must exercise the screen non-trivially


def test_streaming_weighted_sample_matches_batch(spark, sf_dir):
    """The stateless importance-sampling screen must keep exactly the
    rows the batch sampler keeps (shared code, deterministic coin) —
    streamed file-by-file so micro-batch boundaries are exercised."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from parallel_svms_spark.io.sources import DOCUMENTS_SCHEMA, load_table
    from parallel_svms_spark.operators import sharding as SH

    docs = load_table(spark, sf_dir, "documents")
    w = F.col("n_chars") / 2000.0
    batch = sorted(r.doc_id for r in
                   SH.weighted_sample(docs, w).select("doc_id").collect())

    with tempfile.TemporaryDirectory() as tmp:
        docs.filter("doc_id % 2 = 0").coalesce(1).write.parquet(f"{tmp}/d/0")
        docs.filter("doc_id % 2 = 1").coalesce(1).write.parquet(f"{tmp}/d/1")
        dst = f"{tmp}/flat"
        os.makedirs(dst)
        for i, p in enumerate(sorted(glob.glob(f"{tmp}/d/*/part-*"))):
            shutil.copy(p, f"{dst}/{i:04d}.parquet")
            os.utime(f"{dst}/{i:04d}.parquet", (1000 + i, 1000 + i))
        stream = (spark.readStream.schema(DOCUMENTS_SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(dst))
        kept = SW.streaming_weighted_sample(stream, F.col("n_chars") / 2000.0)
        name = "stream_wsample_test"
        q = (kept.writeStream.outputMode("append")
             .format("memory").queryName(name).start())
        q.processAllAvailable()
        q.stop()
        got = sorted(r.doc_id for r in
                     spark.sql(f"SELECT doc_id FROM {name}").collect())
    assert got == batch
    assert got  # fixture must keep a non-trivial subset


def test_streaming_chunk_documents_matches_batch(spark, sf_dir):
    """The stateless chunking screen must emit exactly the batch
    operator's chunk set (shared code, per-row explode) — streamed
    file-by-file so micro-batch boundaries are exercised."""
    import glob
    import os
    import shutil

    from parallel_svms_spark.io.sources import DOCUMENTS_SCHEMA, load_table
    from parallel_svms_spark.operators import sharding as SH

    docs = load_table(spark, sf_dir, "documents")
    batch = sorted((r.doc_id, r.chunk_ix, r.chunk_text) for r in
                   SH.chunk_documents(docs).collect())

    with tempfile.TemporaryDirectory() as tmp:
        docs.filter("doc_id % 2 = 0").coalesce(1).write.parquet(f"{tmp}/d/0")
        docs.filter("doc_id % 2 = 1").coalesce(1).write.parquet(f"{tmp}/d/1")
        dst = f"{tmp}/flat"
        os.makedirs(dst)
        for i, p in enumerate(sorted(glob.glob(f"{tmp}/d/*/part-*"))):
            shutil.copy(p, f"{dst}/{i:04d}.parquet")
            os.utime(f"{dst}/{i:04d}.parquet", (1000 + i, 1000 + i))
        stream = (spark.readStream.schema(DOCUMENTS_SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(dst))
        chunks = SW.streaming_chunk_documents(stream)
        name = "stream_chunk_test"
        q = (chunks.writeStream.outputMode("append")
             .format("memory").queryName(name).start())
        q.processAllAvailable()
        q.stop()
        got = sorted((r.doc_id, r.chunk_ix, r.chunk_text) for r in
                     spark.sql(f"SELECT * FROM {name}").collect())
    assert got == batch
    assert got


def test_streaming_interval_join_matches_batch(spark, sf_dir):
    """The stream-static interval join must produce exactly the batch
    interval_join's matches on the fixture (stateless equi-join: no
    watermark needed, every match emitted in its arrival micro-batch)."""
    import os
    import shutil

    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators import events as E

    events = load_table(spark, sf_dir, "events")
    sess = (E.sessionize(events)
            .select("user_id", "session_seq", "session_start", "session_end")
            .localCheckpoint())
    batch = {(r.event_id, r.user_id, r.session_seq)
             for r in E.sessions_containing(events).collect()}

    with tempfile.TemporaryDirectory() as tmp:
        shutil.copy(f"{sf_dir}/events.parquet", f"{tmp}/0000.parquet")
        os.utime(f"{tmp}/0000.parquet", (1000, 1000))
        stream = (SW.stream_events_from_dir(spark, tmp)
                  .filter("event_type = 'error'").select("event_id", "ts"))
        j = SW.streaming_interval_join(stream, sess) \
            .select("event_id", "user_id", "session_seq")
        name = SW.run_stream_to_memory(j, "interval_join_eq")
        got = {(r.event_id, r.user_id, r.session_seq)
               for r in spark.sql(f"SELECT * FROM {name}").collect()}
    assert got == batch and len(got) > 0


def test_funnel_stateful_matches_batch_conversions(spark, sf_dir):
    """Streaming funnel must emit exactly the users (and conversion
    timestamps) the batch funnel recurrence counts at its final
    stage, given a time-ordered source."""
    import os

    import pyarrow.parquet as pq

    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators import events as E

    events = load_table(spark, sf_dir, "events")
    batch = {(r.user_id, r.converted_ts)
             for r in E.funnel_conversions(events).collect()}
    assert batch  # fixture must actually convert someone

    tbl = pq.read_table(f"{sf_dir}/events.parquet").sort_by("ts")
    with tempfile.TemporaryDirectory() as tmp:
        n = tbl.num_rows
        for i, c in enumerate([tbl.slice(0, n // 3),
                               tbl.slice(n // 3, n // 3),
                               tbl.slice(2 * (n // 3))]):
            p = f"{tmp}/{i:04d}.parquet"
            pq.write_table(c, p)
            os.utime(p, (1000 + i, 1000 + i))
        stream = SW.stream_events_from_dir(spark, tmp, max_files_per_trigger=1)
        conv = SW.funnel_stateful(stream)
        name = SW.run_stream_to_memory(conv, "funnel_eq")
        got = {(r.user_id, r.converted_ts)
               for r in spark.sql(f"SELECT * FROM {name}").collect()}
    assert got == batch


def test_funnel_stateful_order_window_and_single_emit(spark):
    """Out-of-order steps don't convert; conversions emit exactly once
    even when later qualifying events arrive in later batches."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    def tbl(rows):
        return pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([datetime(2020, 1, 1) + timedelta(hours=r[1])
                            for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        })

    # user 1 converts (view→click→purchase within windows); user 2 has
    # purchase BEFORE click (no conversion); user 3's click comes 30h
    # after view (outside the 24h window — no conversion); user 1 gets
    # a second purchase in batch 2 (must not re-emit)
    batch1 = tbl([(1, 0, 1, "view"), (2, 1, 1, "click"),
                  (3, 2, 1, "purchase"),
                  (4, 0, 2, "view"), (5, 1, 2, "purchase"),
                  (6, 2, 2, "click"),
                  (7, 0, 3, "view"), (8, 30, 3, "click")])
    batch2 = tbl([(9, 3, 1, "purchase"), (10, 31, 3, "purchase")])
    with tempfile.TemporaryDirectory() as tmp:
        for i, t in enumerate((batch1, batch2)):
            p = f"{tmp}/{i:04d}.parquet"
            pq.write_table(t, p)
            os.utime(p, (1000 + i, 1000 + i))
        stream = SW.stream_events_from_dir(spark, tmp, max_files_per_trigger=1)
        name = SW.run_stream_to_memory(SW.funnel_stateful(stream),
                                       "funnel_edges")
        rows = spark.sql(f"SELECT * FROM {name}").collect()
    assert [(r.user_id, r.converted_ts.hour) for r in rows] == [(1, 2)]


def test_retention_stateful_matches_batch_triangle(spark, sf_dir):
    """Aggregating the streaming per-user-week feed must reproduce the
    batch retention triangle exactly (cohorts, offsets, counts)."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators import events as E

    events = load_table(spark, sf_dir, "events")
    batch = {(r.cohort_week, r.week_offset): r.n_users
             for r in E.retention_cohorts(events).collect()}
    assert batch

    tbl = pq.read_table(f"{sf_dir}/events.parquet").sort_by("ts")
    with tempfile.TemporaryDirectory() as tmp:
        n = tbl.num_rows
        for i, c in enumerate([tbl.slice(0, n // 2), tbl.slice(n // 2)]):
            p = f"{tmp}/{i:04d}.parquet"
            pq.write_table(c, p)
            os.utime(p, (1000 + i, 1000 + i))
        stream = SW.stream_events_from_dir(spark, tmp, max_files_per_trigger=1)
        name = SW.run_stream_to_memory(SW.retention_stateful(stream),
                                       "retention_eq")
        got_rows = spark.sql(f"SELECT * FROM {name}")
        # exactly-once per user-week: no duplicates in the feed
        assert got_rows.count() == got_rows.distinct().count()
        got = {(r.cohort_week, r.week_offset): r.n
               for r in got_rows.groupBy("cohort_week", "week_offset")
               .agg(F.count("*").alias("n")).collect()}
    assert got == batch


def test_streaming_value_histogram_matches_batch(spark, sf_dir):
    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators.events import value_histogram

    events = load_table(spark, sf_dir, "events")
    batch = {r.bucket: (r.n, r.min_value, r.max_value)
             for r in value_histogram(events).collect()}

    import pyarrow.parquet as pq
    tbl = pq.read_table(f"{sf_dir}/events.parquet").sort_by("ts")
    with tempfile.TemporaryDirectory() as tmp:
        n = tbl.num_rows
        for i, c in enumerate([tbl.slice(0, n // 2), tbl.slice(n // 2)]):
            pq.write_table(c, f"{tmp}/{i:04d}.parquet")
            os.utime(f"{tmp}/{i:04d}.parquet", (1000 + i, 1000 + i))
        stream = SW.stream_events_from_dir(spark, tmp)
        hist = SW.streaming_value_histogram(stream)
        q = (hist.writeStream.outputMode("complete")
             .format("memory").queryName("stream_hist").start())
        q.processAllAvailable()
        q.stop()
        got = {r.bucket: (r.n, r.min_value, r.max_value)
               for r in spark.sql("SELECT * FROM stream_hist").collect()}
    assert got == batch


def test_streaming_outlier_screen_matches_batch_boundary(spark, sf_dir):
    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators.events import outlier_events

    events = load_table(spark, sf_dir, "events")
    thresholds = outlier_events(events)
    # batch view of the same screen: events above their type's p_thr
    want = {r.event_id for r in
            events.join(thresholds.select("event_type", "p_thr"),
                        "event_type")
            .filter("value > p_thr").collect()}
    n_thr = thresholds.count()

    import pyarrow.parquet as pq
    tbl = pq.read_table(f"{sf_dir}/events.parquet").sort_by("ts")
    with tempfile.TemporaryDirectory() as tmp:
        pq.write_table(tbl, f"{tmp}/0000.parquet")
        stream = SW.stream_events_from_dir(spark, tmp)
        flagged = SW.streaming_outlier_screen(stream, thresholds)
        q = (flagged.writeStream.outputMode("append")
             .format("memory").queryName("stream_outliers").start())
        q.processAllAvailable()
        q.stop()
        rows = spark.sql("SELECT * FROM stream_outliers").collect()
    assert {r.event_id for r in rows} == want
    assert len(rows) == len(want)  # exactly-once per outlier
    assert n_thr >= 1 and all(r.value > r.p_thr for r in rows)


def test_checkpoint_restart_recovers_exactly_once(spark, sf_dir, tmp_path):
    """Kill-and-restart recovery: a checkpointed stateful query,
    stopped after the first file and restarted on the same checkpoint
    with more files present, must produce the batch answer with no
    duplicated and no lost sessions — exactly-once across restarts,
    the property a 100 TB continuous pipeline actually relies on.

    The sentinel event (far future) pushes the watermark past every
    real session so all of them close and emit before the final stop.
    """
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators import events as E

    events = load_table(spark, sf_dir, "events")
    batch = {(r.user_id, r.session_start, r.session_end): r.n_events
             for r in E.sessionize(events, gap_minutes=30).collect()}

    tbl = pq.read_table(f"{sf_dir}/events.parquet").sort_by("ts")
    sentinel = pa.table({
        "event_id": pa.array([10**9], pa.int64()),
        "ts": pa.array([tbl["ts"][-1].as_py() + timedelta(days=365)],
                       pa.timestamp("us")),
        "user_id": pa.array([10**9], pa.int64()),
        "event_type": pa.array(["view"], pa.string()),
        "value": pa.array([0.0], pa.float64()),
        "props": pa.array(["{}"], pa.string()),
    })
    src = tmp_path / "src"
    sink = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    n = tbl.num_rows

    def start():
        stream = SW.stream_events_from_dir(spark, str(src),
                                           max_files_per_trigger=1)
        sess = SW.sessionize_stateful(stream, gap_minutes=30)
        return (sess.writeStream.outputMode("append")
                .option("checkpointLocation", str(ckpt))
                .format("parquet").option("path", str(sink))
                .start())

    # phase 1: first half only, then a hard stop (mid-pipeline state
    # lives in the checkpoint now)
    pq.write_table(tbl.slice(0, n // 2), f"{src}/0000.parquet")
    os.utime(f"{src}/0000.parquet", (1000, 1000))
    q = start()
    q.processAllAvailable()
    q.stop()

    # phase 2: rest + sentinel arrive while the query is DOWN; restart
    # from the same checkpoint must pick them up without re-emitting
    # phase-1 output
    pq.write_table(tbl.slice(n // 2), f"{src}/0001.parquet")
    pq.write_table(sentinel, f"{src}/0002.parquet")
    os.utime(f"{src}/0001.parquet", (1001, 1001))
    os.utime(f"{src}/0002.parquet", (1002, 1002))
    q = start()
    q.processAllAvailable()
    q.stop()

    got_rows = [r for r in spark.read.parquet(str(sink)).collect()
                if r.user_id != 10**9]
    got = {(r.user_id, r.session_start, r.session_end): r.n_events
           for r in got_rows}
    assert len(got_rows) == len(got)  # no duplicate emissions
    assert got == batch               # no lost sessions either


def test_transitions_stateful_matches_batch(spark, sf_dir):
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators.events import event_transitions

    events = load_table(spark, sf_dir, "events")
    batch = {(r.prev_type, r.next_type): r.n_transitions
             for r in event_transitions(events).collect()}

    tbl = pq.read_table(f"{sf_dir}/events.parquet").sort_by("ts")
    with tempfile.TemporaryDirectory() as tmp:
        n = tbl.num_rows
        for i, c in enumerate([tbl.slice(0, n // 3),
                               tbl.slice(n // 3, n // 3),
                               tbl.slice(2 * (n // 3))]):
            pq.write_table(c, f"{tmp}/{i:04d}.parquet")
            os.utime(f"{tmp}/{i:04d}.parquet", (1000 + i, 1000 + i))
        stream = SW.stream_events_from_dir(spark, tmp)
        feed = SW.transitions_stateful(stream)
        q = (feed.writeStream.outputMode("append")
             .format("memory").queryName("stream_trans").start())
        q.processAllAvailable()
        q.stop()
        got = {(r.prev_type, r.next_type): r.n
               for r in spark.sql(
                   "SELECT prev_type, next_type, count(*) AS n "
                   "FROM stream_trans GROUP BY 1, 2").collect()}
    assert got == batch


def test_asof_stateful_matches_batch(spark, sf_dir):
    import pyarrow.parquet as pq

    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators.events import asof_prev_event

    events = load_table(spark, sf_dir, "events")
    batch = {(r.event_id, r.user_id, r.ts, r.prev_event_id, r.prev_ts,
              r.gap_us)
             for r in asof_prev_event(events).collect()}

    tbl = pq.read_table(f"{sf_dir}/events.parquet").sort_by("ts")
    with tempfile.TemporaryDirectory() as tmp:
        n = tbl.num_rows
        for i, c in enumerate([tbl.slice(0, n // 3),
                               tbl.slice(n // 3, n // 3),
                               tbl.slice(2 * (n // 3))]):
            pq.write_table(c, f"{tmp}/{i:04d}.parquet")
            os.utime(f"{tmp}/{i:04d}.parquet", (1000 + i, 1000 + i))
        stream = SW.stream_events_from_dir(spark, tmp)
        feed = SW.asof_stateful(stream)
        q = (feed.writeStream.outputMode("append")
             .format("memory").queryName("stream_asof").start())
        q.processAllAvailable()
        q.stop()
        got = {(r.event_id, r.user_id, r.ts, r.prev_event_id, r.prev_ts,
                r.gap_us)
               for r in spark.sql("SELECT * FROM stream_asof").collect()}
    # every left event emitted exactly once, with the same prev pairing
    # (including the NULL-prev lefts) as the batch window carry-forward
    assert got == batch


def test_asof_stateful_tie_straddling_batches_is_dropped(spark):
    """Equal timestamps straddling a micro-batch boundary (review
    finding): a right (ts=T, id=9) lands in batch 1 and a left
    (ts=T, id=5) in batch 2. In the batch operator's (ts, event_id)
    total order the left PRECEDES that right, so pairing them would be
    wrong — the (ts, event_id) guard must DROP the out-of-order left
    (the time-ordered-source contract), never emit the wrong pair."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    tie = t0 + timedelta(minutes=5)

    def tbl(rows):
        return pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows],
                           pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        })

    with tempfile.TemporaryDirectory() as tmp:
        # batch 1: an early click (id=1), then the tie-ts click (id=9)
        pq.write_table(tbl([(1, t0, "click"), (9, tie, "click")]),
                       f"{tmp}/0000.parquet")
        # batch 2: the tie-ts error (id=5) — earlier in (ts, id) order
        # than click 9, plus a genuinely later error that must pair
        # with click 9
        later = tie + timedelta(minutes=1)
        pq.write_table(tbl([(5, tie, "error"), (7, later, "error")]),
                       f"{tmp}/0001.parquet")
        # FileStreamSource orders pending files by MTIME, not name —
        # under load both writes can share an mtime tick, making the
        # batch split nondeterministic (r6 flake). Pin strictly
        # increasing mtimes so batch order is the scenario's order.
        os.utime(f"{tmp}/0000.parquet", (1000, 1000))
        os.utime(f"{tmp}/0001.parquet", (1001, 1001))
        stream = SW.stream_events_from_dir(spark, tmp)
        feed = SW.asof_stateful(stream)
        q = (feed.writeStream.outputMode("append")
             .format("memory").queryName("stream_asof_tie").start())
        q.processAllAvailable()
        q.stop()
        got = {r.event_id: r.prev_event_id for r in
               spark.sql("SELECT * FROM stream_asof_tie").collect()}
    # the out-of-order tie left is dropped, not mis-paired with id=9;
    # the in-order left pairs with the tie click
    assert 5 not in got, got
    assert got == {7: 9}, got


def test_streaming_embedding_near_dup_stream_static(spark):
    import glob
    import os
    import shutil

    import numpy as np

    from parallel_svms_spark.operators import similarity as S

    t0 = datetime(2026, 1, 1, 0, 0, 0)
    rng = [[float((i * 7 + j * 3) % 11) - 5.0 for j in range(8)]
           for i in range(6)]
    corpus = spark.createDataFrame(
        [(100 + i, [float(x) for x in v]) for i, v in enumerate(rng)],
        "vec_id long, embedding array<float>")
    C = S.ivf_centroids(corpus, n_lists=2, sample_rows=6)
    idx = SW.static_embedding_index(corpus, C)
    # batch 1: vec 1 = corpus 100 scaled (cosine 1.0) + noise vector;
    # batch 2: vec 3 = corpus 102 with a small perturbation
    near102 = [x + 0.01 for x in rng[2]]
    f1 = [(1, t0, [x * 2.0 for x in rng[0]]),
          (2, t0 + timedelta(minutes=1),
           [5.0, -4.0, 3.0, -2.0, 1.0, 0.5, -0.5, 4.5])]
    f2 = [(3, t0 + timedelta(minutes=5), near102)]
    with tempfile.TemporaryDirectory() as tmp:
        for i, rows in enumerate((f1, f2)):
            spark.createDataFrame(rows, SW.VECS_SCHEMA).coalesce(1) \
                .write.parquet(f"{tmp}/d/{i}")
        dst = f"{tmp}/flat"
        os.makedirs(dst)
        for i, p in enumerate(sorted(glob.glob(f"{tmp}/d/*/part-*"))):
            shutil.copy(p, f"{dst}/{i:04d}.parquet")
            os.utime(f"{dst}/{i:04d}.parquet", (1000 + i, 1000 + i))
        stream = (spark.readStream.schema(SW.VECS_SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(dst))
        pairs = SW.streaming_embedding_near_dup(stream, idx, C,
                                                threshold=0.9)
        name = "stream_embdedup_test"
        q = (pairs.writeStream.outputMode("append")
             .format("memory").queryName(name).start())
        q.processAllAvailable()
        q.stop()
        got = {(r.vec_a, r.vec_b): r.cosine
               for r in spark.sql(f"SELECT * FROM {name}").collect()}
    assert (1, 100) in got and got[(1, 100)] == 1.0
    assert (3, 102) in got and got[(3, 102)] >= 0.99
    # equivalence: the batch incremental op's new-vs-corpus pairs
    # under the SAME model must agree pair-for-pair (in-batch
    # stream x stream pairs are out of scope by the family contract)
    new_vecs = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, _, v in f1 + f2],
        "vec_id long, embedding array<float>")
    batch = {(r.vec_a, r.vec_b): r.cosine
             for r in S.cosine_near_dup_ivf_incremental(
                 corpus, new_vecs, centroids=C, threshold=0.9,
                 n_lists=2, sample_rows=6).collect()
             if r.vec_b >= 100}  # corpus side only (a<b flips ids)
    want = {(min(a, b), max(a, b)): c for (a, b), c in got.items()}
    assert want == batch, (want, batch)


def test_burst_starters_stateful_matches_batch(spark, sf_dir):
    """r6 burst-debounce twin: one (ts, event_id) register per
    (user, event_type); the emitted starter feed must equal the batch
    operator's kept set row-for-row across micro-batch boundaries."""
    import pyarrow.parquet as pq

    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators.events import burst_starters

    events = load_table(spark, sf_dir, "events")
    batch = {(r.event_id, r.user_id, r.event_type, r.ts)
             for r in burst_starters(events, gap_seconds=3600)
             .select("event_id", "user_id", "event_type", "ts")
             .collect()}

    tbl = pq.read_table(f"{sf_dir}/events.parquet").sort_by("ts")
    with tempfile.TemporaryDirectory() as tmp:
        n = tbl.num_rows
        for i, c in enumerate([tbl.slice(0, n // 3),
                               tbl.slice(n // 3, n // 3),
                               tbl.slice(2 * (n // 3))]):
            pq.write_table(c, f"{tmp}/{i:04d}.parquet")
            os.utime(f"{tmp}/{i:04d}.parquet", (1000 + i, 1000 + i))
        stream = SW.stream_events_from_dir(spark, tmp)
        feed = SW.burst_starters_stateful(stream, gap_seconds=3600)
        q = (feed.writeStream.outputMode("append")
             .format("memory").queryName("stream_bursts").start())
        q.processAllAvailable()
        q.stop()
        got = {(r.event_id, r.user_id, r.event_type, r.ts)
               for r in spark.sql("SELECT * FROM stream_bursts").collect()}
    assert got == batch


def test_burst_starters_stateful_boundary_gap(spark):
    """A burst straddling a micro-batch boundary must NOT re-open: the
    register carries the previous event's ts across batches, and a gap
    exactly equal to the threshold stays inside the burst (strict >)."""
    base = datetime(2024, 1, 1)
    f1 = [(1, base, 10, "a", 0.0, "{}"),
          (2, base + timedelta(seconds=3600), 10, "a", 0.0, "{}")]
    # second file: gap from event 2 is exactly 3600 (same burst),
    # then 3601 (new burst)
    f2 = [(3, base + timedelta(seconds=7200), 10, "a", 0.0, "{}"),
          (4, base + timedelta(seconds=10801), 10, "a", 0.0, "{}")]
    with tempfile.TemporaryDirectory() as tmp:
        dst = f"{tmp}/ev"
        spark.createDataFrame(f1, SW.EVENTS_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(dst)
        spark.createDataFrame(f2, SW.EVENTS_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(dst)
        stream = SW.stream_events_from_dir(spark, dst,
                                           max_files_per_trigger=1)
        feed = SW.burst_starters_stateful(stream, gap_seconds=3600)
        q = (feed.writeStream.outputMode("append")
             .format("memory").queryName("stream_bursts_edge").start())
        q.processAllAvailable()
        q.stop()
        kept = sorted(r.event_id for r in spark.sql(
            "SELECT * FROM stream_bursts_edge").collect())
    assert kept == [1, 4]


def test_streaming_normalized_dedup_drops_variant_copies(spark):
    """The normalized streaming dedup keeps one of a pair that differs
    only by digits/case (batch operator's merge rule) even when the
    copies arrive in DIFFERENT micro-batches, while keeping genuinely
    distinct docs."""
    base = datetime(2024, 1, 1)
    schema = "doc_id long, ts timestamp, text string"
    f1 = [(1, base, "Call 555 please"),
          (2, base + timedelta(minutes=1), "call me maybe")]
    f2 = [(3, base + timedelta(minutes=2), "call 99 please"),   # dup of 1
          (4, base + timedelta(minutes=3), "Email a@b.com now")]
    with tempfile.TemporaryDirectory() as tmp:
        dst = f"{tmp}/docs"
        spark.createDataFrame(f1, schema).coalesce(1) \
            .write.mode("append").parquet(dst)
        spark.createDataFrame(f2, schema).coalesce(1) \
            .write.mode("append").parquet(dst)
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1").parquet(dst))
        feed = SW.streaming_exact_dedup_normalized(stream)
        q = (feed.writeStream.outputMode("append")
             .format("memory").queryName("norm_dedup_stream").start())
        q.processAllAvailable()
        q.stop()
        kept = sorted(r.doc_id for r in spark.sql(
            "SELECT * FROM norm_dedup_stream").collect())
    assert kept == [1, 2, 4]


def test_attribution_stateful_matches_batch(spark, sf_dir):
    """The streaming attribution twin must credit every conversion
    exactly as the batch window does — first/last registers, the
    7-day lookback gate, and the NULL organic bucket included."""
    import pyarrow.parquet as pq

    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators.events import attribution

    events = load_table(spark, sf_dir, "events")
    batch = {(r.event_id, r.user_id, r.ts, r.touch_event_id,
              r.touch_ts, r.gap_us)
             for r in attribution(events, model="last",
                                  horizon_hours=168).collect()}

    tbl = pq.read_table(f"{sf_dir}/events.parquet").sort_by("ts")
    with tempfile.TemporaryDirectory() as tmp:
        n = tbl.num_rows
        for i, c in enumerate([tbl.slice(0, n // 3),
                               tbl.slice(n // 3, n // 3),
                               tbl.slice(2 * (n // 3))]):
            pq.write_table(c, f"{tmp}/{i:04d}.parquet")
            os.utime(f"{tmp}/{i:04d}.parquet", (1000 + i, 1000 + i))
        stream = SW.stream_events_from_dir(spark, tmp)
        feed = SW.attribution_stateful(stream, model="last",
                                       horizon_hours=168)
        q = (feed.writeStream.outputMode("append")
             .format("memory").queryName("stream_attr").start())
        q.processAllAvailable()
        q.stop()
        got = {(r.event_id, r.user_id, r.ts, r.touch_event_id,
                r.touch_ts, r.gap_us)
               for r in spark.sql("SELECT * FROM stream_attr").collect()}
    assert got == batch
    assert batch  # fixture must produce conversions


def test_attribution_stateful_first_touch_matches_batch(spark, sf_dir):
    import pyarrow.parquet as pq

    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators.events import attribution

    events = load_table(spark, sf_dir, "events")
    batch = {(r.event_id, r.touch_event_id, r.gap_us)
             for r in attribution(events, model="first",
                                  horizon_hours=168).collect()}
    tbl = pq.read_table(f"{sf_dir}/events.parquet").sort_by("ts")
    with tempfile.TemporaryDirectory() as tmp:
        pq.write_table(tbl, f"{tmp}/0000.parquet")
        stream = SW.stream_events_from_dir(spark, tmp)
        feed = SW.attribution_stateful(stream, model="first",
                                       horizon_hours=168)
        q = (feed.writeStream.outputMode("append")
             .format("memory").queryName("stream_attr_f").start())
        q.processAllAvailable()
        q.stop()
        got = {(r.event_id, r.touch_event_id, r.gap_us)
               for r in spark.sql(
                   "SELECT * FROM stream_attr_f").collect()}
    assert got == batch


def test_streaming_temporal_join_matches_batch(spark, sf_dir):
    """The stream-static SCD-2 lookup (validity-interval derivation)
    must reproduce the batch union-tag temporal_join row for row —
    including NULLs for facts preceding any version and equal-ts
    version ties (later version id wins)."""
    import glob
    import os
    import shutil

    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators.events import temporal_join

    events = load_table(spark, sf_dir, "events")
    facts = events.filter("event_type = 'purchase'")
    versions = events.filter("event_type = 'view'")
    batch = {(r.fact_id, r.user_id, r.ts, r.version_id,
              r.version_payload)
             for r in temporal_join(facts, versions).collect()}

    with tempfile.TemporaryDirectory() as tmp:
        facts.filter("event_id % 2 = 0").coalesce(1) \
            .write.parquet(f"{tmp}/f/0")
        facts.filter("event_id % 2 = 1").coalesce(1) \
            .write.parquet(f"{tmp}/f/1")
        dst = f"{tmp}/flat"
        os.makedirs(dst)
        for i, p in enumerate(sorted(glob.glob(f"{tmp}/f/*/part-*"))):
            shutil.copy(p, f"{dst}/{i:04d}.parquet")
            os.utime(f"{dst}/{i:04d}.parquet", (1000 + i, 1000 + i))
        stream = SW.stream_events_from_dir(spark, dst)
        feed = SW.streaming_temporal_join(stream, versions)
        q = (feed.writeStream.outputMode("append")
             .format("memory").queryName("stream_tj").start())
        q.processAllAvailable()
        q.stop()
        got = {(r.fact_id, r.user_id, r.ts, r.version_id,
                r.version_payload)
               for r in spark.sql("SELECT * FROM stream_tj").collect()}
    assert got == batch
    assert batch


def test_burst_starters_stateful_restart_exactly_once(spark, sf_dir,
                                                      tmp_path):
    """VERDICT r6 #6: kill-and-restart coverage for the r6 stateful
    twins (the r4 sessionizer pattern). Half the events flow, the
    query hard-stops, the rest arrives while it is DOWN; restarting
    from the same checkpoint must reproduce the batch operator's kept
    set exactly-once — no re-emitted phase-1 starters, no lost
    phase-2 ones."""
    import pyarrow.parquet as pq

    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators.events import burst_starters

    events = load_table(spark, sf_dir, "events")
    batch = {(r.event_id, r.user_id, r.event_type, r.ts)
             for r in burst_starters(events, gap_seconds=3600)
             .select("event_id", "user_id", "event_type", "ts")
             .collect()}

    tbl = pq.read_table(f"{sf_dir}/events.parquet").sort_by("ts")
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ck"
    src.mkdir()
    n = tbl.num_rows

    def start():
        stream = SW.stream_events_from_dir(spark, str(src))
        feed = SW.burst_starters_stateful(stream, gap_seconds=3600)
        return (feed.writeStream.outputMode("append")
                .option("checkpointLocation", str(ckpt))
                .format("parquet").option("path", str(sink))
                .start())

    pq.write_table(tbl.slice(0, n // 2), f"{src}/0000.parquet")
    os.utime(f"{src}/0000.parquet", (1000, 1000))
    q = start()
    q.processAllAvailable()
    q.stop()

    pq.write_table(tbl.slice(n // 2), f"{src}/0001.parquet")
    os.utime(f"{src}/0001.parquet", (1001, 1001))
    q = start()
    q.processAllAvailable()
    q.stop()

    rows = spark.read.parquet(str(sink)).collect()
    got = {(r.event_id, r.user_id, r.event_type, r.ts) for r in rows}
    assert len(rows) == len(got)  # exactly-once: no duplicates
    assert got == batch


def test_attribution_stateful_restart_exactly_once(spark, sf_dir,
                                                   tmp_path):
    """Same kill-and-restart contract for the attribution twin: the
    first/last-touch registers must survive the restart in the
    checkpoint, so conversions arriving after the outage still credit
    touches seen before it."""
    import pyarrow.parquet as pq

    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators.events import attribution

    events = load_table(spark, sf_dir, "events")
    batch = {(r.event_id, r.user_id, r.ts, r.touch_event_id,
              r.touch_ts, r.gap_us)
             for r in attribution(events, model="last",
                                  horizon_hours=168).collect()}

    tbl = pq.read_table(f"{sf_dir}/events.parquet").sort_by("ts")
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ck"
    src.mkdir()
    n = tbl.num_rows

    def start():
        stream = SW.stream_events_from_dir(spark, str(src))
        feed = SW.attribution_stateful(stream, model="last",
                                       horizon_hours=168)
        return (feed.writeStream.outputMode("append")
                .option("checkpointLocation", str(ckpt))
                .format("parquet").option("path", str(sink))
                .start())

    pq.write_table(tbl.slice(0, n // 2), f"{src}/0000.parquet")
    os.utime(f"{src}/0000.parquet", (1000, 1000))
    q = start()
    q.processAllAvailable()
    q.stop()

    pq.write_table(tbl.slice(n // 2), f"{src}/0001.parquet")
    os.utime(f"{src}/0001.parquet", (1001, 1001))
    q = start()
    q.processAllAvailable()
    q.stop()

    rows = spark.read.parquet(str(sink)).collect()
    got = {(r.event_id, r.user_id, r.ts, r.touch_event_id,
            r.touch_ts, r.gap_us) for r in rows}
    assert len(rows) == len(got)
    assert got == batch
    # the restart must not sever cross-outage credits: at least one
    # phase-2 conversion crediting a phase-1 touch
    cut = tbl.slice(0, n // 2)["event_id"].to_pylist()
    phase1 = set(cut)
    crossing = [r for r in rows
                if r.event_id not in phase1
                and r.touch_event_id in phase1]
    assert crossing, "split produced no cross-outage credits"


def test_asof_stateful_restart_exactly_once(spark, sf_dir, tmp_path):
    """Kill-and-restart for the asof twin: the per-user carry-forward
    register must survive in the checkpoint so lefts arriving after
    the outage still pair with rights seen before it."""
    import pyarrow.parquet as pq

    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators.events import asof_prev_event

    events = load_table(spark, sf_dir, "events")
    batch = {(r.event_id, r.user_id, r.ts, r.prev_event_id, r.prev_ts,
              r.gap_us)
             for r in asof_prev_event(events).collect()}

    tbl = pq.read_table(f"{sf_dir}/events.parquet").sort_by("ts")
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ck"
    src.mkdir()
    n = tbl.num_rows

    def start():
        stream = SW.stream_events_from_dir(spark, str(src))
        feed = SW.asof_stateful(stream)
        return (feed.writeStream.outputMode("append")
                .option("checkpointLocation", str(ckpt))
                .format("parquet").option("path", str(sink))
                .start())

    pq.write_table(tbl.slice(0, n // 2), f"{src}/0000.parquet")
    os.utime(f"{src}/0000.parquet", (1000, 1000))
    q = start()
    q.processAllAvailable()
    q.stop()
    pq.write_table(tbl.slice(n // 2), f"{src}/0001.parquet")
    os.utime(f"{src}/0001.parquet", (1001, 1001))
    q = start()
    q.processAllAvailable()
    q.stop()

    rows = spark.read.parquet(str(sink)).collect()
    got = {(r.event_id, r.user_id, r.ts, r.prev_event_id, r.prev_ts,
            r.gap_us) for r in rows}
    assert len(rows) == len(got)
    assert got == batch


def test_transitions_stateful_restart_exactly_once(spark, sf_dir,
                                                   tmp_path):
    """Kill-and-restart for the transitions twin: the per-user
    last-event register survives the restart; the aggregated feed must
    reproduce the batch pair table with no duplicated transitions."""
    import pyarrow.parquet as pq

    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators.events import event_transitions

    events = load_table(spark, sf_dir, "events")
    batch = {(r.prev_type, r.next_type): r.n_transitions
             for r in event_transitions(events).collect()}

    tbl = pq.read_table(f"{sf_dir}/events.parquet").sort_by("ts")
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ck"
    src.mkdir()
    n = tbl.num_rows

    def start():
        stream = SW.stream_events_from_dir(spark, str(src))
        feed = SW.transitions_stateful(stream)
        return (feed.writeStream.outputMode("append")
                .option("checkpointLocation", str(ckpt))
                .format("parquet").option("path", str(sink))
                .start())

    pq.write_table(tbl.slice(0, n // 2), f"{src}/0000.parquet")
    os.utime(f"{src}/0000.parquet", (1000, 1000))
    q = start()
    q.processAllAvailable()
    q.stop()
    pq.write_table(tbl.slice(n // 2), f"{src}/0001.parquet")
    os.utime(f"{src}/0001.parquet", (1001, 1001))
    q = start()
    q.processAllAvailable()
    q.stop()

    rows = spark.read.parquet(str(sink)).collect()
    from collections import Counter
    got = Counter((r.prev_type, r.next_type) for r in rows)
    assert dict(got) == batch


def _run_dedup_restart_cycle(spark, tmp_path, make_feed, f1, f2,
                             schema):
    """Shared kill-and-restart harness for the two watermark-state
    dedup paths: batch 1 flows, the query hard-stops, batch 2 (holding
    a cross-outage duplicate) arrives while it is DOWN; restart from
    the same checkpoint must keep the dedup state — the duplicate
    stays dropped and nothing re-emits."""
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ck"
    src.mkdir()

    def start():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src)))
        feed = make_feed(stream)
        return (feed.writeStream.outputMode("append")
                .option("checkpointLocation", str(ckpt))
                .format("parquet").option("path", str(sink))
                .start())

    spark.createDataFrame(f1, schema).coalesce(1) \
        .write.parquet(str(src / "a"))
    import glob
    import shutil
    for i, p in enumerate(sorted(glob.glob(f"{src}/a/part-*"))):
        shutil.copy(p, f"{src}/{i:04d}.parquet")
        os.utime(f"{src}/{i:04d}.parquet", (1000, 1000))
    shutil.rmtree(f"{src}/a")
    q = start()
    q.processAllAvailable()
    q.stop()

    spark.createDataFrame(f2, schema).coalesce(1) \
        .write.parquet(str(src / "b"))
    for i, p in enumerate(sorted(glob.glob(f"{src}/b/part-*"))):
        shutil.copy(p, f"{src}/1{i:03d}.parquet")
        os.utime(f"{src}/1{i:03d}.parquet", (1001, 1001))
    shutil.rmtree(f"{src}/b")
    q = start()
    q.processAllAvailable()
    q.stop()

    return spark.read.parquet(str(sink)).collect()


def test_watermark_dedup_restart_exactly_once(spark, tmp_path):
    """VERDICT r7 missing #3: the dropDuplicatesWithinWatermark path's
    exactly-once across restart, pinned instead of implied — the
    digest state must survive in the checkpoint so a duplicate whose
    original arrived BEFORE the outage is still dropped AFTER it."""
    base = datetime(2024, 1, 1)
    f1 = [(1, base, "alpha beta gamma"),
          (2, base + timedelta(minutes=1), "delta epsilon zeta")]
    f2 = [(3, base + timedelta(minutes=5), "alpha beta gamma"),  # dup of 1
          (4, base + timedelta(minutes=6), "eta theta iota")]
    rows = _run_dedup_restart_cycle(
        spark, tmp_path, lambda s: SW.streaming_exact_dedup(s),
        f1, f2, "doc_id long, ts timestamp, text string")
    got = sorted(r.doc_id for r in rows)
    assert got == [1, 2, 4]  # no losses, no re-emits, dup 3 dropped


def test_watermark_normalized_dedup_restart_exactly_once(spark,
                                                         tmp_path):
    """Same restart contract for the NORMALIZED watermark dedup: the
    scrub-digest state (not the raw text) crosses the restart, so a
    digit-variant copy of a pre-outage doc is dropped post-outage."""
    base = datetime(2024, 1, 1)
    f1 = [(1, base, "Call 555 please"),
          (2, base + timedelta(minutes=1), "call me maybe")]
    f2 = [(3, base + timedelta(minutes=5), "call 99 please"),  # dup of 1
          (4, base + timedelta(minutes=6), "Email a@b.com now")]
    rows = _run_dedup_restart_cycle(
        spark, tmp_path,
        lambda s: SW.streaming_exact_dedup_normalized(s),
        f1, f2, "doc_id long, ts timestamp, text string")
    got = sorted(r.doc_id for r in rows)
    assert got == [1, 2, 4]


def test_streaming_repeated_span_stats_matches_batch(spark):
    """Stream-static substring screen == batch repeated_span_stats on
    the dirty set: archive-repeated runs, intra-doc repeats (archive
    has never seen the gram), and clean docs (no row), across two
    micro-batches."""
    import glob
    import os
    import shutil

    from parallel_svms_spark.operators import dedup as D

    t0 = datetime(2026, 1, 1, 0, 0, 0)
    boiler = "copy right all rights reserved do not redistribute"
    corpus = spark.createDataFrame(
        [(100, boiler + " archive tail words"),
         (101, "other archive content entirely unrelated here")],
        "doc_id long, text string")
    idx = D.gram_count_index(corpus)
    f1 = [(1, t0, "header words here " + boiler),          # archive dup
          (2, t0 + timedelta(minutes=1),
           "nothing similar here at all whatsoever to anything")]
    f2 = [(3, t0 + timedelta(minutes=5),
           "p q r s t m1 m2 m3 m4 m5 m6 p q r s t")]       # intra-doc
    with tempfile.TemporaryDirectory() as tmp:
        for i, rows in enumerate((f1, f2)):
            spark.createDataFrame(rows, SW.DOCS_SCHEMA).coalesce(1) \
                .write.parquet(f"{tmp}/d/{i}")
        dst = f"{tmp}/flat"
        os.makedirs(dst)
        for i, p in enumerate(sorted(glob.glob(f"{tmp}/d/*/part-*"))):
            shutil.copy(p, f"{dst}/{i:04d}.parquet")
            os.utime(f"{dst}/{i:04d}.parquet", (1000 + i, 1000 + i))
        stream = (spark.readStream.schema(SW.DOCS_SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(dst))
        stats = SW.streaming_repeated_span_stats(stream, idx)
        name = "stream_span_stats_test"
        q = (stats.writeStream.outputMode("complete")
             .format("memory").queryName(name).start())
        q.processAllAvailable()
        q.stop()
        got = {r.doc_id: (r.n_tokens, r.dup_tokens, r.n_spans)
               for r in spark.sql(f"SELECT * FROM {name}").collect()}
    # batch ground truth: stats over corpus ∪ arrivals, dirty arrivals
    arrivals = spark.createDataFrame(
        [(i, t) for i, _, t in f1 + f2], "doc_id long, text string")
    batch = {r.doc_id: (r.n_tokens, r.dup_tokens, r.n_spans)
             for r in D.repeated_span_stats(
                 corpus.unionByName(arrivals)).collect()
             if r.doc_id in (1, 2, 3) and r.dup_tokens > 0}
    assert set(got) == {1, 3}          # doc 2 clean -> no row
    assert got == batch


def test_streaming_repeated_span_stats_min_count_three(spark):
    """The min_count>2 branch (exact in-doc counts from sorted-run
    lengths since r10 — the r9 linear neighbor-mark only serves the
    default threshold 2): in_doc + archive must reach 3. One arrival
    holds boiler once
    (1+1=2, not flagged); another holds it twice (2+1=3, flagged);
    an intra-doc triple with no archive support (3+0=3) is flagged."""
    from parallel_svms_spark.operators import dedup as D

    t0 = datetime(2026, 1, 1, 0, 0, 0)
    boiler = "b1 b2 b3 b4 b5"
    corpus = spark.createDataFrame(
        [(100, boiler + " archive tail")], "doc_id long, text string")
    idx = D.gram_count_index(corpus)
    arrivals = [
        (1, t0, "x " + boiler + " y"),                    # 1+1=2: no
        (2, t0 + timedelta(minutes=1),
         boiler + " mid " + boiler),                      # 2+1=3: yes
        (3, t0 + timedelta(minutes=2),
         "t1 t2 t3 t4 t5 a " + "t1 t2 t3 t4 t5 b " +
         "t1 t2 t3 t4 t5"),                               # 3+0=3: yes
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(arrivals, SW.DOCS_SCHEMA).coalesce(1) \
            .write.parquet(f"{tmp}/d")
        stream = (spark.readStream.schema(SW.DOCS_SCHEMA)
                  .parquet(f"{tmp}/d"))
        stats = SW.streaming_repeated_span_stats(stream, idx,
                                                 min_count=3)
        name = "stream_span_stats_mc3"
        q = (stats.writeStream.outputMode("complete")
             .format("memory").queryName(name).start())
        q.processAllAvailable()
        q.stop()
        got = {r.doc_id: (r.n_tokens, r.dup_tokens, r.n_spans)
               for r in spark.sql(f"SELECT * FROM {name}").collect()}
    # ground truth per ARRIVAL vs archive (the screen's semantics —
    # a full-run over corpus ∪ all arrivals would also count the
    # cross-arrival copies the blind spot deliberately skips)
    batch = {}
    for i, _, t in arrivals:
        one = spark.createDataFrame([(i, t)],
                                    "doc_id long, text string")
        for r in D.repeated_span_stats(corpus.unionByName(one),
                                       min_count=3).collect():
            if r.doc_id == i and r.dup_tokens > 0:
                batch[i] = (r.n_tokens, r.dup_tokens, r.n_spans)
    assert set(got) == {2, 3}
    assert got == batch


def test_streaming_repeated_span_cross_arrival_blind_spot(spark):
    """ADVICE r8: the stream-static screen counts in-doc + ARCHIVE
    occurrences only, so two docs arriving before the index is
    appended that share a NOVEL repeated gram are not flagged — the
    documented divergence from repeated_spans_incremental. This test
    PINS the divergence both ways: un-appended -> no rows (while the
    batch incremental DOES flag the pair), and after
    gram_index_append of the first arrival the second one IS caught.
    """
    from parallel_svms_spark.operators import dedup as D

    t0 = datetime(2026, 1, 1, 0, 0, 0)
    novel = "nv1 nv2 nv3 nv4 nv5 nv6 nv7"
    corpus = spark.createDataFrame(
        [(100, "archive content entirely unrelated to arrivals")],
        "doc_id long, text string")
    arrivals = [(1, t0, "first copy " + novel),
                (2, t0 + timedelta(minutes=1), "second copy " + novel)]

    def run_screen(index_df, batch=arrivals):
        with tempfile.TemporaryDirectory() as tmp:
            spark.createDataFrame(batch, SW.DOCS_SCHEMA).coalesce(1) \
                .write.parquet(f"{tmp}/d")
            stream = (spark.readStream.schema(SW.DOCS_SCHEMA)
                      .parquet(f"{tmp}/d"))
            stats = SW.streaming_repeated_span_stats(stream, index_df)
            name = "stream_span_blind_spot_test"
            q = (stats.writeStream.outputMode("complete")
                 .format("memory").queryName(name).start())
            q.processAllAvailable()
            q.stop()
            return {r.doc_id for r in
                    spark.sql(f"SELECT * FROM {name}").collect()}

    # un-appended index: the shared novel gram is invisible ...
    assert run_screen(D.gram_count_index(corpus)) == set()
    # ... while the batch incremental flags BOTH batch-internal copies
    arr_df = spark.createDataFrame([(i, t) for i, _, t in arrivals],
                                   "doc_id long, text string")
    inc = {r.doc_id for r in D.repeated_spans_incremental(
        corpus, arr_df).collect()}
    assert inc == {1, 2}
    # the documented caller contract is screen-THEN-append: after
    # arrival 1 (screened clean above) is appended, the next
    # micro-batch's copy IS caught
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/gidx"
        D.gram_count_index(corpus).write.parquet(path)
        D.gram_index_append(
            spark.createDataFrame([(1, arrivals[0][2])],
                                  "doc_id long, text string"), path)
        assert run_screen(spark.read.parquet(path),
                          batch=arrivals[1:]) == {2}


def test_streaming_repeated_span_cuts_matches_batch_scrub(spark):
    """r9 scrub twin: streamed cut decisions + batch apply_span_cuts
    == scrub_repeated_spans_incremental, across the witness cases —
    archive-dup (cut), batch doc outranking the archive copy (kept),
    intra-doc repeat (first kept), clean doc (no rows). Arrivals
    share no novel grams (the documented cross-arrival blind spot is
    pinned separately)."""
    from parallel_svms_spark.operators import dedup as D

    t0 = datetime(2026, 1, 1, 0, 0, 0)
    boiler = "copy right all rights reserved do not redistribute"
    corpus = spark.createDataFrame(
        [(100, boiler + " archive tail words"),
         (101, "other archive content entirely unrelated here")],
        "doc_id long, text string")
    idx = D.gram_count_index(corpus)
    arrivals = [
        (300, t0, "header words here " + boiler),
        (50, t0 + timedelta(minutes=1), boiler + " low id outranks"),
        (400, t0 + timedelta(minutes=2),
         "p q r s t m1 m2 m3 m4 m5 m6 p q r s t"),
        (500, t0 + timedelta(minutes=3),
         "totally clean arrival nothing repeated anywhere at all"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(arrivals, SW.DOCS_SCHEMA).coalesce(1) \
            .write.parquet(f"{tmp}/d")
        stream = (spark.readStream.schema(SW.DOCS_SCHEMA)
                  .parquet(f"{tmp}/d"))
        cuts = SW.streaming_repeated_span_cuts(stream, idx)
        name = "stream_span_cuts_test"
        q = (cuts.writeStream.outputMode("complete")
             .format("memory").queryName(name).start())
        q.processAllAvailable()
        q.stop()
        got = {(r.doc_id, r.span_start, r.span_tokens)
               for r in spark.sql(f"SELECT * FROM {name}").collect()}
    arr_df = spark.createDataFrame([(i, t) for i, _, t in arrivals],
                                   "doc_id long, text string")
    # span-level: cuts == the batch incremental's witness spans
    assert {d for d, _, _ in got} == {300, 400}   # 50 outranks, 500 clean
    # text-level: apply the streamed decisions and compare clean_text
    spans_df = spark.createDataFrame(
        sorted(got), "doc_id long, span_start long, span_tokens long")
    applied = {r.doc_id: (r.clean_text, r.n_removed_tokens)
               for r in D.apply_span_cuts(arr_df, spans_df).collect()}
    batch = {r.doc_id: (r.clean_text, r.n_removed_tokens)
             for r in D.scrub_repeated_spans_incremental(
                 corpus, arr_df).collect()}
    assert applied == batch
    assert applied[300] == ("header words here", 8)
    assert applied[50][1] == 0                     # outranking doc intact
    assert applied[400] == ("p q r s t m1 m2 m3 m4 m5 m6", 5)
    assert applied[500][1] == 0


def test_streaming_repeated_span_cuts_restart_exactly_once(
        spark, tmp_path):
    """Kill-and-restart contract for the r9 scrub twin: cut decisions
    for docs arriving after the outage are emitted exactly-once, and
    the final applied text equals the batch incremental scrub."""
    import glob
    import os
    import shutil

    from parallel_svms_spark.operators import dedup as D

    t0 = datetime(2026, 1, 1, 0, 0, 0)
    boiler = "copy right all rights reserved do not redistribute"
    corpus = spark.createDataFrame(
        [(100, boiler + " archive tail words"),
         (101, "other archive content entirely unrelated here")],
        "doc_id long, text string")
    idx = D.gram_count_index(corpus)
    f1 = [(300, t0, "header words here " + boiler),
          (301, t0 + timedelta(minutes=1),
           "nothing similar here at all whatsoever to anything")]
    f2 = [(400, t0 + timedelta(minutes=5),
           "p q r s t m1 m2 m3 m4 m5 m6 p q r s t"),
          (401, t0 + timedelta(minutes=6), boiler + " another copy")]
    src, ckpt = tmp_path / "src", tmp_path / "ck"
    src.mkdir()

    def write_file(i, rows):
        d = tmp_path / f"d{i}"
        spark.createDataFrame(rows, SW.DOCS_SCHEMA).coalesce(1) \
            .write.parquet(str(d))
        p = sorted(glob.glob(f"{d}/part-*"))[0]
        shutil.copy(p, f"{src}/{i:04d}.parquet")
        os.utime(f"{src}/{i:04d}.parquet", (1000 + i, 1000 + i))

    name = "stream_span_cuts_restart"

    def start():
        stream = (spark.readStream.schema(SW.DOCS_SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(str(src)))
        cuts = SW.streaming_repeated_span_cuts(stream, idx)
        return (cuts.writeStream.outputMode("complete")
                .option("checkpointLocation", str(ckpt))
                .format("memory").queryName(name).start())

    write_file(0, f1)
    q = start()
    q.processAllAvailable()
    q.stop()                              # hard stop mid-stream
    write_file(1, f2)                     # arrives while DOWN
    q = start()
    q.processAllAvailable()
    q.stop()

    rows = spark.sql(f"SELECT * FROM {name}").collect()
    got = {(r.doc_id, r.span_start, r.span_tokens) for r in rows}
    assert len(rows) == len(got)          # exactly-once, no dup rows
    arr_df = spark.createDataFrame(
        [(i, t) for i, _, t in f1 + f2], "doc_id long, text string")
    spans_df = spark.createDataFrame(
        sorted(got), "doc_id long, span_start long, span_tokens long")
    applied = {r.doc_id: (r.clean_text, r.n_removed_tokens)
               for r in D.apply_span_cuts(arr_df, spans_df).collect()}
    batch = {r.doc_id: (r.clean_text, r.n_removed_tokens)
             for r in D.scrub_repeated_spans_incremental(
                 corpus, arr_df).collect()}
    assert applied == batch
    assert {d for d, _, _ in got} == {300, 400, 401}


def test_streaming_repeated_span_stats_restart_exactly_once(
        spark, tmp_path):
    """Kill-and-restart contract for the substring-screen twin: the
    windowed per-doc aggregation state must survive in the
    checkpoint, so docs arriving after the outage are screened and
    the final table equals the batch ground truth exactly-once."""
    import glob
    import os
    import shutil

    from parallel_svms_spark.operators import dedup as D

    t0 = datetime(2026, 1, 1, 0, 0, 0)
    boiler = "copy right all rights reserved do not redistribute"
    corpus = spark.createDataFrame(
        [(100, boiler + " archive tail words"),
         (101, "other archive content entirely unrelated here")],
        "doc_id long, text string")
    idx = D.gram_count_index(corpus)
    f1 = [(1, t0, "header words here " + boiler),
          (2, t0 + timedelta(minutes=1),
           "nothing similar here at all whatsoever to anything")]
    f2 = [(3, t0 + timedelta(minutes=5),
           "p q r s t m1 m2 m3 m4 m5 m6 p q r s t"),
          (4, t0 + timedelta(minutes=6), boiler + " another copy")]
    src, ckpt = tmp_path / "src", tmp_path / "ck"
    src.mkdir()

    def write_file(i, rows):
        d = tmp_path / f"d{i}"
        spark.createDataFrame(rows, SW.DOCS_SCHEMA).coalesce(1) \
            .write.parquet(str(d))
        p = sorted(glob.glob(f"{d}/part-*"))[0]
        shutil.copy(p, f"{src}/{i:04d}.parquet")
        os.utime(f"{src}/{i:04d}.parquet", (1000 + i, 1000 + i))

    name = "stream_span_stats_restart"

    def start():
        stream = (spark.readStream.schema(SW.DOCS_SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(str(src)))
        stats = SW.streaming_repeated_span_stats(stream, idx)
        return (stats.writeStream.outputMode("complete")
                .option("checkpointLocation", str(ckpt))
                .format("memory").queryName(name).start())

    write_file(0, f1)
    q = start()
    q.processAllAvailable()
    q.stop()                              # hard stop mid-stream
    write_file(1, f2)                     # arrives while DOWN
    q = start()
    q.processAllAvailable()
    q.stop()

    rows = spark.sql(f"SELECT * FROM {name}").collect()
    got = {r.doc_id: (r.n_tokens, r.dup_tokens, r.n_spans)
           for r in rows}
    assert len(rows) == len(got)          # exactly-once, no dup rows
    arrivals = spark.createDataFrame(
        [(i, t) for i, _, t in f1 + f2], "doc_id long, text string")
    batch = {r.doc_id: (r.n_tokens, r.dup_tokens, r.n_spans)
             for r in D.repeated_span_stats(
                 corpus.unionByName(arrivals)).collect()
             if r.doc_id in (1, 2, 3, 4) and r.dup_tokens > 0}
    assert set(got) == {1, 3, 4}          # doc 2 clean; 1 pre-outage
    assert got == batch


def test_streaming_redact_pii_matches_batch(spark):
    """r10: the stateless PII-redaction twin must rewrite arriving
    docs exactly as the batch operator does (shared Column chain) —
    streamed file-by-file so micro-batch boundaries are exercised on
    rows where every rule fires."""
    import glob
    import shutil

    from parallel_svms_spark.operators.privacy import redact_pii

    rows = [(1, "mail bob@corp.example.com now"),
            (2, "call +44 123-4567-8901 ref 123456789"),
            (3, "clean text"),
            (4, "ip 10.0.0.1 and id 777777777")]
    df = spark.createDataFrame(rows, "doc_id long, body string")
    batch = {(r.doc_id, r.body, r.n_redacted)
             for r in redact_pii(df, ["body"]).collect()}

    with tempfile.TemporaryDirectory() as tmp:
        df.filter("doc_id <= 2").coalesce(1).write.parquet(f"{tmp}/d/0")
        df.filter("doc_id > 2").coalesce(1).write.parquet(f"{tmp}/d/1")
        dst = f"{tmp}/flat"
        os.makedirs(dst)
        for i, p in enumerate(sorted(glob.glob(f"{tmp}/d/*/part-*"))):
            shutil.copy(p, f"{dst}/{i:04d}.parquet")
            os.utime(f"{dst}/{i:04d}.parquet", (1000 + i, 1000 + i))
        stream = (spark.readStream
                  .schema("doc_id long, body string")
                  .option("maxFilesPerTrigger", 1).parquet(dst))
        red = SW.streaming_redact_pii(stream, ["body"])
        name = "stream_redact_test"
        q = (red.writeStream.outputMode("append")
             .format("memory").queryName(name).start())
        q.processAllAvailable()
        q.stop()
        got = {(r.doc_id, r.body, r.n_redacted) for r in
               spark.sql(f"SELECT * FROM {name}").collect()}
    assert got == batch
    assert sum(n for _, _, n in got) == 5  # every rule fired
