"""Text analysis + event operators (SURVEY §2.8 E4/E5/E6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_svms_spark.io.sources import load_table
from parallel_svms_spark.operators import events as E
from parallel_svms_spark.operators import text as TX


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_token_stats_totals(docs):
    st = TX.token_stats(docs)
    total = st.agg(F.sum("n_docs")).collect()[0][0]
    assert total == docs.count()
    assert st.filter("avg_tokens <= 0").count() == 0


def test_quality_score_bounds(docs):
    q = TX.quality_score(docs)
    assert q.filter("quality < 0 or quality > 1").count() == 0
    assert q.filter("n_tokens < 1").count() == 0


def test_lang_id_deterministic_and_bounded(docs):
    li = TX.lang_id(docs)
    assert li.count() == docs.count()
    langs = {r.pred_lang for r in li.select("pred_lang").distinct().collect()}
    assert langs <= set(TX.LANG_MARKERS) | {"und"}


def test_doc_fingerprint_stable_and_content_keyed(spark, docs):
    fp1 = {r.doc_id: r.fingerprint for r in TX.doc_fingerprint(docs).collect()}
    # same text → same fingerprint
    dup = docs.limit(5).select((F.col("doc_id") + 9000).alias("doc_id"),
                               "text", "lang", "source", "n_chars")
    fp2 = {r.doc_id: r.fingerprint
           for r in TX.doc_fingerprint(docs.unionByName(dup)).collect()}
    for i in range(5):
        assert fp2[i] == fp2[i + 9000]
    assert fp1[0] == fp2[0]


def test_json_extract_sums(events):
    j = E.json_extract(events)
    assert j.count() == 5  # five event types
    assert j.filter("k_sum is null").count() == 0


def test_window_tumbling_partitions_time(events):
    w = E.window_tumbling(events)
    total = w.agg(F.sum("n_events")).collect()[0][0]
    assert total == events.count()
    # window starts are exact hours
    assert w.filter(F.minute("window_start") != 0).count() == 0


def test_sessionize_invariants(events):
    s = E.sessionize(events, gap_minutes=30)
    # sessions partition the events
    assert s.agg(F.sum("n_events")).collect()[0][0] == events.count()
    # no session spans a gap: max session duration sanity
    stats = E.session_stats(events, gap_minutes=30)
    assert stats.count() == events.select("user_id").distinct().count()
    assert s.filter("session_start > session_end").count() == 0


def test_window_hopping_double_counts_each_event(spark, sf_dir):
    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators import events as E
    ev = load_table(spark, sf_dir, "events")
    hop = E.window_hopping(ev, width="1 hour", slide="30 minutes")
    # width/slide = 2 ⇒ every event lands in exactly two windows
    total = hop.agg(F.sum("n_events")).first()[0]
    assert total == 2 * ev.count()
    # each hopping window's count equals the sum of its two half-hour
    # tumbling sub-buckets
    tum = (ev.groupBy(F.window("ts", "30 minutes").alias("w"), "event_type")
           .count().select(F.col("w.start").alias("s"), "event_type", "count"))
    joined = (hop.join(tum, (tum.event_type == hop.event_type)
                       & ((tum.s == hop.window_start)
                          | (tum.s == hop.window_start
                             + F.expr("INTERVAL 30 minutes"))), "left")
              .groupBy(hop.window_start, hop.event_type, "n_events")
              .agg(F.sum("count").alias("sub_sum")))
    assert joined.filter("n_events != sub_sum").count() == 0


def test_asof_prev_event_semantics(spark):
    from datetime import datetime
    from parallel_svms_spark.operators import events as EV
    t = lambda s: datetime(2026, 1, 1, 0, 0, s)
    rows = [
        # user 1: click@1, error@2 → matched; error@0 → no prev (kept, null)
        (10, t(0), 1, "error", 0.0, "{}"),
        (11, t(1), 1, "click", 0.0, "{}"),
        (12, t(2), 1, "error", 0.0, "{}"),
        # user 2: tie on ts — click event_id 20 < error event_id 21 →
        # click is visible to the error at the same timestamp
        (20, t(5), 2, "click", 0.0, "{}"),
        (21, t(5), 2, "error", 0.0, "{}"),
        # user 2 later: a 'view' must never match
        (22, t(6), 2, "view", 0.0, "{}"),
        (23, t(7), 2, "error", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    got = {r.event_id: (r.prev_event_id, r.gap_us)
           for r in EV.asof_prev_event(ev).collect()}
    assert got[10] == (None, None)
    assert got[12] == (11, 1_000_000)
    assert got[21] == (20, 0)
    assert got[23] == (20, 2_000_000)
