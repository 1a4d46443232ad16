"""Time-series resampling family (operators/timeseries.py) and the
two-phase per-group top-k (partitioning.topk_per_group): hand-built
edge cases, fixture invariants, and the plan pins for the no-global-
sort claims. Value-vs-DuckDB runs in tools/selfcheck.py / the driver.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from parallel_svms_spark.io.sources import load_table
from parallel_svms_spark.operators import timeseries as TS
from parallel_svms_spark.operators.partitioning import topk_per_group


def phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _mk_events(spark, rows):
    """rows: (event_id, 'YYYY-MM-DD HH:MM:SS', user_id, value)"""
    return spark.createDataFrame(
        [(i, datetime.datetime.fromisoformat(t), u, float(v))
         for i, t, u, v in rows],
        "event_id long, ts timestamp, user_id long, value double")


def test_gap_fill_fills_gaps_with_last_close(spark):
    ev = _mk_events(spark, [
        (1, "2024-01-01 09:00:00", 7, 10.0),
        (2, "2024-01-01 17:00:00", 7, 11.0),   # close of Jan 1
        # Jan 2-3 silent
        (3, "2024-01-04 08:00:00", 7, 20.0),
        (4, "2024-01-04 08:00:00", 7, 21.0),   # same ts: event_id wins
    ])
    out = {r["day"].isoformat(): r["value_ff"]
           for r in TS.gap_fill_daily(ev).collect()}
    assert out == {
        "2024-01-01": 11.0,   # last ts of the day
        "2024-01-02": 11.0,   # filled
        "2024-01-03": 11.0,   # filled
        "2024-01-04": 21.0,   # (ts, event_id) tie → higher event_id
    }


def test_gap_fill_span_is_per_user_not_global(spark):
    ev = _mk_events(spark, [
        (1, "2024-01-01 09:00:00", 1, 1.0),
        (2, "2024-01-09 09:00:00", 1, 2.0),
        (3, "2024-01-05 09:00:00", 2, 3.0),    # user 2 exists one day
    ])
    rows = TS.gap_fill_daily(ev).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 9 and len(by_user[2]) == 1
    # no rows invented outside a user's own [first, last] span
    assert min(r["day"] for r in by_user[2]) == datetime.date(2024, 1, 5)


def test_gap_fill_fixture_invariants(events):
    out = TS.gap_fill_daily(events)
    rows = out.collect()
    assert all(r["value_ff"] is not None for r in rows)
    # grid is dense: per user, row count == span days
    spans = (out.groupBy("user_id")
             .agg(F.count("*").alias("n"),
                  (F.datediff(F.max("day"), F.min("day")) + 1).alias("span"))
             .collect())
    assert spans and all(r["n"] == r["span"] for r in spans)


def test_gap_fill_windows_are_user_partitioned(events):
    # the forward-fill window must be partitioned (never a global
    # single-partition sort — the 100 TB killer)
    p = phys(TS.gap_fill_daily(events))
    assert "Window" in p
    assert "SinglePartition" not in p


def test_streaks_hand_case(spark):
    ev = _mk_events(spark, [
        # user 1: Jan 1,2,3 + Jan 10  → streaks {3, 1}
        (1, "2024-01-01 09:00:00", 1, 0.0),
        (2, "2024-01-02 09:00:00", 1, 0.0),
        (3, "2024-01-02 18:00:00", 1, 0.0),   # same day, collapses
        (4, "2024-01-03 09:00:00", 1, 0.0),
        (5, "2024-01-10 09:00:00", 1, 0.0),
        # user 2: a single day
        (6, "2024-01-05 09:00:00", 2, 0.0),
    ])
    out = {r["user_id"]: (r["longest_streak"], r["n_streaks"])
           for r in TS.activity_streaks(ev).collect()}
    assert out == {1: (3, 2), 2: (1, 1)}


def test_streaks_fixture_bounds(events):
    rows = TS.activity_streaks(events).collect()
    n_days = events.select(F.to_date("ts")).distinct().count()
    for r in rows:
        assert 1 <= r["longest_streak"] <= n_days
        assert 1 <= r["n_streaks"] <= n_days
        # streaks × min length can't exceed the calendar
        assert r["longest_streak"] + (r["n_streaks"] - 1) <= n_days


def test_topk_per_group_matches_single_window(events):
    df = events.select("user_id", "event_type", "value", "event_id")
    got = topk_per_group(
        df, ["event_type"], [F.desc("value"), F.asc("event_id")], k=5)
    w = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.asc("event_id"))
    want = (df.withColumn("rnk", F.row_number().over(w).cast("int"))
            .filter(F.col("rnk") <= 5))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_topk_per_group_stable_under_repartition(events):
    # phase-1 pruning must not depend on the input layout: any total
    # order survivor set is identical whatever the partitioning
    df = events.select("user_id", "event_type", "value", "event_id")
    order = [F.desc("value"), F.asc("event_id")]
    a = topk_per_group(df, ["event_type"], order, k=3).collect()
    b = topk_per_group(df.repartition(17), ["event_type"], order,
                       k=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_topk_per_group_k_exceeds_group(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "v int, g string")
    out = topk_per_group(df, ["g"], [F.desc("v")], k=10).collect()
    assert len(out) == 3  # whole input survives, ranked


def test_label_centroids_match_numpy(spark, sf_dir):
    import math

    import numpy as np

    from parallel_svms_spark.operators.similarity import label_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    got = {(r["label"], r["dim"]): (r["sum_scaled"], r["n"])
           for r in label_centroids(emb).collect()}
    pdf = emb.toPandas()
    for lbl, grp in pdf.groupby("label"):
        mat = np.stack(grp["embedding"].to_numpy()).astype("float64")
        for d in range(mat.shape[1]):
            want = int(sum(math.floor(v * 1000000) for v in mat[:, d]))
            assert got[(int(lbl), d)] == (want, len(grp))


def test_fuzzy_pairs_hand_case(spark):
    from parallel_svms_spark.operators.fuzzy import fuzzy_name_pairs
    df = spark.createDataFrame(
        [("red widget",), ("red widgets",), ("red widget",),
         ("blue bolt",), ("bolt",)], "p_name string")
    got = {(r.name_a, r.name_b): r.dist
           for r in fuzzy_name_pairs(df, max_dist=2).collect()}
    # duplicate "red widget" collapses; "blue bolt"↔"bolt" is dist 5
    assert got == {("red widget", "red widgets"): 1}


def test_fuzzy_pairs_plan_is_hash_join_not_nested_loop(spark, sf_dir):
    from parallel_svms_spark.operators.fuzzy import fuzzy_name_pairs
    part = load_table(spark, sf_dir, "part")
    p = phys(fuzzy_name_pairs(part))
    assert "NestedLoop" not in p and "CartesianProduct" not in p


def test_fuzzy_pairs_length_band_is_lossless(spark, sf_dir):
    # the blocked rewrite must equal the literal all-pairs filter
    from pyspark.sql import functions as F
    from parallel_svms_spark.operators.fuzzy import fuzzy_name_pairs
    part = load_table(spark, sf_dir, "part")
    names = part.select(F.col("p_name").alias("name")).distinct()
    a = names.select(F.col("name").alias("name_a"))
    b = names.select(F.col("name").alias("name_b"))
    naive = (a.crossJoin(b)
             .filter(F.col("name_a") < F.col("name_b"))
             .withColumn("dist", F.levenshtein("name_a", "name_b"))
             .filter(F.col("dist") <= 2))
    assert sorted(map(tuple, fuzzy_name_pairs(part).collect())) == \
        sorted(map(tuple, naive.collect()))


# ---------------------------------------------------------------------------
# rolling_features / rolling_features_bucketed
# ---------------------------------------------------------------------------

def test_rolling_features_hand_case(spark):
    ev = _mk_events(spark, [
        (1, "2024-01-01 09:00:00", 7, 10.0),
        (2, "2024-01-01 09:30:00", 7, 20.0),
        (3, "2024-01-01 10:00:00", 7, 40.0),   # 09:00 still in [t-1h, t]
        (4, "2024-01-01 11:30:00", 7, 80.0),   # window empty of others
        (5, "2024-01-01 10:00:00", 8, 5.0),    # other user: isolated
    ])
    out = {r["event_id"]: (r["n_win"], r["value_millis_win"])
           for r in TS.rolling_features(ev).collect()}
    assert out == {
        1: (1, 10_000),
        2: (2, 30_000),
        3: (3, 70_000),          # closed interval: 09:00 included
        4: (1, 80_000),
        5: (1, 5_000),
    }


def test_rolling_features_ties_are_range_peers(spark):
    # two events at the identical (user, ts): RANGE frames include the
    # whole peer group for BOTH rows — no tiebreak dependence
    ev = _mk_events(spark, [
        (1, "2024-01-01 09:00:00", 7, 1.0),
        (2, "2024-01-01 09:00:00", 7, 2.0),
    ])
    out = {r["event_id"]: (r["n_win"], r["value_millis_win"])
           for r in TS.rolling_features(ev).collect()}
    assert out == {1: (2, 3_000), 2: (2, 3_000)}


def test_rolling_bucketed_equivalence_across_boundaries(spark, events):
    """The bucketed variant must be value-identical on the fixture —
    including with a pathological 1h bucket (= horizon), where nearly
    every event needs the replicated context from the previous
    bucket."""
    plain = {(r["event_id"]): (r["n_win"], r["value_millis_win"])
             for r in TS.rolling_features(events).collect()}
    for bucket_hours in (1, 6):
        got = {(r["event_id"]): (r["n_win"], r["value_millis_win"])
               for r in TS.rolling_features_bucketed(
                   events, bucket_hours=bucket_hours).collect()}
        assert got == plain


def test_rolling_bucketed_rejects_bucket_below_horizon(spark, events):
    with pytest.raises(ValueError):
        TS.rolling_features_bucketed(events, window_minutes=120,
                                     bucket_hours=1)


def test_rolling_plain_window_is_user_partitioned(spark, events):
    p = phys(TS.rolling_features(events))
    # the window's required distribution is hashpartitioning(user_id),
    # never a single-partition global sort
    assert "windowspecdefinition" in p.lower() or "Window" in p
    assert "SinglePartition" not in p


def test_rolling_bucketed_window_keyed_finer_than_user(spark, events):
    p = phys(TS.rolling_features_bucketed(events))
    assert "__bkt" in p  # partition key includes the time bucket
    assert "SinglePartition" not in p


# ---------------------------------------------------------------------------
# grouped_exact_percentiles
# ---------------------------------------------------------------------------

def test_percentiles_hand_case(spark):
    from parallel_svms_spark.operators.partitioning import (
        grouped_exact_percentiles)
    ev = _mk_events(spark, [
        (1, "2024-01-01 09:00:00", 1, 10.0),
        (2, "2024-01-01 09:01:00", 1, 20.0),
        (3, "2024-01-01 09:02:00", 1, 30.0),
        (4, "2024-01-01 09:03:00", 1, 40.0),
        (5, "2024-01-01 09:04:00", 2, 7.0),    # singleton group
    ])
    out = {r["user_id"]: r for r in grouped_exact_percentiles(
        ev, "user_id", "value").collect()}
    g = out[1]
    # n=4: pos50 = 1 + .5*3 = 2.5 -> 25.0 ; pos90 = 3.7 -> 37.0
    assert g["n"] == 4
    assert g["p50"] == pytest.approx(25.0, abs=0)
    assert g["p90"] == pytest.approx(37.0)
    assert g["p99"] == pytest.approx(39.7)
    s = out[2]
    assert (s["n"], s["p50"], s["p90"], s["p99"]) == (1, 7.0, 7.0, 7.0)


def test_percentiles_exclude_nulls_and_match_sorted_def(spark):
    from parallel_svms_spark.operators.partitioning import (
        grouped_exact_percentiles)
    rows = [(i, datetime.datetime(2024, 1, 1, 9, 0, 0), 1,
             float(v) if v is not None else None)
            for i, v in enumerate([None, 5.0, 1.0, 3.0, None, 2.0, 4.0])]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")
    r = grouped_exact_percentiles(ev, "user_id", "value").collect()[0]
    assert r["n"] == 5 and r["p50"] == 3.0


def test_percentiles_plan_has_no_pergroup_window(spark, events):
    """The whole point: a low-cardinality group column must NOT plan a
    per-group sort window. The operator is range-partition + counts +
    bracket selection; its only window-free Arrow pass emits ≤ 6 rows
    per group."""
    from parallel_svms_spark.operators.partitioning import (
        grouped_exact_percentiles)
    out = grouped_exact_percentiles(events, "event_type", "value")
    # result frame is a driver-assembled literal: tiny by construction
    assert out.count() == 5
    p = phys(out)
    assert "windowspecdefinition" not in p.lower()


def test_percentiles_partition_spanning_many_arrow_batches(spark):
    """r10 regression: a partition arrives in the rank-picking Arrow
    pass as SEVERAL batches once it exceeds
    arrow.maxRecordsPerBatch; the per-group rank must carry across
    batches (a per-batch restart computed wrong ranks / crashed —
    seen first at low core counts, where partitions are larger).
    Forces the multi-batch shape by shrinking the batch size, and
    checks against the exact percentile aggregate."""
    import pyspark.sql.functions as F

    from parallel_svms_spark.operators.partitioning import (
        grouped_exact_percentiles)
    n = 5000
    df = (spark.range(n)
          .select((F.col("id") % 3).alias("user_id"),
                  # distinct, deterministic, group-interleaved values
                  (F.pmod(F.xxhash64("id"), F.lit(1000000)) / 7.0)
                  .alias("value")))
    want = {r["user_id"]: r for r in
            df.groupBy("user_id").agg(
                F.count("*").alias("n"),
                F.percentile("value", F.lit(0.5)).alias("p50"),
                F.percentile("value", F.lit(0.9)).alias("p90"),
                F.percentile("value", F.lit(0.99)).alias("p99"))
            .collect()}
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
    try:
        got = {r["user_id"]: r for r in grouped_exact_percentiles(
            df, "user_id", "value").collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       old)
    assert set(got) == set(want)
    for g, w in want.items():
        r = got[g]
        assert r["n"] == w["n"]
        for c in ("p50", "p90", "p99"):
            assert r[c] == pytest.approx(w[c], rel=1e-12), (g, c)


def test_percentiles_superset_ps_bitwise_equal(spark, events):
    """r10 sharing hook: each requested percentile's bracket ranks and
    interpolation are independent of the OTHER requested ps, so a
    union-ps call must reproduce every subset call's doubles bitwise
    (what lets winsorize_events and value_percentiles share one pass
    inside event_suite)."""
    from parallel_svms_spark.operators.partitioning import (
        grouped_exact_percentiles)
    union = {r["event_type"]: r for r in grouped_exact_percentiles(
        events, "event_type", "value",
        ps=(0.01, 0.5, 0.9, 0.99)).collect()}
    solo_vp = {r["event_type"]: r for r in grouped_exact_percentiles(
        events, "event_type", "value", ps=(0.5, 0.9, 0.99)).collect()}
    solo_w = {r["event_type"]: r for r in grouped_exact_percentiles(
        events, "event_type", "value", ps=(0.01, 0.99)).collect()}
    assert set(union) == set(solo_vp) == set(solo_w)
    for g in union:
        assert union[g]["n"] == solo_vp[g]["n"] == solo_w[g]["n"]
        for c in ("p50", "p90", "p99"):
            assert union[g][c] == solo_vp[g][c], (g, c)  # exact, no eps
        for c in ("p1", "p99"):
            assert union[g][c] == solo_w[g][c], (g, c)


def test_winsorize_with_shared_thr_bitwise_equal(spark, events):
    """winsorize_events(thr=<union-ps table>) must equal the
    self-computed path row-for-row exactly (the event_suite wiring)."""
    from parallel_svms_spark.operators import events as E
    from parallel_svms_spark.operators.partitioning import (
        grouped_exact_percentiles)
    thr = grouped_exact_percentiles(events, "event_type", "value",
                                    ps=(0.01, 0.5, 0.9, 0.99))
    a = sorted(E.winsorize_events(events).collect())
    b = sorted(E.winsorize_events(events, thr=thr).collect())
    assert a == b
