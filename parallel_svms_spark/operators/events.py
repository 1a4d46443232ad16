"""Event-stream operators: JSON extraction, tumbling windows,
sessionization (SURVEY §2.8 E5/E6). Batch forms here; the streaming
twin (Structured Streaming + watermark) lives in streaming/windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def json_extract(events: DataFrame) -> DataFrame:
    """E5: pull a typed field out of the JSON props column and
    aggregate — get_json_object is JVM-side (Jackson), no UDF."""
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum("k").alias("k_sum"),
             F.round(F.avg("k"), 6).alias("k_avg"))
    )


def window_tumbling(events: DataFrame) -> DataFrame:
    """E6: 1-hour tumbling-window aggregation by event type.

    Uses F.window (the same operator the streaming twin uses with a
    watermark); at scale this is a single hash aggregation keyed on
    (window, type) — time-locality in the data means near-sorted
    shuffle keys, which AQE coalesces well.
    """
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 6).alias("value_sum"))
        .select(F.col("w.start").alias("window_start"),
                "event_type", "n_events", "value_sum")
    )


def window_hopping(events: DataFrame, width: str = "1 hour",
                   slide: str = "30 minutes") -> DataFrame:
    """E6: hopping (sliding) window aggregation — each event lands in
    width/slide overlapping windows. F.window generates the window
    structs JVM-side (no explode UDF); the aggregation is one hash agg
    keyed (window, type) exactly like the tumbling form, with
    width/slide× the input rows — the standard overlap cost, NOT an
    extra shuffle."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 6).alias("value_sum"))
        .select(F.col("w.start").alias("window_start"),
                "event_type", "n_events", "value_sum")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """E6: gap-based sessionization — session breaks when a user is
    idle > gap. lag + cumulative-sum windows, both partitioned by
    user_id (shuffle on user, then linear scans per user — the
    standard scalable shape; skewed mega-users would get AQE skew
    handling or a salt+merge pass).

    Returns one row per session with bounds and counts.
    """
    by_user = W.partitionBy("user_id").orderBy("ts")
    gap = F.lag("ts").over(by_user)
    # millisecond arithmetic: engine-portable (DuckDB's epoch() rounds
    # seconds, Spark's cast floors — ms versions agree exactly)
    is_new = (F.unix_millis(F.col("ts")) - F.unix_millis(gap)
              > gap_minutes * 60_000).cast("int")
    with_sess = (
        events
        .withColumn("new_sess", F.coalesce(is_new, F.lit(1)))
        .withColumn("session_seq", F.sum("new_sess").over(
            by_user.rowsBetween(W.unboundedPreceding, 0)))
    )
    return (
        with_sess.groupBy("user_id", "session_seq")
        .agg(F.count("*").alias("n_events"),
             F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             F.round(F.sum("value"), 6).alias("value_sum"))
    )


def sessionize_bucketed(events: DataFrame, gap_minutes: int = 30,
                        bucket: str = "week") -> DataFrame:
    """Mega-user-safe sessionization, value-identical to
    ``sessionize``: the plain operator's per-user window puts ALL of a
    user's events in one task, so a user with billions of events pins
    a single core for the whole stage (measured: a user owning 500k of
    1M rows already costs ~1.5× wall-clock; at 100 TB it's a stage
    killer). This variant:

    1. sessionizes within (user, time-bucket) windows — a mega-user's
       events spread over their active buckets, bounding any task at
       one user-bucket of events;
    2. merges sessions that straddle bucket boundaries with a second
       lag/cumsum window over per-user SESSIONS — rows into this
       residual window are sessions, not events (orders of magnitude
       fewer; a pathological no-gap user contributes one session per
       bucket).

    Chain merges are transitive through the cumulative sum, so a
    session spanning many buckets coalesces exactly. Output schema and
    values match ``sessionize`` (same session_seq numbering, same 6-dp
    value_sum), which is asserted by equivalence tests and lets the
    qkey share the plain operator's DuckDB oracle verbatim.

    Measured trade (local[32], 1M events, one user owning 500k): the
    bucketed plan costs ~1.4× the plain one — the second exchange and
    window are a real constant factor — while producing identical
    output. Reach for it when a single user's event count exceeds what
    one task should hold (the regime a local benchmark can't show),
    not as a default.
    """
    gap_ms = gap_minutes * 60_000
    ev = events.withColumn("bkt", F.date_trunc(bucket, F.col("ts")))
    by_ub = W.partitionBy("user_id", "bkt").orderBy("ts")
    prev = F.lag("ts").over(by_ub)
    is_new = (F.unix_millis(F.col("ts")) - F.unix_millis(prev)
              > gap_ms).cast("int")
    per_bucket = (
        ev.withColumn("new_sess", F.coalesce(is_new, F.lit(1)))
        .withColumn("seq", F.sum("new_sess").over(
            by_ub.rowsBetween(W.unboundedPreceding, 0)))
        .groupBy("user_id", "bkt", "seq")
        .agg(F.count("*").alias("n"),
             F.min("ts").alias("s"),
             F.max("ts").alias("e"),
             F.sum("value").alias("v"))
    )
    # boundary merge: per-user window over sessions (small by
    # construction), same gap rule applied between consecutive
    # bucket-sessions
    by_u = W.partitionBy("user_id").orderBy("s", "e")
    prev_e = F.lag("e").over(by_u)
    brk = F.coalesce(
        (F.unix_millis(F.col("s")) - F.unix_millis(prev_e)
         > gap_ms).cast("int"), F.lit(1))
    return (
        per_bucket
        .withColumn("grp", F.sum(brk).over(
            by_u.rowsBetween(W.unboundedPreceding, 0)))
        .groupBy("user_id", F.col("grp").alias("session_seq"))
        .agg(F.sum("n").cast("long").alias("n_events"),
             F.min("s").alias("session_start"),
             F.max("e").alias("session_end"),
             F.round(F.sum("v"), 6).alias("value_sum"))
        .select("user_id", "session_seq", "n_events",
                "session_start", "session_end", "value_sum")
    )


def session_stats_from(sessions: DataFrame) -> DataFrame:
    """Per-user rollup over an already-sessionized frame (shared by
    the plain and bucketed sessionize qkeys)."""
    dur = (F.unix_millis(F.col("session_end"))
           - F.unix_millis(F.col("session_start")))
    return (
        sessions.withColumn("duration_ms", dur)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"),
             F.sum("n_events").alias("n_events"),
             F.sum("duration_ms").alias("total_duration_ms"))
    )


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Rollup over sessions (count / mean length) — the deterministic
    observable for the sessionize qkey."""
    return session_stats_from(sessionize(events, gap_minutes))


def funnel_conversions(events: DataFrame,
                       steps: tuple[str, ...] = ("view", "click",
                                                 "purchase"),
                       window_hours: int = 24) -> DataFrame:
    """The funnel recurrence's final stage as rows: (user_id,
    converted_ts) for every user completing ALL steps in order, each
    within the window of the prior — the WHO behind ``funnel``'s
    counts, and the batch twin of
    ``streaming.windows.funnel_stateful`` (equivalence-tested)."""
    e = events.select("user_id", "event_type", "ts")
    cur = (e.filter(F.col("event_type") == steps[0])
           .groupBy("user_id").agg(F.min("ts").alias("t")))
    for step in steps[1:]:
        deadline = F.col("t") + F.expr(f"INTERVAL {int(window_hours)} HOURS")
        cur = (e.filter(F.col("event_type") == step)
               .join(cur, "user_id")
               .filter((F.col("ts") > F.col("t"))
                       & (F.col("ts") <= deadline))
               .groupBy("user_id").agg(F.min("ts").alias("t")))
    return cur.select("user_id", F.col("t").alias("converted_ts"))


def funnel(events: DataFrame,
           steps: tuple[str, ...] = ("view", "click", "purchase"),
           window_hours: int = 24) -> DataFrame:
    """Ordered conversion funnel: count users who performed the steps
    in sequence, each within ``window_hours`` of completing the prior
    step (the first qualifying occurrence counts). Returns one row per
    stage: (stage, step, n_users).

    Scale shape: stage 0 is a hash aggregation keyed on user_id; every
    later stage joins the (monotonically shrinking) converted-user
    frame back to the events on user_id and re-aggregates — all
    exchanges share the user_id key, so AQE reuses the partitioning,
    and from stage 1 on the converted side is usually small enough for
    a broadcast join (Spark picks that up from its shrinking size
    estimate; at 100 TB the events side streams through unchanged).
    The per-stage outputs are single-row aggregates unioned at the end.
    """
    e = events.select("user_id", "event_type", "ts")
    cur = (e.filter(F.col("event_type") == steps[0])
           .groupBy("user_id").agg(F.min("ts").alias("t")))
    counts = [cur.agg(F.lit(0).alias("stage"),
                      F.lit(steps[0]).alias("step"),
                      F.count("*").alias("n_users"))]
    for i, step in enumerate(steps[1:], start=1):
        deadline = F.col("t") + F.expr(f"INTERVAL {int(window_hours)} HOURS")
        cur = (e.filter(F.col("event_type") == step)
               .join(cur, "user_id")
               .filter((F.col("ts") > F.col("t"))
                       & (F.col("ts") <= deadline))
               .groupBy("user_id").agg(F.min("ts").alias("t")))
        counts.append(cur.agg(F.lit(i).alias("stage"),
                              F.lit(step).alias("step"),
                              F.count("*").alias("n_users")))
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: users grouped by the ISO week of their
    first event (cohort_week), counted in every subsequent week they
    were active. Returns (cohort_week, week_offset, n_users) — the
    classic retention-triangle input.

    Scale shape: two hash aggregations keyed on user_id (first-seen
    and distinct user-weeks — the distinct is map-side partial, state
    one row per user-week) joined on user_id, then a small rollup
    keyed (cohort, offset): at most users × horizon rows enter the
    final aggregation. No windows, no skew hazard beyond mega-user
    event counts, which the distinct collapses before the join.
    """
    first = (events.groupBy("user_id")
             .agg(F.to_date(F.date_trunc("week", F.min("ts")))
                  .alias("cohort_week")))
    active = (events
              .select("user_id",
                      F.to_date(F.date_trunc("week", F.col("ts")))
                      .alias("active_week"))
              .distinct())
    off = (F.datediff("active_week", "cohort_week") / 7).cast("int")
    return (active.join(first, "user_id")
            .groupBy("cohort_week", off.alias("week_offset"))
            .agg(F.count("*").alias("n_users")))


def asof_prev_event(events: DataFrame, left_type: str = "error",
                    right_type: str = "click") -> DataFrame:
    """As-of join within an event stream: for each ``left_type`` event,
    the most recent ``right_type`` event by the same user at or before
    it (tie on ts broken by event_id, strictly ordered) — the
    "error correlated to the click that preceded it" query. Spark has
    no native ASOF JOIN; the scalable formulation is NOT a range join
    (quadratic per user) but a single per-user window: sort each
    user's events once, carry the last-seen right event forward with
    ``last(..., ignorenulls=True)``, keep the left rows.

    Scale shape: one hash exchange on user_id + an in-partition sort —
    identical cost to sessionize; running state is one row. Returns
    (event_id, user_id, ts, prev_event_id, prev_ts, gap_us) with NULL
    prevs for lefts with no earlier right (kept, like LEFT ASOF JOIN).
    """
    e = (events.filter(F.col("event_type").isin([left_type, right_type]))
         .select("event_id", "ts", "user_id", "event_type"))
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    mark_id = F.when(F.col("event_type") == right_type, F.col("event_id"))
    mark_ts = F.when(F.col("event_type") == right_type, F.col("ts"))
    return (e
            .withColumn("prev_event_id", F.last(mark_id, True).over(w))
            .withColumn("prev_ts", F.last(mark_ts, True).over(w))
            .filter(F.col("event_type") == left_type)
            .select("event_id", "user_id", "ts", "prev_event_id",
                    "prev_ts",
                    (F.unix_micros(F.col("ts"))
                     - F.unix_micros(F.col("prev_ts"))).alias("gap_us")))


def interval_join(points: DataFrame, intervals: DataFrame,
                  ts_col: str = "ts",
                  start_col: str = "session_start",
                  end_col: str = "session_end",
                  bucket_minutes: int = 360) -> DataFrame:
    """Time-range (interval containment) join: each point row matched
    to every interval row with start ≤ ts ≤ end — the operator behind
    "which sessions / deploys / experiments was this event inside?".

    A naive theta-join plans as BroadcastNestedLoop or a cartesian
    product — O(N·M) and a 100 TB stage killer. This is the bucketized
    equi-join formulation (the same trick as Databricks' range-join bin
    hints): quantize time into fixed-width buckets, explode each
    interval into the buckets it spans, equi-join points on bucket,
    then refine with the exact range predicate. Each (point, interval)
    match is produced exactly once (the point's bucket is unique), so
    no post-join dedup is needed. Cost: |points| + Σ(interval spans /
    bucket) join rows, hash-exchanged on bucket — pick bucket_minutes
    near the TYPICAL interval length so most intervals explode to 1-2
    buckets; far-outlier intervals only add rows linearly.

    Callers pass pre-projected frames with disjoint column names.
    """
    bms = int(bucket_minutes) * 60_000
    p = points.withColumn(
        "__b", F.expr(f"unix_millis({ts_col}) div {bms}"))
    i = intervals.withColumn(
        "__b", F.explode(F.sequence(
            F.expr(f"unix_millis({start_col}) div {bms}"),
            F.expr(f"unix_millis({end_col}) div {bms}"))))
    return (p.join(i, "__b")
            .filter((F.col(ts_col) >= F.col(start_col))
                    & (F.col(ts_col) <= F.col(end_col)))
            .drop("__b"))


def sessions_containing(events: DataFrame,
                        point_type: str = "error") -> DataFrame:
    """interval_join demo dataflow: every ``point_type`` event joined
    to ALL sessions (any user's) whose [start, end] span contains it —
    the concurrent-sessions-at-incident-time question. Deliberately
    key-free: this is the hard case a per-user equi-join can't express,
    which is exactly what the bucketized formulation is for.
    """
    sess = sessionize(events).select(
        "user_id", "session_seq", "session_start", "session_end")
    pts = (events.filter(F.col("event_type") == point_type)
           .select("event_id", "ts"))
    return (interval_join(pts, sess)
            .select("event_id", "user_id", "session_seq"))


def value_histogram(events: DataFrame, width: float = 50.0) -> DataFrame:
    """Fixed-width histogram of the value column: bucket ordinal,
    count, and the exact min/max observed inside each bucket.

    ``floor(value / width)`` is one deterministic double op per row
    (identical on any engine), the group-by is map-side combinable, so
    the shuffle carries ≤ |buckets| rows per task — the degenerate-
    cheap profiling shape that should NEVER be implemented by
    collecting values to the driver. min/max are selections of
    existing doubles (no accumulation), so they are partition-order-
    independent and oracle-safe.
    """
    b = F.floor(F.col("value") / F.lit(width)).cast("int").alias("bucket")
    return (events.groupBy(b)
            .agg(F.count("*").alias("n"),
                 F.min("value").alias("min_value"),
                 F.max("value").alias("max_value")))


def outlier_events(events: DataFrame, q: float = 0.99,
                   approx: bool = False) -> DataFrame:
    """Per-type tail-outlier screen: the exact q-quantile of value per
    event_type, and how many events exceed it — the robust anomaly
    gate (a fixed z-score would chase the mean; a quantile threshold
    is distribution-free).

    Two aggregations over the events, both keyed by event_type: the
    threshold pass (exact ``percentile`` by default — value-multiset
    state, the oracle-checkable twin; ``approx=True`` flips to
    t-digest ``approx_percentile``, the bounded-state 100 TB path,
    same schema) and the count-above pass. The per-type threshold
    table is tiny (|event types| rows) and broadcast back, so the
    second pass is a narrow scan + map-side-combinable count — the
    events never shuffle for the comparison.

    The threshold is rounded to 6 dp BEFORE the comparison on both
    engines, so the boundary predicate is evaluated on identical
    doubles (same contract as length_profile's rounded percentiles).
    """
    fn = "approx_percentile" if approx else "percentile"
    thr = events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.expr(f"{fn}(value, {q})"), 6).alias("p_thr"))
    above = (events.join(F.broadcast(thr.select("event_type", "p_thr")),
                         "event_type")
             .filter(F.col("value") > F.col("p_thr"))
             .groupBy("event_type")
             .agg(F.count("*").alias("n_outliers")))
    return (thr.join(above, "event_type", "left")
            .select("event_type", "n_events", "p_thr",
                    F.coalesce(F.col("n_outliers"), F.lit(0))
                    .cast("long").alias("n_outliers")))


def event_transitions(events: DataFrame) -> DataFrame:
    """Per-user event-type transition counts — first-order Markov
    structure of the event stream ((prev → next) pair frequencies),
    the order-SENSITIVE sequence statistic none of the set-shaped
    aggregations capture.

    One ``lag`` window partitioned per user (ts, event_id total
    order — the asof/sessionize tie contract), then a map-side-
    combinable pair count: the only exchanges are the user hash for
    the window and ≤|types|² rows for the count. A mega-user costs
    one task's sort, bounded by that user's events — same profile as
    sessionize, with sessionize_bucketed's bucketing trick applicable
    verbatim if one user outgrows a task.
    """
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (events.select("user_id", "ts", "event_id", "event_type")
             .withColumn("prev_type", F.lag("event_type").over(w))
             .filter(F.col("prev_type").isNotNull()))
    return (pairs.groupBy("prev_type",
                          F.col("event_type").alias("next_type"))
            .agg(F.count("*").alias("n_transitions")))


def collapse_bursts(events: DataFrame, gap_seconds: int = 600,
                    keys: tuple[str, ...] = ("user_id", "event_type")
                    ) -> DataFrame:
    """Burst rollup — debounce semantics: within each ``keys`` group,
    consecutive events ≤ ``gap_seconds`` apart belong to one burst
    (retry storms, double-clicks, at-least-once redelivery). One row
    per burst with its span and size. This is TRAILING-gap debounce —
    a burst ends only after a quiet period — the same recurrence as
    ``sessionize`` at a finer grain and per (user, type) instead of
    per user; the fixed-throttle alternative ("drop within N of last
    KEPT") is a different, inherently sequential recurrence — use the
    streaming twin's per-key state for that shape if ever needed.

    Scale shape: identical to sessionize — shuffle on the group keys,
    two linear window passes per group, map-side-combinable rollup.
    The finer (user, type) key only helps skew: a mega-user's events
    split across their event types.
    """
    by = W.partitionBy(*keys).orderBy("ts", "event_id")
    prev = F.lag("ts").over(by)
    # microsecond gaps, matching the stateful streaming twin
    # (burst_starters_stateful compares micros) — ms truncation could
    # classify a sub-millisecond straddler differently batch vs stream
    is_new = (F.unix_micros(F.col("ts")) - F.unix_micros(prev)
              > int(gap_seconds) * 1_000_000).cast("int")
    w = (events
         .withColumn("new_burst", F.coalesce(is_new, F.lit(1)))
         .withColumn("burst_seq", F.sum("new_burst").over(
             by.rowsBetween(W.unboundedPreceding, 0))))
    return (w.groupBy(*keys, "burst_seq")
            .agg(F.count("*").alias("n_events"),
                 F.min("ts").alias("burst_start"),
                 F.max("ts").alias("burst_end")))


def burst_starters(events: DataFrame, gap_seconds: int = 600,
                   keys: tuple[str, ...] = ("user_id", "event_type")
                   ) -> DataFrame:
    """The deduplicated event stream itself: the FIRST event of every
    burst (see ``collapse_bursts``) — what a pipeline keeps when it
    collapses retry storms before sessionization/funnels. A burst
    starter is exactly a row whose gap from its (ts, event_id)-ordered
    predecessor exceeds the gap (or has no predecessor), so this is
    ONE lag window + a codegen'd filter — no groupBy at all, and the
    (ts, event_id) tie order makes the kept set deterministic and
    engine-reproducible (DuckDB oracle replays the same recurrence).
    """
    by = W.partitionBy(*keys).orderBy("ts", "event_id")
    prev = F.lag("ts").over(by)
    is_new = F.coalesce(
        (F.unix_micros(F.col("ts")) - F.unix_micros(prev)
         > int(gap_seconds) * 1_000_000), F.lit(True))
    return (events.withColumn("__new", is_new)
            .filter(F.col("__new")).drop("__new"))


def attribution(events: DataFrame, conversion_type: str = "purchase",
                touch_type: str = "click", model: str = "last",
                horizon_hours: int | None = 24 * 7) -> DataFrame:
    """Conversion attribution: credit each ``conversion_type`` event
    to a ``touch_type`` event by the same user — ``model='last'`` is
    last-touch (the most recent touch at or before the conversion,
    NULLed when it falls outside ``horizon_hours``), ``model='first'``
    is first-touch (the user's earliest touch at or before the
    conversion; the horizon still gates on the LAST touch's recency,
    the standard lookback-window rule). Returns (event_id, user_id,
    ts, touch_event_id, touch_ts, gap_us) with NULL touches for
    unattributed conversions (kept — the "organic" bucket every
    attribution report needs).

    Scale shape: the as-of carry-forward formulation
    (``asof_prev_event``'s plan — one hash exchange on user_id, one
    in-partition sort, O(1) running state), NOT a range join: both
    the first- and last-touch carries ride the same window, and the
    horizon is a post-hoc filter on the carried timestamp — no second
    exchange, no per-conversion probe. The DuckDB oracle is the
    identical FIRST_VALUE/LAST_VALUE(IGNORE NULLS) window algebra.
    """
    assert model in ("first", "last")
    e = (events.filter(
            F.col("event_type").isin([conversion_type, touch_type]))
         .select("event_id", "ts", "user_id", "event_type"))
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    mark_id = F.when(F.col("event_type") == touch_type,
                     F.col("event_id"))
    mark_ts = F.when(F.col("event_type") == touch_type, F.col("ts"))
    carried = (e
               .withColumn("last_id", F.last(mark_id, True).over(w))
               .withColumn("last_ts", F.last(mark_ts, True).over(w))
               .withColumn("first_id", F.first(mark_id, True).over(w))
               .withColumn("first_ts", F.first(mark_ts, True).over(w))
               .filter(F.col("event_type") == conversion_type))
    # lookback gate: the LAST touch must be inside the horizon for
    # the conversion to be attributed at all (both models)
    in_window = F.lit(True) if horizon_hours is None else (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_ts"))
        <= int(horizon_hours) * 3_600_000_000)
    pick = "last" if model == "last" else "first"
    tid = F.when(in_window, F.col(f"{pick}_id"))
    tts = F.when(in_window, F.col(f"{pick}_ts"))
    return (carried
            .select("event_id", "user_id", "ts",
                    tid.alias("touch_event_id"),
                    tts.alias("touch_ts"),
                    F.when(in_window,
                           F.unix_micros(F.col("ts"))
                           - F.unix_micros(F.col(f"{pick}_ts")))
                    .alias("gap_us")))


def temporal_join(facts: DataFrame, versions: DataFrame,
                  key: str = "user_id", ts_col: str = "ts",
                  fact_id: str = "event_id",
                  version_id: str = "event_id",
                  payload: str = "value") -> DataFrame:
    """Point-in-time dimension lookup (the SCD-2 read path): join each
    FACT row to the VERSION row of the same ``key`` that was effective
    AT the fact's timestamp — "the price/plan/segment the customer had
    when the order happened". A version effective at T applies to
    facts at T (version-before-fact tie order). Facts preceding any
    version keep NULLs (LEFT point-in-time semantics). Returns
    (fact_id, key, ts, version_id, version_payload).

    This is the cross-TABLE generalization of ``asof_prev_event``
    (same-stream as-of), and deliberately NOT a range join against
    materialized [valid_from, valid_to) intervals: the union-tag
    formulation needs no interval table maintenance and no
    bucketizing. Scale shape: union the two inputs (zero-exchange
    merge), ONE hash exchange on the key, per-key sorted window
    carrying the last version id/payload forward — sessionize's plan;
    state is one register. The DuckDB oracle is the identical
    union-tag LAST_VALUE(IGNORE NULLS) algebra.
    """
    v = versions.select(
        F.col(key).alias("k"), F.col(ts_col).alias("t"),
        F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("fid"),
        F.col(version_id).cast("long").alias("vid"),
        F.col(payload).cast("double").alias("pay"))
    f = facts.select(
        F.col(key).alias("k"), F.col(ts_col).alias("t"),
        F.lit(1).alias("tag"),
        F.col(fact_id).cast("long").alias("fid"),
        F.lit(None).cast("long").alias("vid"),
        F.lit(None).cast("double").alias("pay"))
    w = (W.partitionBy("k")
         .orderBy("t", "tag", F.coalesce(F.col("vid"), F.col("fid")))
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (v.unionByName(f)
            .withColumn("version_id", F.last("vid", True).over(w))
            .withColumn("version_payload", F.last("pay", True).over(w))
            .filter(F.col("tag") == 1)
            .select(F.col("fid").alias("fact_id"),
                    F.col("k").alias(key),
                    F.col("t").alias(ts_col),
                    "version_id", "version_payload"))


def winsorize_events(events: DataFrame, lo: float = 0.01,
                     hi: float = 0.99,
                     thr: DataFrame | None = None) -> DataFrame:
    """Winsorization audit: per event type, clip ``value`` at the
    EXACT lo/hi percentiles and report what clipping does — row
    counts clipped at each tail and the mean before/after — the
    robust-statistics preflight run before feeding heavy-tailed
    telemetry into a model (a handful of sentinel 1e9 readings can
    move a raw mean arbitrarily; the winsorized mean bounds any
    single row's influence).

    The thresholds come from ``grouped_exact_percentiles`` — the
    distributed SELECTION machinery (no per-group sort task) whose
    interpolation is bit-identical to the DuckDB oracle's — and
    attach back as a broadcast |types|-row table; the clip pass is
    one narrow projection + one hash aggregation. Means are rounded
    to 6 dp on both sides (the suite's standard float contract).

    ``thr``: optional precomputed threshold table carrying at least
    (event_type, p<lo·100>, p<hi·100>) — the sharing hook for callers
    that already ran ``grouped_exact_percentiles`` over the same
    (event_type, value) pairs with a ps superset (each percentile's
    bracket/interpolation is independent of the other requested ps,
    so the superset's values are bit-identical).
    """
    from parallel_svms_spark.operators.partitioning import (
        grouped_exact_percentiles)
    lo_c = f"p{int(round(lo * 100))}"
    hi_c = f"p{int(round(hi * 100))}"
    if thr is None:
        thr = grouped_exact_percentiles(events, "event_type", "value",
                                        ps=(lo, hi))
    thr = thr.select("event_type", lo_c, hi_c)
    src = (events.filter(F.col("value").isNotNull())
           .select("event_type", F.col("value").cast("double")
                   .alias("v"))
           .join(F.broadcast(thr), "event_type"))
    clipped = F.greatest(F.col(lo_c), F.least(F.col(hi_c), F.col("v")))
    return (src.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.sum((F.col("v") < F.col(lo_c)).cast("long"))
                 .alias("n_clipped_lo"),
                 F.sum((F.col("v") > F.col(hi_c)).cast("long"))
                 .alias("n_clipped_hi"),
                 F.round(F.avg("v"), 6).alias("mean_raw"),
                 F.round(F.avg(clipped), 6).alias("mean_winsorized"),
                 F.min(lo_c).alias("thr_lo"),
                 F.min(hi_c).alias("thr_hi")))
