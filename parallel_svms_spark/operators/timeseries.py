"""Time-series resampling over the events stream — calendar-grid
gap filling with forward fill, and gaps-and-islands streak analysis.

The reference has no time dimension at all (its iteration is batch
re-execution, SURVEY §2.9); these extend the §2.8 E6 event family with
the two shapes every telemetry/metrics consumer of a 100 TB event lake
asks for next:

- ``gap_fill_daily`` — regularize an irregular event stream onto each
  user's own daily calendar and carry the last observation forward
  (the TimescaleDB ``time_bucket_gapfill`` + ``locf`` composition /
  QuestDB ``SAMPLE BY ... FILL(PREV)``, re-expressed as DataFrame
  ops).
- ``activity_streaks`` — consecutive-active-day runs per user (the
  classic gaps-and-islands rewrite: group key = day − dense ordinal,
  which is constant exactly along a consecutive run).

Scale shape: every exchange in both operators is keyed by ``user_id``
(or finer), every window is partitioned per user — there is no global
sort or single-task window anywhere. Per-user state is bounded by the
*calendar*, not the event volume: a mega-user with 10⁹ events still
collapses to ≤ span_days rows before the window runs, because the
close-of-day aggregation (a map-side-combinable ``max(struct)``) runs
BEFORE the grid join. The grid itself is built from per-user
``sequence(min_day, max_day)`` — ≤ span_days rows per user, never a
cross join against a global calendar dimension.

Determinism contract: "close of day" is the value at the max
``(ts, event_id)`` pair — ``event_id`` is unique, so the tie order is
total and the DuckDB window oracle (row_number DESC) must hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_daily(events: DataFrame, user_col: str = "user_id",
                   ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """Daily close-of-day series per user on a dense calendar grid,
    gaps forward-filled (last observation carried forward).

    Three stages, all user-keyed:

    1. close-of-day: ``max(struct(ts, event_id, value))`` per
       (user, day) — partial-agg combinable, so the shuffle carries at
       most one row per user-day regardless of raw event volume;
    2. grid: per-user ``sequence(min_day, max_day)`` exploded — the
       fill domain is each user's own span (no rows invented before a
       user existed or after it was last seen);
    3. forward fill: ``last(day_close, ignorenulls)`` over a
       user-partitioned, day-ordered window. Window state is ≤
       span_days rows per user — calendar-bounded, not volume-bounded.

    Returns (user_id, day, value_ff); value_ff is never NULL because
    every user's grid starts on a day with an observation.
    """
    day = F.to_date(F.col(ts_col)).alias("day")
    daily = (
        events.groupBy(F.col(user_col), day)
        .agg(F.max(F.struct(ts_col, "event_id", value_col))
             .getField(value_col).alias("day_close"))
    )
    span = daily.groupBy(user_col).agg(F.min("day").alias("d0"),
                                       F.max("day").alias("d1"))
    grid = span.select(user_col,
                       F.explode(F.sequence("d0", "d1")).alias("day"))
    w = (Window.partitionBy(user_col).orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        grid.join(daily, [user_col, "day"], "left")
        .withColumn("value_ff", F.last("day_close", ignorenulls=True).over(w))
        .select(user_col, "day", "value_ff")
    )


def activity_streaks(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Longest consecutive-active-day streak and streak count per user.

    Gaps-and-islands: within a user, ``day − row_number(day)`` is
    constant exactly while days are consecutive, so grouping on it
    splits the activity history into maximal runs. The distinct
    (user, day) projection collapses raw volume FIRST (one shuffle,
    ≤ span_days rows per user survive), and the ordinal window is
    user-partitioned — bounded by the calendar like everything above.

    Returns (user_id, longest_streak, n_streaks).
    """
    days = events.select(F.col(user_col),
                         F.to_date(F.col(ts_col)).alias("day")).distinct()
    w = Window.partitionBy(user_col).orderBy("day")
    isl = days.withColumn("grp", F.date_sub("day", F.row_number().over(w)))
    streaks = isl.groupBy(user_col, "grp").agg(F.count("*").alias("len"))
    return streaks.groupBy(user_col).agg(
        F.max("len").alias("longest_streak"),
        F.count("*").alias("n_streaks"))


def rolling_features(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts", value_col: str = "value",
                     window_minutes: int = 60) -> DataFrame:
    """Per-event trailing-window features: for EVERY event, the count
    and (integer-exact) value sum of the same user's events in the
    closed interval ``[ts − window, ts]`` — the feature shape online
    models ask of an event lake ("how active was this user in the
    last hour as of this event?").

    One user-partitioned RANGE window over epoch-millis — Spark's
    range frame is the native physical form (a single sort per user
    plus a sliding two-pointer frame; no self-join, no explode). The
    value sum is floored to millis PER ROW before the window sum, so
    the aggregate is integer and therefore exact under any intra-frame
    order — that is what lets the DuckDB oracle hash-match doubles-
    free. Ties (same user, same ts) are RANGE peers in both engines:
    every peer sees the whole peer group, no tiebreak needed.

    Scale shape: shuffle keyed by user; window state is the trailing
    hour only (Spark's range frame evicts as it slides). A mega-user
    still serializes one task — ``rolling_features_bucketed`` is the
    value-identical bounded-task variant, same trade as
    ``events.sessionize_bucketed``.
    """
    horizon_ms = window_minutes * 60_000
    w = (Window.partitionBy(user_col)
         .orderBy(F.unix_millis(F.col(ts_col)))
         .rangeBetween(-horizon_ms, 0))
    vm = F.floor(F.col(value_col) * 1000).cast("long")
    return (events
            .withColumn("n_win", F.count("*").over(w))
            .withColumn("value_millis_win", F.sum(vm).over(w))
            .select("event_id", user_col, "n_win", "value_millis_win"))


def rolling_features_bucketed(events: DataFrame,
                              user_col: str = "user_id",
                              ts_col: str = "ts",
                              value_col: str = "value",
                              window_minutes: int = 60,
                              bucket_hours: int = 6) -> DataFrame:
    """Mega-user-safe ``rolling_features``, value-identical by
    construction (asserted by equivalence tests; shares the plain
    operator's DuckDB oracle verbatim).

    A trailing window of bounded horizon needs only bounded context,
    so instead of one window task per user:

    1. bucket events into (user, ``bucket_hours``) time buckets;
    2. REPLICATE each event that falls within ``horizon`` of its
       bucket's end into the next bucket as a context-only row —
       every event's trailing hour is then fully present inside its
       own bucket (requires ``bucket ≥ horizon``, asserted);
    3. run the identical RANGE window partitioned by (user, bucket)
       and drop the context rows.

    Any task is bounded by one user-bucket (+ ≤ one horizon of
    context); replication overhead is horizon/bucket ≤ 1/6 of rows.
    Same trade as ``sessionize_bucketed``: a constant-factor second
    pass buys immunity to single-user skew — reach for it when one
    user's event count exceeds what one task should hold.
    """
    horizon_ms = window_minutes * 60_000
    bucket_ms = bucket_hours * 3_600_000
    if bucket_ms < horizon_ms:
        raise ValueError("bucket must be at least the window horizon")
    ev = events.withColumn("__ms", F.unix_millis(F.col(ts_col)))
    ev = ev.withColumn("__bkt", F.floor(F.col("__ms") / bucket_ms))
    native = ev.withColumn("__ctx", F.lit(0))
    ctx = (ev.filter(F.col("__ms")
                     >= (F.col("__bkt") + 1) * bucket_ms - horizon_ms)
           .withColumn("__bkt", F.col("__bkt") + 1)
           .withColumn("__ctx", F.lit(1)))
    w = (Window.partitionBy(user_col, "__bkt")
         .orderBy("__ms")
         .rangeBetween(-horizon_ms, 0))
    vm = F.floor(F.col(value_col) * 1000).cast("long")
    return (native.unionByName(ctx)
            .withColumn("n_win", F.count("*").over(w))
            .withColumn("value_millis_win", F.sum(vm).over(w))
            .filter(F.col("__ctx") == 0)
            .select("event_id", user_col, "n_win", "value_millis_win"))
