"""Structured Streaming twins of the batch event operators (SURVEY §7.9
optional surface — the reference has no streaming; E6's tumbling window
gets a streaming twin with watermarking for late data).

The batch operator and the streaming twin share the same groupBy
(F.window) expression — Catalyst compiles the same logical aggregation
either way; only the source/sink and the watermark differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def stream_events_from_dir(spark: SparkSession, path: str,
                           max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream (for tests/local: parquet dir; in production
    the same pipeline reads kafka — only this function changes)."""
    return (spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def windowed_counts(stream: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours",
                    slide: str | None = None) -> DataFrame:
    """Tumbling (or, with ``slide``, hopping) window counts with a
    late-data watermark. State is bounded: watermark age ×
    (n_types × windows/hour) rows — ×(width/slide) when hopping."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(w.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 6).alias("value_sum"))
        .select(F.col("w.start").alias("window_start"),
                "event_type", "n_events", "value_sum")
    )


SESSION_OUT_SCHEMA = ("user_id long, session_start timestamp, "
                      "session_end timestamp, n_events int, value_sum double")
_SESSION_STATE_SCHEMA = "start_us long, last_us long, n int, vsum double"


def sessionize_stateful(stream: DataFrame,
                        gap_minutes: int = 30) -> DataFrame:
    """Custom stateful operator: gap-based sessionization via
    ``applyInPandasWithState`` — the streaming twin of the batch
    ``operators.events.sessionize`` (lag/cumsum windows don't exist in
    streaming; per-key mutable state does).

    State per user is one open session (4 scalars), so state size is
    O(active users), independent of event volume. A session closes
    when a later event arrives more than ``gap_minutes`` after the
    last one, or — for users that go quiet — when the event-time
    watermark passes last_event + gap (EventTimeTimeout), so state
    can't leak and every session is eventually emitted exactly once.

    Session bounds are tracked at MICROsecond resolution (Spark
    timestamp precision): ms truncation here would emit session
    start/end values that differ from the batch operator's on µs-grain
    data — caught by the fixture-equivalence test in
    tests/test_streaming_stateful.py. Only the timeout timestamp is
    ms-grain (the GroupState API's unit).
    """
    import pandas as pd  # noqa: F401  (worker-side)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60_000_000

    def fn(key, pdfs, state: GroupState):
        import pandas as pd
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n, vsum = state.get
            state.remove()
            yield pd.DataFrame({
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n], "value_sum": [round(vsum, 6)]})
            return
        events = pd.concat(list(pdfs)).sort_values("ts")
        if state.exists:
            start_us, last_us, n, vsum = state.get
        else:
            start_us, last_us, n, vsum = -1, -1, 0, 0.0
        closed = []
        for ts, value in zip(events["ts"], events["value"]):
            t = ts.value // 1_000  # ns → µs
            if start_us < 0:
                start_us, last_us, n, vsum = t, t, 1, float(value)
            elif t - last_us > gap_us:
                closed.append((start_us, last_us, n, vsum))
                start_us, last_us, n, vsum = t, t, 1, float(value)
            else:
                last_us, n, vsum = t, n + 1, vsum + float(value)
        state.update((start_us, last_us, n, vsum))
        # a wholly-late burst can put last+gap behind the watermark,
        # which setTimeoutTimestamp rejects — clamp to watermark+1ms
        # (fires at the next batch). Timeout API is ms-grain; round the
        # µs deadline UP so a timeout can never fire early.
        state.setTimeoutTimestamp(
            max(-(-(last_us + gap_us) // 1000),
                state.getCurrentWatermarkMs() + 1))
        if closed:
            yield pd.DataFrame({
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us")
                                  for s, _, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us")
                                for _, e, _, _ in closed],
                "n_events": [c for _, _, c, _ in closed],
                "value_sum": [round(v, 6) for _, _, _, v in closed]})

    return (stream.withWatermark("ts", f"{gap_minutes} minutes")
            .groupBy("user_id").applyInPandasWithState(
                fn, SESSION_OUT_SCHEMA, _SESSION_STATE_SCHEMA,
                "append", GroupStateTimeout.EventTimeTimeout))


DOCS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("text", T.StringType()),
])


def streaming_exact_dedup(stream: DataFrame,
                          watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of ``operators.dedup.exact_dedup``: drop rows
    whose content digest was already seen, with BOUNDED state.

    ``dropDuplicatesWithinWatermark`` keys state on the digest column
    and expires entries once the watermark passes their event time —
    the production shape for continuous ingest dedup (an unbounded
    ``dropDuplicates`` would grow state forever at 100 TB/day). Exact
    within the watermark horizon; duplicates farther apart than the
    horizon re-emit, which is the documented streaming trade: pair it
    with a periodic batch ``exact_dedup`` compaction of the sink.
    Digest, not text, enters state — 32 B/doc regardless of doc size,
    same invariant as the batch operator's shuffle.
    """
    return (stream
            .withColumn("digest", F.sha2(F.col("text"), 256))
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["digest"])
            .drop("digest"))


def static_minhash_index(documents: DataFrame, n_hashes: int = 64,
                         k: int = 3, n_bands: int = 16,
                         rows_per_band: int = 4,
                         seed: int = 42) -> DataFrame:
    """Static side of the stream-static near-dup join: one row per
    (band, bandhash) per corpus doc, carrying the doc's distinct
    shingle-hash set for exact verification. Build once from the batch
    corpus (same signature family as ``dedup.minhash_signatures``);
    at scale, persist it or write it bucketed by (band, bandhash) so
    each micro-batch joins without rebuilding."""
    from parallel_svms_spark.operators import dedup as D
    sigs = D.minhash_signatures(documents, n_hashes, k, seed)
    banded = (sigs
              .select("doc_id", F.explode(
                  D.band_structs(n_bands, rows_per_band)).alias("bh"))
              .select(F.col("doc_id").alias("doc_b"),
                      "bh.band", "bh.bandhash"))
    sh = documents.select(
        F.col("doc_id").alias("doc_b"),
        F.transform(F.array_distinct(D.shingles_col("text", k)),
                    lambda s: F.xxhash64(s)).alias("sh_b"))
    return banded.join(sh, "doc_b")


def streaming_minhash_near_dups(stream_docs: DataFrame,
                                static_index: DataFrame,
                                n_hashes: int = 64, k: int = 3,
                                threshold: float = 0.5,
                                n_bands: int = 16, rows_per_band: int = 4,
                                seed: int = 42,
                                watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of ``dedup.minhash_near_dups``: match each
    arriving doc against a static corpus index (E2 × streaming —
    continuous-ingest near-dup screening).

    Same pipeline, streaming-shaped:
    - sign: the batch signature family (``minhash_udf`` — identical
      permutations) as a narrow per-micro-batch map, no state;
    - band: same ``band_structs`` expression, exploded;
    - candidates: a STREAM-STATIC equi-join on (band, bandhash) — no
      stream-stream join state; the static side is a plain DataFrame
      the planner shuffles/broadcasts per its size;
    - verify: exact Jaccard over distinct shingle-hash sets, same
      xxhash64 family as the batch verifier;
    - emit-once: a doc collides with the same corpus doc in up to
      ``n_bands`` bands; ``dropDuplicatesWithinWatermark`` on
      (doc_a, doc_b) collapses them with state bounded by the
      watermark horizon (the unbounded ``distinct`` of the batch
      operator is not available to a stream).

    Returns (doc_a = stream doc, doc_b = corpus doc, ts, jaccard).
    """
    from parallel_svms_spark.operators import dedup as D
    sh_a = F.transform(F.array_distinct(D.shingles_col("text", k)),
                       lambda s: F.xxhash64(s))
    sigs = (stream_docs
            .select("doc_id", "ts", sh_a.alias("sh_a"),
                    D.minhash_hashes_col("text", k).alias("hs"))
            .select("doc_id", "ts", "sh_a",
                    D.minhash_udf(n_hashes, seed)("hs").alias("sig")))
    banded = (sigs
              .select("doc_id", "ts", "sh_a", F.explode(
                  D.band_structs(n_bands, rows_per_band)).alias("bh"))
              .select(F.col("doc_id").alias("doc_a"), "ts", "sh_a",
                      "bh.band", "bh.bandhash"))
    jac = F.round(F.size(F.array_intersect("sh_a", "sh_b"))
                  / F.size(F.array_union("sh_a", "sh_b")), 6)
    return (banded.withWatermark("ts", watermark)
            .join(static_index, ["band", "bandhash"])
            .filter(F.col("doc_a") != F.col("doc_b"))
            .withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "ts", "jaccard")
            .dropDuplicatesWithinWatermark(["doc_a", "doc_b"]))


VECS_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
])


def static_embedding_index(corpus_vecs: DataFrame, centroids,
                           features_col: str = "embedding") -> DataFrame:
    """Static side of the stream-static embedding near-dup join: the
    corpus assigned under its own IVF model (``ivf_assign_with`` with
    the SAME centroids the stream side uses — model consistency is
    what makes list-bucketed matching correct). At scale this is the
    persisted ``partitionBy('ivf_list')`` table, not a rebuild."""
    from parallel_svms_spark.operators.similarity import ivf_assign_with
    return (ivf_assign_with(corpus_vecs, centroids, features_col)
            .select(F.col("vec_id").alias("vec_b"),
                    F.col(features_col).alias("emb_b"), "ivf_list"))


def streaming_embedding_near_dup(stream_vecs: DataFrame,
                                 static_index: DataFrame,
                                 centroids,
                                 threshold: float = 0.9,
                                 features_col: str = "embedding"
                                 ) -> DataFrame:
    """Streaming twin of the new-vs-corpus half of
    ``similarity.cosine_near_dup_ivf_incremental``: every arriving
    vector is assigned to its IVF list with the corpus-trained
    ``centroids`` (one Arrow-batched broadcast matmul per
    micro-batch, stateless), stream-static equi-joined against the
    per-list ``static_embedding_index``, and exact-cosine verified
    JVM-side. Continuous-ingest semantic dedup: "is this new sample
    already in the corpus?" at arrival time.

    No dedup state is needed at all — a vector lives in exactly ONE
    list, so each (stream, corpus) pair can only be produced once
    (unlike the minhash twin's n_bands collisions). In-batch
    stream×stream pairs are out of scope by the family contract
    (same as ``streaming_minhash_near_dups``): arrivals are screened
    against the CORPUS; batch-internal dup collapse happens at the
    next compaction via the batch operator.

    Returns (vec_a = stream vector, vec_b = corpus vector, ts,
    cosine) with cosine ≥ threshold.
    """
    from parallel_svms_spark.operators.similarity import ivf_assign_with
    assigned = (ivf_assign_with(stream_vecs, centroids, features_col)
                .select(F.col("vec_id").alias("vec_a"), "ts",
                        F.col(features_col).alias("emb_a"), "ivf_list"))
    ea = F.col("emb_a").cast("array<double>")
    eb = F.col("emb_b").cast("array<double>")
    dot = F.aggregate(F.zip_with(ea, eb, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(ea, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(eb, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    cosine = F.round(dot / F.greatest(na * nb, F.lit(1e-30)), 6)
    return (assigned.join(static_index, "ivf_list")
            .filter(F.col("vec_a") != F.col("vec_b"))
            .withColumn("cosine", cosine)
            .filter(F.col("cosine") >= threshold)
            .select("vec_a", "vec_b", "ts", "cosine"))


def streaming_decontaminate(stream_docs: DataFrame, benchmark: DataFrame,
                            k: int = 4, text_col: str = "text") -> DataFrame:
    """Streaming twin of ``contamination.decontaminate``: drop arriving
    docs that share any word k-shingle with the (static, small)
    benchmark set — the continuous-ingest contamination screen.

    STATELESS by construction: the benchmark's distinct shingle set is
    collected once (it is small by the same contract that lets the
    batch operator broadcast it) and shipped as a broadcast variable;
    each micro-batch row is screened by one Arrow-batched membership
    test. No join state, no watermark, no store — the streaming shapes
    that DO need state (stream-static join + dedup) are exercised by
    ``streaming_minhash_near_dups``; a contamination screen is a pure
    filter and should plan like one.

    Python shingling here mirrors ``dedup.shingles_col`` exactly
    (space tokens, k-window space-join, whole-text fallback below k
    tokens) — asserted against the batch operator in tests.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from parallel_svms_spark.operators.contamination import \
        benchmark_shingles
    bench = {r[0] for r in benchmark_shingles(benchmark, k, text_col)
             .collect()}
    bc = stream_docs.sparkSession.sparkContext.broadcast(bench)
    kk = int(k)

    def _screen(texts):
        bset = bc.value

        def clean(t) -> bool:
            # NULL/invalid text is KEPT, matching the batch twin
            # (shingles_col(NULL) → NULL → explode drops the doc from
            # the contamination check, anti-join keeps it)
            if not isinstance(t, str):
                return True
            toks = t.split(" ")
            if len(toks) < kk:
                return t not in bset
            return all(" ".join(toks[i:i + kk]) not in bset
                       for i in range(len(toks) - kk + 1))

        return texts.map(clean)

    # concrete-class annotations (postponed-evaluation strings would
    # not resolve for pandas_udf's eval-type inference — same pattern
    # as dedup.minhash_udf)
    _screen.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    is_clean = pandas_udf(_screen, "boolean")

    return stream_docs.filter(is_clean(F.col(text_col)))


def streaming_quality_screen(stream_docs: DataFrame,
                             min_quality: float = 0.5,
                             text_col: str = "text") -> DataFrame:
    """Streaming twin of the quality gate: keep arriving docs whose
    heuristic quality ≥ ``min_quality``, annotated with the score.

    STATELESS: the score is the batch operator's own JVM expression
    set (``text.quality_cols`` — literally shared code, so the two
    paths cannot drift), and the screen is one narrow codegen'd
    projection + filter per micro-batch. No state store, no watermark,
    no Python. This is the threshold form of ``text.quality_filter``:
    the per-source exact-quota rank needs corpus-wide counts and is
    inherently a batch op; a continuous ingest pipeline screens on a
    fixed threshold (calibrated offline from the batch percentiles).
    """
    from parallel_svms_spark.operators.text import quality_cols
    _, _, _, score = quality_cols(text_col)
    return (stream_docs.withColumn("quality", score)
            .filter(F.col("quality") >= float(min_quality)))


def streaming_weighted_sample(stream_docs: DataFrame, weight,
                              id_col: str = "doc_id") -> DataFrame:
    """Streaming twin of ``sharding.weighted_sample``: keep each
    arriving doc with probability min(weight, 1) — continuous-ingest
    importance sampling.

    STATELESS and literally shared code: the batch operator is already
    a pure deterministic filter (md5-hex coin vs a per-row weight
    threshold, no window, no RNG state), so the streaming form IS the
    batch function applied to an unbounded DataFrame. A doc's fate
    depends only on (id, weight) — replays and micro-batch boundaries
    cannot flip it, which is exactly the exactly-once-friendly
    property a sampling screen needs."""
    from parallel_svms_spark.operators.sharding import weighted_sample
    return weighted_sample(stream_docs, weight, id_col=id_col)


def streaming_chunk_documents(stream_docs: DataFrame,
                              chunk_chars: int = 256,
                              overlap: int = 32,
                              id_col: str = "doc_id",
                              text_col: str = "text") -> DataFrame:
    """Streaming twin of ``sharding.chunk_documents``: chunk documents
    as they arrive — continuous-ingest corpus preparation.

    STATELESS and literally shared code: the batch operator is a pure
    per-row explode (chunk boundaries depend only on the row's own
    text), so the streaming form IS the batch function applied to the
    unbounded DataFrame — replays and micro-batch boundaries cannot
    change a document's chunk set, and no watermark or state store is
    involved."""
    from parallel_svms_spark.operators.sharding import chunk_documents
    return chunk_documents(stream_docs, chunk_chars, overlap,
                           id_col=id_col, text_col=text_col)


def run_stream_to_memory(agg: DataFrame, query_name: str = "stream_out",
                         output_mode: str = "append"):
    """Drive a bounded file-stream to completion synchronously (test
    harness: memory sink + processAllAvailable)."""
    q = (agg.writeStream.outputMode(output_mode)
         .format("memory").queryName(query_name).start())
    q.processAllAvailable()
    q.stop()
    return query_name


def streaming_interval_join(stream_points: DataFrame, intervals: DataFrame,
                            ts_col: str = "ts",
                            start_col: str = "session_start",
                            end_col: str = "session_end",
                            bucket_minutes: int = 360) -> DataFrame:
    """Streaming twin of ``events.interval_join``: arriving point
    events matched against a STATIC interval table (deploy windows,
    experiment spans, session history) — "which live context did this
    event land in?" at ingest time.

    Same bucketized formulation as the batch operator — the static
    side explodes into spanned buckets once, the stream side derives
    its bucket per row — so the stream-static join is an EQUI-join on
    bucket. That matters twice at scale: Spark disallows/degrades
    stream-static theta joins (full interval scan per micro-batch),
    and the equi-form means each micro-batch probes only its buckets'
    hash partitions. Stateless: stream-static inner joins keep no
    watermark state, and each match still occurs exactly once (the
    point's bucket is unique).
    """
    bms = int(bucket_minutes) * 60_000
    i = intervals.withColumn(
        "__b", F.explode(F.sequence(
            F.expr(f"unix_millis({start_col}) div {bms}"),
            F.expr(f"unix_millis({end_col}) div {bms}"))))
    p = stream_points.withColumn(
        "__b", F.expr(f"unix_millis({ts_col}) div {bms}"))
    return (p.join(i, "__b")
            .filter((F.col(ts_col) >= F.col(start_col))
                    & (F.col(ts_col) <= F.col(end_col)))
            .drop("__b"))


_FUNNEL_STATE_SCHEMA = T.StructType([
    T.StructField("stage", T.IntegerType()),
    T.StructField("t_us", T.LongType()),
])

FUNNEL_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("converted_ts", T.TimestampType()),
])


def funnel_stateful(stream: DataFrame,
                    steps: tuple[str, ...] = ("view", "click", "purchase"),
                    window_hours: int = 24) -> DataFrame:
    """Streaming twin of ``operators.events.funnel``'s conversion
    test: per user, advance through ``steps`` greedily (first
    qualifying occurrence, each within ``window_hours`` of completing
    the prior step) and emit ONE (user_id, converted_ts) row the
    moment the final step completes — batch funnel tells you how many
    converted, this tells you WHO, as it happens.

    State per user is two scalars (stage index + last completion µs) —
    O(users) regardless of event volume, and terminal after
    conversion so duplicates can't re-emit. Greedy first-match equals
    the batch operator's min-qualifying-per-stage recurrence when
    events are processed in event-time order: within a micro-batch we
    sort by ts, across micro-batches a time-ordered source is assumed
    (the usual log-ingest contract; the fixture-equivalence test
    feeds ordered chunks). A late event behind the watermark can
    therefore miss a conversion the batch operator would count —
    the standard streaming-lateness trade, same as the sessionizer's.
    """
    import pandas as pd  # noqa: F401  (worker-side)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    window_us = int(window_hours) * 3_600_000_000
    n_steps = len(steps)
    step_of = {s: i for i, s in enumerate(steps)}

    def fn(key, pdfs, state: GroupState):
        import pandas as pd
        (user_id,) = key
        events = pd.concat(list(pdfs)).sort_values("ts")
        stage, t_us = state.get if state.exists else (0, -1)
        if stage >= n_steps:  # terminal: already converted
            state.update((stage, t_us))
            return
        out = []
        for ts, etype in zip(events["ts"], events["event_type"]):
            idx = step_of.get(etype)
            if idx != stage:
                continue
            t = ts.value // 1_000  # ns → µs
            if stage > 0 and not (t_us < t <= t_us + window_us):
                continue
            stage, t_us = stage + 1, t
            if stage == n_steps:
                out.append(t)
                break
        state.update((stage, t_us))
        if out:
            yield pd.DataFrame({
                "user_id": [user_id],
                "converted_ts": [pd.Timestamp(out[0], unit="us")]})

    return (stream
            .filter(F.col("event_type").isin(list(steps)))
            .select("user_id", "ts", "event_type")
            .withWatermark("ts", f"{int(window_hours)} hours")
            .groupBy("user_id").applyInPandasWithState(
                fn, FUNNEL_OUT_SCHEMA, _FUNNEL_STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))


_RETENTION_STATE_SCHEMA = "cohort_days long, seen string"

RETENTION_OUT_SCHEMA = ("user_id long, cohort_week date, "
                        "week_offset int")


def retention_stateful(stream: DataFrame) -> DataFrame:
    """Streaming twin of ``operators.events.retention_cohorts``'s
    per-user substrate: emit one (user_id, cohort_week, week_offset)
    row the FIRST time each user is active in each week — the
    incremental feed a live retention triangle aggregates, where the
    batch operator recomputes the triangle from scratch.

    State per user: cohort week (one long, set on first sight) plus
    the set of already-emitted week offsets (comma string — a user
    active every single week for a decade is ~2 KB). Exactly-once per
    user-week by construction: an offset is emitted only on set
    insertion. Cohort correctness assumes event-time-ordered arrival
    (the log-ingest contract; the fixture-equivalence test feeds
    ordered chunks) — a late FIRST event behind the stream head would
    pin the cohort a week late, the same lateness trade the other
    stateful twins document.
    """
    import pandas as pd  # noqa: F401  (worker-side)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        import pandas as pd
        (user_id,) = key
        events = pd.concat(list(pdfs)).sort_values("ts")
        if state.exists:
            cohort_days, seen_s = state.get
            seen = set(int(x) for x in seen_s.split(",") if x != "")
        else:
            cohort_days, seen = -1, set()
        out = []
        for ts in events["ts"]:
            # Monday-start week, as F.date_trunc("week") computes
            day = ts.normalize() - pd.Timedelta(days=int(ts.weekday()))
            days = day.value // 86_400_000_000_000  # ns → days
            if cohort_days < 0:
                cohort_days = days
            off = (days - cohort_days) // 7
            if off not in seen:
                seen.add(off)
                out.append(off)
        state.update((cohort_days,
                      ",".join(str(x) for x in sorted(seen))))
        if out:
            cohort = pd.Timestamp(cohort_days * 86_400_000_000_000)
            yield pd.DataFrame({
                "user_id": [user_id] * len(out),
                "cohort_week": [cohort.date()] * len(out),
                "week_offset": [int(o) for o in out]})

    return (stream.select("user_id", "ts")
            .withWatermark("ts", "7 days")
            .groupBy("user_id").applyInPandasWithState(
                fn, RETENTION_OUT_SCHEMA, _RETENTION_STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))


def streaming_value_histogram(stream: DataFrame, width: float = 50.0,
                              watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of ``events.value_histogram``: the same
    fixed-width binning as a continuously-maintained aggregate.

    State is ≤ |buckets| rows TOTAL (the bin expression is identical
    to the batch operator's; buckets are value-range-bounded, not
    time-bounded), so unlike windowed counts there is no per-window
    state growth — the watermark exists only to let the sink run in
    update/complete mode with late-data semantics. Aggregating the
    update feed's latest row per bucket reproduces the batch
    histogram's n exactly (equivalence-tested on the fixture).
    min/max per bucket are monotone under accumulation, so the twin
    carries them too.
    """
    b = F.floor(F.col("value") / F.lit(width)).cast("int").alias("bucket")
    return (stream.withWatermark("ts", watermark)
            .groupBy(b)
            .agg(F.count("*").alias("n"),
                 F.min("value").alias("min_value"),
                 F.max("value").alias("max_value")))


def streaming_outlier_screen(stream: DataFrame, thresholds: DataFrame,
                             ) -> DataFrame:
    """Streaming twin of ``events.outlier_events``'s screening half:
    flag arriving events whose value exceeds the per-type threshold
    profiled OFFLINE by the batch operator (the standard split — the
    quantile itself needs the history, the screen must run on the
    live stream).

    STATELESS: a stream-static broadcast join against the tiny
    (|event types|)-row threshold table and a filter — plans like the
    quality gate. Emits each outlier exactly once, as it arrives.
    Threshold rows come straight from ``outlier_events`` output
    (event_type, p_thr), so batch and stream agree on the boundary by
    construction (same rounded double, equivalence-tested).
    """
    thr = F.broadcast(thresholds.select("event_type", "p_thr"))
    return (stream.join(thr, "event_type")
            .filter(F.col("value") > F.col("p_thr"))
            .select("event_id", "ts", "user_id", "event_type", "value",
                    "p_thr"))


_TRANSITIONS_STATE_SCHEMA = ("last_type string, last_ts_us long, "
                             "last_eid long")

TRANSITIONS_OUT_SCHEMA = ("user_id long, prev_type string, "
                          "next_type string, ts timestamp")


def transitions_stateful(stream: DataFrame,
                         watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of ``operators.events.event_transitions``: emit
    one (user_id, prev_type, next_type, ts) row the moment each
    transition happens; aggregating the feed by (prev, next) count
    reproduces the batch pair table exactly (equivalence-tested).

    State per user is ONE string + one timestamp — the smallest
    possible stateful operator, O(users) forever. Within a
    micro-batch events sort by (ts, event_id) — the same total order
    the batch lag window uses — and across micro-batches a
    time-ordered source is assumed (same contract, and same
    late-event trade, as the sessionizer and funnel twins).
    """
    import pandas as pd  # noqa: F401  (worker-side)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        import pandas as pd
        (user_id,) = key
        ev = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        if len(ev) == 0:
            return
        last_type, last_ts_us, last_eid = (
            state.get if state.exists else (None, -1, -1))
        # enforce the time-ordered-source contract in the BATCH
        # operator's total order (ts, event_id): an event at or before
        # the last processed (ts, id) pair arrived out of order across
        # micro-batches and would pair with the wrong predecessor —
        # drop it rather than emit a wrong (prev, next) row. Ties on
        # ts alone are legitimate (higher event_id is still in-order);
        # comparing the pair, not just ts, keeps batch equivalence
        # when equal timestamps straddle a micro-batch boundary
        if last_ts_us >= 0:
            ts_us = ev["ts"].astype("datetime64[ns]").astype("int64") // 1_000
            keep = (ts_us > last_ts_us) | (
                (ts_us == last_ts_us) & (ev["event_id"] > last_eid))
            ev = ev[keep]
            if len(ev) == 0:
                return
        rows = []
        for ts, etype in zip(ev["ts"], ev["event_type"]):
            if last_type is not None:
                rows.append((user_id, last_type, etype, ts))
            last_type = etype
        state.update((last_type,
                      int(ev["ts"].iloc[-1].value // 1_000),
                      int(ev["event_id"].iloc[-1])))
        if rows:
            yield pd.DataFrame(rows, columns=[
                "user_id", "prev_type", "next_type", "ts"])

    return (stream.select("user_id", "ts", "event_id", "event_type")
            .withWatermark("ts", watermark)
            .groupBy("user_id").applyInPandasWithState(
                fn, TRANSITIONS_OUT_SCHEMA, _TRANSITIONS_STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))


_ASOF_STATE_SCHEMA = ("prev_id long, prev_ts_us long, "
                      "last_ts_us long, last_eid long")

ASOF_OUT_SCHEMA = ("event_id long, user_id long, ts timestamp, "
                   "prev_event_id long, prev_ts timestamp, gap_us long")


def asof_stateful(stream: DataFrame, left_type: str = "error",
                  right_type: str = "click",
                  watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of ``operators.events.asof_prev_event``: emit,
    for each arriving ``left_type`` event, the most recent
    ``right_type`` event by the same user at or before it — the
    continuous "error correlated to the click that preceded it" feed.

    State per user is ONE (event_id, ts) pair — the carry-forward
    register the batch window's ``last(..., ignorenulls=True)``
    maintains implicitly, made explicit. O(users) state forever, no
    timeout needed (the register never grows). Events sort by
    (ts, event_id) within a micro-batch — the batch operator's total
    order — and the stored last_ts_us drops batch-leading events that
    arrive out of order across micro-batches (same time-ordered-source
    contract, and the same guard, as the transitions twin).

    Lefts with no earlier right emit NULL prevs, exactly like the
    batch LEFT-ASOF semantics (equivalence-tested on the fixture).
    """
    import pandas as pd  # noqa: F401  (worker-side)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        import pandas as pd
        (user_id,) = key
        ev = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        if len(ev) == 0:
            return
        prev_id, prev_ts_us, last_ts_us, last_eid = (
            state.get if state.exists else (None, None, -1, -1))
        ts_us = ev["ts"].astype("datetime64[ns]").astype("int64") // 1_000
        if last_ts_us >= 0:
            # drop events at or before the last processed (ts, id)
            # pair — the batch operator's total order; ts-only
            # comparison would mis-pair equal timestamps straddling
            # a micro-batch boundary (see transitions_stateful)
            keep = (ts_us > last_ts_us) | (
                (ts_us == last_ts_us) & (ev["event_id"] > last_eid))
            ev, ts_us = ev[keep], ts_us[keep]
            if len(ev) == 0:
                return
        rows = []
        for eid, ts, t_us, etype in zip(ev["event_id"], ev["ts"],
                                        ts_us, ev["event_type"]):
            if etype == right_type:
                prev_id, prev_ts_us = int(eid), int(t_us)
            elif etype == left_type:
                rows.append((
                    int(eid), user_id, ts,
                    prev_id,
                    pd.Timestamp(prev_ts_us * 1_000)
                    if prev_ts_us is not None else pd.NaT,
                    int(t_us) - prev_ts_us
                    if prev_ts_us is not None else None))
        state.update((prev_id, prev_ts_us, int(ts_us.iloc[-1]),
                      int(ev["event_id"].iloc[-1])))
        if rows:
            yield pd.DataFrame(rows, columns=[
                "event_id", "user_id", "ts", "prev_event_id",
                "prev_ts", "gap_us"])

    return (stream
            .filter(F.col("event_type").isin([left_type, right_type]))
            .select("event_id", "ts", "user_id", "event_type")
            .withWatermark("ts", watermark)
            .groupBy("user_id").applyInPandasWithState(
                fn, ASOF_OUT_SCHEMA, _ASOF_STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))


_BURST_STATE_SCHEMA = "last_ts_us long, last_eid long"
BURST_OUT_SCHEMA = ("event_id long, user_id long, event_type string, "
                    "ts timestamp")


def burst_starters_stateful(stream: DataFrame, gap_seconds: int = 3600,
                            watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of ``operators.events.burst_starters``: emit
    each arriving event that OPENS a burst (gap from the previous
    event of the same (user, event_type) exceeds ``gap_seconds``) —
    the continuous retry-storm/debounce dedup feed, each kept event
    emitted the moment it arrives.

    State per (user, event_type) is ONE (ts, event_id) register — the
    previous event the batch operator's ``lag`` window reads, made
    explicit. O(|users|·|types|) state forever, no timeout needed.
    Events sort by (ts, event_id) within a micro-batch — the batch
    operator's total order — and the stored register drops
    batch-leading events that arrive out of order across micro-batches
    (same time-ordered-source contract, and the same guard, as the
    asof/transitions twins). Row-for-row equivalence with the batch
    operator is pinned in tests/test_streaming_stateful.py.
    """
    import pandas as pd  # noqa: F401  (worker-side)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_seconds) * 1_000_000

    def fn(key, pdfs, state: GroupState):
        import pandas as pd
        user_id, event_type = key
        ev = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        if len(ev) == 0:
            return
        last_ts_us, last_eid = state.get if state.exists else (None, -1)
        ts_us = ev["ts"].astype("datetime64[ns]").astype("int64") // 1_000
        if last_ts_us is not None:
            keep = (ts_us > last_ts_us) | (
                (ts_us == last_ts_us) & (ev["event_id"] > last_eid))
            ev, ts_us = ev[keep], ts_us[keep]
            if len(ev) == 0:
                return
        rows = []
        prev = last_ts_us
        for eid, ts, t_us in zip(ev["event_id"], ev["ts"], ts_us):
            if prev is None or int(t_us) - prev > gap_us:
                rows.append((int(eid), user_id, event_type, ts))
            prev = int(t_us)
        state.update((int(ts_us.iloc[-1]), int(ev["event_id"].iloc[-1])))
        if rows:
            yield pd.DataFrame(rows, columns=[
                "event_id", "user_id", "event_type", "ts"])

    return (stream
            .select("event_id", "ts", "user_id", "event_type")
            .withWatermark("ts", watermark)
            .groupBy("user_id", "event_type").applyInPandasWithState(
                fn, BURST_OUT_SCHEMA, _BURST_STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))


def streaming_compression_screen(stream_docs: DataFrame,
                                 min_ratio: float = 0.25,
                                 level: int = 6) -> DataFrame:
    """Streaming twin of ``text.compression_screen``: the deflate-
    ratio junk gate on continuous ingest. STATELESS and literally
    shared code — the batch operator already decides each doc's fate
    from its own bytes inside the Arrow batch, so the streaming form
    IS the batch function applied to an unbounded DataFrame (the
    ``streaming_weighted_sample`` / ``streaming_quality_screen``
    pattern); replays and micro-batch boundaries cannot flip a row."""
    from parallel_svms_spark.operators.text import compression_screen
    return compression_screen(stream_docs, min_ratio=min_ratio,
                              level=level)


def streaming_redact_pii(stream_docs: DataFrame, cols: list[str],
                         rules=None) -> DataFrame:
    """Streaming twin of ``privacy.redact_pii``: destructive free-text
    PII redaction on continuous ingest — identifiers must die BEFORE
    the lake write, not in a later batch pass that leaves a raw copy
    at rest. STATELESS and literally shared code (the
    ``streaming_compression_screen`` pattern): the redaction chain is
    one codegen'd regex projection whose output depends only on the
    row's own text, so replays and micro-batch boundaries cannot
    change what a row becomes, and the batch/stream paths cannot
    drift."""
    from parallel_svms_spark.operators.privacy import redact_pii
    return redact_pii(stream_docs, cols, rules=rules)


def streaming_score_quality(stream_docs: DataFrame, artifact: dict,
                            text_col: str = "text") -> DataFrame:
    """Streaming twin of ``ml.quality.score_quality``: score arriving
    documents under a FROZEN committed classifier artifact — the
    model-based quality gate applied at ingest, before the lake
    write. STATELESS and literally shared code: the classifier
    compiles to one codegen'd JVM expression (Σ w[h(token) mod d] +
    b over a constant-folded weight array), so a row's score depends
    only on (artifact, its own text) — replays and micro-batch
    boundaries cannot change it, and the batch/stream paths cannot
    drift. Training stays a batch/offline step by design (the
    committed-artifact lifecycle, like the frozen BPE vocab the
    ``streaming_bpe_count`` twin consumes)."""
    from parallel_svms_spark.ml.quality import score_quality
    return score_quality(stream_docs, artifact, text_col)


def streaming_bpe_count(stream_docs: DataFrame,
                        merges: list[tuple[str, str]],
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Streaming twin of ``bpe.bpe_token_count``: per-arriving-doc
    subword token counts under a FROZEN merge table. STATELESS and
    literally shared code (the ``streaming_compression_screen``
    pattern) — each doc's count depends only on its own text and the
    broadcast ranks, so the batch function applied to an unbounded
    frame IS the streaming operator; replays and micro-batch
    boundaries cannot flip a count. The merge table is the committed
    vocabulary — train it offline (``bpe.bpe_train_merges`` on the
    corpus), never on the stream."""
    from parallel_svms_spark.operators.bpe import bpe_token_count
    return bpe_token_count(stream_docs, merges, text_col=text_col,
                           id_col=id_col)


def streaming_bpe_encode_ids(stream_docs: DataFrame, artifact: dict,
                             text_col: str = "text",
                             id_col: str = "doc_id") -> DataFrame:
    """Streaming twin of ``bpe.bpe_encode_ids`` (r8): per-arriving-doc
    token-ID sequences under a FROZEN committed vocabulary — the
    continuous-ingest form of shard-payload production. STATELESS and
    literally shared code, same contract as ``streaming_bpe_count``:
    a doc's ids depend only on its own text and the broadcast
    artifact, so replays and micro-batch boundaries cannot flip an
    id. Load the artifact from the committed file
    (``bpe.bpe_load_vocab``), never train on the stream — day-N ids
    must mean the same thing at every micro-batch."""
    from parallel_svms_spark.operators.bpe import bpe_encode_ids
    return bpe_encode_ids(stream_docs, artifact, text_col=text_col,
                          id_col=id_col)


def streaming_exact_dedup_normalized(stream: DataFrame,
                                     watermark: str = "2 hours"
                                     ) -> DataFrame:
    """Streaming twin of ``dedup.exact_dedup_keys_normalized``'s keep
    semantics: drop arriving docs whose NORMALIZED content (the
    ``text.scrub_text`` lowercase/email/digit-mask/ws-collapse pass —
    shared expressions, so the normalization can never drift from the
    batch operator) was already seen within the watermark horizon.
    Same bounded-state shape and the same trade as
    ``streaming_exact_dedup``: 32 B of digest state per doc, horizon-
    scoped exactness, periodic batch compaction for the long tail.
    """
    from parallel_svms_spark.operators.text import clean_text_col
    clean = clean_text_col("text")
    return (stream
            .withColumn("digest", F.sha2(clean, 256))
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["digest"])
            .drop("digest"))


_ATTR_STATE_SCHEMA = ("first_id long, first_ts_us long, "
                      "last_id long, last_ts_us long, "
                      "seen_ts_us long, seen_eid long")
ATTR_OUT_SCHEMA = ("event_id long, user_id long, ts timestamp, "
                   "touch_event_id long, touch_ts timestamp, "
                   "gap_us long")


def attribution_stateful(stream: DataFrame,
                         conversion_type: str = "purchase",
                         touch_type: str = "click",
                         model: str = "last",
                         horizon_hours: int | None = 24 * 7,
                         watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of ``operators.events.attribution``: emit, for
    each arriving conversion, its first-/last-touch credit — the
    continuous attribution feed (each conversion credited the moment
    it lands, not at end-of-day batch).

    State per user is TWO (event_id, ts) registers — the first- and
    last-touch carries the batch window maintains implicitly, made
    explicit — plus the (ts, id) order guard shared with the
    asof/transitions/burst twins. O(users) state forever, no timeout
    needed (registers never grow). The horizon gates on the LAST
    touch's recency in both models, exactly like the batch operator
    (row-for-row equivalence-tested on the fixture).
    """
    assert model in ("first", "last")
    import pandas as pd  # noqa: F401  (worker-side)
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    horizon_us = (None if horizon_hours is None
                  else int(horizon_hours) * 3_600_000_000)

    def fn(key, pdfs, state: GroupState):
        import pandas as pd
        (user_id,) = key
        ev = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        if len(ev) == 0:
            return
        (first_id, first_ts_us, last_id, last_ts_us,
         seen_ts_us, seen_eid) = (
            state.get if state.exists
            else (None, None, None, None, -1, -1))
        ts_us = ev["ts"].astype("datetime64[ns]").astype("int64") // 1_000
        if seen_ts_us >= 0:
            keep = (ts_us > seen_ts_us) | (
                (ts_us == seen_ts_us) & (ev["event_id"] > seen_eid))
            ev, ts_us = ev[keep], ts_us[keep]
            if len(ev) == 0:
                return
        rows = []
        for eid, ts, t_us, etype in zip(ev["event_id"], ev["ts"],
                                        ts_us, ev["event_type"]):
            if etype == touch_type:
                last_id, last_ts_us = int(eid), int(t_us)
                if first_id is None:
                    first_id, first_ts_us = int(eid), int(t_us)
            elif etype == conversion_type:
                in_win = (last_ts_us is not None
                          and (horizon_us is None
                               or int(t_us) - last_ts_us <= horizon_us))
                pick_id, pick_ts = ((last_id, last_ts_us)
                                    if model == "last"
                                    else (first_id, first_ts_us))
                if in_win:
                    rows.append((int(eid), user_id, ts, pick_id,
                                 pd.Timestamp(pick_ts * 1_000),
                                 int(t_us) - pick_ts))
                else:
                    rows.append((int(eid), user_id, ts, None,
                                 pd.NaT, None))
        state.update((first_id, first_ts_us, last_id, last_ts_us,
                      int(ts_us.iloc[-1]),
                      int(ev["event_id"].iloc[-1])))
        if rows:
            yield pd.DataFrame(rows, columns=[
                "event_id", "user_id", "ts", "touch_event_id",
                "touch_ts", "gap_us"])

    return (stream
            .filter(F.col("event_type").isin([conversion_type,
                                              touch_type]))
            .select("event_id", "ts", "user_id", "event_type")
            .withWatermark("ts", watermark)
            .groupBy("user_id").applyInPandasWithState(
                fn, ATTR_OUT_SCHEMA, _ATTR_STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))


def streaming_temporal_join(stream_facts: DataFrame,
                            versions: DataFrame,
                            key: str = "user_id", ts_col: str = "ts",
                            fact_id: str = "event_id",
                            version_id: str = "event_id",
                            payload: str = "value") -> DataFrame:
    """Streaming twin of ``events.temporal_join``: arriving facts
    joined to the version of their key effective AT the fact's
    timestamp, against a STATIC version table — the SCD-2 lookup at
    ingest time ("the plan the customer had when this order landed").

    The batch operator's union-tag carry needs the whole stream; the
    stream-static form instead materializes each version's VALIDITY
    INTERVAL once on the static side — ``[ts, next version's ts)``
    via a ``lead`` window, the classic SCD-2 valid_from/valid_to
    derivation, open-ended for the latest version — and the lookup
    becomes a stream-static equi-join on the key plus a range filter.
    LEFT semantics match the batch operator: facts preceding any
    version (or with no version row at all) keep NULLs.

    Stateless (stream-static joins hold no watermark state); each
    fact matches AT MOST one validity interval (intervals partition
    the timeline per key), so exactly-once emission needs no dedup.
    Row-for-row equivalence with the batch operator is pinned on the
    fixture. Scale: the static side is |versions| rows exchanged
    once per micro-batch plan — broadcast when the dimension is
    small, the usual dimension-join call.
    """
    from pyspark.sql import Window as W

    v = (versions.select(
            F.col(key).alias("__k"),
            F.col(ts_col).alias("__from"),
            F.col(version_id).cast("long").alias("version_id"),
            F.col(payload).cast("double").alias("version_payload"))
         .withColumn("__to", F.lead("__from").over(
             W.partitionBy("__k").orderBy("__from", "version_id"))))
    f = stream_facts.select(
        F.col(fact_id).cast("long").alias("fact_id"),
        F.col(key), F.col(ts_col))
    cond = ((F.col(key) == F.col("__k"))
            & (F.col(ts_col) >= F.col("__from"))
            & (F.col("__to").isNull()
               | (F.col(ts_col) < F.col("__to"))))
    return (f.join(v, cond, "left")
            .select("fact_id", key, ts_col,
                    "version_id", "version_payload"))


def streaming_repeated_span_stats(stream_docs: DataFrame,
                                  index: DataFrame, k: int = 5,
                                  min_count: int = 2,
                                  watermark: str = "2 hours",
                                  window: str = "1 hour") -> DataFrame:
    """Streaming twin of ``dedup.repeated_span_stats`` (r8): per
    arriving document, how many of its tokens are covered by a word
    k-gram repeated ≥ ``min_count`` times across the FROZEN archive
    gram index plus the document itself — the continuous-ingest form
    of the substring-dedup screen (``repeated_spans_incremental`` is
    the daily-batch form; this is the same archive-count semantics at
    single-doc batch size).

    Shape, stage by stage:
    - gram emission + IN-DOC occurrence counts are one stateless array
      expression per row (a doc's self-repetition needs no state).
      r9/r10: both branches are O(L log L) per doc over ONE
      (gram, pos) array sort — at the default ``min_count=2`` a
      linear neighbor-mark, for ``min_count > 2`` exact per-gram
      counts from sorted-run lengths (r10 — the per-element filter
      scan this replaced was O(L²) on doc-sized L);
    - archive counts come from a STREAM-STATIC left join on the
      8-byte gram hash against the pre-summed index (read it from
      ``gram_index_append``'s path; day-rows collapse in one
      combinable sum) — no stream-stream state;
    - a position is covered iff in_doc + archive ≥ min_count, so a
      phrase repeated inside one arriving doc is caught even when the
      archive has never seen it (matching the batch family);
    - the per-doc span merge that the batch side runs as a window is
      here a watermarked (event-window, doc_id) aggregation:
      ``sort_array(collect_list(pos))`` — state bounded by the
      watermark horizon × in-flight docs, each entry ≤ doc length —
      folded by a JVM ``aggregate`` into covered-token count and
      span count (identical gaps-and-islands arithmetic: new span
      iff pos > prev_end + 1).

    Emits (doc_id, n_tokens, dup_tokens, n_spans) ONLY for documents
    with non-zero repeated coverage — a screen, not an audit; the
    batch twin's zero rows for clean docs have no streaming analogue
    (an absent aggregation group never fires). Equivalence with the
    batch stats on the dirty set is test-pinned — WITH one stated
    exception (ADVICE r8): occurrence counts are in-doc + ARCHIVE
    only, so two documents arriving before the index is appended
    that share a novel repeated gram are NOT flagged — a
    cross-arrival blind spot ``repeated_spans_incremental`` (which
    sums batch-internal cross-doc counts) does not have. Callers
    wanting incremental-equivalent semantics must
    ``gram_index_append`` each micro-batch's grams before the next
    batch arrives; the divergent case is itself test-pinned
    (``test_streaming_repeated_span_cross_arrival_blind_spot``).
    """
    from parallel_svms_spark.operators.dedup import (gram_structs_col,
                                                     tokens_col)
    k = int(k)
    assert k >= 2 and int(min_count) >= 2
    idx = index.groupBy("g").agg(F.sum("n_occ").alias("old_n"))
    # r9: the shared linear gram expression (zip_with chain) — the
    # old inline-slice-in-lambda form re-split the text per gram,
    # O(L²) per arriving doc (see dedup.shingles_col)
    gs = gram_structs_col("text", k)
    if int(min_count) == 2:
        # default path, O(L log L) per doc: an occurrence is in-doc
        # repeated iff EITHER neighbor in (gram, pos) sort order
        # shares its gram — one array sort + neighbor marks + re-sort
        # by pos, no per-element scan (the cuts twin's trick with
        # both neighbors, since stats cover EVERY occurrence of a
        # repeated gram, not just non-first ones)
        srt = F.array_sort(F.transform(
            gs, lambda e: F.struct(e["g"].alias("g"),
                                   e["pos"].alias("pos"))))
        nn = F.size(srt)
        shift_back = F.concat(
            F.array(F.struct(F.lit(None).cast("bigint").alias("g"),
                             F.lit(-1).alias("pos"))),
            F.slice(srt, 1, F.greatest(nn - 1, F.lit(0))))
        shift_fwd = F.concat(
            F.slice(srt, 2, F.greatest(nn - 1, F.lit(0))),
            F.array(F.struct(F.lit(None).cast("bigint").alias("g"),
                             F.lit(-1).alias("pos"))))
        both = F.zip_with(srt, shift_back,
                          lambda a, b: F.struct(
                              a["g"].alias("g"), a["pos"].alias("pos"),
                              (b["g"].isNotNull()
                               & (a["g"] == b["g"])).alias("p")))
        marked = F.when(nn > 0, F.array_sort(F.zip_with(
            both, shift_fwd,
            lambda a, b: F.struct(
                a["pos"].alias("pos"), a["g"].alias("g"),
                F.when(a["p"] | (b["g"].isNotNull()
                                 & (a["g"] == b["g"])),
                       F.lit(2)).otherwise(F.lit(1))
                .alias("in_doc"))))).otherwise(F.array())
    else:
        # general min_count (r10 — VERDICT r9 #2): exact per-gram
        # in-doc counts from RUN LENGTHS over the same (gram, pos)
        # sort the default path uses — O(L log L) per doc, replacing
        # the per-element F.filter scan (O(L²) on doc-sized L, the
        # straggler class the r9 batch fixes removed). Equal grams
        # are adjacent after the sort, so: run-start indices = the
        # positions whose predecessor differs (0-based F.get is
        # NULL-safe at i−1 = −1, no ANSI index error), run length =
        # distance to the next start, and each element's exact count
        # is its run's length — expanded back by one slice per run,
        # Σ run lengths = L total. Everything references only bound
        # lambda variables (the let_col discipline: an unbound srt
        # would re-sort per element).
        from parallel_svms_spark.io.sources import let_col
        srt0 = F.array_sort(F.transform(
            gs, lambda e: F.struct(e["g"].alias("g"),
                                   e["pos"].alias("pos"))))

        def runs_marked(s: F.Column) -> F.Column:
            idxs = F.sequence(F.lit(0), F.size(s) - 1)
            bpos = F.filter(
                idxs, lambda i: F.get(s, i - 1).isNull()
                | (F.get(s, i - 1)["g"] != F.get(s, i)["g"]))
            return let_col(bpos, lambda b: F.flatten(F.zip_with(
                b,
                F.concat(F.slice(b, 2, F.greatest(F.size(b) - 1,
                                                  F.lit(0))),
                         F.array(F.size(s))),
                lambda st, en: F.transform(
                    F.slice(s, st + 1, en - st),
                    lambda e: F.struct(
                        e["pos"].alias("pos"), e["g"].alias("g"),
                        (en - st).alias("in_doc"))))))

        marked = F.when(F.size(srt0) > 0,
                        let_col(srt0, runs_marked)).otherwise(F.array())
    grams = (stream_docs
             .filter(F.col("text").isNotNull())
             .select("doc_id", "ts",
                     F.size(tokens_col("text")).cast("long")
                     .alias("n_tokens"),
                     F.explode(marked).alias("s"))
             .select("doc_id", "ts", "n_tokens",
                     F.col("s.pos").alias("pos"),
                     F.col("s.g").alias("g"),
                     F.col("s.in_doc").alias("in_doc")))
    hits = (grams.withWatermark("ts", watermark)
            .join(idx, "g", "left_outer")
            .filter(F.col("in_doc")
                    + F.coalesce(F.col("old_n"), F.lit(0))
                    >= int(min_count)))
    agg = (hits.groupBy(F.window("ts", window), "doc_id")
           .agg(F.sort_array(F.collect_list("pos")).alias("ps"),
                F.max("n_tokens").alias("n_tokens")))
    zero = F.struct(F.lit(0).cast("long").alias("dup"),
                    F.lit(-2 * k).cast("long").alias("pe"),
                    F.lit(0).cast("long").alias("ns"))
    fold = F.aggregate(
        "ps", zero,
        lambda acc, p: F.struct(
            F.when(p > acc["pe"] + 1, acc["dup"] + k)
            .otherwise(acc["dup"] + p + k - 1 - acc["pe"]).alias("dup"),
            (p + k - 1).cast("long").alias("pe"),
            F.when(p > acc["pe"] + 1, acc["ns"] + 1)
            .otherwise(acc["ns"]).alias("ns")))
    return agg.select("doc_id", "n_tokens",
                      fold["dup"].alias("dup_tokens"),
                      fold["ns"].alias("n_spans"))


def streaming_repeated_span_cuts(stream_docs: DataFrame,
                                 index: DataFrame, k: int = 5,
                                 watermark: str = "2 hours",
                                 window: str = "1 hour") -> DataFrame:
    """Streaming twin of the SCRUB half of the substring family (r9):
    emit (doc_id, span_start, span_tokens) keep-first CUT DECISIONS
    for each arriving document against the FROZEN archive witness
    index (``gram_count_index``'s r9 schema with first_doc /
    first_pos); apply them at materialization time with the batch
    ``dedup.apply_span_cuts`` — the text column never rides a
    streaming shuffle, only 20 B gram rows and span triples do (the
    reason this twin emits decisions, not rewritten blobs).

    Keep-first semantics match ``scrub_repeated_spans_incremental``
    EXACTLY: an arriving occurrence (d, p) is cut iff an earlier
    occurrence of its gram exists in the SAME document, or the
    archive witness (first_doc, first_pos) lexicographically precedes
    (d, p) — an arriving doc that outranks the archive copy keeps its
    text, restriction-to-batch style. Cross-arrival blind spot: same
    as ``streaming_repeated_span_stats`` (two arrivals sharing a
    novel gram are not flagged until the index is appended — callers
    wanting incremental-equivalent semantics ``gram_index_append``
    each micro-batch); the equivalence test pins the no-cross-repeat
    case and the scrub-twin witness cases.

    Stage shape, all linear per document: in-doc earlier-occurrence
    flags via ONE array sort by (gram, pos) + predecessor mark +
    re-sort by pos (no per-element scan — the stats twin's in_doc
    count is per-element O(L²), this is O(L log L)); stream-static
    left join on the 8-byte hash against the pre-collapsed witness;
    watermarked (window, doc_id) collect of cut positions (state
    bounded by watermark horizon × doc length); spans from the
    sorted positions by two zip_with gaps-and-islands passes (a span
    STARTS where the previous cut is > k away and ENDS at p+k−1
    where the next cut is > k away — no fold, no array append).
    """
    from parallel_svms_spark.operators.dedup import (
        _require_witness_index, gram_structs_col)
    k = int(k)
    assert k >= 2
    # fail fast on a pre-r9 witness-less index (ADVICE r9): a legacy
    # or mixed-schema index would silently read NULL witnesses and
    # treat archived grams as keeper-less, wrongly keeping batch
    # copies of archive boilerplate
    idx = _require_witness_index(index).groupBy("g").agg(
        F.min(F.struct(F.col("first_doc").alias("d"),
                       F.col("first_pos").alias("p"))).alias("old_keep"))
    gs = gram_structs_col("text", k)
    srt = F.array_sort(F.transform(
        gs, lambda e: F.struct(e["g"].alias("g"),
                               e["pos"].alias("pos"))))
    n = F.size(srt)
    prev = F.concat(
        F.array(F.struct(F.lit(None).cast("bigint").alias("g"),
                         F.lit(-1).alias("pos"))),
        F.slice(srt, 1, F.greatest(n - 1, F.lit(0))))
    marks = F.when(n > 0, F.array_sort(F.zip_with(
        srt, prev,
        lambda a, b: F.struct(
            a["pos"].alias("pos"), a["g"].alias("g"),
            (b["g"].isNotNull() & (a["g"] == b["g"])).alias("dup"))))) \
        .otherwise(F.array())
    grams = (stream_docs
             .filter(F.col("text").isNotNull())
             .select("doc_id", "ts", F.explode(marks).alias("m"))
             .select("doc_id", "ts", F.col("m.pos").alias("pos"),
                     F.col("m.g").alias("g"),
                     F.col("m.dup").alias("dup")))
    hits = (grams.withWatermark("ts", watermark)
            .join(idx, "g", "left_outer")
            .filter(F.col("dup")
                    | (F.col("old_keep").isNotNull()
                       & (F.col("old_keep")
                          < F.struct(F.col("doc_id").alias("d"),
                                     F.col("pos").alias("p"))))))
    agg = (hits.groupBy(F.window("ts", window), "doc_id")
           .agg(F.sort_array(F.collect_list("pos")).alias("ps")))
    ps = F.col("ps")
    m = F.size(ps)
    sentinel = 1 << 30
    prevp = F.concat(F.array(F.lit(-sentinel)),
                     F.slice(ps, 1, F.greatest(m - 1, F.lit(0))))
    nextp = F.concat(F.slice(ps, 2, F.greatest(m - 1, F.lit(0))),
                     F.array(F.lit(sentinel)))
    starts = F.filter(
        F.zip_with(ps, prevp, lambda p, q: F.when(p - q > k, p)),
        lambda x: x.isNotNull())
    ends = F.filter(
        F.zip_with(ps, nextp, lambda p, q: F.when(q - p > k, p + k - 1)),
        lambda x: x.isNotNull())
    spans = F.zip_with(
        starts, ends,
        lambda a, b: F.struct(
            a.cast("long").alias("span_start"),
            (b - a + 1).cast("long").alias("span_tokens")))
    return (agg.select("doc_id", F.explode(spans).alias("s"))
            .select("doc_id", F.col("s.span_start").alias("span_start"),
                    F.col("s.span_tokens").alias("span_tokens")))
