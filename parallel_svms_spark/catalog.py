"""SQL surface: register the fixture tables and the engine's derived
relations as temp views, so everything the DataFrame API computes is
equally reachable from ``spark.sql``.

The reference has no query language at all (SURVEY §2.9: "no SQL or
expression language of any kind"); Spark gives a full ANSI SQL front
end for free ONCE the relations are in the catalog. This module is
that registration: after ``register(spark, sf_dir)`` a user writes

    spark.sql("SELECT s.user_id, q.quality
               FROM event_sessions s JOIN doc_quality q ON ...")

and Catalyst plans straight through the view definitions — views are
lazy logical plans, not materializations, so predicate pushdown and
column pruning cross the view boundary (e.g. a filter on
``event_sessions.user_id`` reaches the events parquet scan).

Only cheap, universally-useful derived relations are registered as
views (quality/session/dedup-keys shapes). The expensive operators
(near-dup joins, ANN, training) stay function-calls — a view that
hides a 50-minute self-join behind a SELECT is a footgun, not UX.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from parallel_svms_spark.io.sources import TABLES, load_table


def register_tables(spark: SparkSession, sf_dir: str,
                    prefix: str = "") -> list[str]:
    """One temp view per fixture table (timestamps normalized by
    load_table, so SQL users never see the NTZ quirk)."""
    names = []
    for name in TABLES:
        load_table(spark, sf_dir, name) \
            .createOrReplaceTempView(prefix + name)
        names.append(prefix + name)
    return names


def register_views(spark: SparkSession, prefix: str = "") -> list[str]:
    """Derived relations over the registered tables. Each is a lazy
    logical plan built by the SAME operator functions the qkeys use —
    one definition, two surfaces. ``prefix`` must match the one given
    to ``register_tables`` (views resolve the prefixed table names and
    are themselves registered under the same prefix).

    Exact/approx split (ADVICE r5): ``event_outliers`` intentionally
    serves APPROXIMATE ``p_thr`` values (t-digest ``approx_percentile``
    — r5 change, previously exact) so the default SQL surface never
    hides a full per-type value-multiset aggregation behind a SELECT;
    consumers needing exact thresholds call
    ``events.outlier_events(df, approx=False)`` directly, which is
    also what the ``outlier_events`` qkey pins against its oracle."""
    from parallel_svms_spark.operators import events as E
    from parallel_svms_spark.operators import text as TX
    from parallel_svms_spark.operators.dedup import exact_dedup_keys

    docs = spark.table(prefix + "documents")
    events = spark.table(prefix + "events")
    views: dict[str, DataFrame] = {
        # per-doc quality heuristics + language id
        "doc_quality": TX.quality_score(docs),
        # gap-based sessions (the operator's full session rows)
        "event_sessions": E.sessionize(events),
        # canonical doc id per exact-duplicate text group
        "dedup_keys": exact_dedup_keys(docs),
        # per-type tail thresholds for ad-hoc anomaly SQL. approx=True
        # (t-digest) on purpose: a default view must not hide an exact
        # per-type value-multiset aggregation behind a SELECT — the
        # exact twin stays a function call (outlier_events(approx=False))
        "event_outliers": E.outlier_events(events, approx=True),
        # r6: default train/valid/test assignment — a zero-shuffle
        # projection, so SQL over the view costs exactly a scan
        "doc_splits": __import__(
            "parallel_svms_spark.operators.sharding",
            fromlist=["x"]).dataset_split(docs).select(
                "doc_id", "split"),
        # r6: the deduplicated (burst-collapsed) event stream — the
        # debounced feed funnels/sessions SHOULD consume when retry
        # storms are present
        "events_debounced": E.burst_starters(events, gap_seconds=3600),
        # r6b: the chunked corpus — a zero-exchange explode, so SQL
        # over the view costs one scan with per-row amplification
        "doc_chunks": __import__(
            "parallel_svms_spark.operators.sharding",
            fromlist=["x"]).chunk_documents(docs),
        # r6b: default 5-fold CV assignment — zero-shuffle projection,
        # the doc_splits pattern with integer fold ids
        "doc_folds": __import__(
            "parallel_svms_spark.operators.sharding",
            fromlist=["x"]).kfold_assign(docs.select("doc_id"), k=5,
                                         id_col="doc_id"),
    }
    for name, df in views.items():
        df.createOrReplaceTempView(prefix + name)
    return sorted(prefix + name for name in views)


def register(spark: SparkSession, sf_dir: str, prefix: str = "") -> list[str]:
    """Tables + derived views; returns everything registered."""
    return (register_tables(spark, sf_dir, prefix)
            + register_views(spark, prefix))
