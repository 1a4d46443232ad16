"""SQL-surface registration (catalog.py): tables + operator-derived
views reachable from spark.sql, with optimization crossing the view
boundary (pushdown through views)."""

from __future__ import annotations

import pytest

from parallel_svms_spark import catalog


@pytest.fixture(scope="module")
def registered(spark, sf_dir):
    return catalog.register(spark, sf_dir)


def test_all_tables_and_views_registered(spark, registered):
    assert set(registered) >= {
        "lineitem", "orders", "documents", "events",
        "doc_quality", "event_sessions", "dedup_keys", "event_outliers"}
    for name in registered:
        assert spark.sql(f"SELECT * FROM {name} LIMIT 1").count() >= 0


def test_sql_joins_across_operator_views(spark, registered):
    # sessions joined to outlier thresholds — two operator views in
    # one SQL statement, planned as one DAG
    rows = spark.sql("""
        SELECT s.user_id, count(*) AS n_sessions
        FROM event_sessions s
        WHERE s.n_events >= 2
        GROUP BY s.user_id
        ORDER BY n_sessions DESC, user_id LIMIT 5
    """).collect()
    assert rows and all(r.n_sessions >= 1 for r in rows)
    joined = spark.sql("""
        SELECT o.event_type, o.n_outliers, q.n_docs
        FROM event_outliers o
        CROSS JOIN (SELECT count(*) AS n_docs FROM doc_quality) q
    """).collect()
    assert len(joined) == 5


def test_view_results_match_operator_calls(spark, sf_dir, registered):
    # the default view is the bounded-state approx twin (ADVICE r4:
    # a SELECT must not hide exact per-type value-multiset state);
    # it must match the approx operator call exactly, and agree with
    # the exact operator on counts (thresholds differ only by the
    # t-digest's bounded error)
    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators.events import outlier_events
    ev = load_table(spark, sf_dir, "events")
    direct = sorted(map(tuple, outlier_events(ev, approx=True).collect()))
    via_sql = sorted(map(tuple,
                         spark.sql("SELECT * FROM event_outliers")
                         .collect()))
    assert direct == via_sql
    exact = {r.event_type: r.n_events
             for r in outlier_events(ev).collect()}
    assert {t[0]: t[1] for t in direct} == exact


def test_pushdown_crosses_view_boundary(spark, registered):
    # a filter applied in SQL above the view must reach the parquet
    # scan below it
    q = spark.sql(
        "SELECT l_orderkey FROM lineitem WHERE l_shipdate > "
        "TIMESTAMP '2001-01-01'")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_shipdate" in \
        plan.split("PushedFilters")[1][:300]


def test_r6_views_registered_and_consistent(spark, sf_dir, registered):
    """doc_splits / events_debounced (r6) resolve from SQL and match
    the operator calls; the split view's filter plans as a pure scan
    (zero exchange through the view boundary)."""
    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators.events import burst_starters
    from parallel_svms_spark.operators.sharding import dataset_split

    assert {"doc_splits", "events_debounced"} <= set(registered)
    docs = load_table(spark, sf_dir, "documents")
    want = {(r.doc_id, r.split)
            for r in dataset_split(docs).select("doc_id", "split")
            .collect()}
    got = {(r.doc_id, r.split)
           for r in spark.sql("SELECT * FROM doc_splits").collect()}
    assert got == want

    ev = load_table(spark, sf_dir, "events")
    assert (spark.sql("SELECT count(*) AS n FROM events_debounced")
            .first().n
            == burst_starters(ev, gap_seconds=3600).count())

    q = spark.sql("SELECT doc_id FROM doc_splits WHERE split = 'valid'")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # still a zero-shuffle projection


def test_r6b_views_registered_and_consistent(spark, sf_dir, registered):
    """doc_chunks / doc_folds (r6b) resolve from SQL and match the
    operator calls; both stay zero-exchange through the view."""
    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators.sharding import (chunk_documents,
                                                        kfold_assign)

    assert {"doc_chunks", "doc_folds"} <= set(registered)
    docs = load_table(spark, sf_dir, "documents")
    want = {(r.doc_id, r.chunk_ix, r.chunk_text)
            for r in chunk_documents(docs).collect()}
    got = {(r.doc_id, r.chunk_ix, r.chunk_text)
           for r in spark.sql(
               "SELECT doc_id, chunk_ix, chunk_text FROM doc_chunks")
           .collect()}
    assert got == want

    wantf = {(r.doc_id, r.fold)
             for r in kfold_assign(docs.select("doc_id"), k=5,
                                   id_col="doc_id").collect()}
    gotf = {(r.doc_id, r.fold)
            for r in spark.sql("SELECT * FROM doc_folds").collect()}
    assert gotf == wantf

    for q in ("SELECT doc_id FROM doc_chunks WHERE chunk_ix = 0",
              "SELECT doc_id FROM doc_folds WHERE fold = 2"):
        plan = (spark.sql(q)._jdf.queryExecution().executedPlan()
                .toString())
        assert "Exchange" not in plan
