"""Pseudonymization contracts: joinability, NULL transparency, salt
rotation, and the zero-exchange plan. Value parity with DuckDB is the
`pseudonymize_events` qkey's oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from parallel_svms_spark.io.sources import load_table
from parallel_svms_spark.operators.privacy import pseudonymize


def test_pseudonymize_preserves_joinability(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    tok = pseudonymize(ev, ["user_id"], salt="t")
    # same value → same token: the tokenized table sessionizes/groups
    # exactly like the raw one
    raw = sorted(r.n for r in
                 ev.groupBy("user_id").agg(F.count("*").alias("n"))
                 .collect())
    via = sorted(r.n for r in
                 tok.groupBy("user_id").agg(F.count("*").alias("n"))
                 .collect())
    assert raw == via
    # one token per raw id, no collisions on the fixture
    assert (tok.select("user_id").distinct().count()
            == ev.select("user_id").distinct().count())


def test_pseudonymize_null_and_salt_rotation(spark):
    df = spark.createDataFrame([(1,), (None,)], "uid long")
    a = pseudonymize(df, ["uid"], salt="a").collect()
    vals = [r.uid for r in a]
    assert None in vals  # NULL → NULL, never a constant token
    assert sum(v is not None for v in vals) == 1
    b = pseudonymize(df, ["uid"], salt="b").collect()
    # rotating the salt severs linkability: no token survives
    assert ({r.uid for r in a if r.uid is not None}
            & {r.uid for r in b if r.uid is not None} == set())


def test_k_anonymity_risk_hand_computed(spark):
    from parallel_svms_spark.operators.privacy import k_anonymity_risk
    rows = ([("a", "x")] * 5 + [("a", "y")] * 2 + [("b", "x")] * 1)
    df = spark.createDataFrame(rows, "uid string, et string")
    got = {(r.uid, r.et, r.group_size) for r in
           k_anonymity_risk(df, ["uid", "et"], k=5).collect()}
    # the k-sized group is safe; the 2- and 1-row groups are risks
    assert got == {("a", "y", 2), ("b", "x", 1)}
    # k=1 can never flag anything (every group has >= 1 row)
    assert k_anonymity_risk(df, ["uid", "et"], k=1).count() == 0


def test_cluster_size_stats_accounts_for_every_doc(spark, sf_dir):
    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators import dedup as D
    docs = load_table(spark, sf_dir, "documents")
    hist = D.cluster_size_stats(docs, k=3, threshold=0.5).collect()
    # the histogram partitions the corpus: sum(size * count) = n docs
    assert sum(r.cluster_size * r.n_clusters for r in hist) == docs.count()
    # and total clusters = distinct reps of the underlying clustering
    n_reps = (D.dedup_clusters(docs, k=3, threshold=0.5)
              .select("cluster_rep").distinct().count())
    assert sum(r.n_clusters for r in hist) == n_reps


def test_pseudonymize_plan_is_pure_projection(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    p = (pseudonymize(ev, ["user_id", "event_type"], salt="t")
         ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in p
    assert "Python" not in p and "Pandas" not in p
