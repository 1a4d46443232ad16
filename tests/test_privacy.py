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


# --- r10: free-text PII redaction + audit -------------------------------

_PII_ROWS = [
    (1, "mail bob.smith+x@corp.example.com or 10.0.0.1"),
    (2, "call +44 123-4567-8901 ref 123456789"),
    (3, None),
    (4, "clean text no pii"),
    (5, "ids 000042 and 99-12345 ip 256.1.2.3"),
]


def test_redact_pii_rule_coverage_and_sequencing(spark):
    from parallel_svms_spark.operators.privacy import redact_pii
    df = spark.createDataFrame(_PII_ROWS, "id int, body string")
    got = {r.id: (r.body, r.n_redacted)
           for r in redact_pii(df, ["body"]).collect()}
    assert got[1] == ("mail <EMAIL> or <IP>", 2)
    # sequential semantics: the phone's digits are consumed by the
    # phone rule — idnum must NOT re-count them (n = 2, not 3+)
    assert got[2] == ("call <PHONE> ref <ID>", 2)
    assert got[3] == (None, 0)  # NULL in, NULL out, count 0 not NULL
    assert got[4] == ("clean text no pii", 0)
    # 256.1.2.3 still matches the (syntactic) ipv4 shape; 99-12345 is
    # too short for phone and its digit runs are < 6 → untouched
    assert got[5] == ("ids <ID> and 99-12345 ip <IP>", 2)


def test_redact_pii_multicolumn_counts(spark):
    from parallel_svms_spark.operators.privacy import redact_pii
    df = spark.createDataFrame(
        [(1, "a@b.co more", "1234567")], "id int, x string, y string")
    r = redact_pii(df, ["x", "y"]).collect()[0]
    assert (r.x, r.y, r.n_redacted) == ("<EMAIL> more", "<ID>", 2)


def test_pii_audit_matches_redaction_totals(spark):
    from parallel_svms_spark.operators.privacy import (PII_RULES,
                                                       pii_audit,
                                                       redact_pii)
    df = spark.createDataFrame(_PII_ROWS, "id int, body string")
    rep = {(r.col_name, r.rule): (r.n_matches, r.n_rows_affected)
           for r in pii_audit(df, ["body"]).collect()}
    # every rule reported, including zero-hit ones
    assert set(rep) == {("body", n) for n, _, _ in PII_RULES}
    assert rep[("body", "email")] == (1, 1)
    assert rep[("body", "ipv4")] == (2, 2)
    assert rep[("body", "phone")] == (1, 1)
    assert rep[("body", "idnum")] == (2, 2)
    # audit total == what redaction will actually replace
    total = sum(m for m, _ in rep.values())
    assert total == sum(r.n_redacted
                        for r in redact_pii(df, ["body"]).collect())


def test_redact_pii_plan_is_pure_projection(spark, sf_dir):
    from parallel_svms_spark.operators.privacy import redact_pii
    cust = load_table(spark, sf_dir, "customer")
    p = (redact_pii(cust.select("c_custkey",
                                F.col("c_name").alias("name")), ["name"])
         ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in p
    assert "Python" not in p and "Pandas" not in p


def test_pii_audit_single_pass_plan(spark, sf_dir):
    from parallel_svms_spark.operators.privacy import pii_audit
    cust = load_table(spark, sf_dir, "customer")
    plan = (pii_audit(cust.select(F.col("c_name").alias("name"),
                                  F.col("c_mktsegment").alias("segment")),
                      ["name", "segment"])
            ._jdf.queryExecution().executedPlan().toString())
    # one aggregation over the table feeding the unpivot — the scan
    # appears once, not once per (column, rule) cell
    assert plan.count("FileScan") <= 1
    assert "Python" not in plan and "Pandas" not in plan
