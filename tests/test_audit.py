"""Constraint-validation audit: planted-violation detection + plan shape.

The sf fixtures are clean (all checks report 0 violations — proven by
the DuckDB oracle in test_oracles_all), so these tests build a dirty
micro-warehouse where every check must fire with an exactly known
count, then pin the plan shape the module docstring promises.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from parallel_svms_spark.io.sources import load_table
from parallel_svms_spark.operators.audit import validate_constraints


@pytest.fixture(scope="module")
def dirty(spark):
    orders = spark.createDataFrame(
        [
            # (o_orderkey, o_custkey, o_orderstatus, o_totalprice)
            (1, 10, "O", 100.0),
            (1, 10, "O", 100.0),      # duplicate PK (1 extra row)
            (2, 10, "F", -5.0),       # negative totalprice
            (3, 99, "X", 50.0),       # bad status + orphan custkey
            (None, 11, "P", 10.0),    # NULL PK
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(10, "Alice"), (11, ""), (12, None)],
        "c_custkey long, c_name string",
    )
    lineitem = spark.createDataFrame(
        [
            # (l_orderkey, l_quantity, l_discount, l_tax)
            (1, 10.0, 0.05, 0.02),
            (2, 0.0, 0.05, 0.02),     # quantity < 1
            (2, 99.0, 1.5, 0.02),     # quantity > 50 AND discount > 1
            (7, 10.0, -0.1, -0.5),    # orphan orderkey, disc < 0, tax < 0
        ],
        "l_orderkey long, l_quantity double, l_discount double, "
        "l_tax double",
    )
    return orders, customer, lineitem


def test_planted_violations_all_detected(dirty):
    orders, customer, lineitem = dirty
    got = {r["check_name"]: (r["n_violations"], r["n_checked"])
           for r in validate_constraints(orders, customer, lineitem).collect()}
    assert got == {
        "orders_orderkey_not_null": (1, 5),
        # 5 rows − 3 distinct non-NULL keys: the dup row AND the
        # NULL-key row both count (a NULL key can't be proven unique;
        # COUNT(DISTINCT) ignores NULLs in both engines)
        "orders_orderkey_unique": (2, 5),
        "orders_totalprice_nonneg": (1, 5),
        "orders_status_domain": (1, 5),
        "customer_custkey_not_null": (0, 3),
        "customer_name_nonempty": (2, 3),   # empty string + NULL
        "lineitem_quantity_range": (2, 4),
        "lineitem_discount_range": (2, 4),
        "lineitem_tax_nonneg": (1, 4),
        "orders_custkey_fk": (1, 5),        # custkey 99
        "lineitem_orderkey_fk": (1, 4),     # orderkey 7
    }


def test_clean_tables_report_zero(spark, sf_dir):
    from parallel_svms_spark.io.sources import load_table
    out = validate_constraints(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "lineitem"),
    ).collect()
    assert len(out) == 11
    assert all(r["n_violations"] == 0 for r in out)
    # n_checked carries the audited population per table
    assert {r["n_checked"] for r in out} == {150, 1500, 6000}


def test_plan_has_no_cartesian_or_python(dirty):
    """The audit is fused scans + key-only joins: no nested-loop /
    cartesian anywhere in the plan, and no Python evaluation."""
    orders, customer, lineitem = dirty
    plan = validate_constraints(orders, customer, lineitem) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dataset_manifest_rollup_consistency(spark, sf_dir):
    """The __all__ row equals the column-sums of the per-source rows
    (counts/volumes) and the global min/max envelope; dup_ppm reacts
    to injected exact duplicates and NULL text is accounted."""
    from pyspark.sql import functions as F

    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators import audit as AU

    docs = load_table(spark, sf_dir, "documents")
    rows = {r.source: r for r in AU.dataset_manifest(docs).collect()}
    allr = rows.pop("__all__")
    assert allr.n_docs == sum(r.n_docs for r in rows.values())
    assert allr.n_tokens == sum(r.n_tokens for r in rows.values())
    assert allr.n_chars == sum(r.n_chars for r in rows.values())
    assert allr.min_tokens == min(r.min_tokens for r in rows.values())
    assert allr.max_tokens == max(r.max_tokens for r in rows.values())
    # inject: one exact dup + one NULL text into a single source
    one = docs.limit(1).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text", "lang",
        "source", "n_chars")
    nul = docs.limit(1).select(
        (F.col("doc_id") + 20_000).alias("doc_id"),
        F.lit(None).cast("string").alias("text"), "lang", "source",
        "n_chars")
    aug = {r.source: r for r in AU.dataset_manifest(
        docs.unionByName(one).unionByName(nul)).collect()}
    src = docs.limit(1).first().source
    assert aug[src].n_null_text == rows[src].n_null_text + 1
    assert aug[src].dup_ppm > rows[src].dup_ppm
    assert aug["__all__"].n_docs == allr.n_docs + 2


def test_dataset_manifest_null_source_and_lang_col(spark, sf_dir):
    """ADVICE r8: a genuinely-NULL source gets its own __null__ row
    (never merged with the grand total), and a schema without a
    language column yields n_langs NULL instead of failing."""
    from pyspark.sql import functions as F

    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators import audit as AU

    docs = load_table(spark, sf_dir, "documents")
    nosrc = docs.limit(3).select(
        (F.col("doc_id") + 30_000).alias("doc_id"), "text", "lang",
        F.lit(None).cast("string").alias("source"), "n_chars")
    rows = {r.source: r for r in AU.dataset_manifest(
        docs.unionByName(nosrc)).collect()}
    assert rows["__null__"].n_docs == 3
    assert rows["__all__"].n_docs == docs.count() + 3
    # exactly one total row: per-source rows + __null__ + __all__
    n_sources = docs.select("source").distinct().count()
    assert len(rows) == n_sources + 2
    # schema without a language column: n_langs is NULL, not an error
    slim = docs.select("doc_id", "text", "source")
    got = {r.source: r for r in AU.dataset_manifest(slim).collect()}
    assert got["__all__"].n_langs is None
    assert got["__all__"].n_docs == docs.count()
    # custom lang_col name is honored
    ren = docs.withColumnRenamed("lang", "language")
    cus = {r.source: r for r in AU.dataset_manifest(
        ren, lang_col="language").collect()}
    assert cus["__all__"].n_langs == rows["__all__"].n_langs


def test_score_drift_identical_distributions_zero(spark, sf_dir):
    """batch == archive ⇒ every smoothed p equals q ⇒ every PSI term
    is exactly 0 (not merely small)."""
    from parallel_svms_spark.operators.audit import score_drift
    from parallel_svms_spark.operators.text import quality_cols
    docs = load_table(spark, sf_dir, "documents")
    score = quality_cols("text")[3]
    rows = score_drift(docs, docs, score, k=10).collect()
    assert len(rows) == 10
    assert all(r.psi_micro == 0 for r in rows)
    assert sum(r.n_archive for r in rows) == docs.count()


def test_score_drift_detects_shift(spark):
    """A shifted batch distribution must light up: archive uniform on
    [0, 100), batch concentrated high — headline PSI far above the
    0.25 'act' convention; buckets partition both sides."""
    from parallel_svms_spark.operators.audit import score_drift
    a = spark.range(1000).select(
        (F.col("id") % 100).cast("double").alias("v"))
    b = spark.range(200).select(
        (90 + F.col("id") % 10).cast("double").alias("v"))
    rows = score_drift(a, b, F.col("v"), k=10).collect()
    assert sum(r.n_archive for r in rows) == 1000
    assert sum(r.n_batch for r in rows) == 200
    assert sum(r.psi_micro for r in rows) > 250_000  # PSI > 0.25
    # the high-score bucket carries the batch mass
    top = max(rows, key=lambda r: r.bucket)
    assert top.n_batch == 200


def test_score_drift_clf_score_composes(spark, sf_dir):
    """Drift monitoring composes with the classifier scorer: the
    frozen artifact's clf_score column drifts like any score — the
    MLOps loop (train day-0, monitor day-N) closes."""
    from parallel_svms_spark.ml.quality import (score_quality,
                                                train_quality_classifier)
    from parallel_svms_spark.operators.audit import score_drift
    docs = load_table(spark, sf_dir, "documents")
    art = train_quality_classifier(docs, dim=32, sample_rows=128)
    scored = score_quality(docs, art)
    rows = score_drift(scored.filter("doc_id % 2 = 0"),
                       scored.filter("doc_id % 2 = 1"),
                       F.col("clf_score"), k=5).collect()
    assert len(rows) == 5
    # even/odd halves of the same corpus: no real drift
    assert abs(sum(r.psi_micro for r in rows)) < 100_000
