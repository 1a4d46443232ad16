"""Relational core (SURVEY §2.1-§2.6 qkeys) on the sf0.001 fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from parallel_svms_spark.io.sources import (
    load_table, parse_dense_lines, to_dense_lines,
)
from parallel_svms_spark.operators import partitioning as X
from parallel_svms_spark.operators import relational as R


def test_scan_and_counts(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    assert R.scan_count(li).collect()[0].n_rows == 6000
    assert R.agg_count(li).collect()[0].total_record_count == 6000


def test_groupby_count_balanced_classes(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = R.agg_groupby_count(emb).collect()
    counts = {r.label: r.class_count for r in rows}
    assert set(counts) == set(range(10))
    assert sum(counts.values()) == 500
    assert all(40 <= c <= 65 for c in counts.values())  # near-balanced


def test_proj_and_parse_roundtrip(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    proj = R.proj_label(emb)
    joined = proj.join(emb, "vec_id")
    assert joined.filter(F.col("parsed_label") != F.col("label")).count() == 0
    parsed = R.parse_project(emb)
    assert parsed.filter(F.col("n_features") != 64).count() == 0


def test_dense_csv_codec_roundtrip(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    lines = to_dense_lines(emb, "label", "embedding")
    back = parse_dense_lines(lines)
    assert back.count() == 500
    orig_sum = emb.select(
        F.sum(F.aggregate(F.col("embedding").cast("array<double>"),
                          F.lit(0.0), lambda a, x: a + x))).collect()[0][0]
    back_sum = back.select(
        F.sum(F.aggregate("features", F.lit(0.0), lambda a, x: a + x))
    ).collect()[0][0]
    assert abs(orig_sum - back_sum) < 1e-9


def test_semijoin_vs_filter_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    semi = R.filter_semijoin(li, orders)
    expected = (li.join(orders, li.l_orderkey == orders.o_orderkey)
                  .filter(F.col("o_orderstatus") == "F").count())
    assert semi.count() == expected


def test_anti_join_disjoint_from_semi(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    anti = R.dedup_anti(cust, orders)
    with_orders = cust.join(orders, cust.c_custkey == orders.o_custkey,
                            "left_semi")
    assert anti.count() + with_orders.count() == cust.count()


def test_balanced_buckets_mod_exact_balance(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    b = X.balanced_buckets(emb, 8)  # vec_id 0..499 dense
    counts = [r.subset_count for r in X.agg_bucket_count(b).collect()]
    assert len(counts) == 8
    assert max(counts) - min(counts) <= 1  # exact balance on dense ids


def test_balanced_buckets_hash_approx_balance(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "rid", F.monotonically_increasing_id())
    b = X.balanced_buckets(li, 16, key="rid", strategy="hash")
    counts = [r.subset_count for r in X.agg_bucket_count(b).collect()]
    assert len(counts) == 16
    mean = sum(counts) / len(counts)
    assert all(abs(c - mean) < 0.25 * mean for c in counts)


def test_merge_pairs_halves(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    b = X.balanced_buckets(emb, 8)
    merged = X.halve_buckets_count(b).collect()
    assert sorted(r.bucket for r in merged) == [0, 1, 2, 3]
    assert sum(r.merged_count for r in merged) == 500


def test_set_ops(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    u = R.set_union(orders)
    n_u = orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).count()
    assert u.count() == n_u
    ex = R.set_except(li, orders)
    finished = set(r.o_orderkey for r in
                   orders.filter("o_orderstatus = 'F'").collect())
    got = set(r.okey for r in ex.collect())
    assert not (got & finished)


def test_eval_confusion_total(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    conf = R.eval_confusion(emb)
    assert conf.agg(F.sum("n")).collect()[0][0] == 500


def test_balanced_buckets_stratified_per_class_balance(spark, sf_dir):
    from parallel_svms_spark.io.sources import load_table
    emb = load_table(spark, sf_dir, "embeddings")
    b = X.balanced_buckets(emb, 8, strategy="stratified")
    hist = (b.groupBy("label", "bucket").count()
            .groupBy("label")
            .agg(F.max("count").alias("mx"), F.min("count").alias("mn"))
            .collect())
    assert len(hist) == emb.select("label").distinct().count()
    for r in hist:
        assert r.mx - r.mn <= 1, f"label {r.label}: {r.mn}..{r.mx}"


def test_merge_upsert_semantics(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    updates = (docs.filter("doc_id % 7 = 0")
               .withColumn("n_chars", F.col("n_chars") + 1000))
    new_row = (docs.limit(1)
               .withColumn("doc_id", F.lit(10_000_000).cast("long")))
    merged = R.merge_upsert(docs, updates.unionByName(new_row))
    assert merged.count() == n + 1  # updates replace, the new key inserts
    # every updated key carries the update's value, not the target's
    bumped = merged.filter("doc_id % 7 = 0 AND doc_id < 10000000")
    orig = docs.filter("doc_id % 7 = 0").agg(F.sum("n_chars")).collect()[0][0]
    got = bumped.agg(F.sum("n_chars")).collect()[0][0]
    assert got == orig + 1000 * bumped.count()
    # keys must stay unique after the merge
    assert merged.select("doc_id").distinct().count() == n + 1
