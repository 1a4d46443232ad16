"""Physical-plan regression tests: lock in the scale properties the
operators were designed around (pushdown, pruning, join strategy,
shuffle count). A refactor that silently reintroduces a cartesian
product, a driver broadcast of corpus-sized data, or a full-column
scan should fail HERE, at sf0.001, not at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_svms_spark.io.sources import load_table
from parallel_svms_spark.operators import dedup as D
from parallel_svms_spark.operators import similarity as S


def phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_filter_and_projection_reach_parquet_scan(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    q = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    p = phys(q)
    assert "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]" in p
    # column pruning: the scan must read exactly the two needed columns
    assert "ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string>" in p


def test_blocked_near_dup_single_shuffle_and_broadcast_tasks(emb):
    p = phys(S.cosine_near_dup_blocked(emb, threshold=0.4))
    # the tiny block-pair task table must broadcast; the data must NOT
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # exactly ONE real exchange: the (ta, tb) grouping for the tiles
    n_shuffles = p.count("Exchange hashpartitioning")
    assert n_shuffles == 1, f"expected 1 shuffle, plan had {n_shuffles}"


def test_jaccard_join_never_cartesian_or_corpus_broadcast(docs):
    p = phys(D.ngram_jaccard_pairs(docs, k=3, threshold=0.5))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # verify joins are pinned shuffle_hash (broadcast of post-explode
    # sides was the observed driver-OOM failure mode)
    assert "ShuffledHashJoin" in p


def test_minhash_pipeline_join_strategy(docs):
    p = phys(D.minhash_near_dups(docs, threshold=0.5))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "ShuffledHashJoin" in p


def test_exact_dedup_scan_prunes_to_needed_columns(docs):
    p = phys(D.exact_dedup_keys(docs))
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p


def test_bucketed_tables_join_with_zero_exchange(spark, sf_dir):
    from parallel_svms_spark.io.sources import load_table, write_bucketed
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
    write_bucketed(lineitem, "b_lineitem", "l_orderkey", n_buckets=8)
    try:
        j = (spark.table("b_lineitem")
             .join(spark.table("b_orders"),
                   F.col("l_orderkey") == F.col("o_orderkey"))
             .select("l_orderkey", "o_orderstatus"))
        p = phys(j)
        # both scans read pre-bucketed data: the equi-join plans with
        # NO shuffle on either side (SortMergeJoin over bucketed scans)
        assert "Exchange hashpartitioning" not in p, p
        assert j.count() == lineitem.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
