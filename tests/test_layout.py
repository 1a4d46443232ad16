"""Physical-layout operators: Z-order clustering, compaction, and the
exact-k uniform sampler.

The round-trip VALUE checks live in the qkey oracles
(`zorder_roundtrip`, `compaction_roundtrip`, `sample_uniform` — see
tests/test_oracles_all.py); this file pins what the oracles cannot
see: the file-level pruning envelopes, the file-count shrink, and the
sampler's plan + stability contracts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_svms_spark.io.layout import (compact_files,
                                           dataset_file_stats,
                                           files_overlapping,
                                           write_zordered)
from parallel_svms_spark.io.sources import load_table
from parallel_svms_spark.operators.sharding import uniform_sample_exact

SF_MID = "/root/testdata/sf0.01"


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """The Morton layout's per-file envelopes must let a 2-D box
    predicate skip most files, and strictly more than an unclustered
    layout of the same file count skips."""
    ev = load_table(spark, SF_MID, "events")
    zpath, npath = str(tmp_path / "z"), str(tmp_path / "naive")
    write_zordered(ev, zpath, ["user_id", "value"], bits=12, n_files=16)
    # the fixture arrives time-ordered; a straight 16-file rewrite is
    # the layout a naive ingest produces
    ev.repartition(16).write.parquet(npath)

    boxes = {"user_id": (3, 9), "value": (50.0, 200.0)}
    z_hit, z_n = files_overlapping(zpath, boxes)
    n_hit, n_n = files_overlapping(npath, boxes)
    assert z_n == 16 and n_n == 16
    # naive round-robin files all span ~the full value range → ~all hit
    assert z_hit < n_hit
    # the box covers ~5% × ~30% of the 2-D domain; clustered files are
    # contiguous z-ranges, so at most half the files may intersect it
    assert z_hit <= z_n // 2
    # losslessness at file granularity too: same row count back
    assert spark.read.parquet(zpath).count() == ev.count()


def test_zorder_rejects_overflowing_key():
    from parallel_svms_spark.io.layout import zorder_key
    with pytest.raises(ValueError):
        zorder_key([F.lit(0), F.lit(0)], bits=32)  # 64 > 62


def test_compaction_shrinks_files_preserves_rows(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    frag, out = str(tmp_path / "frag"), str(tmp_path / "out")
    docs.repartition(48).write.parquet(frag)
    n_in, _ = dataset_file_stats(frag)
    assert n_in == 48
    n_out = compact_files(spark, frag, out, target_file_bytes=64 << 20)
    assert n_out < n_in
    assert dataset_file_stats(out)[0] == n_out
    back = spark.read.parquet(out)
    # row multiset preserved (doc_id unique in the fixture): equal
    # count + anti-joins empty both ways
    assert back.count() == docs.count()
    assert back.join(docs, ["doc_id"], "left_anti").count() == 0
    assert docs.join(back, ["doc_id"], "left_anti").count() == 0


def test_compaction_coalesce_no_exchange(spark, sf_dir, tmp_path):
    """Compaction must merge splits without shuffling the data."""
    docs = load_table(spark, sf_dir, "documents")
    frag = str(tmp_path / "frag")
    docs.repartition(48).write.parquet(frag)
    plan = (spark.read.parquet(frag).coalesce(2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Coalesce" in plan and "Exchange" not in plan


def test_uniform_sample_exact_contracts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    s50 = uniform_sample_exact(docs, k=50)
    ids50 = {r.doc_id for r in s50.select("doc_id").collect()}
    assert len(ids50) == 50
    # deterministic across runs
    assert ids50 == {r.doc_id
                     for r in uniform_sample_exact(docs, k=50)
                     .select("doc_id").collect()}
    # nested-sample property of a fixed total order: top-50 ⊂ top-80
    ids80 = {r.doc_id for r in uniform_sample_exact(docs, k=80)
             .select("doc_id").collect()}
    assert ids50 < ids80
    # growth stability: md5 order is per-row, so restricting the
    # corpus can only ADD survivors from the retained rows' top-k
    sub = docs.filter("doc_id % 5 != 0")
    ids_sub = {r.doc_id for r in uniform_sample_exact(sub, k=50)
               .select("doc_id").collect()}
    assert {i for i in ids50 if i % 5 != 0} <= ids_sub


def test_zorder_empty_and_constant_inputs(spark, tmp_path):
    """Empty input (NULL min/max) must not crash the stats pass, and a
    constant cluster column must degrade to a no-op dimension."""
    empty = spark.createDataFrame([], "a long, b double")
    p1 = str(tmp_path / "empty")
    write_zordered(empty, p1, ["a", "b"])
    assert spark.read.parquet(p1).count() == 0
    const = spark.createDataFrame([(i, 7.0) for i in range(100)],
                                  "a long, b double")
    p2 = str(tmp_path / "const")
    write_zordered(const, p2, ["a", "b"], bits=8, n_files=4)
    assert spark.read.parquet(p2).count() == 100


def test_weighted_sample_clamps_out_of_range_weights(spark):
    from parallel_svms_spark.operators.sharding import weighted_sample
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    # negative weight = keep nothing (NOT the lpad-truncation
    # keep-everything failure mode)
    assert weighted_sample(df, F.lit(-0.5)).count() == 0
    # NULL and NaN weights drop the row (Spark's least/greatest skip
    # NULLs and order NaN above every double — both would otherwise
    # silently sample at rate 1)
    odd = spark.createDataFrame([(1, None), (2, 1.5),
                                 (3, float("nan"))],
                                "doc_id long, w double")
    kept = weighted_sample(odd, F.col("w")).collect()
    assert [r.doc_id for r in kept] == [2]


def test_uniform_sample_plan_is_take_ordered(spark, sf_dir):
    """sort+limit must fuse into TakeOrderedAndProject — per-task
    top-k heaps, no full sort, no exchange of the data."""
    docs = load_table(spark, sf_dir, "documents")
    plan = (uniform_sample_exact(docs, k=50)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# hash-bucketed tables / exchange-free fact⋈fact join
# ---------------------------------------------------------------------------

def test_bucketed_join_has_no_exchange_on_either_side(spark, sf_dir,
                                                      tmp_path):
    from parallel_svms_spark.io.layout import write_bucketed_table
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed_table(orders, "t_bkt_orders",
                         str(tmp_path / "o"), "o_orderkey", 8)
    write_bucketed_table(li, "t_bkt_lineitem",
                         str(tmp_path / "l"), "l_orderkey", 8)
    bo, bl = spark.table("t_bkt_orders"), spark.table("t_bkt_lineitem")
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bo.join(bl, bo.o_orderkey == bl.l_orderkey) \
              .select("o_orderkey", "l_extendedprice")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # the pre-paid shuffle: co-partitioned bucketed scans feed the
        # join directly — NO Exchange anywhere in the join subtree
        assert "Exchange" not in plan
        # and it computes the same multiset as the plain join
        po = orders.join(li, orders.o_orderkey == li.l_orderkey)
        assert j.count() == po.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        spark.sql("DROP TABLE IF EXISTS t_bkt_orders")
        spark.sql("DROP TABLE IF EXISTS t_bkt_lineitem")


def test_bucketed_table_one_file_per_bucket(spark, sf_dir, tmp_path):
    import os
    from parallel_svms_spark.io.layout import write_bucketed_table
    orders = load_table(spark, sf_dir, "orders")
    write_bucketed_table(orders, "t_bkt_files",
                         str(tmp_path / "b"), "o_orderkey", 8)
    try:
        files = [f for f in os.listdir(tmp_path / "b")
                 if f.endswith(".parquet")]
        assert len(files) == 8  # repartition-by-key ⇒ 1 file/bucket
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_files")


# ---------------------------------------------------------------------------
# CSV codec quoting torture
# ---------------------------------------------------------------------------

def test_csv_roundtrips_quotes_commas_and_unicode(spark, tmp_path):
    from pyspark.sql import types as T
    from parallel_svms_spark.io.sources import read_csv, write_csv
    nasty = [
        (1, 'plain'),
        (2, 'comma, inside'),
        (3, 'quote " inside'),
        (4, '{"json": "va,l\\"ue", "n": 3}'),
        (5, 'trailing space '),
        (6, 'unicode é漢字'),
        (7, None),
    ]
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("payload", T.StringType())])
    df = spark.createDataFrame(nasty, schema)
    path = str(tmp_path / "csv")
    write_csv(df, path)
    back = {r["id"]: r["payload"]
            for r in read_csv(spark, path, schema).collect()}
    assert back == dict(nasty)


def test_split_lake_pruned_read_and_losslessness(spark, sf_dir, tmp_path):
    """write_split_corpus + read_split (r6): the single-split read
    must prune to its directory (PartitionFilters on split) and
    reproduce dataset_split's assignment exactly, schema-unchanged."""
    from pyspark.sql import functions as F

    from parallel_svms_spark.io.sources import (load_table, read_split,
                                                write_split_corpus)
    from parallel_svms_spark.operators.sharding import dataset_split

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "split_lake")
    write_split_corpus(docs, path)

    want = {r.doc_id for r in
            dataset_split(docs).filter(F.col("split") == "valid")
            .collect()}
    back = read_split(spark, path, "valid")
    assert {r.doc_id for r in back.collect()} == want
    assert sorted(back.columns) == sorted(docs.columns)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "split#" in plan.split("PartitionFilters")[1][:120]
    # all three splits together are lossless
    total = sum(read_split(spark, path, s).count()
                for s in ("train", "valid", "test"))
    assert total == docs.count()
