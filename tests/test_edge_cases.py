"""Edge-case hardening: empty inputs, degenerate docs, and a
property-based check of the sparse codec's float round-trip claim
(parse(encode(x)) must reproduce doubles EXACTLY — the parse_sparse
oracle depends on it).
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from parallel_svms_spark.io.sources import parse_sparse_lines, to_sparse_lines
from parallel_svms_spark.operators import dedup as D
from parallel_svms_spark.operators import similarity as S


def test_dedup_family_handles_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert D.exact_dedup_keys(empty).count() == 0
    assert D.ngram_jaccard_pairs(empty, threshold=0.5).count() == 0
    assert D.minhash_near_dups(empty, threshold=0.5).count() == 0
    assert D.simhash_near_dups(empty).count() == 0


def test_similarity_handles_empty_and_single_row(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert S.cosine_near_dup_blocked(empty, threshold=0.5).count() == 0
    one = spark.createDataFrame([(0, [1.0, 0.0])],
                                "vec_id long, embedding array<float>")
    assert S.cosine_near_dup_blocked(one, threshold=0.5).count() == 0
    assert S.topk_cosine(one, [1.0, 0.0], k=10).count() == 1


def test_jaccard_single_and_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d")], "doc_id long, text string")
    rows = D.ngram_jaccard_pairs(df, k=3, threshold=0.5).collect()
    assert [(r.doc_a, r.doc_b, r.jaccard) for r in rows] == [(1, 2, 1.0)]
    single = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    assert D.ngram_jaccard_pairs(single, threshold=0.5).count() == 0


# finite doubles excluding subnormals Spark/py repr edge (they still
# round-trip, but keep the strategy in the range real features live in)
_floats = st.floats(min_value=-1e12, max_value=1e12,
                    allow_nan=False, allow_infinity=False)


@settings(max_examples=20, deadline=None)
@given(st.lists(_floats, min_size=1, max_size=8), st.integers(0, 9))
def test_sparse_codec_roundtrip_property(spark, values, label):
    df = spark.createDataFrame([(label, values)],
                               "label int, embedding array<double>")
    parsed = parse_sparse_lines(to_sparse_lines(df, min_abs=0.0)).first()
    assert parsed.label == float(label)
    got = [parsed.features.get(i + 1, 0.0) for i in range(len(values))]
    for a, b in zip(got, values):
        assert a == b or (math.isnan(a) and math.isnan(b)), (a, b)


def test_exchange_by_bucket_physical_layout(spark, sf_dir, tmp_path):
    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators import partitioning as X
    emb = load_table(spark, sf_dir, "embeddings")
    b = X.balanced_buckets(emb, 4)
    out = str(tmp_path / "bybucket")
    X.exchange_by_bucket(b, 4).write.partitionBy("bucket") \
        .mode("overwrite").parquet(out)
    import glob
    dirs = sorted(p.rsplit("=", 1)[1] for p in glob.glob(f"{out}/bucket=*"))
    assert dirs == ["0", "1", "2", "3"]
    back = spark.read.parquet(out)
    assert back.count() == emb.count()


def test_r4_operators_handle_empty_input(spark):
    from parallel_svms_spark.operators import events as E
    from parallel_svms_spark.operators import text as TX

    no_events = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string")
    # funnel on zero events: all stages exist with zero users
    got = {r.step: r.n_users for r in E.funnel(no_events).collect()}
    assert got == {"view": 0, "click": 0, "purchase": 0}
    assert E.retention_cohorts(no_events).count() == 0

    no_docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, "
            "n_chars long")
    assert TX.boilerplate_score(no_docs).count() == 0
    assert TX.quality_filter(no_docs).count() == 0

    from parallel_svms_spark.operators import dedup as D2
    some = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    # empty corpus: everything in the batch is new
    assert D2.dedup_against(no_docs.select("doc_id", "text"),
                            some).count() == 1
    # empty batch: nothing survives, nothing crashes
    assert D2.dedup_against(some, no_docs.select("doc_id", "text")
                            ).count() == 0


def test_ivf_near_dup_single_vector_and_tiny_input(spark):
    one = spark.createDataFrame([(0, [1.0, 0.0])],
                                "vec_id long, embedding array<float>")
    assert S.cosine_near_dup_ivf(one, threshold=0.5).count() == 0
    # n < n_lists: every vector its own (or a shared) cluster — the
    # duplicated pair must still surface
    few = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>")
    got = {(r.vec_a, r.vec_b) for r in
           S.cosine_near_dup_ivf(few, threshold=0.99).collect()}
    assert got == {(0, 1)}
