"""r10 pipeline rewrites: the self-semi-join → keep-predicate filter
in pipeline_curate / pipeline_pretrain must be row-identical to the
old shape (a semi-join against a pure per-row filter of the SAME
frame, keyed on unique ids, is the filter)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from parallel_svms_spark.io.sources import load_table
from parallel_svms_spark.operators import contamination as CN
from parallel_svms_spark.operators import dedup as D
from parallel_svms_spark.operators import sharding as SH
from parallel_svms_spark.operators import text as TX


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _same_rows(a, b):
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_rate_threshold_hex_literals():
    """ADVICE r10: anchor the shared threshold helper against
    hard-coded hex literals so the sampler-equivalence tests are not
    tautological (both sides otherwise share _rate_threshold_hex)."""
    assert SH._rate_threshold_hex(0.5) == "80000000"
    assert SH._rate_threshold_hex(0.25) == "40000000"
    assert SH._rate_threshold_hex(0.0) == "00000000"
    assert SH._rate_threshold_hex(1.0) == "ffffffff"  # clamped to max
    assert SH._rate_threshold_hex(0.9) == "e6666666"


def test_pipeline_keep_col_rewrite_id_uniqueness_precondition(docs):
    """ADVICE r10: the semi-join → keep-predicate rewrite in
    pipeline_curate/pipeline_pretrain is row-identical ONLY when
    doc_id is unique in the filtered frame (with duplicate ids the old
    semi-join would keep every row sharing a passing id). Assert the
    precondition holds where the rewrite applies: both pipelines
    filter a deduped frame."""
    kept = TX.quality_filter(docs, keep_frac=0.5).select("doc_id")
    deduped_curate = D.exact_dedup(docs.join(kept, "doc_id", "left_semi"))
    assert (deduped_curate.groupBy("doc_id").count()
            .agg(F.max("count")).first()[0] or 0) <= 1
    clean = CN.decontaminate_splits(docs, k=4)
    deduped_pretrain = clean.join(
        D.exact_dedup_keys_normalized(clean), "doc_id", "left_semi")
    assert (deduped_pretrain.groupBy("doc_id").count()
            .agg(F.max("count")).first()[0] or 0) <= 1


def test_mixture_keep_col_is_the_sampler(docs):
    rates = {"src0": 0.9, "src2": 0.2}
    old = docs.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
        < F.when(F.col("source") == "src2", F.lit(SH._rate_threshold_hex(0.2)))
        .otherwise(F.when(F.col("source") == "src0",
                          F.lit(SH._rate_threshold_hex(0.9)))
                   .otherwise(F.lit(SH._rate_threshold_hex(0.4))))
    ).select("doc_id", "source")
    new = SH.mixture_sample_hash(docs, rates=rates, default_rate=0.4)
    _same_rows(old, new)


def test_weighted_keep_col_is_the_sampler(docs):
    w = F.col("n_chars") / F.lit(700.0)
    _same_rows(SH.weighted_sample(docs, weight=w),
               docs.filter(SH.weighted_keep_col(w)))


def test_pipeline_curate_filter_equals_semi_join(spark, sf_dir, docs):
    kept = TX.quality_filter(docs, keep_frac=0.5).select("doc_id")
    curated = docs.join(kept, "doc_id", "left_semi")
    deduped = D.exact_dedup(curated)
    mixed = SH.mixture_sample_hash(deduped, default_rate=0.5)
    old = SH.pack_shards(
        deduped.join(mixed.select("doc_id"), "doc_id", "left_semi"),
        budget_tokens=2048)
    _same_rows(old, E._pipeline_curate(spark, sf_dir))


def test_pipeline_pretrain_filter_equals_semi_join(spark, sf_dir, docs):
    clean = CN.decontaminate_splits(docs, k=4)
    keys = D.exact_dedup_keys_normalized(clean)
    deduped = clean.join(keys, "doc_id", "left_semi")
    sampled = SH.weighted_sample(
        deduped.select("doc_id", "source", "n_chars"),
        weight=F.col("n_chars") / F.lit(2000.0))
    old = SH.pack_shards(
        deduped.join(sampled.select("doc_id"), "doc_id", "left_semi"),
        budget_tokens=2048, order="hash")
    _same_rows(old, E._pipeline_pretrain(spark, sf_dir))
