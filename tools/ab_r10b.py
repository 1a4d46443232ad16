"""Same-session A/B timings for the r10 session-2 optimizations.

Each pair interleaves OLD and NEW twice (min-of-2, bench methodology)
in ONE warm session, so JVM/codegen state and host noise hit both
variants equally. OLD variants are reproduced inline by passing the
unpersisted index explicitly (the exact pre-change plan) or by
replaying the pre-change action sequence.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from parallel_svms_spark.session import get_spark  # noqa: E402
from parallel_svms_spark.io.sources import load_table  # noqa: E402
from parallel_svms_spark.operators import dedup as D  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def min2(spark, fn):
    best = float("inf")
    for _ in range(2):
        best = min(best, fn())
        spark.catalog.clearCache()
    return best


def main():
    spark = get_spark("ab_r10b")
    docs = load_table(spark, SF, "documents")
    corpus = docs.filter("doc_id % 7 != 0")
    batch = docs.filter("doc_id % 7 = 0")

    results = {}

    # -- winnow_near_dups_incremental: persisted fixture index (NEW)
    #    vs unpersisted index arg (OLD plan shape)
    old = lambda: noop(D.winnow_near_dups_incremental(
        corpus, batch, index=D.winnow_index(corpus, 3, 4)))
    new = lambda: noop(D.winnow_near_dups_incremental(corpus, batch))
    results["winnow_inc OLD"] = min2(spark, old)
    results["winnow_inc NEW"] = min2(spark, new)

    # -- editdist_passjoin_incremental
    old = lambda: noop(D.editdist_passjoin_incremental(
        corpus, batch, max_dist=3,
        index=D.editdist_index(corpus, max_dist=3)))
    new = lambda: noop(D.editdist_passjoin_incremental(
        corpus, batch, max_dist=3))
    results["editdist_inc OLD"] = min2(spark, old)
    results["editdist_inc NEW"] = min2(spark, new)

    # -- simhash_near_dups_incremental: NEW persists sigs_new inside;
    #    OLD shape = hand-inlined pre-change body
    def simhash_old():
        sigs_old = D.simhash_index(corpus)
        sigs_new = D.simhash(batch)
        bn = D._simhash_blocks(sigs_new, 4)
        bo = D._simhash_blocks(sigs_old, 4)
        cross = (bn.select(F.col("doc_id").alias("bid"),
                           F.col("simhash").alias("bsig"), "blk", "val")
                 .join(bo.select(F.col("doc_id").alias("aid"),
                                 F.col("simhash").alias("asig"),
                                 "blk", "val"), ["blk", "val"])
                 .filter(F.col("bid") != F.col("aid"))
                 .select(F.least("bid", "aid").alias("doc_a"),
                         F.when(F.col("bid") < F.col("aid"), F.col("bsig"))
                         .otherwise(F.col("asig")).alias("sig_a"),
                         F.greatest("bid", "aid").alias("doc_b"),
                         F.when(F.col("bid") < F.col("aid"), F.col("asig"))
                         .otherwise(F.col("bsig")).alias("sig_b"))
                 .distinct())
        hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        cross_pairs = (cross.withColumn("hamming", hamming)
                       .filter(F.col("hamming") <= 3)
                       .select("doc_a", "doc_b", "hamming"))
        within = D._simhash_pairs(sigs_new, 3, 4)
        return noop(cross_pairs.unionByName(within).distinct())

    results["simhash_inc OLD"] = min2(spark, simhash_old)
    results["simhash_inc NEW"] = min2(
        spark, lambda: noop(D.simhash_near_dups_incremental(
            corpus, batch, max_hamming=3)))

    # -- ensemble incremental (composes all three members)
    results["ensemble_inc NEW"] = min2(
        spark, lambda: noop(D.ensemble_near_dups_incremental(
            corpus, batch, min_votes=2)))

    # -- pipeline_daily_ingest: OLD = chain without the fresh persist
    import __spark_entry__ as E
    from parallel_svms_spark.operators import audit as AU

    def daily_old():
        d = load_table(spark, SF, "documents").filter("text is not null")
        archive = d.filter("source <> 'src0'")
        b = d.filter("source = 'src0'")
        fresh = D.dedup_against(archive, b)
        scrubbed = D.scrub_repeated_spans_incremental(archive, fresh)
        day = (scrubbed.join(fresh.select("doc_id", "lang"), "doc_id")
               .select("doc_id", F.col("clean_text").alias("text"),
                       "lang", F.lit("src0").alias("source")))
        return noop(AU.dataset_manifest(day))

    results["daily_ingest OLD"] = min2(spark, daily_old)
    results["daily_ingest NEW"] = min2(
        spark, lambda: noop(E.queries_all()["pipeline_daily_ingest"](
            spark, SF)))

    # -- svm_linear_ovr: OLD = two actions, NEW = one agg
    from parallel_svms_spark.ml.mllib_path import (predict_linear_ovr,
                                                   train_linear_ovr)
    emb = load_table(spark, SF, "embeddings")

    def ovr_old():
        t0 = time.perf_counter()
        model = train_linear_ovr(emb, max_iter=5)
        pred = predict_linear_ovr(model, emb)
        a = pred.count()
        b = pred.select("pred").distinct().count()
        assert a and b
        return time.perf_counter() - t0

    def ovr_new():
        t0 = time.perf_counter()
        df = E.queries_all()["svm_linear_ovr"](spark, SF)
        df.collect()
        return time.perf_counter() - t0

    results["svm_linear_ovr OLD"] = min2(spark, ovr_old)
    results["svm_linear_ovr NEW"] = min2(spark, ovr_new)

    for k, v in results.items():
        print(f"{k:24s} {v:7.3f}s")


if __name__ == "__main__":
    main()
