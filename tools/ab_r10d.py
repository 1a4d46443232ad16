"""Same-session A/B timings for the r10 session-4 optimizations.

Interleaves OLD (pre-change shape, reproduced inline) and NEW twice
each (min-of-2, bench methodology) in ONE warm session.

  1. dedup_clusters: all-docs label loop (OLD) vs edge-endpoint loop
     + final attach (NEW).
  2. event percentile pair: two independent grouped_exact_percentiles
     machineries (OLD) vs one union-ps pass shared by both members
     (NEW shape).
  3. simjoin_candidates: log_dropped=True build-time count (OLD) vs
     False (NEW).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from parallel_svms_spark.io.sources import load_table  # noqa: E402
from parallel_svms_spark.operators import dedup as D  # noqa: E402
from parallel_svms_spark.operators import events as EV  # noqa: E402
from parallel_svms_spark.operators.partitioning import (  # noqa: E402
    grouped_exact_percentiles)
from parallel_svms_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def clusters_old(documents):
    """Pre-r10d dedup_clusters: labels over ALL docs each round."""
    from parallel_svms_spark.caching import scoped_persist
    pairs = D.ngram_jaccard_pairs(documents, 3, 0.5,
                                  max_doc_freq=1000, log_dropped=False)
    edges = scoped_persist(
        pairs.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("d"))
        .union(pairs.select(F.col("doc_b").alias("s"),
                            F.col("doc_a").alias("d"))))
    lab = documents.select("doc_id", F.col("doc_id").alias("lab")) \
                   .localCheckpoint()
    prev_sum = lab.agg(F.sum("lab")).first()[0]
    for _ in range(50):
        nbr = (edges.join(lab.select(F.col("doc_id").alias("d"),
                                     F.col("lab").alias("nbr_lab")), "d")
               .groupBy("s").agg(F.min("nbr_lab").alias("nbr_lab")))
        lab = (lab.join(nbr.withColumnRenamed("s", "doc_id"),
                        "doc_id", "left")
               .select("doc_id",
                       F.least(F.col("lab"),
                               F.coalesce("nbr_lab", F.col("lab")))
                       .alias("lab"))
               .localCheckpoint())
        cur_sum = lab.agg(F.sum("lab")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return lab.select("doc_id", F.col("lab").alias("cluster_rep"))


def main() -> int:
    spark = get_spark("ab_r10d")
    docs = load_table(spark, SF, "documents")
    events = load_table(spark, SF, "events")
    res: dict[str, float] = {}

    def timed(name, fn, runs=2):
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        res[name] = best

    # warm both plan families once before interleaving
    noop(clusters_old(docs))
    noop(D.dedup_clusters(docs, k=3, threshold=0.5))
    spark.catalog.clearCache()
    timed("clusters OLD", lambda: noop(clusters_old(docs)))
    timed("clusters NEW",
          lambda: noop(D.dedup_clusters(docs, k=3, threshold=0.5)))
    timed("clusters OLD b", lambda: noop(clusters_old(docs)))
    timed("clusters NEW b",
          lambda: noop(D.dedup_clusters(docs, k=3, threshold=0.5)))

    def pct_old():
        noop(EV.winsorize_events(events))
        noop(grouped_exact_percentiles(events, "event_type", "value"))

    def pct_new():
        shared = grouped_exact_percentiles(
            events, "event_type", "value", ps=(0.01, 0.5, 0.9, 0.99))
        noop(EV.winsorize_events(events, thr=shared))
        noop(shared.select("event_type", "n", "p50", "p90", "p99"))

    pct_old(); pct_new(); spark.catalog.clearCache()
    timed("event pcts OLD", pct_old)
    timed("event pcts NEW", pct_new)
    timed("event pcts OLD b", pct_old)
    timed("event pcts NEW b", pct_new)

    sj_old = lambda: noop(D.ngram_jaccard_pairs(docs, k=3, threshold=0.5))
    sj_new = lambda: noop(D.ngram_jaccard_pairs(docs, k=3, threshold=0.5,
                                                log_dropped=False))
    sj_old(); sj_new(); spark.catalog.clearCache()
    timed("simjoin OLD", sj_old)
    timed("simjoin NEW", sj_new)
    timed("simjoin OLD b", sj_old)
    timed("simjoin NEW b", sj_new)

    for k, v in res.items():
        print(f"{k:22s} {v:6.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
