"""Same-session A/B + plan capture for the r10 session-5 pipeline
rewrites: pipeline_curate / pipeline_pretrain self-semi-join (OLD,
reproduced inline) vs direct keep-predicate filter (NEW, the
committed shape). Interleaved min-of-2 per arm, full qkey timed
(stage build + noop of the packed output). Also asserts row-set
equivalence of OLD vs NEW (exceptAll both ways on the packed output)
and writes the pre-pack stage plans to plans/r10/.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from parallel_svms_spark.io.sources import load_table  # noqa: E402
from parallel_svms_spark.operators import dedup as D  # noqa: E402
from parallel_svms_spark.operators import sharding as SH  # noqa: E402
from parallel_svms_spark.operators import text as TX  # noqa: E402
from parallel_svms_spark.operators import contamination as CN  # noqa: E402
from parallel_svms_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "..", "plans", "r10")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def curate_old_final(docs):
    kept = TX.quality_filter(docs, keep_frac=0.5).select("doc_id")
    curated = docs.join(kept, "doc_id", "left_semi")
    deduped = D.exact_dedup(curated)
    mixed = SH.mixture_sample_hash(deduped, default_rate=0.5)
    return deduped.join(mixed.select("doc_id"), "doc_id", "left_semi")


def curate_new_final(docs):
    kept = TX.quality_filter(docs, keep_frac=0.5).select("doc_id")
    curated = docs.join(kept, "doc_id", "left_semi")
    deduped = D.exact_dedup(curated)
    return deduped.filter(SH.mixture_keep_col(default_rate=0.5))


def pretrain_old_final(docs):
    clean = CN.decontaminate_splits(docs, k=4)
    keys = D.exact_dedup_keys_normalized(clean)
    deduped = clean.join(keys, "doc_id", "left_semi")
    sampled = SH.weighted_sample(
        deduped.select("doc_id", "source", "n_chars"),
        weight=F.col("n_chars") / F.lit(2000.0))
    return deduped.join(sampled.select("doc_id"), "doc_id", "left_semi")


def main() -> int:
    spark = get_spark("ab_r10e")
    docs = load_table(spark, SF, "documents")
    res: dict[str, float] = {}

    def timed(name, fn, runs=2):
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        res[name] = best

    # equivalence: packed output row sets identical both ways
    old_c = SH.pack_shards(curate_old_final(docs), budget_tokens=2048)
    new_c = E._pipeline_curate(spark, SF)
    assert old_c.exceptAll(new_c).count() == 0
    assert new_c.exceptAll(old_c).count() == 0
    print("curate OLD == NEW (packed rows)", flush=True)
    old_p = SH.pack_shards(pretrain_old_final(docs), budget_tokens=2048,
                           order="hash")
    new_p = E._pipeline_pretrain(spark, SF)
    assert old_p.exceptAll(new_p).count() == 0
    assert new_p.exceptAll(old_p).count() == 0
    print("pretrain OLD == NEW (packed rows)", flush=True)
    spark.catalog.clearCache()

    # stage plans (the full qkey's explain is truncated at
    # pack_shards' localCheckpoint, so the evidence is the pre-pack
    # stage: the semi-join's duplicated subtree vs the single filter)
    def pretrain_new_final(dd):
        clean = CN.decontaminate_splits(dd, k=4)
        keys = D.exact_dedup_keys_normalized(clean)
        deduped = clean.join(keys, "doc_id", "left_semi")
        return deduped.filter(SH.weighted_keep_col(
            F.col("n_chars") / F.lit(2000.0)))

    for tag, df in (("pipeline_curate_stage_before", curate_old_final(docs)),
                    ("pipeline_curate_stage_after", curate_new_final(docs)),
                    ("pipeline_pretrain_stage_before",
                     pretrain_old_final(docs)),
                    ("pipeline_pretrain_stage_after",
                     pretrain_new_final(docs))):
        with open(os.path.join(PLANS, f"{tag}.txt"), "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))

    co = lambda: noop(SH.pack_shards(curate_old_final(docs),
                                     budget_tokens=2048))
    cn = lambda: noop(E._pipeline_curate(spark, SF))
    po = lambda: noop(SH.pack_shards(pretrain_old_final(docs),
                                     budget_tokens=2048, order="hash"))
    pn = lambda: noop(E._pipeline_pretrain(spark, SF))
    co(); cn(); po(); pn(); spark.catalog.clearCache()  # warm both shapes
    timed("curate OLD", co)
    timed("curate NEW", cn)
    timed("curate OLD b", co)
    timed("curate NEW b", cn)
    timed("pretrain OLD", po)
    timed("pretrain NEW", pn)
    timed("pretrain OLD b", po)
    timed("pretrain NEW b", pn)
    for k, v in res.items():
        print(f"{k:16s} {v:6.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
