"""A/B (r11, bench-faithful): suite strategies under run_once semantics
(min-of-2 per query, NO clearCache between a query's two runs,
clearCache after — exactly bench.py's loop).

Variants:
  A  union-action (committed r10 shape)
  B  eager per-member digest collect, caches left to the caller
  C  eager per-member digest collect inside cache_scope() —
     zero blocks survive the call (VERDICT r10 #5 hygiene)

Usage: python tools/ab_r11b.py [suite ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import __spark_entry__ as E  # noqa: E402
from parallel_svms_spark.caching import cache_scope  # noqa: E402
from parallel_svms_spark.session import get_spark  # noqa: E402
from tools.ab_r11a import make_eager_suite_fn  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = ["neardup_suite", "span_suite", "sampling_suite", "ml_suite",
           "dedup_exact_suite", "event_suite", "decontaminate_suite"]


def scoped(fn):
    def run(s, d):
        with cache_scope():
            return fn(s, d)
    return run


def bench_like(spark, fn):
    """run_once × 2, min — bench.py's per-query methodology."""
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        df = fn(spark, SF)
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    spark.catalog.clearCache()
    return best


def main() -> int:
    suites = sys.argv[1:] or DEFAULT
    spark = get_spark("ab_r11b")
    all_q = E.queries_all()
    cur = E.queries()
    # one throwaway pass to warm the JVM/codegen before any timing
    bench_like(spark, cur[suites[0]])
    for suite in suites:
        members = E._SUITES[suite]
        variants = {
            "A union": cur[suite],
            "B eager": make_eager_suite_fn(members, all_q),
            "C eager+scope": scoped(make_eager_suite_fn(members, all_q)),
        }
        res = {k: bench_like(spark, fn) for k, fn in variants.items()}
        # second interleaved round, keep min
        for k, fn in variants.items():
            res[k] = min(res[k], bench_like(spark, fn))
        print(f"{suite:22s} " + "  ".join(
            f"{k} {v:6.2f}s" for k, v in res.items()))
        n_blocks = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
        if n_blocks:
            print(f"   !! {n_blocks} persistent RDDs left after clearCache")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
