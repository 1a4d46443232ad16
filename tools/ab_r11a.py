"""A/B (r11): suite digest strategy — one union-plan noop action vs
per-member threaded digest collection.

Today `_make_suite_fn` builds every member's 1-row digest agg, unions
them, and the CALLER's single action executes the union (AQE
materializes member stages with some concurrency, but the union plan
is planned as one giant query and the final stage waits on all).

Variant B collects each member's single digest row INSIDE its build
thread (full member-level job overlap, member execution starts the
moment its build finishes, per-member planning instead of one giant
union plan) and returns a local DataFrame of the identical rows.

Interleaved min-of-N in ONE warm session (the r10 lesson: never
compare across sessions). Usage:
    python tools/ab_r11a.py [suite ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import __spark_entry__ as E  # noqa: E402
from parallel_svms_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("AB_ROUNDS", "2"))

DEFAULT = ["neardup_suite", "span_suite", "sampling_suite",
           "dedup_exact_suite", "event_suite", "decontaminate_suite"]


def make_eager_suite_fn(members, all_q):
    """Variant B: per-member digest rows collected in the build pool."""
    from concurrent.futures import ThreadPoolExecutor
    from pyspark.sql import functions as F

    def run(s, d):
        schema_holder = {}

        def build(member):
            qkey, exprs = member
            df = all_q[qkey](s, d)
            agg = df.selectExpr(
                "cast(count(*) as bigint) as n_rows",
                *E._digest_exprs(exprs)).select(
                F.lit(qkey).alias("q"), "*")
            schema_holder.setdefault("schema", agg.schema)
            return agg.collect()[0]

        E._SUITE_BUILD_SCOPES.append({})
        try:
            if len(members) > 1:
                workers = min(E._suite_build_threads(s), len(members))
                with ThreadPoolExecutor(max_workers=workers) as pool:
                    rows = list(pool.map(build, members))
            else:
                rows = [build(members[0])]
        finally:
            E._SUITE_BUILD_SCOPES.pop()
        return s.createDataFrame(rows, schema_holder["schema"])

    return run


def timed(spark, fn):
    t0 = time.perf_counter()
    df = fn(spark, SF)
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    return dt


def main() -> int:
    suites = sys.argv[1:] or DEFAULT
    spark = get_spark("ab_r11a")
    all_q = E.queries_all()
    cur = E.queries()
    for suite in suites:
        members = E._SUITES[suite]
        old_fn = cur[suite]
        new_fn = make_eager_suite_fn(members, all_q)
        # row-identity spot check once per suite (order + values)
        a = [tuple(r) for r in old_fn(spark, SF).collect()]
        spark.catalog.clearCache()
        b = [tuple(r) for r in new_fn(spark, SF).collect()]
        spark.catalog.clearCache()
        assert a == b, f"{suite}: digest rows differ!\nA={a}\nB={b}"
        olds, news = [], []
        for _ in range(ROUNDS):
            olds.append(timed(spark, old_fn))
            news.append(timed(spark, new_fn))
        print(f"{suite:24s} union-action {min(olds):6.2f}s  "
              f"eager-collect {min(news):6.2f}s   "
              f"(all: {['%.2f' % t for t in olds]} vs "
              f"{['%.2f' % t for t in news]})")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
