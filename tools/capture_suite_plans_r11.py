"""Capture before/after plans for the r11 suite digest-strategy change.

"before" = the r10 union-plan shape (reconstructed inline — one digest
agg per member unioned into a single frame the caller actions);
"after" = the committed eager-collect `_make_suite_fn` (the returned
frame is the collected digest rows; the members' plans execute inside
the build threads, and the per-member shapes are unchanged — see
plans/r10 for those).

Usage: python tools/capture_suite_plans_r11.py suite [suite ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import __spark_entry__ as E  # noqa: E402
from parallel_svms_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def union_suite_fn(members, all_q):
    """The r10 `_make_suite_fn` body (union of member digest aggs)."""
    from concurrent.futures import ThreadPoolExecutor
    from pyspark.sql import functions as F

    def run(s, d):
        def build(member):
            qkey, exprs = member
            df = all_q[qkey](s, d)
            agg = df.selectExpr(
                "cast(count(*) as bigint) as n_rows",
                *E._digest_exprs(exprs))
            return agg.select(F.lit(qkey).alias("q"), "*")

        E._SUITE_BUILD_SCOPES.append({})
        try:
            workers = min(E._suite_build_threads(s), len(members))
            with ThreadPoolExecutor(max_workers=workers) as pool:
                parts = list(pool.map(build, members))
        finally:
            E._SUITE_BUILD_SCOPES.pop()
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    return run


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main() -> int:
    suites = sys.argv[1:]
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "plans", "r11")
    os.makedirs(here, exist_ok=True)
    spark = get_spark("capture_suite_plans")
    all_q = E.queries_all()
    cur = E.queries()
    for suite in suites:
        old = union_suite_fn(E._SUITES[suite], all_q)(spark, SF)
        with open(os.path.join(here, f"{suite}_before.txt"), "w") as fh:
            fh.write(plan_of(old))
        spark.catalog.clearCache()
        new = cur[suite](spark, SF)
        with open(os.path.join(here, f"{suite}_after.txt"), "w") as fh:
            fh.write(plan_of(new))
        spark.catalog.clearCache()
        print(f"captured {suite}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
