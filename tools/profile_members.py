"""Per-member phase-split profiler (r10 session-4 measurement tool).

For each suite named on the command line, one warm session times each
member's registry query: plan BUILD time (fn call — driver-side
collects/trainings happen here) vs noop EXEC time, min-of-2 per the
bench methodology, plus the suite action itself. Run on a quiet host;
all comparisons stay within this one session.

Usage: python tools/profile_members.py neardup_suite event_suite ...
       (no args = the current top suites)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import __spark_entry__ as E  # noqa: E402
from parallel_svms_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = ["neardup_suite", "sampling_suite", "event_suite",
           "text_stats_suite", "quality_suite", "dedup_exact_suite",
           "span_suite", "lm_suite", "roundtrip_suite",
           "decontaminate_suite", "embedding_dedup_suite", "ml_suite"]


def main() -> int:
    suites = sys.argv[1:] or DEFAULT
    spark = get_spark("profile_members")
    qall = E.queries_all()
    for suite in suites:
        members = E._SUITES.get(suite)
        if members is None:
            print(f"!! {suite}: not a suite")
            continue
        print(f"== {suite} ({len(members)} members)")
        for qkey, _ in members:
            best_b = best_x = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                df = qall[qkey](spark, SF)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                best_b = min(best_b, t1 - t0)
                best_x = min(best_x, t2 - t1)
                spark.catalog.clearCache()
            print(f"  {qkey:38s} build {best_b:6.2f}s  exec {best_x:6.2f}s")
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            E.queries()[suite](spark, SF).write.format("noop") \
                .mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(f"  -- suite action: {best:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
