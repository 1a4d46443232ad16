"""Capture .explain('formatted') for named per-operator qkeys into
plans/<tag>/<qkey>_<suffix>.txt — the optimization round's plan-diff
evidence (guide §1 / §7.2). Usage:

    python tools/capture_plans.py <tag> <suffix> qkey [qkey ...]

Plans are captured from queries_all() members (the operator granularity
the suites aggregate). Queries whose fn performs eager work (ML trains)
still produce the plan of the RETURNED frame, which is what executes in
the suite digest.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> int:
    tag, suffix, *keys = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "plans", tag)
    os.makedirs(here, exist_ok=True)
    import __spark_entry__ as entrymod
    from parallel_svms_spark.session import get_spark
    spark = get_spark("capture_plans")
    qs = entrymod.queries_all()
    for key in keys:
        df = qs[key](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(here, f"{key}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"captured {key} ({len(plan)} chars)")
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
