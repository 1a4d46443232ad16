"""Local emulation of the driver's correctness gate.

Runs every ``queries()[qkey]`` on Spark and, where present, the
matching ``oracle_sql()[qkey]`` on DuckDB over the same parquet, then
compares row-count + column names + order-insensitive value multiset.

Usage:  python tools/selfcheck.py [--all] [sf_dir] [qkey ...]

By default this emulates the driver exactly: the curated 50-qkey
``queries()`` surface. ``--all`` switches to the full per-operator
``queries_all()`` registry (full-row hashes; count pinned by the import-time coverage assert).
"""

from __future__ import annotations

import sys
import time
from collections import Counter

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from parallel_svms_spark.io.sources import TABLES  # noqa: E402
from parallel_svms_spark.session import get_spark  # noqa: E402


def norm_cell(v):
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--all"]
    use_all = "--all" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    # the IVF-family oracles rebuild their centroids from parquet at
    # oracle-construction time; point that rebuild at the SAME sf_dir
    # being compared (the driver's own gate runs at the default sf0.01)
    import os
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", sf_dir)
    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    if use_all:
        qs, oracles = entrymod.queries_all(), entrymod.oracle_sql_all()
    else:
        qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        spark.catalog.clearCache()  # drop operator-persisted intermediates
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sm, om = norm_rows(scols, [tuple(r) for r in srows]), norm_rows(ocols, orows)
            if sm != om:
                diff = list((sm - om).items())[:3] + list((om - sm).items())[:3]
                problems.append(f"values differ, e.g. {diff}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
