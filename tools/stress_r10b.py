"""One-off stress legs for the r10 session-2 operators
(redact_pii / pii_audit / mixture_sample_temperature /
dedup_ensemble) at 10x and 20x replicated sf0.1 documents —
appends a ``stress_r10b`` block to BENCH_STRESS.json.

The slope question per op:
- redact_pii / pii_audit: pure codegen'd regex scans — must be
  linear (scan-bound), no exchange of corpus rows.
- mixture_sample_temperature: one map-side mass agg + broadcast
  join — linear, and the |sources|-row rate table is scale-free.
- dedup_ensemble: strictly the sum of the three family plans plus a
  pair-set-sized aggregation; the families' slopes are already
  recorded (dedup_minhash / dedup_editdist / simhash legs), so the
  leg checks the vote stage adds no super-linear tail.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import stress as stress_mod  # noqa: E402

from parallel_svms_spark.operators import dedup as D  # noqa: E402
from parallel_svms_spark.operators import sharding as SH  # noqa: E402
from parallel_svms_spark.operators.privacy import (  # noqa: E402
    pii_audit, redact_pii)
from parallel_svms_spark.session import get_spark  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent))


def probe() -> float:
    t = time.time()
    acc = 0
    for i in range(2_000_000):
        acc += i * i % 7
    return round(time.time() - t, 4)


def main() -> None:
    spark = get_spark("stress-r10b")
    out: dict = {"probe_sec": probe(), "legs": {}}
    for mult in (10, 20):
        docs_path, _ = stress_mod.build(spark, mult, 25)
        docs = spark.read.parquet(docs_path)
        legs = {}

        t = time.time()
        n = redact_pii(docs, ["text"]).agg(
            {"n_redacted": "sum"}).collect()[0][0]
        legs["redact_pii"] = {"rows_in": docs.count(),
                              "sum_redacted": int(n or 0),
                              "sec": round(time.time() - t, 2)}

        t = time.time()
        rows = pii_audit(docs, ["text"]).collect()
        legs["pii_audit"] = {"rows_out": len(rows),
                             "sec": round(time.time() - t, 2)}

        t = time.time()
        c = SH.mixture_sample_temperature(
            docs, alpha=0.3, target_frac=0.5).count()
        legs["mixture_sample_temperature"] = {
            "rows_out": int(c), "sec": round(time.time() - t, 2)}

        t = time.time()
        c = D.ensemble_near_dups(docs, threshold=0.5, max_hamming=3,
                                 max_dist=3, min_votes=2).count()
        legs["dedup_ensemble"] = {"rows_out": int(c),
                                  "sec": round(time.time() - t, 2)}
        out["legs"][f"x{mult}"] = legs
        print(json.dumps({f"x{mult}": legs}), file=sys.stderr)

    p = Path(__file__).resolve().parent.parent / "BENCH_STRESS.json"
    blob = json.loads(p.read_text())
    blob["stress_r10b"] = out
    p.write_text(json.dumps(blob, indent=1, sort_keys=True) + "\n")
    print("written stress_r10b")


if __name__ == "__main__":
    main()
