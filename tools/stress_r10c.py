"""One-off stress legs for the r10 session-4 operators
(bpe_decode roundtrip / split_by_cluster / quality_classifier) at
10x and 20x replicated sf0.1 documents — appends a ``stress_r10c``
block to BENCH_STRESS.json.

The slope question per op:
- bpe_roundtrip: corpus-exact train (vocab-bounded agg — the
  replicas add only ~one copytag token per copy, so the vocab is
  scale-free) + two zero-exchange Arrow maps (encode, decode) + one
  per-source agg — must be linear, scan-bound.
- split_by_cluster: the coin itself is a narrow projection; the
  slope IS dedup_clusters' slope (pair generation + min-label
  propagation over the near-dup graph). The replicated corpus keeps
  per-copy dup structure without collapsing copies together, so the
  edge count grows linearly with the corpus.
- quality_classifier: fixed 512-doc sample train (scale-free) + one
  exact-percentile agg + a codegen'd scoring scan + per-source agg —
  must be linear with a constant train offset.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import stress as stress_mod  # noqa: E402

from parallel_svms_spark.ml import quality as Q  # noqa: E402
from parallel_svms_spark.operators import bpe as BP  # noqa: E402
from parallel_svms_spark.operators import sharding as SH  # noqa: E402
from parallel_svms_spark.session import get_spark  # noqa: E402


def probe() -> float:
    t = time.time()
    acc = 0
    for i in range(2_000_000):
        acc += i * i % 7
    return round(time.time() - t, 4)


def main() -> None:
    spark = get_spark("stress-r10c")
    out: dict = {"probe_sec": probe(), "legs": {}}
    for mult in (10, 20):
        docs_path, _ = stress_mod.build(spark, mult, 25)
        docs = spark.read.parquet(docs_path)
        n_in = docs.count()
        legs = {}

        t = time.time()
        rows = BP.bpe_roundtrip(docs, n_merges=200).collect()
        legs["bpe_roundtrip"] = {
            "rows_in": n_in,
            "n_match": int(sum(r.n_match for r in rows)),
            "n_docs": int(sum(r.n_docs for r in rows)),
            "sec": round(time.time() - t, 2)}

        t = time.time()
        c = SH.split_by_cluster(docs).groupBy("split").count().collect()
        legs["split_by_cluster"] = {
            "rows_in": n_in,
            "by_split": {r.split: r["count"] for r in c},
            "sec": round(time.time() - t, 2)}

        t = time.time()
        rows = Q.quality_classifier(docs).collect()
        legs["quality_classifier"] = {
            "rows_in": n_in,
            "agree_ppm": int(sum(r.n_agree for r in rows) * 1_000_000
                             // max(sum(r.n_docs for r in rows), 1)),
            "sec": round(time.time() - t, 2)}

        out["legs"][f"x{mult}"] = legs
        print(json.dumps({f"x{mult}": legs}), file=sys.stderr)

    p = Path(__file__).resolve().parent.parent / "BENCH_STRESS.json"
    blob = json.loads(p.read_text())
    blob["stress_r10c"] = out
    p.write_text(json.dumps(blob, indent=1, sort_keys=True) + "\n")
    print("written stress_r10c")


if __name__ == "__main__":
    main()
