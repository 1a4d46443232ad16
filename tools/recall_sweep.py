"""ANN accuracy/cost sweep: measure recall@k of the two approximate
top-k paths (IVF coarse quantization, multi-probe hyperplane LSH)
against brute-force cosine ground truth, across their tuning knobs.

"Measure, don't guess": the scale pitch for IVF/LSH is scanning
n_probe/n_lists (resp. buckets/2^bits) of the data — this harness
quantifies what that fraction buys in recall, in BOTH data regimes:

- the sf0.1 fixture embeddings — near-orthogonal isotropic random
  unit vectors (top-10 "neighbors" at cosine ≈ 0.3), the NO-structure
  adversarial case where no sub-linear index can do well; and
- a deterministic 10-cluster blob set of the same size/dim — the
  structure real text/image embeddings actually have, where coarse
  quantization is supposed to earn its keep.

Writes RECALL.md so the tradeoff table lives in the repo and changes
to the index math show up as diffs.

Usage: python tools/recall_sweep.py [sf_dir] [n_queries] [out_md]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parallel_svms_spark.io.sources import load_table  # noqa: E402
from parallel_svms_spark.operators import similarity as S  # noqa: E402
from parallel_svms_spark.session import get_spark  # noqa: E402

K = 10


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    out_md = sys.argv[3] if len(sys.argv) > 3 else str(
        Path(__file__).resolve().parent.parent / "RECALL.md")
    spark = get_spark("recall-sweep")
    emb = load_table(spark, sf_dir, "embeddings").cache()
    n_rows = emb.count()

    # clustered twin: same size/dim, 10 Gaussian blobs, unit-normalized
    import numpy as np
    rng = np.random.default_rng(7)
    dim = len(emb.first().embedding)
    n_clusters = 10
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = centers[np.arange(n_rows) % n_clusters] \
        + 0.15 * rng.standard_normal((n_rows, dim))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    blobs = spark.createDataFrame(
        [(int(i), [float(x) for x in pts[i]], int(i % n_clusters))
         for i in range(n_rows)],
        "vec_id long, embedding array<float>, label int").cache()
    blobs.count()
    # deterministic spread of query vectors across the table
    stride = max(1, n_rows // n_queries)
    qids = [i * stride for i in range(n_queries)]
    qvecs = {r.vec_id: [float(x) for x in r.embedding]
             for r in emb.filter(emb.vec_id.isin(qids)).collect()}

    import math

    def ground_truth(table, queries):
        return {qid: {r.vec_id
                      for r in S.topk_cosine(table, qv, k=K).collect()}
                for qid, qv in queries.items()}

    def sweep(table, truth, queries, fn, configs):
        out = []
        for label, kwargs, frac in configs:
            t0 = time.monotonic()
            hits = tot = 0
            for qid, qv in queries.items():
                got = {r.vec_id
                       for r in fn(table, qv, k=K, **kwargs).collect()}
                hits += len(got & truth[qid])
                tot += len(truth[qid])
            out.append((label, frac, hits / tot,
                        (time.monotonic() - t0) / len(queries)))
            print(f"  {label}: recall@{K} {hits / tot:.3f}", file=sys.stderr)
        return out

    ivf_cfg = [
        (f"IVF lists=16 probe={p}", {"n_lists": 16, "n_probe": p}, p / 16)
        for p in (1, 2, 4, 8)]
    lsh_cfg = [
        (f"LSH bits=12 probe_bits={b}", {"n_bits": 12, "n_probe_bits": b},
         sum(math.comb(12, i) for i in range(b + 1)) / 2 ** 12)
        for b in (0, 1, 2, 3)]

    pq_cfg = [
        (f"PQ m=8 ks=64 cand={c}", {"m": 8, "ks": 64, "n_candidates": c},
         c / n_rows)
        for c in (50, 100, 200, 400)]

    results = {}
    for regime, table in (("isotropic fixture", emb),
                          ("10-cluster blobs", blobs)):
        print(f"-- {regime}", file=sys.stderr)
        queries = {r.vec_id: [float(x) for x in r.embedding]
                   for r in table.filter(table.vec_id.isin(qids)).collect()}
        t0 = time.monotonic()
        truth = ground_truth(table, queries)
        brute_sec = time.monotonic() - t0
        results[regime] = (
            sweep(table, truth, queries, S.ivf_topk, ivf_cfg)
            + sweep(table, truth, queries, S.ann_lsh_topk, lsh_cfg)
            + sweep(table, truth, queries, S.pq_topk, pq_cfg),
            brute_sec / len(queries))

    lines = [
        "# RECALL — ANN accuracy/cost sweep",
        "",
        f"`python tools/recall_sweep.py {sf_dir} {n_queries}`: recall@{K}",
        f"vs brute-force cosine ground truth over {n_queries} query",
        f"vectors on two {n_rows}-vector datasets. `scan frac` is the",
        "designed fraction of the table each probe touches (the quantity",
        "that becomes partition pruning at 100 TB — see",
        "`write_ivf_partitioned`); per-query seconds are local[32]",
        "wall-clock, dominated by fixed job overhead at this SF — the",
        "scan-fraction column, not wall-clock, is the scale signal.",
    ]
    for regime, (rows_out, brute_per_q) in results.items():
        lines += [
            "",
            f"## {regime} (brute-force baseline "
            f"{brute_per_q:.2f} s/query)",
            "",
            "| config | scan frac | recall@10 | sec/query |",
            "|---|---|---|---|",
        ]
        for label, frac, rec, sec in rows_out:
            lines.append(
                f"| {label} | {frac:.3f} | {rec:.3f} | {sec:.2f} |")
    lines += [
        "",
        "(PQ's `scan frac` is the exact-rerank fraction; its ADC",
        "candidate stage reads every row's 8-byte code — 1/32nd the",
        "bytes of the vectors it replaces.)",
        "",
        "Reading: on the ISOTROPIC fixture (near-orthogonal random",
        "vectors, top-10 at cosine ≈ 0.3) no sub-linear index can",
        "locate neighbors — recall tracks scan fraction, the provable",
        "worst case; the similarity tests assert the property LSH does",
        "guarantee there (truly-similar planted vectors collide). On",
        "the CLUSTERED twin — the structure real embeddings have —",
        "coarse quantization works as designed: recall is high at a",
        "small probed fraction. Both paths exact-rerank candidates, so",
        "precision is 1.0 by construction; recall is the only",
        "approximation, and partitioned layouts turn the probed",
        "fraction into real partition pruning.",
    ]
    Path(out_md).write_text("\n".join(lines) + "\n")
    print(f"wrote {out_md}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
